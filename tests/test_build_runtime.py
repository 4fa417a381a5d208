"""build_runtime config matrix: every CLI-reachable (model, vad, engine,
quant) combination constructs a working runtime (serve/app.py)."""

import asyncio

import numpy as np
import pytest

from sonicscribe_tpu.config import AppConfig
from sonicscribe_tpu.serve.app import build_runtime

SR = 16000


def _run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


@pytest.mark.parametrize(
    "vad_spec,engine_kind,quant",
    [
        ("energy", "batched", "native"),
        ("silero", "batched", "native"),
        ("energy", "threaded", "native"),
        ("energy", "batched", "int8"),
    ],
)
def test_runtime_matrix(vad_spec, engine_kind, quant):
    cfg = AppConfig()
    cfg.quant_mode = quant
    engine, vad, info = build_runtime("tiny-random", vad_spec, cfg, engine_kind)
    try:
        assert info["vad"] == vad_spec and info["engine"] == engine_kind
        assert info["quant_mode"] == quant
        t = np.arange(int(SR * 0.4)) / SR
        audio = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)

        async def go():
            r = await engine.transcribe(audio, SR, max_new_tokens=6)
            win = (0.001 * np.random.default_rng(0).standard_normal(10240)).astype(
                np.float32
            )
            p, _state = await engine.vad_window_prob(win, None)
            return r, p

        r, p = _run(go())
        assert 1 <= len(r.tokens) <= 6
        assert 0.0 <= p <= 1.0
    finally:
        engine.shutdown()
