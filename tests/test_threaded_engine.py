"""ThreadedEngine: the simple single-thread engine behind --engine threaded.

Covers the engine option build_runtime exposes (serve/app.py): token parity
with the direct Transcriber, VAD window probabilities with state threading,
and a full streaming session (interim + committed) through it.
"""

import asyncio

import jax
import jax.numpy as jnp
import numpy as np

from sonicscribe_tpu.config import AppConfig
from sonicscribe_tpu.engine.transcriber import Transcriber
from sonicscribe_tpu.models import tiny
from sonicscribe_tpu.models.glm_asr import init_params
from sonicscribe_tpu.models.tokenizer import ByteTokenizer
from sonicscribe_tpu.serve.engine_async import ThreadedEngine
from sonicscribe_tpu.tools.loadtest import run_load
from sonicscribe_tpu.vad.model import EnergyVad

SR = 16000


def _stack():
    cfg = tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    tr = Transcriber(cfg, params, ByteTokenizer(cfg), prefill_buckets=(64, 128))
    return tr


def _run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def test_token_parity_and_vad_state():
    tr = _stack()
    t = np.arange(int(SR * 0.4)) / SR
    audio = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    golden = tr.transcribe(audio, SR, max_new_tokens=8)

    engine = ThreadedEngine(tr, EnergyVad())
    try:
        async def go():
            r = await engine.transcribe(audio, SR, max_new_tokens=8)
            quiet = (0.0005 * np.random.default_rng(0).standard_normal(10240)).astype(np.float32)
            p1, state = await engine.vad_window_prob(quiet, None)
            p2, state = await engine.vad_window_prob(audio[:10240], state)
            return r, p1, p2

        r, p_quiet, p_speech = _run(go())
        np.testing.assert_array_equal(r.tokens, golden.tokens)
        assert 0.0 <= p_quiet <= 1.0 and 0.0 <= p_speech <= 1.0
        assert p_speech > p_quiet  # energy gate sees the tone after the floor
    finally:
        engine.shutdown()


def test_streaming_session_through_threaded_engine():
    """Full sessions (gate + interim + committed) run on the simple engine
    too — it has no device ring, so sessions take the host-audio path."""
    tr = _stack()
    engine = ThreadedEngine(tr, EnergyVad())
    try:
        metrics = _run(
            run_load(engine, AppConfig(), n_streams=2, seconds=6.0, realtime=False)
        )
        assert metrics["errors"] == 0, metrics
        assert metrics["committed_count"] >= 2, metrics
    finally:
        engine.shutdown()
