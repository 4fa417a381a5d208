"""Day-one checkpoint-readiness hardening (round-3 verdict item #4).

The real GLM-ASR-Nano-2512 checkpoint has never flowed through this stack
(env has zero egress; reference loads it at backend/asr.py:66-82). These
tests harden the conversion path so that name-mapping or layout drift
against the real checkpoint breaks LOUDLY on day one:

  * `cfg_from_hf_config` derives the full architecture from the synthetic
    fixture's realistic config.json (nested audio_config/text_config +
    generation_config.json special ids) — round-trip exact.
  * `convert_hf_checkpoint(cfg=None)` — the day-one derive path — produces
    a checkpoint whose load round-trips the derived config.
  * An explicit cfg that DISAGREES with config.json raises with the field
    diff (never silently converts under the wrong architecture).
  * A missing / misnamed HF tensor raises listing every problem at once.
  * Unconsumed HF tensors are reported (warning), not dropped silently.
  * `tools/verify_checkpoint.verify` — the day-one runbook — passes every
    step against the synthetic fixture, including the golden-WAV gate.
"""

import asyncio
import dataclasses
import json
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonicscribe_tpu.models import tiny
from sonicscribe_tpu.models.glm_asr import init_params
from sonicscribe_tpu.tools.convert_weights import (
    cfg_from_hf_config,
    convert_hf_checkpoint,
    expected_shapes,
    load_checkpoint,
)
from sonicscribe_tpu.tools.export_hf import (
    export_hf_checkpoint,
    make_test_tokenizer,
)


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    cfg = tiny()
    params = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    d = str(tmp_path_factory.mktemp("hf_fixture"))
    export_hf_checkpoint(params, cfg, d)
    make_test_tokenizer(d, vocab_size=cfg.decoder.vocab_size, cfg=cfg)
    return cfg, d


def test_cfg_derivation_roundtrips_exactly(hf_dir):
    cfg, d = hf_dir
    derived = cfg_from_hf_config(d)
    assert derived == cfg


def test_cfg_derivation_fails_loudly_listing_missing_fields(tmp_path):
    d = str(tmp_path)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({"model_type": "glm-asr", "audio_config": {},
                   "text_config": {"vocab_size": 100}}, f)
    with pytest.raises(ValueError) as e:
        cfg_from_hf_config(d)
    msg = str(e.value)
    # every missing scope appears in one combined report
    assert "audio:" in msg and "text:" in msg
    assert "num_mel_bins" in msg and "hidden_size" in msg


def test_convert_with_derived_config(hf_dir, tmp_path):
    """cfg=None — the day-one path: architecture read off the checkpoint."""
    cfg, d = hf_dir
    out = str(tmp_path / "native")
    got = convert_hf_checkpoint(d, out, cfg=None, progress=lambda _m: None)
    assert got == cfg
    cfg2, params, tok = load_checkpoint(out)
    assert cfg2 == cfg
    want = expected_shapes(cfg)
    # every expected tensor present with the expected shape
    from sonicscribe_tpu.tools.convert_weights import _flatten

    flat = _flatten(jax.tree.map(np.asarray, params))
    assert set(want) <= set(flat)
    for k, shape in want.items():
        assert tuple(flat[k].shape) == shape, k


def test_explicit_cfg_disagreement_raises_with_diff(hf_dir, tmp_path):
    cfg, d = hf_dir
    wrong = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, n_kv_heads=4)
    )
    with pytest.raises(ValueError) as e:
        convert_hf_checkpoint(d, str(tmp_path / "x"), wrong,
                              progress=lambda _m: None)
    assert "decoder.n_kv_heads" in str(e.value)
    assert "given=4" in str(e.value)


def test_missing_hf_tensor_raises(hf_dir, tmp_path):
    """A renamed tensor in the real checkpoint must fail the fetch with the
    missing name, not produce a silently-wrong tree."""
    from safetensors.numpy import load_file, save_file

    cfg, d = hf_dir
    broken = str(tmp_path / "broken_hf")
    shutil.copytree(d, broken)
    sd = load_file(os.path.join(broken, "model.safetensors"))
    victim = "audio_proj.linear_1.weight"
    sd["audio_proj.proj_in.weight"] = sd.pop(victim)
    save_file(sd, os.path.join(broken, "model.safetensors"))
    with pytest.raises(KeyError) as e:
        convert_hf_checkpoint(broken, str(tmp_path / "y"), cfg,
                              progress=lambda _m: None)
    assert victim in str(e.value)


def test_unconsumed_hf_tensors_are_reported(hf_dir, tmp_path):
    from safetensors.numpy import load_file, save_file

    cfg, d = hf_dir
    extra = str(tmp_path / "extra_hf")
    shutil.copytree(d, extra)
    sd = load_file(os.path.join(extra, "model.safetensors"))
    sd["model.layers.0.mystery_gate.weight"] = np.zeros((4, 4), np.float32)
    # derived buffers must NOT trigger the warning
    sd["model.rotary_emb.inv_freq"] = np.zeros((8,), np.float32)
    save_file(sd, os.path.join(extra, "model.safetensors"))
    msgs: list[str] = []
    convert_hf_checkpoint(extra, str(tmp_path / "z"), cfg, progress=msgs.append)
    warn = [m for m in msgs if m.startswith("WARNING")]
    assert len(warn) == 1
    assert "mystery_gate" in warn[0]
    assert "inv_freq" not in warn[0]


def test_verify_runbook_passes_on_synthetic_fixture(hf_dir, tmp_path):
    """The day-one runbook end-to-end: derive -> convert -> load -> twin
    token-exactness -> mel parity -> golden WAV."""
    from sonicscribe_tpu.audio.wav import write_wav
    from sonicscribe_tpu.tools.verify_checkpoint import verify

    _cfg, d = hf_dir
    sr = 16000
    t = np.arange(sr) / sr
    wav_path = str(tmp_path / "golden.wav")
    with open(wav_path, "wb") as f:
        f.write(write_wav((0.3 * np.sin(2 * np.pi * 440 * t)).astype(
            np.float32), sr))

    report = verify(d, out=str(tmp_path / "native"), wavs=[wav_path])
    by_step = {r["step"]: r for r in report}
    for step in ("derive", "convert", "load", "twin", "mel", "wav[0]"):
        assert step in by_step, f"runbook skipped step {step}: {report}"
        assert by_step[step]["status"] == "ok", by_step[step]
    assert not [r for r in report if r["status"] == "FAIL"]


def test_verify_runbook_twin_gate_is_not_vacuous(hf_dir, tmp_path,
                                                 monkeypatch):
    """The twin step must actually COMPARE: force the torch side to emit a
    shifted token stream and assert the runbook reports FAIL (guards against
    the gate silently passing on exceptions or an empty comparison)."""
    import sonicscribe_tpu.tools.torch_reference as torch_ref
    from sonicscribe_tpu.tools.verify_checkpoint import verify

    _cfg, d = hf_dir
    real = torch_ref.transcribe_torch

    def shifted(*args, **kwargs):
        toks = real(*args, **kwargs)
        return [(t + 1) for t in toks]

    monkeypatch.setattr(torch_ref, "transcribe_torch", shifted)
    report = verify(d, out=str(tmp_path / "native"))
    by_step = {r["step"]: r for r in report}
    assert by_step["twin"]["status"] == "FAIL", report


async def test_serve_smoke_through_checkpoint_path(hf_dir, tmp_path,
                                                   aiohttp_client):
    """Day-one SERVING wiring (VERDICT r4 #8): boot `build_runtime` from a
    converted checkpoint directory — the exact path the real
    GLM-ASR-Nano-2512 weights will take (`serve --model <dir>`) — and drive
    one live WS session plus one file job over real sockets. verify_checkpoint
    proves convert→load→transcribe; this proves the serving layer consumes
    the same checkpoint end to end before real weights ever arrive."""
    from sonicscribe_tpu.audio.wav import write_wav
    from sonicscribe_tpu.config import AppConfig
    from sonicscribe_tpu.serve.app import build_app, build_runtime

    _cfg, d = hf_dir
    ckpt = str(tmp_path / "native_ckpt")
    convert_hf_checkpoint(d, ckpt, cfg=None, progress=lambda _m: None)

    app_cfg = AppConfig()
    engine, vad, info = build_runtime(ckpt, "energy", app_cfg)
    try:
        app = build_app(app_cfg, engine, vad, info)
        client = await aiohttp_client(app)

        body = await (await client.get("/health")).json()
        assert body["status"] == "ok" and body["model_loaded"]

        sr = 16000
        t = np.arange(int(2.0 * sr)) / sr
        env = 0.5 * (1 + np.sin(2 * np.pi * 3 * t))
        speech = (0.25 * env * sum(
            np.sin(2 * np.pi * f * t) for f in (200, 700, 1500, 2600)
        )).astype(np.float32)
        sil = (0.0006 * np.random.default_rng(1)
               .standard_normal(int(1.6 * sr))).astype(np.float32)

        # --- one file job over live sockets ---
        from aiohttp import FormData

        form = FormData()
        form.add_field(
            "file", write_wav(np.concatenate([sil[: sr // 2], speech, sil]), sr),
            filename="smoke.wav", content_type="audio/wav",
        )
        r = await client.post("/transcribe/file?stream=true", data=form)
        assert r.status == 200
        lines = [json.loads(ln) for ln in (await r.text()).strip().split("\n")]
        summary = lines[-1]
        assert summary["type"] == "final_summary"
        assert summary["successful_segments"] >= 1
        assert summary["failed_segments"] == 0

        # --- one WS session over live sockets ---
        ws = await client.ws_connect("/ws/audio")
        hello = json.loads(await ws.receive_str())
        assert hello["type"] == "connection_established"
        pcm = np.clip(
            np.concatenate([sil[: sr // 2], speech, sil]) * 32767,
            -32768, 32767,
        ).astype("<i2").tobytes()
        committed = None
        for i in range(0, len(pcm), 2048):
            await ws.send_bytes(pcm[i : i + 2048])
        for _ in range(200):
            try:
                msg = json.loads(await asyncio.wait_for(
                    ws.receive_str(), timeout=20.0
                ))
            except asyncio.TimeoutError:
                break
            if msg["type"] == "committed_output":
                committed = msg
                break
        await ws.close()
        assert committed is not None, "no committed_output from checkpoint-served session"
        # random weights may greedy-decode straight to EOS -> empty text;
        # the wiring proof is the committed message itself, with the field
        assert "text" in committed and "segment_id" in committed, committed
    finally:
        engine.shutdown()
