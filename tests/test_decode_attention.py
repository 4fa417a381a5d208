"""Flash-decode attention kernel vs the XLA decode-step attention math
(interpret mode; real-chip wiring is the round-2 follow-up)."""

import numpy as np
import pytest


def _reference(q, k_cache, v_cache, lens):
    """The decode_step attention math (models/glm_asr.py) in numpy."""
    S, nh, hd = q.shape
    nkv = k_cache.shape[2]
    g = nh // nkv
    out = np.zeros((S, nh * hd), np.float32)
    for s in range(S):
        n = lens[s] + 1
        qg = q[s].reshape(nkv, g, hd).astype(np.float64)
        k = k_cache[s, :n].astype(np.float64)  # [n, nkv, hd]
        v = v_cache[s, :n].astype(np.float64)
        scores = np.einsum("kgd,bkd->kgb", qg, k) / np.sqrt(hd)
        p = np.exp(scores - scores.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ctx = np.einsum("kgb,bkd->kgd", p, v)
        out[s] = ctx.reshape(-1)
    return out


@pytest.mark.parametrize("lens", [[0, 5], [127, 128], [255, 37]])
def test_matches_reference(lens):
    from sonicscribe_tpu.ops.decode_attention import flash_decode_attention
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    S, nh, nkv, hd, MAX = 2, 8, 2, 128, 256
    q = rng.standard_normal((S, nh, hd)).astype(np.float32) * 0.3
    k = rng.standard_normal((S, MAX, nkv, hd)).astype(np.float32) * 0.3
    v = rng.standard_normal((S, MAX, nkv, hd)).astype(np.float32) * 0.3
    lens = np.asarray(lens, np.int32)

    got = np.asarray(
        flash_decode_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lens),
            interpret=True,
        )
    )
    want = _reference(q, k, v, lens)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_decode_step_flash_token_parity():
    """decode_step(use_flash=True) must produce the same greedy tokens as the
    XLA attention path over a multi-step decode (interpret mode on CPU)."""
    import jax
    import jax.numpy as jnp

    from sonicscribe_tpu.models import tiny
    from sonicscribe_tpu.models.glm_asr import (
        decode_step,
        init_cache,
        init_params,
        prefill,
    )

    cfg = tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    B, S, MAX_LEN = 2, 24, 128
    rng = np.random.default_rng(1)
    embeds = jnp.asarray(
        rng.standard_normal((B, S, cfg.decoder.d_model)).astype(np.float32) * 0.1
    )
    lengths = jnp.asarray([S, S - 7], jnp.int32)

    def run(use_flash):
        cache = init_cache(cfg, B, MAX_LEN, dtype=jnp.float32)
        cache, logits = prefill(params, cfg, embeds, lengths, cache)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        toks = [np.asarray(tok)]
        for _ in range(6):
            cache, logits = decode_step(
                params, cfg, cache, tok, use_flash=use_flash
            )
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            toks.append(np.asarray(tok))
        return np.stack(toks), np.asarray(logits)

    toks_xla, logits_xla = run(False)
    toks_flash, logits_flash = run(True)
    np.testing.assert_array_equal(toks_flash, toks_xla)
    np.testing.assert_allclose(logits_flash, logits_xla, rtol=2e-4, atol=2e-4)


def test_batched_engine_flash_token_parity():
    """BatchedEngine(flash_decode='on') matches flash_decode='off'
    token-for-token through the full scheduler (interpret mode on CPU)."""
    import asyncio

    import jax
    import jax.numpy as jnp

    from sonicscribe_tpu.engine.batcher import BatchedEngine
    from sonicscribe_tpu.engine.transcriber import Transcriber
    from sonicscribe_tpu.models import tiny
    from sonicscribe_tpu.models.glm_asr import init_params
    from sonicscribe_tpu.models.tokenizer import ByteTokenizer
    from sonicscribe_tpu.vad.model import EnergyVad

    cfg = tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    tr = Transcriber(cfg, params, ByteTokenizer(cfg), prefill_buckets=(64,))
    sr = 16000
    t = np.arange(sr // 2) / sr
    audio = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)

    def go(flash):
        async def run():
            eng = BatchedEngine(
                tr, EnergyVad(), slots=2, max_decode_tokens=16,
                flash_decode=flash,
            )
            try:
                r = await eng.transcribe(audio, sr, max_new_tokens=8)
                return r.tokens
            finally:
                eng.shutdown()

        loop = asyncio.get_event_loop_policy().new_event_loop()
        return loop.run_until_complete(run())

    np.testing.assert_array_equal(go("on"), go("off"))
