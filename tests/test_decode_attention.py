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
