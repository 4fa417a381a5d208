"""Pallas flash-decode attention: length-limited KV reads (EXPERIMENTAL).

The XLA decode step (models/glm_asr.py:decode_step) reads the ENTIRE padded
KV cache [S, MAX_LEN, nkv, hd] every step — masked positions still cost HBM
bandwidth, and decode is bandwidth-bound (measured ~82% of v5e speed-of-light
at nano scale). This kernel iterates only ceil((len+1)/BLOCK) KV blocks per
slot with an online-softmax (flash) accumulator, cutting decode HBM traffic
roughly by the cache-occupancy ratio.

Status: numerics verified against the XLA attention math
(tests/test_decode_attention.py) and COMPILED + RUN on a real v5e chip
(agrees with interpret mode to 1e-7, incl. edge lengths 0 / block-straddling
/ full cache). Not yet wired into decode_step — that swap plus a measured
perf comparison under the batcher is the round-2 follow-up.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128  # KV positions per iteration
NEG_INF = -1e30


def _kernel(lens_ref, q_ref, k_ref, v_ref, out_ref, *, scale):
    """Grid is (S,). Per slot: online-softmax attention over the first
    lens[s]+1 cache positions (history + the just-written token).

    q_ref: [1, nkv, g, hd]; k_ref/v_ref: [1, MAX, nkv, hd]; out [1, nkv*g*hd].
    """
    s = pl.program_id(0)
    n_valid = lens_ref[s] + 1  # history + current token
    nkv, g, hd = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    max_len = k_ref.shape[1]

    q = q_ref[0].astype(jnp.float32) * scale  # [nkv, g, hd]

    def body(j, carry):
        m, denom, acc = carry
        k_blk = k_ref[0, pl.ds(j * BLOCK, BLOCK)].astype(jnp.float32)  # [B,nkv,hd]
        v_blk = v_ref[0, pl.ds(j * BLOCK, BLOCK)].astype(jnp.float32)
        pos = j * BLOCK + jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)
        valid = pos < n_valid  # [1, B]

        # per-kv-head 2D matmuls (Mosaic's dot_general has no batch dims)
        new_m_h, denom_h, acc_h = [], [], []
        for h in range(nkv):
            scores = jax.lax.dot_general(
                q[h], k_blk[:, h, :],  # [g, hd] x [B, hd]
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [g, B]
            scores = jnp.where(valid, scores, NEG_INF)
            blk_max = jnp.max(scores, axis=-1, keepdims=True)  # [g, 1]
            nm = jnp.maximum(m[h], blk_max)
            corr = jnp.exp(m[h] - nm)
            p = jnp.exp(scores - nm)  # [g, B]
            denom_h.append(denom[h] * corr + jnp.sum(p, axis=-1, keepdims=True))
            ctx = jax.lax.dot_general(
                p, v_blk[:, h, :],  # [g, B] x [B, hd]
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [g, hd]
            acc_h.append(acc[h] * corr + ctx)
            new_m_h.append(nm)
        return jnp.stack(new_m_h), jnp.stack(denom_h), jnp.stack(acc_h)

    n_blocks = (n_valid + BLOCK - 1) // BLOCK
    m0 = jnp.full((nkv, g, 1), NEG_INF, jnp.float32)
    d0 = jnp.zeros((nkv, g, 1), jnp.float32)
    a0 = jnp.zeros((nkv, g, hd), jnp.float32)
    # dynamic trip count: only the occupied cache blocks are ever read
    m, denom, acc = jax.lax.fori_loop(
        0, jnp.minimum(n_blocks, max_len // BLOCK), body, (m0, d0, a0)
    )
    out = acc / jnp.maximum(denom, 1e-30)
    # out_ref block is [1, 8, nh*hd/8] (Mosaic wants 8x128-aligned last dims)
    out_ref[0] = out.reshape(8, (nkv * g * hd) // 8).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def flash_decode_attention(
    q: jnp.ndarray,  # [S, nh, hd] (current-token queries, post-RoPE)
    k_cache: jnp.ndarray,  # [S, MAX_LEN, nkv, hd] incl. the current token at lens[s]
    v_cache: jnp.ndarray,
    lens: jnp.ndarray,  # [S] history length (current token at index lens[s])
    interpret: bool = False,
) -> jnp.ndarray:
    """-> ctx [S, nh*hd] f32. MAX_LEN must be a multiple of BLOCK."""
    S, nh, hd = q.shape
    nkv = k_cache.shape[2]
    g = nh // nkv
    qg = q.reshape(S, nkv, g, hd)
    scale = 1.0 / (hd ** 0.5)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # lens
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, nkv, g, hd), lambda s, lens: (s, 0, 0, 0)),
            pl.BlockSpec(
                (1,) + k_cache.shape[1:], lambda s, lens: (s, 0, 0, 0)
            ),
            pl.BlockSpec(
                (1,) + v_cache.shape[1:], lambda s, lens: (s, 0, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec((1, 8, (nh * hd) // 8), lambda s, lens: (s, 0, 0)),
    )
    out = pl.pallas_call(
        partial(_kernel, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, 8, (nh * hd) // 8), jnp.float32),
        interpret=interpret,
    )(lens.astype(jnp.int32), qg, k_cache, v_cache)
    return out.reshape(S, nh * hd)
