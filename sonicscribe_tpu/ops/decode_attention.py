"""Pallas flash-decode attention: length-limited KV reads.

The XLA decode step (models/glm_asr.py:decode_step) reads the ENTIRE padded
KV cache [S, MAX_LEN, nkv, hd] every step — masked positions still cost HBM
bandwidth, and decode is bandwidth-bound. This kernel puts the KV blocks on
the PALLAS GRID (s, j) with a scalar-prefetched index map that clamps past-
the-end block indices to the slot's last occupied block: Mosaic's pipeline
emitter skips the DMA when a buffer's block index repeats, so each slot
fetches only ceil((len+1)/BLOCK) KV blocks from HBM — cost scales with cache
OCCUPANCY, not capacity. (A first version looped over blocks INSIDE a
per-slot kernel with a whole-row BlockSpec; that still DMA'd the full row and
measured 0.6-0.9x of XLA. This grid/index-map form is the paged-attention
pattern.)

Numerics verified against the XLA decode attention
(tests/test_decode_attention.py, incl. through decode_step and the full
BatchedEngine) and benched on the real v5e via
`python -m sonicscribe_tpu.tools.bench_flash`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128  # KV positions per grid step
NEG_INF = -1e30


def _kernel(
    lens_ref,  # [S] i32 scalar-prefetch
    q_ref,  # [1, nkv, g, hd]
    k_ref,  # [1, BLOCK, nkv, hd]
    v_ref,  # [1, BLOCK, nkv, hd]
    out_ref,  # [1, 8, nh*hd/8]
    m_ref,  # VMEM [nkv, g, 128] f32 (running max, col 0 meaningful)
    d_ref,  # VMEM [nkv, g, 128] f32 (running denom)
    acc_ref,  # VMEM [nkv, g, hd] f32
    *,
    scale,
):
    s = pl.program_id(0)
    j = pl.program_id(1)
    n_valid = lens_ref[s] + 1  # history + the just-written current token
    last_blk = lens_ref[s] // BLOCK  # index of the last occupied block
    nkv, g, hd = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        d_ref[...] = jnp.zeros_like(d_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j <= last_blk)
    def _update():
        q = q_ref[0].astype(jnp.float32) * scale  # [nkv, g, hd]
        k_blk = k_ref[0].astype(jnp.float32)  # [BLOCK, nkv, hd]
        v_blk = v_ref[0].astype(jnp.float32)
        pos = j * BLOCK + jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)
        valid = pos < n_valid  # [1, BLOCK]

        # per-kv-head 2D matmuls (Mosaic's dot_general has no batch dims)
        for h in range(nkv):
            scores = jax.lax.dot_general(
                q[h], k_blk[:, h, :],  # [g, hd] x [BLOCK, hd]
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [g, BLOCK]
            scores = jnp.where(valid, scores, NEG_INF)
            m_prev = m_ref[h, :, :1]  # [g, 1]
            blk_max = jnp.max(scores, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, blk_max)
            corr = jnp.exp(m_prev - m_new)  # [g, 1]
            p = jnp.exp(scores - m_new)  # [g, BLOCK]
            d_ref[h, :, :1] = d_ref[h, :, :1] * corr + jnp.sum(
                p, axis=-1, keepdims=True
            )
            ctx = jax.lax.dot_general(
                p, v_blk[:, h, :],  # [g, BLOCK] x [BLOCK, hd]
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [g, hd]
            acc_ref[h] = acc_ref[h] * corr + ctx
            m_ref[h, :, :1] = m_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _emit():
        out = acc_ref[...] / jnp.maximum(d_ref[:, :, :1], 1e-30)
        # out block is [1, 8, nh*hd/8] (Mosaic wants 8x128-aligned last dims)
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
    max_len, nkv = k_cache.shape[1], k_cache.shape[2]
    if max_len % BLOCK:
        raise ValueError(f"MAX_LEN {max_len} not a multiple of {BLOCK}")
    g = nh // nkv
    qg = q.reshape(S, nkv, g, hd)
    scale = 1.0 / (hd ** 0.5)
    lens = lens.astype(jnp.int32)

    def kv_map(s, j, lens_ref):
        # clamp past-the-end block indices to the slot's last occupied block:
        # a repeated index skips the DMA, so only occupied blocks are fetched
        return (s, jnp.minimum(j, lens_ref[s] // BLOCK), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # lens
        grid=(S, max_len // BLOCK),
        in_specs=[
            pl.BlockSpec((1, nkv, g, hd), lambda s, j, lens: (s, 0, 0, 0)),
            pl.BlockSpec((1, BLOCK, nkv, hd), kv_map),
            pl.BlockSpec((1, BLOCK, nkv, hd), kv_map),
        ],
        out_specs=pl.BlockSpec((1, 8, (nh * hd) // 8), lambda s, j, lens: (s, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((nkv, g, 128), jnp.float32),
            pltpu.VMEM((nkv, g, 128), jnp.float32),
            pltpu.VMEM((nkv, g, hd), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, 8, (nh * hd) // 8), jnp.float32),
        interpret=interpret,
    )(lens, qg, k_cache, v_cache)
    return out.reshape(S, nh * hd)
