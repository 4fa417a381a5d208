"""Fused int8 dequant-matmul Pallas kernel for the decode hot path.

Weight-only int8 decode is HBM-bandwidth-bound: each step streams the whole
~1.24 GB int8 decoder through the chip while the activations are a few KB
(`[B, d]` with B <= pool slots). The capability being beaten is the
reference's bitsandbytes Linear8bitLt path (reference backend/asr.py:169-210);
the XLA fallback in ops/quant.py measured only 55-65 % of the int8 bandwidth
bound on chip (INT8_FILE_BENCH.json r3, 291-306 tok/s vs a ~553 tok/s
roofline) — the convert-into-dot fusion XLA emits relays int8 (32, 128)
tiles into bf16 (16, 128) layout on the critical path.

Here the kernel owns the layout: the grid walks output-column blocks, each
step DMAs one `[K, n_blk]` int8 block into VMEM (half the bytes of bf16 —
this DMA is the roofline term and Mosaic double-buffers it against compute),
upcasts to bf16 on the VPU, runs the `[B, K] x [K, n_blk]` MXU dot at f32
accumulation, and applies the per-output-channel scale to the f32 result
before the single cast back to the activation dtype.

NOT wired into serving: on chip both forms measured SLOWER than the HLO
XLA emits for ops/quant.matmul's convert-into-dot (295-303 vs 342-446
GB/s effective, INT8_MATMUL_BENCH.json — the r3 55-65 % reading above was
an epoch artifact; the r4 roofline probe shows XLA already at ~85-95 % of
the chip's real streaming ceiling). The kernels and their interpret-mode
parity tests (tests/test_quant.py) are kept as the measured baseline for
hardware where the tradeoff flips. Numerics: identical quantized weights,
scale applied after the f32-accumulated dot on both paths.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, q_ref, s_ref, o_ref):
    w = q_ref[:].astype(jnp.bfloat16)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)


def _pick_n_blk(n: int) -> int:
    for blk in (512, 384, 256, 128):
        if n % blk == 0:
            return blk
    return 0


def supported(x_shape, q_shape) -> bool:
    """True when the kernel handles this (x, q) pair: 2-D single-position
    activations and 128-aligned weight dims (all four decoder projections
    and every encoder projection at nano scale qualify)."""
    if len(x_shape) != 2 or len(q_shape) != 2:
        return False
    k, n = q_shape
    return k % 128 == 0 and _pick_n_blk(n) != 0


@partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _int8_matmul(x, q, scale, out_dtype, interpret):
    b, k = x.shape
    n = q.shape[1]
    n_blk = _pick_n_blk(n)
    # sublane-pad the (tiny) activation block to the bf16 tile height; the
    # padded rows cost nothing against the [K, n_blk] weight DMA that
    # dominates each grid step
    b_pad = -(-max(b, 16) // 16) * 16
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0)))
    out = pl.pallas_call(
        _kernel,
        grid=(n // n_blk,),
        in_specs=[
            pl.BlockSpec((b_pad, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n_blk), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_blk), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (b_pad, n_blk), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * k * n,
            bytes_accessed=k * n + 4 * n + 2 * b_pad * (k + n),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, q, scale)
    return out[:b] if b_pad != b else out


def int8_matmul(
    x: jnp.ndarray,
    q: jnp.ndarray,
    scale: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """x [B, K] (bf16/f32) @ dequant(q [K, N] int8, scale [1, N] f32) -> [B, N]
    in x.dtype. Call `supported(x.shape, q.shape)` first; asserts otherwise."""
    assert supported(x.shape, q.shape), (x.shape, q.shape)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _int8_matmul(
        x, q, scale.reshape(1, -1).astype(jnp.float32), x.dtype, interpret
    )


def _stacked_kernel(l_ref, x_ref, q_ref, s_ref, o_ref):
    del l_ref  # consumed by the index maps
    w = q_ref[0].astype(jnp.bfloat16)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[0]).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _int8_matmul_stacked(x, q, scale, layer, out_dtype, interpret):
    b, k = x.shape
    n = q.shape[2]
    n_blk = _pick_n_blk(n)
    b_pad = -(-max(b, 16) // 16) * 16
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // n_blk,),
        in_specs=[
            pl.BlockSpec((b_pad, k), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, n_blk), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_blk), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (b_pad, n_blk), lambda j, l: (0, j), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _stacked_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * k * n,
            bytes_accessed=k * n + 4 * n + 2 * b_pad * (k + n),
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, q, scale)
    return out[:b] if b_pad != b else out


def int8_matmul_stacked(
    x: jnp.ndarray,
    q: jnp.ndarray,
    scale: jnp.ndarray,
    layer,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """x [B, K] @ dequant(q [L, K, N] int8, scale [L, 1, N])[layer] -> [B, N].

    The layer-scan form: the FULL stacked weight is the kernel operand and
    the (traced) layer index arrives by scalar prefetch, so the per-layer
    slice happens inside the kernel's DMA index map. Slicing before a
    pallas_call instead forces XLA to materialize the slice as a custom-call
    operand — an HBM->HBM copy of every weight every step, which is what
    sank the naive kernel to 295 GB/s effective (INT8_MATMUL_BENCH.json)."""
    assert q.ndim == 3 and supported(x.shape, q.shape[1:]), (x.shape, q.shape)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _int8_matmul_stacked(
        x, q, scale.reshape(q.shape[0], 1, -1).astype(jnp.float32),
        layer, x.dtype, interpret,
    )
