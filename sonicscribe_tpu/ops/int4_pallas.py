"""Fused int4 dequant-matmul Pallas kernels for the decode hot path.

Decode is weight-stream-bound and the int8 path already reads at 91-93 % of
the chip's measured int8 streaming rate (INT8_MATMUL_BENCH + HBM_BENCH r4),
so the remaining single-chip decode lever is BYTES, not rate: int4 weights
halve the stream again (~0.62 GB/step at nano). Plain XLA cannot exploit it:
the shift/mask unpack of packed nibbles never fuses into the dot's operand
load (INT4_MATMUL_BENCH: 31.8 ms/step, 16x WORSE than int8) and the native
``jnp.int4`` dtype dies in the axon backend's lowering. Here the kernel owns
the unpack, and the packing is chosen so the unpack is nearly free:

  packed[k, n] (int8)  =  (codes[k, n] & 0xF) | (codes[k + K/2, n] << 4)

i.e. the LOW nibble holds weight row ``k`` and the HIGH nibble holds row
``k + K/2``. Because the two nibble planes are contiguous halves of K (not
interleaved), no sublane shuffle is needed:

  lo = (p << 4) >> 4      # two arithmetic int8 shifts: sign-extended row k
  hi =  p >> 4            # ONE arithmetic shift: sign-extended row k + K/2
  acc = x[:, :K/2] @ lo + x[:, K/2:] @ hi

The activation slices are contiguous, the unpack is 3 VPU shift ops per
packed byte, and the [K/2, n_blk] int8 DMA (one QUARTER of bf16's bytes) is
the roofline term Mosaic double-buffers against compute.

Two dot flavors:
  - w4a16: unpacked nibbles upcast to bf16, bf16 MXU dot (drop-in for the
    weight-only decode path; activations untouched).
  - w4a8: nibbles stay s8 and feed the native s8 MXU dot against
    dynamically-quantized s8 activations (zero weight-cast VPU work; the
    per-token activation quant is output-sized, same recipe as
    ops/quant.matmul_w8a8).

Like int8_pallas, each flavor has a stacked scalar-prefetch form for the
28-layer ``lax.scan``: the FULL [L, K/2, N] weight is the kernel operand and
the traced layer index arrives by scalar prefetch, so the per-layer slice
happens inside the DMA index map (slicing before the call would materialize
an HBM->HBM copy every step).

Quantization here is per-output-channel scale over [-7, 7] codes (the same
symmetric recipe as int8 with 3-bit mantissa headroom). The capability being
beaten is the reference's bitsandbytes int8 decode (ref backend/asr.py:
169-210); int4 halves its weight stream again.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_int4(codes: jnp.ndarray) -> jnp.ndarray:
    """[.., K, N] int8 codes in [-8, 7] -> [.., K/2, N] int8, low nibble =
    row k, high nibble = row k + K/2 (contiguous halves, see module doc)."""
    k = codes.shape[-2]
    assert k % 2 == 0, codes.shape
    lo = codes[..., : k // 2, :].astype(jnp.int8)
    hi = codes[..., k // 2 :, :].astype(jnp.int8)
    return ((lo & 0xF) | (hi << 4)).astype(jnp.int8)


def _unpack(p):
    """Sign-extended nibble planes from packed int8. Mosaic rejects vector
    shifts on int8 (remote-compile bisection, r4), so the shifts run in
    int32: widen, 3 arithmetic shifts, narrow — ~6 VPU ops per packed byte,
    well under the block DMA this kernel exists to halve."""
    v = p.astype(jnp.int32)
    lo = ((v << 28) >> 28).astype(jnp.int8)
    hi = (v >> 4).astype(jnp.int8)
    return lo, hi


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_int4 (host/test helper): [.., K/2, N] -> [.., K, N]."""
    lo, hi = _unpack(packed)
    return jnp.concatenate([lo, hi], axis=-2)


def _pick_n_blk(n: int) -> int:
    for blk in (512, 384, 256, 128):
        if n % blk == 0:
            return blk
    return 0


def supported(x_shape, packed_shape) -> bool:
    """2-D single-position activations against 128-aligned packed weights;
    x's K must be exactly twice the packed K/2."""
    if len(x_shape) != 2 or len(packed_shape) != 2:
        return False
    k2, n = packed_shape
    return x_shape[1] == 2 * k2 and _pick_n_blk(n) != 0


# ---------------------------------------------------------------- w4a16 ----


def _kernel_w4a16(x_ref, p_ref, s_ref, o_ref):
    lo, hi = _unpack(p_ref[:])
    k2 = lo.shape[0]
    acc = jnp.dot(
        x_ref[:, :k2], lo.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    acc += jnp.dot(
        x_ref[:, k2:], hi.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _int4_matmul(x, p, scale, out_dtype, interpret):
    b, k = x.shape
    k2, n = p.shape
    n_blk = _pick_n_blk(n)
    b_pad = -(-max(b, 16) // 16) * 16
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0)))
    out = pl.pallas_call(
        _kernel_w4a16,
        grid=(n // n_blk,),
        in_specs=[
            pl.BlockSpec((b_pad, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k2, n_blk), lambda j: (0, j), memory_space=pltpu.VMEM),
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
            flops=2 * b_pad * 2 * k2 * n,
            bytes_accessed=k2 * n + 4 * n + 2 * b_pad * (2 * k2 + n),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, p, scale)
    return out[:b] if b_pad != b else out


def int4_matmul(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scale: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """x [B, K] (bf16/f32) @ dequant(packed [K/2, N], scale [1, N]) -> [B, N]
    in x.dtype."""
    assert supported(x.shape, packed.shape), (x.shape, packed.shape)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _int4_matmul(
        x, packed, scale.reshape(1, -1).astype(jnp.float32), x.dtype, interpret
    )


def _stacked_kernel_w4a16(l_ref, x_ref, p_ref, s_ref, o_ref):
    del l_ref  # consumed by the index maps
    lo, hi = _unpack(p_ref[0])
    k2 = lo.shape[0]
    acc = jnp.dot(
        x_ref[:, :k2], lo.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    acc += jnp.dot(
        x_ref[:, k2:], hi.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (acc * s_ref[0]).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _int4_matmul_stacked(x, p, scale, layer, out_dtype, interpret):
    b, k = x.shape
    _, k2, n = p.shape
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
            pl.BlockSpec((1, k2, n_blk), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_blk), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (b_pad, n_blk), lambda j, l: (0, j), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _stacked_kernel_w4a16,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * 2 * k2 * n,
            bytes_accessed=k2 * n + 4 * n + 2 * b_pad * (2 * k2 + n),
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, p, scale)
    return out[:b] if b_pad != b else out


def int4_matmul_stacked(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scale: jnp.ndarray,
    layer,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """x [B, K] @ dequant(packed [L, K/2, N], scale [L, 1, N])[layer] ->
    [B, N]; the traced layer index slices inside the kernel's DMA index map
    (the lax.scan form the decode step uses)."""
    assert packed.ndim == 3 and supported(x.shape, packed.shape[1:]), (
        x.shape, packed.shape,
    )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _int4_matmul_stacked(
        x, packed, scale.reshape(packed.shape[0], 1, -1).astype(jnp.float32),
        layer, x.dtype, interpret,
    )


# ----------------------------------------------------------------- w4a8 ----


def _kernel_w4a8(xq_ref, sx_ref, p_ref, s_ref, o_ref):
    lo, hi = _unpack(p_ref[:])
    k2 = lo.shape[0]
    acc = jnp.dot(xq_ref[:, :k2], lo, preferred_element_type=jnp.int32)
    acc += jnp.dot(xq_ref[:, k2:], hi, preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * sx_ref[:] * s_ref[:]).astype(
        o_ref.dtype
    )


@partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _int4_matmul_w4a8(xq, sx, p, scale, out_dtype, interpret):
    b, k = xq.shape
    k2, n = p.shape
    n_blk = _pick_n_blk(n)
    # s8 operand tiles are 32 sublanes high; pad the activation block up
    b_pad = -(-max(b, 32) // 32) * 32
    if b_pad != b:
        xq = jnp.pad(xq, ((0, b_pad - b), (0, 0)))
        sx = jnp.pad(sx, ((0, b_pad - b), (0, 0)))
    out = pl.pallas_call(
        _kernel_w4a8,
        grid=(n // n_blk,),
        in_specs=[
            pl.BlockSpec((b_pad, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k2, n_blk), lambda j: (0, j), memory_space=pltpu.VMEM),
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
            flops=2 * b_pad * 2 * k2 * n,
            bytes_accessed=k2 * n + 4 * n + b_pad * (2 * k2 + 4 + 2 * n),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, sx, p, scale)
    return out[:b] if b_pad != b else out


def _quant_acts(x):
    """Per-token symmetric s8 quant (same recipe as quant.matmul_w8a8)."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def int4_matmul_w4a8(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scale: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Dynamic per-token s8 activations against the s4 nibble planes on the
    native s8 MXU dot; scales fold into the f32 accumulator in-kernel."""
    assert supported(x.shape, packed.shape), (x.shape, packed.shape)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xq, sx = _quant_acts(x)
    return _int4_matmul_w4a8(
        xq, sx, packed, scale.reshape(1, -1).astype(jnp.float32),
        x.dtype, interpret,
    )


def _stacked_kernel_w4a8(l_ref, xq_ref, sx_ref, p_ref, s_ref, o_ref):
    del l_ref
    lo, hi = _unpack(p_ref[0])
    k2 = lo.shape[0]
    acc = jnp.dot(xq_ref[:, :k2], lo, preferred_element_type=jnp.int32)
    acc += jnp.dot(xq_ref[:, k2:], hi, preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * sx_ref[:] * s_ref[0]).astype(
        o_ref.dtype
    )


@partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _int4_matmul_w4a8_stacked(xq, sx, p, scale, layer, out_dtype, interpret):
    b, k = xq.shape
    _, k2, n = p.shape
    n_blk = _pick_n_blk(n)
    b_pad = -(-max(b, 32) // 32) * 32
    if b_pad != b:
        xq = jnp.pad(xq, ((0, b_pad - b), (0, 0)))
        sx = jnp.pad(sx, ((0, b_pad - b), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // n_blk,),
        in_specs=[
            pl.BlockSpec((b_pad, k), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, 1), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k2, n_blk), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_blk), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (b_pad, n_blk), lambda j, l: (0, j), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _stacked_kernel_w4a8,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * 2 * k2 * n,
            bytes_accessed=k2 * n + 4 * n + b_pad * (2 * k2 + 4 + 2 * n),
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), xq, sx, p, scale)
    return out[:b] if b_pad != b else out


def int4_matmul_w4a8_stacked(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scale: jnp.ndarray,
    layer,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Stacked scalar-prefetch W4A8 (the lax.scan decode form)."""
    assert packed.ndim == 3 and supported(x.shape, packed.shape[1:]), (
        x.shape, packed.shape,
    )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xq, sx = _quant_acts(x)
    return _int4_matmul_w4a8_stacked(
        xq, sx, packed, scale.reshape(packed.shape[0], 1, -1).astype(
            jnp.float32
        ),
        layer, x.dtype, interpret,
    )
