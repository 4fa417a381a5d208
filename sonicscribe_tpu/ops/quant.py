"""INT8 weight-only quantization for the GLM-ASR decoder/encoder projections.

Replaces the reference's bitsandbytes ``Linear8bitLt`` CUDA path
(reference: backend/asr.py:169-210): every linear projection EXCEPT
`lm_head` / `embed_tokens` / `audio_proj` is replaced by int8 weights with
per-output-channel symmetric scales (the same skip-list as asr.py:176).

TPU mapping: the quantized weight is stored int8 in HBM (half the bytes of
bf16 — and autoregressive decode is HBM-bandwidth-bound, so this is a
throughput feature, not just a memory one). The hot matmul is
``x @ dequant(w)``: XLA fuses the int8->bf16 convert + column scale into the
MXU matmul's operand load, so no dequantized copy ever lands in HBM.

A quantized tensor is the pytree ``{"q": int8 [..., in, out],
"scale": f32 [..., 1, out]}``; stacked layer weights quantize per layer per
output channel, and `lax.scan` slices both leaves together.
"""

from __future__ import annotations

from typing import Any, Union

import jax.numpy as jnp

QTensor = dict  # {"q": int8, "scale": f32}
ArrayOrQ = Union[jnp.ndarray, QTensor]

# dict keys of projection weights that get quantized; embed / lm_head /
# adapter(audio_proj) are skipped, matching reference asr.py:176
_QUANT_KEYS = {
    # decoder
    "qkv_w", "o_w", "gate_up_w", "down_w",
    # encoder
    "q_w", "k_w", "v_w", "fc1_w", "fc2_w",
}


def is_qtensor(x: Any) -> bool:
    return isinstance(x, dict) and "q" in x and "scale" in x


def quantize_tensor(w: jnp.ndarray) -> QTensor:
    """Per-output-channel symmetric int8 over the input axis (axis=-2)."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale}


def dequantize_tensor(t: QTensor, dtype=jnp.float32) -> jnp.ndarray:
    return (t["q"].astype(jnp.float32) * t["scale"]).astype(dtype)


def matmul(x: jnp.ndarray, w: ArrayOrQ) -> jnp.ndarray:
    """x @ w where w may be a plain array or an int8 QTensor.

    For QTensors the convert+scale fuses into the matmul under XLA; int8 bytes
    stream from HBM.
    """
    if is_qtensor(w):
        out = jnp.einsum(
            "...i,io->...o",
            x,
            w["q"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        return (out * w["scale"][..., 0, :]).astype(x.dtype)
    return x @ w


def matmul_w8a8(x: jnp.ndarray, w: ArrayOrQ) -> jnp.ndarray:
    """x @ w with DYNAMIC per-row activation int8 on top of the weight int8.

    Both operands reach the MXU as s8 (s8 x s8 -> s32 is the native int8
    systolic mode), so the weight stream never pays the int8->bf16 relayout
    of the W8A16 `matmul` path on its HBM->MXU load. Activation scales are
    symmetric per leading row (per token), computed on the fly — the
    standard dynamic-quant serving recipe; adds ~0.3-1 % relative logit
    error on top of weight-only int8 (tests/test_quant.py bounds it).
    Falls back to the W8A16 path for non-quantized weights."""
    if not is_qtensor(w):
        return x @ w
    import jax

    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    out = jax.lax.dot_general(
        xq, w["q"],
        (((xq.ndim - 1,), (w["q"].ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (out.astype(jnp.float32) * sx * w["scale"][..., 0, :]).astype(x.dtype)


def quantize_params_int8(params: dict, decoder_only: bool = False) -> dict:
    """Quantize a GLM-ASR parameter tree (returns a new tree).

    decoder_only=True quantizes ONLY the decoder projections ("int8-decoder"
    mode). Rationale, measured on the v5e: weight-only int8 pays off where a
    program is weight-bandwidth-bound — the autoregressive DECODE (202 ->
    306 tok/s single-stream). The ENCODER prefill is MXU-compute-bound, and
    the on-the-fly dequant makes int8 prefill strictly slower, which is why
    full int8 improves interim latency but REGRESSES committed/file latency
    whenever prefill waves dominate (BENCH_r02 stream_committed 1669 ->
    1723 ms; SCALE_BENCH stream100 committed 2001 -> 2469 ms). The mixed
    mode keeps bf16 prefill speed with int8 decode bandwidth. (The
    reference's bitsandbytes path quantizes every linear, asr.py:174-208 —
    `int8` mode keeps that parity.)"""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k in _QUANT_KEYS and isinstance(v, jnp.ndarray):
                    out[k] = quantize_tensor(v)
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    if decoder_only:
        out = dict(params)
        out["decoder"] = walk(params["decoder"])
        return out
    return walk(params)
