"""On-chip A/B of int8 decode-projection strategies.

Times the full per-step decoder projection sweep (the int8 decode roofline
term): a lax.scan over the nano decoder's 28 stacked layers running the four
quantized projections (qkv, o, gate_up, down) exactly as decode_step composes
them, at single-position batch sizes. Reports ms/step and the effective HBM
read bandwidth against the 1.24 GB int8 weight stream, for

  - bf16                : unquantized weights (the r3 87 %-of-roofline baseline)
  - int8_xla            : ops/quant.matmul W8A16 path (convert fused into the dot)
  - int8_w8a8           : dynamic per-row activation int8 + native s8 MXU dot
                          (no weight upcast on the load path at all)
  - int8_pallas         : ops/int8_pallas fused dequant-matmul (naive, XLA
                          slices the layer before the kernel)
  - int8_pallas_stacked : scalar-prefetch form (kernel owns the layer slice)

Select variants by name on argv (default: bf16 int8_xla int8_w8a8 — the
pallas forms measured 273-303 GB/s, below even W8A16, killed by per-call
overhead + strided [K, n_blk] block DMA at nano scale; kept runnable for
re-benchmarking on new toolchains). Results MERGE into the existing
artifact, so partial runs keep the other variants' recorded numbers.

Artifact: INT8_MATMUL_BENCH.json. Run on the real chip (no platform
override); CPU runs are meaningless for this question.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sonicscribe_tpu.models.config import nano
from sonicscribe_tpu.ops import quant
from sonicscribe_tpu.ops.int8_pallas import int8_matmul, int8_matmul_stacked

REPS = 30
DEFAULT_VARIANTS = ("bf16", "int8_xla", "int8_w8a8")


def _layer_weights(cfg, key, dtype=jnp.bfloat16):
    dec = cfg.decoder
    L, d = dec.n_layers, dec.d_model
    qkv_out = (dec.n_heads + 2 * dec.n_kv_heads) * dec.head_dim
    ks = jax.random.split(key, 4)
    s = 0.02
    return {
        "qkv_w": jax.random.normal(ks[0], (L, d, qkv_out), dtype) * s,
        "o_w": jax.random.normal(
            ks[1], (L, dec.n_heads * dec.head_dim, d), dtype) * s,
        "gate_up_w": jax.random.normal(
            ks[2], (L, d, 2 * dec.ffn_hidden), dtype) * s,
        "down_w": jax.random.normal(ks[3], (L, dec.ffn_hidden, d), dtype) * s,
    }


def _sweep(mm):
    """One decode step's projection chain over all layers, composed like
    decode_step (each output feeds the next so nothing is dead code)."""

    def body(h, lp):
        qkv = mm(h, lp["qkv_w"])
        h = h + 0.01 * mm(qkv[:, : h.shape[1]], lp["o_w"])
        gu = mm(h, lp["gate_up_w"])
        gate, up = jnp.split(gu, 2, axis=-1)
        h = h + 0.01 * mm(jax.nn.silu(gate) * up, lp["down_w"])
        return h, None

    def step(weights, h):
        h, _ = jax.lax.scan(body, h, weights)
        return h

    return jax.jit(step)


def _sweep_stacked(n_layers):
    """Same chain, but the pallas kernel receives the FULL stacked weights
    and the layer index by scalar prefetch (no pre-kernel slice copy).
    Weights MUST flow in as the jit argument: closing over the concrete
    1.24 GB stack embeds it as an HLO literal that the remote compile
    service chokes on (the axon-tunnel closure-capture hang)."""

    def mm(x, t, l):
        return int8_matmul_stacked(x, t["q"], t["scale"], l)

    def step(weights, h):
        def body(h, l):
            qkv = mm(h, weights["qkv_w"], l)
            h = h + 0.01 * mm(qkv[:, : h.shape[1]], weights["o_w"], l)
            gu = mm(h, weights["gate_up_w"], l)
            gate, up = jnp.split(gu, 2, axis=-1)
            h = h + 0.01 * mm(jax.nn.silu(gate) * up, weights["down_w"], l)
            return h, None

        h, _ = jax.lax.scan(body, h, jnp.arange(n_layers))
        return h

    return jax.jit(step)


def _time_step(step, weights, h0):
    out = step(weights, h0)
    np.asarray(out).ravel()[:1]  # real sync over the axon tunnel
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = step(weights, out)
    np.asarray(out).ravel()[:1]
    return (time.perf_counter() - t0) / REPS * 1000


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.sonicscribe_jax_cache"),
        ),
    )
    cfg = nano()
    dec = cfg.decoder
    qkv_out = (dec.n_heads + 2 * dec.n_kv_heads) * dec.head_dim
    int8_bytes = dec.n_layers * (
        dec.d_model * qkv_out
        + dec.n_heads * dec.head_dim * dec.d_model
        + dec.d_model * 2 * dec.ffn_hidden
        + dec.ffn_hidden * dec.d_model
    )
    key = jax.random.PRNGKey(0)
    w_bf16 = _layer_weights(cfg, key)
    w_q = jax.tree.map(
        quant.quantize_tensor, w_bf16, is_leaf=lambda x: hasattr(x, "shape")
    )
    jax.block_until_ready(jax.tree.leaves(w_q))

    def mm_pallas(x, w):
        return int8_matmul(x, w["q"], w["scale"][0])

    variants = {
        "bf16": lambda: (w_bf16, _sweep(quant.matmul)),
        "int8_xla": lambda: (w_q, _sweep(quant.matmul)),
        "int8_w8a8": lambda: (w_q, _sweep(quant.matmul_w8a8)),
        "int8_pallas": lambda: (w_q, _sweep(mm_pallas)),
        "int8_pallas_stacked": lambda: (
            w_q, _sweep_stacked(w_q["qkv_w"]["q"].shape[0])
        ),
    }
    chosen = [a for a in sys.argv[1:] if a in variants] or list(DEFAULT_VARIANTS)

    results = {}
    for B in (8, 16, 64):
        h0 = jax.random.normal(jax.random.PRNGKey(B), (B, dec.d_model),
                               jnp.bfloat16) * 0.1
        row = {}
        for name in chosen:
            weights, sweep = variants[name]()
            ms = _time_step(sweep, weights, h0)
            stream = int8_bytes * (2 if name == "bf16" else 1)
            row[name] = {
                "ms_per_step": round(ms, 3),
                "eff_gb_s": round(stream / (ms / 1000) / 1e9, 1),
            }
            print(f"B={B:3d} {name:12s} {ms:7.3f} ms/step  "
                  f"{row[name]['eff_gb_s']:6.1f} GB/s eff", flush=True)
        results[f"B{B}"] = row

    # merge per-variant into any existing artifact so partial runs keep the
    # other variants' recorded numbers
    out_path = "INT8_MATMUL_BENCH.json"
    art = {}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                art = json.load(f)
        except (OSError, json.JSONDecodeError):
            art = {}
    art.update(
        {
            "what": "per-decode-step decoder projection sweep (28 layers x "
                    "qkv/o/gate_up/down), nano scale; eff_gb_s = weight bytes "
                    "streamed / time",
            "int8_weight_gb": round(int8_bytes / 1e9, 3),
            "backend": jax.default_backend(),
            "reps": REPS,
        }
    )
    for bkey, row in results.items():
        art.setdefault(bkey, {}).update(row)
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
    print("wrote INT8_MATMUL_BENCH.json")


if __name__ == "__main__":
    main()
