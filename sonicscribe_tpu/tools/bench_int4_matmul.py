"""On-chip A/B of int4 decode-projection strategies vs the int8/bf16 record.

HBM_BENCH + INT8_MATMUL_BENCH (r4) bound the int8 story: the W8A16 dot at
~400 GB/s already runs at ~91-93 % of the best pure-read rate measured for
int8 data on this chip, so the remaining decode lever is BYTES, not rate —
int4 weights halve the stream again (~0.62 GB/step at nano). This probe
measures whether an int4 weight stream actually converts into wall-clock
before we commit to an int4 serving mode. Variants over the same
28-layer × (qkv, o, gate_up, down) scan sweep as bench_int8_matmul:

  - int8_xla    : the recorded W8A16 baseline (ops/quant.matmul)
  - int4_packed : two nibbles per uint8 byte (K/2 × N storage), unpacked
                  with shift/mask → s8 → bf16 inside the scan body; XLA
                  fuses the unpack into the dot's operand load or it dies
  - int4_native : weights stored as jnp.int4 (XLA's packed 4-bit dtype),
                  upcast to bf16 at the dot
  - int4_w4a8   : jnp.int4 weights upcast to s8, native s8 MXU dot against
                  dynamically-quantized s8 activations

Per-channel scales only (a perf probe — the serving mode would use
group-wise scales for quality; the scale multiply is output-sized noise
either way). eff_gb_s is computed against each variant's OWN weight-stream
bytes. Artifact: INT4_MATMUL_BENCH.json (merges like bench_int8_matmul).
Run on the real chip; CPU runs are meaningless for this question.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sonicscribe_tpu.models import nano
from sonicscribe_tpu.ops import quant

REPS = 30
DEFAULT_VARIANTS = ("int8_xla", "int4_pallas", "int4_pallas_w4a8")


def _layer_shapes(dec):
    qkv_out = (dec.n_heads + 2 * dec.n_kv_heads) * dec.head_dim
    return {
        "qkv_w": (dec.n_layers, dec.d_model, qkv_out),
        "o_w": (dec.n_layers, dec.n_heads * dec.head_dim, dec.d_model),
        "gate_up_w": (dec.n_layers, dec.d_model, 2 * dec.ffn_hidden),
        "down_w": (dec.n_layers, dec.ffn_hidden, dec.d_model),
    }


def _make_int4(shapes, key):
    """Per-tensor: int4 codes [-7, 7] + per-channel scale, three storages:
    packed uint8 (two codes per byte along K), native jnp.int4, and the
    reference bf16 dequant for the int8 baseline comparison."""
    out = {}
    for i, (name, shp) in enumerate(shapes.items()):
        k = jax.random.fold_in(key, i)
        codes = jax.random.randint(k, shp, -7, 8, jnp.int8)
        scale = (
            0.02 / 7.0
            * jnp.ones((shp[0], 1, shp[2]), jnp.float32).astype(jnp.bfloat16)
        )
        L, K, N = shp
        lo = codes[:, 0::2, :]  # even K rows -> low nibble
        hi = codes[:, 1::2, :]
        packed = (
            (lo.astype(jnp.uint8) & 0xF) | ((hi.astype(jnp.uint8) & 0xF) << 4)
        )
        out[name] = {
            "codes": codes,
            "packed": packed,  # [L, K//2, N]
            "i4": codes.astype(jnp.int4),
            "scale": scale,
        }
    return out


def _unpack(packed):
    """[.., K//2, N] uint8 -> [.., K, N] int8 codes (sign-extended)."""
    lo = (packed & 0xF).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)
    # sign-extend nibbles: values >= 8 are negative
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    K2, N = packed.shape[-2], packed.shape[-1]
    inter = jnp.stack([lo, hi], axis=-2)  # [.., K//2, 2, N]
    return inter.reshape(*packed.shape[:-2], K2 * 2, N)


def _mm_packed(x, t):
    w = _unpack(t["packed"]).astype(x.dtype)
    return (x @ w) * t["scale"][0].astype(x.dtype)


def _mm_native(x, t):
    return (x @ t["i4"].astype(x.dtype)) * t["scale"][0].astype(x.dtype)


def _mm_w4a8(x, t):
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    out = jax.lax.dot_general(
        xq, t["i4"].astype(jnp.int8),
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (
        out.astype(jnp.float32) * sx * t["scale"][0].astype(jnp.float32)
    ).astype(x.dtype)


def _mm_int8(x, t):
    return quant.matmul(x, t)


def _sweep(mm, field):
    def body(h, lp):
        def g(name):
            t = lp[name]
            return {k: t[k] for k in (field, "scale")} if field else t

        qkv = mm(h, g("qkv_w"))
        h = h + 0.01 * mm(qkv[:, : h.shape[1]], g("o_w"))
        gu = mm(h, g("gate_up_w"))
        gate, up = jnp.split(gu, 2, axis=-1)
        h = h + 0.01 * mm(jax.nn.silu(gate) * up, g("down_w"))
        return h, None

    def step(weights, h):
        h, _ = jax.lax.scan(body, h, weights)
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
    shapes = _layer_shapes(dec)
    n_el = sum(np.prod(s) for s in shapes.values())
    w4 = _make_int4(shapes, jax.random.PRNGKey(0))

    # the int8 baseline reuses the same codes through quantize layout
    w8 = {
        name: {
            "q": t["codes"],
            "scale": t["scale"].astype(jnp.float32),
        }
        for name, t in w4.items()
    }

    # halved-K packing for the Pallas kernels (ops/int4_pallas): low nibble
    # = row k, high nibble = row k + K/2 — the unpack is 3 arithmetic shifts
    from sonicscribe_tpu.ops.int4_pallas import (
        int4_matmul_stacked,
        int4_matmul_w4a8_stacked,
        pack_int4,
    )

    wp = {
        name: {
            "p": pack_int4(t["codes"]),
            "scale": t["scale"].astype(jnp.float32),
        }
        for name, t in w4.items()
    }
    n_layers = next(iter(shapes.values()))[0]

    def _sweep_pallas(mm_stacked):
        """Stacked scalar-prefetch chain; weights flow in as the jit
        argument (closing over the concrete GB-scale stack embeds it as an
        HLO literal the remote compile service chokes on)."""

        def step(weights, h):
            def body(h, l):
                def mm(x, t):
                    return mm_stacked(x, t["p"], t["scale"], l)

                qkv = mm(h, weights["qkv_w"])
                h = h + 0.01 * mm(qkv[:, : h.shape[1]], weights["o_w"])
                gu = mm(h, weights["gate_up_w"])
                gate, up = jnp.split(gu, 2, axis=-1)
                h = h + 0.01 * mm(jax.nn.silu(gate) * up, weights["down_w"])
                return h, None

            h, _ = jax.lax.scan(body, h, jnp.arange(n_layers))
            return h

        return jax.jit(step)

    variants = {
        "int8_xla": (w8, _sweep(_mm_int8, None), int(n_el)),
        "int4_packed": (w4, _sweep(_mm_packed, "packed"), int(n_el) // 2),
        "int4_native": (w4, _sweep(_mm_native, "i4"), int(n_el) // 2),
        "int4_w4a8": (w4, _sweep(_mm_w4a8, "i4"), int(n_el) // 2),
        "int4_pallas": (
            wp, _sweep_pallas(int4_matmul_stacked), int(n_el) // 2,
        ),
        "int4_pallas_w4a8": (
            wp, _sweep_pallas(int4_matmul_w4a8_stacked), int(n_el) // 2,
        ),
    }
    chosen = [a for a in sys.argv[1:] if a in variants] or list(DEFAULT_VARIANTS)

    results = {}
    for B in (8, 16, 64):
        h0 = jax.random.normal(jax.random.PRNGKey(B), (B, dec.d_model),
                               jnp.bfloat16) * 0.1
        row = {}
        for name in chosen:
            weights, sweep, stream_bytes = variants[name]
            try:
                ms = _time_step(sweep, weights, h0)
            except Exception as e:  # an unsupported dtype path should not
                row[name] = {"error": str(e)[:160]}  # kill the other variants
                print(f"B={B:3d} {name:12s} ERROR {str(e)[:120]}", flush=True)
                continue
            row[name] = {
                "ms_per_step": round(ms, 3),
                "eff_gb_s": round(stream_bytes / (ms / 1000) / 1e9, 1),
            }
            print(f"B={B:3d} {name:12s} {ms:7.3f} ms/step  "
                  f"{row[name]['eff_gb_s']:6.1f} GB/s eff", flush=True)
        results[f"B{B}"] = row

    out_path = "INT4_MATMUL_BENCH.json"
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
                    "qkv/o/gate_up/down), nano scale; eff_gb_s = each "
                    "variant's OWN weight bytes / time (int4 streams half "
                    "of int8's)",
            "int8_weight_gb": round(int(n_el) / 1e9, 3),
            "backend": jax.default_backend(),
            "reps": REPS,
        }
    )
    for bkey, row in results.items():
        art.setdefault(bkey, {}).update(row)
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
    print("wrote INT4_MATMUL_BENCH.json")


if __name__ == "__main__":
    main()
