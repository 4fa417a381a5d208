"""Component microbench: where does the decode step's time go?

The full 50-slot nano decode step measures ~12 ms vs a ~7.3 ms HBM roofline
(weights 3.39 GB + KV r/w, DECODE_STEP_BENCH.json). This isolates the parts:

- `mlp_chain`: the layer scan running ONLY the weight-bound matmuls
  (qkv, o, gate_up, down) — measures pure weight-stream efficiency.
- `attn_chain`: the layer scan running ONLY attention against the KV cache
  (scores, mask, softmax, context) — measures cache-read + VPU efficiency.
- `lm_head`: final norm + vocab projection + argmax.
- `full`: the real decode_step, for reference.

Writes DECODE_PARTS_BENCH.json. Run: python -m sonicscribe_tpu.tools.bench_decode_parts
"""

from __future__ import annotations

import json
import math
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

SLOTS = 50
MAX_LEN = 896
K = 16
REPS = 8


def main():
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.join(repo, ".jax_cache")),
    )
    from sonicscribe_tpu.models import nano
    from sonicscribe_tpu.models.glm_asr import (
        NEG_INF,
        _lm_logits,
        _rms_norm,
        decode_step,
        init_cache,
        init_params,
    )
    from sonicscribe_tpu.ops.quant import matmul

    cfg = nano()
    dec = cfg.decoder
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)

    def timeit(fn, *args):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # real sync (axon)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        return (time.perf_counter() - t0) / (REPS * K) * 1000  # ms/step

    results = {"backend": jax.default_backend(), "slots": SLOTS,
               "max_len": MAX_LEN, "k_steps": K}

    # ---- mlp_chain: weight-bound matmuls only ----
    @jax.jit
    def mlp_chain(p, h):
        def one(h, _):
            def body(h, lp):
                hn = _rms_norm(h, lp["ln1_scale"], dec.rms_eps)
                qkv = matmul(hn, lp["qkv_w"])
                # fold qkv back to D via o_w's shape (nh*hd == its in-dim)
                h = h + matmul(qkv[..., : dec.n_heads * dec.head_dim], lp["o_w"])
                hn = _rms_norm(h, lp["ln2_scale"], dec.rms_eps)
                gate, up = jnp.split(matmul(hn, lp["gate_up_w"]), 2, axis=-1)
                h = h + matmul(jax.nn.silu(gate) * up, lp["down_w"])
                return h, None

            h, _ = jax.lax.scan(body, h, p["decoder"]["layers"])
            return h, None

        h, _ = jax.lax.scan(one, h, None, length=K)
        return h

    h0 = jnp.asarray(rng.standard_normal((SLOTS, dec.d_model)), jnp.bfloat16)
    results["mlp_chain_ms_per_step"] = round(timeit(mlp_chain, params, h0), 3)

    # ---- attn_chain: attention against the cache only ----
    cache = init_cache(cfg, SLOTS, MAX_LEN, dtype=jnp.bfloat16)
    k_cache, v_cache = cache["k"], cache["v"]
    lens = jnp.asarray(rng.integers(MAX_LEN // 2, MAX_LEN - 1, SLOTS), jnp.int32)
    nkv, g, hd = dec.n_kv_heads, dec.n_heads // dec.n_kv_heads, dec.head_dim
    kpos = jax.lax.broadcasted_iota(jnp.int32, (SLOTS, MAX_LEN), 1)
    scale = 1.0 / math.sqrt(hd)

    @jax.jit
    def attn_chain(kc, vc, q0):
        valid = kpos <= lens[:, None]

        def one(q, _):
            def body(q, kv):
                kl, vl = kv
                qg = q.reshape(SLOTS, nkv, g, hd)
                scores = jnp.einsum(
                    "bkgd,bskd->bkgs", qg, kl, preferred_element_type=jnp.float32
                ) * scale
                scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
                attn = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
                ctx = jnp.einsum("bkgs,bskd->bkgd", attn, vl)
                return ctx.reshape(SLOTS, dec.n_heads * hd), None

            q, _ = jax.lax.scan(body, q, (kc, vc))
            return q, None

        q, _ = jax.lax.scan(one, q0, None, length=K)
        return q

    q0 = jnp.asarray(
        rng.standard_normal((SLOTS, dec.n_heads * hd)), jnp.bfloat16
    )
    results["attn_chain_ms_per_step"] = round(timeit(attn_chain, k_cache, v_cache, q0), 3)

    # ---- lm_head ----
    @jax.jit
    def lm_head_chain(p, h):
        def one(h, _):
            logits = _lm_logits(p, cfg, h)
            tok = jnp.argmax(logits, -1)
            return h + p["decoder"]["embed"][tok], None

        h, _ = jax.lax.scan(one, h, None, length=K)
        return h

    results["lm_head_ms_per_step"] = round(timeit(lm_head_chain, params, h0), 3)

    # ---- full decode_step (donated cache chained across calls) ----
    @partial(jax.jit, donate_argnums=(1,))
    def full(p, cache, toks):
        def one(carry, _):
            cache, toks = carry
            cache, logits = decode_step(p, cfg, cache, toks)
            return (cache, jnp.argmax(logits, -1).astype(jnp.int32)), None

        (cache, toks), _ = jax.lax.scan(one, (cache, toks), None, length=K)
        return cache, toks

    cache = init_cache(cfg, SLOTS, MAX_LEN, dtype=jnp.bfloat16)
    cache["len"] = jnp.asarray(
        rng.integers(MAX_LEN // 2, MAX_LEN - K - 1, SLOTS), jnp.int32
    )
    toks = jnp.asarray(rng.integers(0, dec.vocab_size, SLOTS), jnp.int32)
    cache, toks = full(params, cache, toks)  # compile
    np.asarray(toks).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(REPS):
        cache["len"] = cache["len"] - K  # hold occupancy steady
        cache, toks = full(params, cache, toks)
    np.asarray(toks).ravel()[:1]
    results["full_ms_per_step"] = round(
        (time.perf_counter() - t0) / (REPS * K) * 1000, 3
    )

    # rooflines at 819 GB/s (v5e)
    wbytes = 1.69e9 * 2
    kvbytes = 28 * SLOTS * MAX_LEN * nkv * hd * 2 * 2
    results["roofline_weights_ms"] = round(wbytes / 819e9 * 1000, 2)
    results["roofline_kv_read_ms"] = round(kvbytes / 819e9 * 1000, 2)

    with open(os.path.join(repo, "DECODE_PARTS_BENCH.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
