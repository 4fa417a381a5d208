"""A/B: occupied-prefix (`rows`) decode programs vs full-pool decode.

Motivation: the long (finals/file) pool decodes ALL slot rows every step,
but finals arrive staggered — typically 4-12 of 32 slots are active — and
the per-step KV read scales with rows x max_len (nano long pool at B=32 x
2560: ~4.7 GB vs ~3.4 GB of weights; reference decode loop:
backend/asr.py:407-422 pays neither cost because it serializes requests).
`_decode_k_program(rows=R)` computes only the occupied prefix. This bench
measures the per-program time of k=8 steps at rows in {4, 8, 16, full} on
the long pool's shapes, plus token parity vs the full program.

Run on the real chip:  python -m sonicscribe_tpu.tools.bench_rows
Writes ROWS_DECODE_BENCH.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                ".jax_cache",
            ),
        ),
    )

    from sonicscribe_tpu.engine.batcher import _decode_k_program
    from sonicscribe_tpu.models import nano, tiny
    from sonicscribe_tpu.models.glm_asr import init_params

    quick = "--quick" in sys.argv
    cfg = tiny() if quick else nano()
    dtype = jnp.float32 if quick else jnp.bfloat16
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    dec = cfg.decoder

    # long-pool serving shapes (bench_commit engine: slots=32 + trash row)
    S = 5 if quick else 33
    MAX_LEN = 256 if quick else 2560
    MAX_NEW = 32 if quick else 200
    K = 8

    kv_shape = (dec.n_layers, S, MAX_LEN, dec.n_kv_heads, dec.head_dim)

    @jax.jit
    def _make_kv(key):
        # device-side PRNG: the KV pool is ~2.4 GB at nano shapes — host
        # generation + tunnel upload would dominate the bench
        ka, kb = jax.random.split(key)
        ck = jax.random.normal(ka, kv_shape, dtype) * 0.02
        cv = jax.random.normal(kb, kv_shape, dtype) * 0.02
        return ck, cv

    def fresh_state(seed: int):
        rng = np.random.default_rng(seed)
        ck, cv = _make_kv(jax.random.PRNGKey(seed))
        cl = jnp.asarray(rng.integers(100, MAX_LEN - MAX_NEW - 1, (S,)), jnp.int32)
        tok = jnp.asarray(rng.integers(5, dec.vocab_size - 1, (S,)), jnp.int32)
        out = jnp.zeros((S, MAX_NEW), jnp.int32)
        n = jnp.ones((S,), jnp.int32)
        dn = jnp.zeros((S,), bool)
        bias = jnp.zeros((S, dec.vocab_size), jnp.float32)
        bud = jnp.full((S,), MAX_NEW, jnp.int32)
        return ck, cv, cl, tok, out, n, dn, bias, bud

    rows_choices = [2, 4, None] if quick else [4, 8, 16, None]
    n_iters = 2 if quick else 6
    results = {}
    golden = None
    for rows in rows_choices:
        # parity: active rows live only in [0:min_rows) so every variant
        # computes them; excluded rows must come back untouched. HBM is
        # tight (params 3.4 GB + KV 4.8 GB on a 16 GB chip), so each timed
        # call CHAINS the previous call's donated state — one generation of
        # KV lives at a time.
        ck, cv, cl, tok, out, n, dn, bias, bud = fresh_state(0)
        min_rows = rows_choices[0]
        dn = dn.at[min_rows:].set(True)  # only the prefix is active
        r = _decode_k_program(
            params, cfg, ck, cv, cl, tok, out, n, dn, bias, bud, K, rows=rows
        )
        toks = np.asarray(r[4][:min_rows])
        status = np.asarray(r[7])
        if golden is None:
            golden = (toks, status[:min_rows])
        else:
            np.testing.assert_array_equal(toks, golden[0])
            np.testing.assert_array_equal(status[:min_rows], golden[1])
        del r, ck, cv, cl, tok, out, n, dn

        # timing: all rows < R active (the realistic occupancy for that R)
        ck, cv, cl, tok, out, n, dn, bias, bud = fresh_state(1)
        if rows is not None:
            dn = dn.at[rows:].set(True)
        timings = []
        for i in range(n_iters + 1):  # first call warms; budgets (200)
            # exceed (n_iters+1)*K steps so no row finishes mid-bench
            t0 = time.perf_counter()
            r = _decode_k_program(
                params, cfg, ck, cv, cl, tok, out, n, dn, bias, bud, K,
                rows=rows,
            )
            # transfers synchronize on the axon tunnel; status is the same
            # tiny fetch the scheduler does
            _ = np.asarray(r[7])
            if i:
                timings.append((time.perf_counter() - t0) * 1e3)
            ck, cv, cl, tok, out, n, dn = r[:7]
        del r, ck, cv, cl, tok, out, n, dn
        label = "full" if rows is None else str(rows)
        results[label] = {
            "k8_program_ms_min": round(min(timings), 1),
            "k8_program_ms_med": round(float(np.median(timings)), 1),
            "parity": "ok",
        }
        print(label, results[label])

    out = {
        "bench": "rows_decode",
        "model": "tiny" if quick else "nano",
        "pool_rows": S,
        "max_len": MAX_LEN,
        "k": K,
        "backend": jax.default_backend(),
        "results": results,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "ROWS_DECODE_BENCH.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
