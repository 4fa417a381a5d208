"""A/B microbench: decode_step KV-write placement (read-only-scan vs in-scan).

Decode is HBM-bandwidth-bound (reference decode loop: backend/asr.py:407-422).
The in-scan form (models/glm_asr.py:decode_step default, kv_write_in_scan=
True — this bench measured it ~5% faster: XLA aliases the scan buffers, so
the feared full-cache rewrite does not happen) scatters the current token
into the cache inside the layer scan and re-emits the whole cache as scan
ys. The read-only alternative emits only the new rows and scatters once
after the scan; it is kept behind the knob for re-benchmarking.

Run on the real chip:  python -m sonicscribe_tpu.tools.bench_decode
Writes DECODE_STEP_BENCH.json at the repo root.

Shapes mirror the serving bench (bench.py): nano model, the stream engine's
short pool (50 slots x 896) and the file engine's long pool (8 slots x 2560).
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _bench_config(slots: int, max_len: int, label: str, params, cfg, results):
    from sonicscribe_tpu.models.glm_asr import decode_step, init_cache

    @partial(jax.jit, static_argnames=("in_scan", "unroll"), donate_argnums=(1,))
    def k_steps(p, cache, tokens, in_scan, unroll):
        def step(carry, _):
            cache, tok = carry
            cache, logits = decode_step(
                p, cfg, cache, tok, kv_write_in_scan=in_scan, unroll=unroll
            )
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return (cache, nxt), None

        (cache, tok), _ = jax.lax.scan(step, (cache, tokens), None, length=K)
        return cache, tok

    K = 16
    rng = np.random.default_rng(0)
    for variant, in_scan, unroll in (
        ("readonly", False, 1),
        ("inscan", True, 1),
        ("inscan_unroll4", True, 4),
    ):
        cache = init_cache(cfg, slots, max_len, dtype=jnp.bfloat16)
        # mid occupancy: realistic interim/final mix
        cache["len"] = jnp.asarray(
            rng.integers(max_len // 4, max_len - K - 1, slots), jnp.int32
        )
        tokens = jnp.asarray(rng.integers(0, cfg.decoder.vocab_size, slots), jnp.int32)
        cache, tok = k_steps(params, cache, tokens, in_scan, unroll)  # compile
        np.asarray(tok)  # REAL sync: under the axon tunnel block_until_ready
        # returns at dispatch, so only a host fetch proves execution finished
        REPS = 10
        t0 = time.perf_counter()
        for _ in range(REPS):
            cache["len"] = cache["len"] - K  # keep occupancy in range
            cache, tok = k_steps(params, cache, tokens, in_scan, unroll)
        np.asarray(tok)  # one fetch syncs the whole donated chain
        ms_per_step = (time.perf_counter() - t0) / (REPS * K) * 1000
        results[f"{label}_{variant}_ms_per_step"] = round(ms_per_step, 3)
        results[f"{label}_{variant}_tok_per_s"] = round(
            slots / (ms_per_step / 1000), 1
        )
        del cache


def main():
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
    from sonicscribe_tpu.models import nano
    from sonicscribe_tpu.models.glm_asr import init_params

    cfg = nano()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    results = {"backend": jax.default_backend(), "k_steps": 16}
    _bench_config(50, 896, "pool50x896", params, cfg, results)
    _bench_config(8, 2560, "pool8x2560", params, cfg, results)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "DECODE_STEP_BENCH.json",
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
