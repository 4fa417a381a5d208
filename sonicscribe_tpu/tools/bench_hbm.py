"""Raw HBM read-bandwidth roofline probe, per dtype.

Establishes the REAL read ceiling the decode weight stream can hit for
each storage dtype — VERDICT r3 #3 asks either for int8 decode at >=75 %
of "its bandwidth bound" or for proof of where the bound actually is.
The published ~819 GB/s HBM figure is a bf16/f32-tile number; 8-bit
arrays pack into (32, 128) memory tiles and may read at a different
sustained rate, so dividing int8 wall time by the bf16 ceiling
understates int8 efficiency. This probe measures a pure streaming
reduction (read-only, no MXU) over a weight-stream-sized array:

    step(h) = h + sum(x)     dispatched REPS times, chained scalar carry

for bf16, f32, int8 (flat and weight-shaped [K, N] forms). eff_gb_s =
bytes / time. The matmul benches (INT8_MATMUL_BENCH.json) should be read
against THESE per-dtype ceilings, not the bf16 one.

Run on the real chip: python -m sonicscribe_tpu.tools.bench_hbm
Writes HBM_BENCH.json at the repo root.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 20
GB = 1 << 30


@jax.jit
def _step(h, x):
    # h is a scalar carry so the python loop's dispatches serialize; every
    # execution re-reads x from HBM (nothing is cached across executions).
    # x MUST be an argument, not a closure capture — jax embeds closed-over
    # concrete arrays as HLO constants, which would ship the whole 1.25 GB
    # literal to the (remote) compile service
    return h + jnp.sum(x, dtype=jnp.float32 if x.dtype != jnp.int8
                       else jnp.int32).astype(jnp.float32)


def _probe(x, reps=REPS):
    """Sustained read bandwidth of summing x, chained through a carry."""
    h = _step(jnp.float32(0.0), x)
    np.asarray(h)  # real sync over the axon tunnel
    t0 = time.perf_counter()
    for _ in range(reps):
        h = _step(h, x)
    np.asarray(h)
    dt = (time.perf_counter() - t0) / reps
    return x.size * x.dtype.itemsize / dt / 1e9, dt * 1000


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.sonicscribe_jax_cache"),
        ),
    )
    n_bytes = int(1.25 * GB)  # ~ the nano int8 decoder weight stream
    key = jax.random.PRNGKey(0)

    results = {}
    # flat 1-D and a decoder-projection-like 2-D tiling for each dtype;
    # lazy thunks so only one ~1.25 GB array is live at a time
    for name, make in (
        ("bf16_flat",
         lambda: jax.random.normal(key, (n_bytes // 2,), jnp.bfloat16)),
        ("f32_flat",
         lambda: jax.random.normal(key, (n_bytes // 4,), jnp.float32)),
        ("int8_flat",
         lambda: jax.random.randint(key, (n_bytes,), -127, 127, jnp.int8)),
        ("bf16_2d",
         lambda: jax.random.normal(key, (4096, n_bytes // 2 // 4096),
                                   jnp.bfloat16)),
        ("int8_2d",
         lambda: jax.random.randint(key, (4096, n_bytes // 4096), -127, 127,
                                    jnp.int8)),
    ):
        arr = make()
        gbs, ms = _probe(arr)
        results[name] = {"eff_gb_s": round(gbs, 1), "ms": round(ms, 3),
                         "bytes": int(arr.size * arr.dtype.itemsize)}
        print(f"{name:10s} {gbs:7.1f} GB/s  {ms:8.3f} ms", flush=True)
        del arr

    art = {
        "what": "pure streaming-reduction read bandwidth per storage dtype "
                "(read-only sum over a ~1.25 GB array, chained dispatches); "
                "the per-dtype ceiling the decode weight stream can hit",
        "backend": jax.default_backend(),
        "reps": REPS,
        **results,
    }
    with open("HBM_BENCH.json", "w") as f:
        json.dump(art, f, indent=1)
    print("wrote HBM_BENCH.json")


if __name__ == "__main__":
    main()
