"""Microbench: XLA decode attention vs the Pallas flash-decode kernel.

Runs the engine's real _decode_k_program at nano scale on the current backend
for both attention paths across cache occupancies, and prints a JSON line.
Decode is HBM-bandwidth-bound; flash reads only ceil((len+1)/128) KV blocks
per slot instead of the whole padded cache, so the win scales with
(MAX_LEN / occupancy).

Usage: python -m sonicscribe_tpu.tools.bench_flash [--slots 50] [--k 16]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_decode(engine, k: int, occupancy: int, iters: int = 8) -> float:
    """Seconds per decode step (amortized over k-step programs), on the
    engine's LONG pool."""
    pool = engine.long
    # occupy every slot at `occupancy` cache positions, never finishing
    rows = int(pool.cache_len.shape[0])
    pool.cache_len = jnp.full((rows,), occupancy, jnp.int32)
    pool.done = jnp.zeros((rows,), bool)
    pool.budgets = jnp.full((rows,), 10**9, jnp.int32)
    pool.last_tok = jnp.full((rows,), 7, jnp.int32)
    pool.n_emitted = jnp.zeros((rows,), jnp.int32)

    engine._dispatch_decode(pool, k)  # compile
    np.asarray(pool.cache_len)  # drain the remote queue (transfers sync)

    pool.cache_len = jnp.full((rows,), occupancy, jnp.int32)
    t0 = time.perf_counter()
    for _ in range(iters):
        engine._dispatch_decode(pool, k)
        pool.cache_len = jnp.full((rows,), occupancy, jnp.int32)
    np.asarray(pool.cache_len)  # real transfer = real sync on axon
    dt = time.perf_counter() - t0
    return dt / (iters * k)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=50)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--model", default="nano")
    args = ap.parse_args()

    import os

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
    )

    from sonicscribe_tpu.engine.batcher import BatchedEngine
    from sonicscribe_tpu.engine.transcriber import Transcriber
    from sonicscribe_tpu.models import nano, tiny
    from sonicscribe_tpu.models.glm_asr import init_params
    from sonicscribe_tpu.models.tokenizer import ByteTokenizer
    from sonicscribe_tpu.vad.model import EnergyVad

    mcfg = nano() if args.model == "nano" else tiny()
    dtype = jnp.bfloat16 if args.model == "nano" else jnp.float32
    params = init_params(mcfg, jax.random.PRNGKey(0), dtype=dtype)
    tr = Transcriber(mcfg, params, ByteTokenizer(mcfg), prefill_buckets=(128, 3072))

    out = {"slots": args.slots, "k": args.k, "backend": jax.default_backend()}
    engines = {}
    for mode in ("off", "on"):
        engines[mode] = BatchedEngine(
            tr, EnergyVad(), slots=args.slots, max_decode_tokens=256,
            flash_decode=mode,
        )
    max_len = int(engines["on"].MAX_LEN)
    out["max_len"] = max_len
    for occ in (64, 256, max_len - 8):
        for mode in ("off", "on"):
            s = bench_decode(engines[mode], args.k, occ)
            out[f"occ{occ}_{mode}_ms_per_step"] = round(s * 1e3, 3)
            out[f"occ{occ}_{mode}_tok_per_s"] = round(args.slots / s, 1)
        off = out[f"occ{occ}_off_ms_per_step"]
        on = out[f"occ{occ}_on_ms_per_step"]
        out[f"occ{occ}_speedup"] = round(off / on, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
