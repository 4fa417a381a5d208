"""Committed-output latency decomposition + A/B (VERDICT r2 item 2).

Speech-end -> committed_output is the second most user-visible latency in
the product (the reference's whole two-phase protocol exists for it,
reference: backend/connection_manager.py:169-245). Round 2 measured p50
1,669 ms at 50 streams without decomposing it. This bench:

1. decomposes the committed path with the engine's per-class latency
   samples (queue = speech-end enqueue -> prefill dispatch; run = prefill
   -> reap, which spans the decode ticks and the one-tick reap delay);
2. A/Bs the two candidate levers on the same warmed engine:
   - `idle_k`: long-pool decode k cap while the SHORT pool is idle
     (finals of synchronized speech/silence cycles decode during the
     silence phase, exactly when no interims compete) — r2 shipped a flat
     live cap of 8;
   - `group_prefill`: admit synchronized final waves through the B=4/8
     ring-prefill programs instead of one B=1 program per final.

Run on the real chip:  python -m sonicscribe_tpu.tools.bench_commit
Writes COMMIT_LATENCY_BENCH.json at the repo root.
"""

from __future__ import annotations

import asyncio
import json
import os
import sys
import time

import numpy as np


def _pct(xs, p):
    return round(float(np.percentile(xs, p)), 1) if len(xs) else None


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

    from sonicscribe_tpu.config import AppConfig
    from sonicscribe_tpu.engine.batcher import BatchedEngine
    from sonicscribe_tpu.engine.transcriber import Transcriber
    from sonicscribe_tpu.models import nano, tiny
    from sonicscribe_tpu.models.glm_asr import init_params
    from sonicscribe_tpu.models.tokenizer import ByteTokenizer
    from sonicscribe_tpu.tools.loadtest import run_load
    from sonicscribe_tpu.vad.model import SileroCostProbeVad

    quick = "--quick" in sys.argv
    cfg = tiny() if quick else nano()
    dtype = jnp.float32 if quick else jnp.bfloat16
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    tokenizer = ByteTokenizer(cfg)
    no_eos = np.zeros((cfg.decoder.vocab_size,), np.float32)
    no_eos[cfg.eos_id] = -1e9
    no_eos[cfg.pad_id] = -1e9  # worst case: every decode runs its budget

    tr = Transcriber(cfg, params, tokenizer, prefill_buckets=(128, 512))
    # production-shaped gate: full Silero forward cost, EnergyVad decisions
    engine = BatchedEngine(
        tr, SileroCostProbeVad(), slots=4 if quick else 32,
        max_decode_tokens=200, base_logit_bias=no_eos,
    )
    t0 = time.perf_counter()
    engine.warmup()
    warmup_s = round(time.perf_counter() - t0, 1)

    app_cfg = AppConfig()
    n_streams = 4 if quick else 50
    seconds = 6.0 if quick else 16.0
    smallest_cb = min(engine.chunk_buckets)
    full_ring_grid = set(engine.long.compiled_ring_prefill)

    def set_variant(idle_k: int, group_prefill: bool) -> None:
        engine.long_idle_k_cap = idle_k
        engine.long.compiled_ring_prefill = (
            set(full_ring_grid)
            if group_prefill
            else {t for t in full_ring_grid if t[2] == 1 or t[0] == smallest_cb}
        )

    def take_decomposition() -> dict:
        out = {}
        for cls in ("short", "long"):
            lat = engine.stats.pop(cls + "_lat_ms", None)
            if lat and lat["queue"]:
                out[cls] = {
                    "n": len(lat["queue"]),
                    "queue_p50_ms": _pct(lat["queue"], 50),
                    "queue_p95_ms": _pct(lat["queue"], 95),
                    "run_p50_ms": _pct(lat["run"], 50),
                    "run_p95_ms": _pct(lat["run"], 95),
                    "tokens_p50": _pct(lat["tokens"], 50),
                }
        return out

    loop = asyncio.new_event_loop()
    results = []
    # round 2 of the A/B (after the pending-k exception landed: a long-only
    # backlog with the short pool idle no longer clips k to pending_k_cap —
    # gate probes during the silence phase tolerate a k-program delay)
    variants = [
        ("baseline_r2", 8, False),  # r2 shipped: flat k cap 8, B=1 prefills
        ("combined_k16", 16, True),
        ("combined_k32", 32, True),
        ("combined_k64", 64, True),
    ]
    for name, idle_k, group in variants:
        set_variant(idle_k, group)
        # settle pass absorbs scheduling warm-in and compile stragglers
        loop.run_until_complete(
            run_load(engine, app_cfg, n_streams, max(4.0, seconds / 2), realtime=True)
        )
        engine.stats.pop("short_lat_ms", None)
        engine.stats.pop("long_lat_ms", None)
        m = loop.run_until_complete(
            run_load(engine, app_cfg, n_streams, seconds, realtime=True)
        )
        entry = {
            "variant": name,
            "long_idle_k_cap": idle_k,
            "group_prefill": group,
            "interim_p50_ms": m["interim_p50_ms"],
            "interim_p95_ms": m["interim_p95_ms"],
            "committed_count": m["committed_count"],
            "committed_p50_ms": m["committed_p50_ms"],
            "committed_p95_ms": m["committed_p95_ms"],
            "decomposition": take_decomposition(),
        }
        results.append(entry)
        print(json.dumps(entry))

    # utterance-realistic workload at the chosen defaults: 2.56 s of
    # silence fits 4 full gate windows, so EVERY 2 s utterance ends and
    # finals carry the product-typical ~70-token budget (the default cycle
    # produces drifting-phase ~16 s segments / 130-token finals — the
    # worst case; see loadtest.make_stream_audio)
    set_variant(32, True)
    loop.run_until_complete(
        run_load(engine, app_cfg, n_streams, max(4.0, seconds / 2),
                 realtime=True, silence_s=2.56)
    )
    engine.stats.pop("short_lat_ms", None)
    engine.stats.pop("long_lat_ms", None)
    m = loop.run_until_complete(
        run_load(engine, app_cfg, n_streams, seconds, realtime=True,
                 silence_s=2.56)
    )
    utterance = {
        "variant": "utterance_workload_k32_group",
        "cycle": "2.0s speech / 2.56s silence (every utterance ends)",
        "interim_p50_ms": m["interim_p50_ms"],
        "interim_p95_ms": m["interim_p95_ms"],
        "committed_count": m["committed_count"],
        "committed_p50_ms": m["committed_p50_ms"],
        "committed_p95_ms": m["committed_p95_ms"],
        "decomposition": take_decomposition(),
    }
    results.append(utterance)
    print(json.dumps(utterance))
    engine.shutdown()
    loop.close()

    out = {
        "bench": "commit_latency",
        "model": "tiny" if quick else "nano",
        "streams": n_streams,
        "seconds_per_run": seconds,
        "warmup_s": warmup_s,
        "backend": jax.default_backend(),
        "workload": "loadtest speech/silence cycles (2.0s/1.5s), EOS suppressed "
                    "(worst case: finals decode their full 50+5*dur budget)",
        "variants": results,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "COMMIT_LATENCY_BENCH.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
