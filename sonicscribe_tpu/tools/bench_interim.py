"""Interim-latency decomposition at 50 streams (VERDICT r2 stretch item 8).

Single-request interim latency is ~125 ms; under a 50-stream realtime load
the p50 is ~218 ms. This bench decomposes the ~90 ms delta with:

1. the short class's queue/run latency samples (engine.stats), and
2. the per-tick phase timeline (`BatchedEngine.tick_trace`,
   SONIC_TICK_TRACE=1): ingest / vad dispatch / admit+prefill dispatch /
   decode dispatch / previous-tick resolve, plus inter-tick gaps.

Reference motivation: the reference's tentative path is its most
latency-sensitive surface (backend/connection_manager.py:92-168 drives
interim updates on every chunk while speech is open).

Run on the real chip:  python -m sonicscribe_tpu.tools.bench_interim
Writes INTERIM_BENCH.json at the repo root.
"""

from __future__ import annotations

import asyncio
import json
import os
import sys
import time

import numpy as np


def _pct(xs, p):
    return round(float(np.percentile(xs, p)), 2) if len(xs) else None


def main() -> None:
    os.environ["SONIC_TICK_TRACE"] = "1"
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

    tr = Transcriber(cfg, params, tokenizer, prefill_buckets=(128, 512))
    engine = BatchedEngine(
        tr, SileroCostProbeVad(), slots=4 if quick else 32,
        max_decode_tokens=200,
    )
    t0 = time.perf_counter()
    engine.warmup()
    warmup_s = round(time.perf_counter() - t0, 1)

    app_cfg = AppConfig()
    n_streams = 4 if quick else 50
    seconds = 6.0 if quick else 16.0

    loop = asyncio.new_event_loop()
    # NOTE: an earlier revision A/B'd speculative_interims here; both arms
    # measured verify_rounds=0 — the sliding last-20-chunk interim window
    # never repeats a start between 1 s-cadence interims, so the session's
    # draft guard (serve/session.py _run_interim) correctly never fires.
    # The flag now defaults OFF (config.speculative_interims) and the A/B
    # was dropped rather than keep paying a second 16 s chip run for a
    # measured no-op.
    # settle pass absorbs scheduling warm-in and compile stragglers
    loop.run_until_complete(
        run_load(engine, app_cfg, n_streams, max(4.0, seconds / 2),
                 realtime=True)
    )
    engine.stats.pop("short_lat_ms", None)
    engine.stats.pop("long_lat_ms", None)
    engine.tick_trace.clear()
    v0 = engine.stats.get("verify_rounds", 0)
    m = loop.run_until_complete(
        run_load(engine, app_cfg, n_streams, seconds, realtime=True)
    )
    verify_rounds = engine.stats.get("verify_rounds", 0) - v0
    ticks = list(engine.tick_trace)
    lat = engine.stats.pop("short_lat_ms", None)
    engine.shutdown()
    loop.close()

    # phase decomposition over busy ticks (at least one pool active, or any
    # vad work — idle 1 s wakeup ticks would drown the percentiles)
    busy = [
        t for t in ticks
        if t["n_vad"] or any(n for _, n in t["active"])
    ]
    gaps = [
        (b["t"] - a["t"]) * 1e3 - a["total_ms"]
        for a, b in zip(busy, busy[1:])
        if (b["t"] - a["t"]) < 1.0  # drop idle-wait boundaries
    ]
    phases = {}
    for key in (
        "ingest_ms", "vad_dispatch_ms", "admit_ms", "early_resolve_ms",
        "decode_dispatch_ms", "resolve_ms", "total_ms",
    ):
        xs = [t[key] for t in busy]
        phases[key] = {"p50": _pct(xs, 50), "p95": _pct(xs, 95),
                       "mean": round(float(np.mean(xs)), 2) if xs else None}
    short_active = [
        dict(t["active"]).get("short", 0) for t in busy
    ]
    from sonicscribe_tpu.tools.loadtest import compile_probe_s, tunnel_rtt_ms

    out = {
        "bench": "interim_decomposition",
        "model": "tiny" if quick else "nano",
        "streams": n_streams,
        "seconds": seconds,
        "warmup_s": warmup_s,
        "backend": jax.default_backend(),
        "tunnel_rtt_ms": tunnel_rtt_ms(),
        "compile_probe_s": compile_probe_s(),
        "interim_p50_ms": m["interim_p50_ms"],
        "interim_p95_ms": m["interim_p95_ms"],
        "committed_p50_ms": m["committed_p50_ms"],
        "verify_rounds": verify_rounds,
        "short_class": None if not lat else {
            "n": len(lat["queue"]),
            "queue_p50_ms": _pct(lat["queue"], 50),
            "queue_p95_ms": _pct(lat["queue"], 95),
            "run_p50_ms": _pct(lat["run"], 50),
            "run_p95_ms": _pct(lat["run"], 95),
        },
        "busy_ticks": len(busy),
        "early_resolve_ticks": sum(1 for t in busy if t["early"]),
        "tick_phases_ms": phases,
        "inter_tick_gap_ms": {"p50": _pct(gaps, 50), "p95": _pct(gaps, 95)},
        "short_active_per_busy_tick": {
            "p50": _pct(short_active, 50), "max": max(short_active, default=0),
        },
    }
    print(json.dumps(out, indent=1))
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "INTERIM_BENCH.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
