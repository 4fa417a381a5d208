"""Mixed-workload bench: realtime streams + a concurrent file job.

The scenario: N realtime sessions (short-pool interims) while the server
also transcribes an uploaded file (long-pool segments). The VERDICT r4 #2
ask: interim p95 < 400 ms with file RTF <= 0.05, attacking COHORT STRUCTURE
(per-tick long-pool program size) rather than admission order (rationing —
A/B'd in r4 and lost, note_r4_ab below).

r5 design:
- A/B legs sweep the two per-tick long-work caps: `busy_long_admit_cap`
  (file prefill groups admitted per tick while the short class is busy) and
  `long_live_k_cap` (long decode steps per tick while realtime sessions are
  live).
- Latency percentiles are split INTO vs OUTSIDE the file job's wall-clock
  window (run_load's `samples`): the p95 target is gated by the during-file
  regime, which a whole-window percentile dilutes.
- The winning leg's run keeps the tick trace (SONIC_TICK_TRACE) and reports
  the tick-phase + admit (prep/write/dispatch, groups-per-pool)
  decomposition in and out of the file window — the "is the floor physics?"
  evidence the verdict asks for if no leg clears 400 ms.

Writes MIXED_BENCH.json. Run: python -m sonicscribe_tpu.tools.bench_mixed
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


def main():
    os.environ["SONIC_TICK_TRACE"] = "1"
    import jax

    if "--cpu" in sys.argv:
        # CPU smoke of the bench's own code without holding the chip: the
        # ambient env pins the tunneled backend and a killed chip-attached
        # quick run congests the remote queue for everyone (verify skill)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.join(repo, ".jax_cache")),
    )

    from sonicscribe_tpu.config import AppConfig
    from sonicscribe_tpu.engine.batcher import BatchedEngine
    from sonicscribe_tpu.engine.transcriber import Transcriber
    from sonicscribe_tpu.models import nano, tiny
    from sonicscribe_tpu.models.glm_asr import init_params
    from sonicscribe_tpu.models.tokenizer import ByteTokenizer
    from sonicscribe_tpu.tools.loadtest import (
        compile_probe_s,
        run_load,
        tunnel_rtt_ms,
    )
    from sonicscribe_tpu.vad.model import EnergyVad

    quick = "--quick" in sys.argv
    cfg = tiny() if quick else nano()
    dtype = jnp.float32 if quick else jnp.bfloat16
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    tokenizer = ByteTokenizer(cfg)
    no_eos = np.zeros((cfg.decoder.vocab_size,), np.float32)
    no_eos[cfg.eos_id] = -1e9
    no_eos[cfg.pad_id] = -1e9

    sr = 16000
    n_streams = 4 if quick else 50
    seg_bucket = 128 if quick else 512
    seg_seconds = seg_bucket * 160 / sr  # 5.12 s segments, stream buckets
    n_seg = 3 if quick else 12  # ~61 s concurrent file job
    window_s = 8.0 if quick else 16.0
    rng = np.random.default_rng(0)
    segments = [
        (0.1 * rng.standard_normal(int(sr * seg_seconds))).astype(np.float32)
        for _ in range(n_seg)
    ]

    results = {"backend": jax.default_backend(), "streams": n_streams,
               "file_segments": n_seg,
               "file_audio_seconds": round(n_seg * seg_seconds, 1),
               "tunnel_rtt_ms": tunnel_rtt_ms(),
               "compile_probe_s": compile_probe_s(),
               "note_r4_ab": (
                   "r4 settled admission ORDER: rationing (short-class "
                   "admits+dispatch ahead of long admits) lost on every "
                   "metric (interim p50 310 vs 254, file RTF 0.057 vs "
                   "0.041) and ships default-off; dual-pool fusion also "
                   "lost (p95 697). r5 attacks per-tick long-pool program "
                   "SIZE instead (admit cap x k cap sweep below), with "
                   "in/out-of-file-window splits and a tick decomposition."
               ),
               "note_r5_close": (
                   "r5 close (VERDICT r4 #2): no leg clears in-file p95 "
                   "< 400 ms at RTF <= 0.05, and the sweep shows why — "
                   "long-program GRANULARITY is not the binding term. The "
                   "caps varied long-pool program size 216 -> 94 ms "
                   "(resolve p50, shipped vs k4) and admits/tick 2 -> 1; "
                   "in-file interim p50 moved 542 -> 391 ms but p95 stayed "
                   "581-646 across every leg. The tail is burst-load "
                   "queueing: at RTF <= 0.05 the 61.4 s file job may hold "
                   "the device ~2.8 s of wall, and its measured in-file "
                   "occupancy is near-solid (16 ticks x ~216 ms resolve), "
                   "while the 50-stream interim class needs ~1 s of device "
                   "time over the same window (100 in-file interims in "
                   "staggered subwaves). Demand inside the burst exceeds "
                   "the RTF-capped window's slack, so a tail of in-file "
                   "interims must queue behind >= one long program plus "
                   "their own wave (213.8 + 195.0 ~= 409 ms at p50 scale) "
                   "regardless of how finely the long work is sliced. "
                   "Breaking 400 needs file RTF > 0.05 (k4 reads 0.0523 "
                   "for in-file p50 391) or a cheaper interim class. The "
                   "shipped default stays cap-free: best RTF (0.0454) and "
                   "best overall p50 (196.8 ms); the frontier lives in "
                   "the admit1/k4 legs."
               )}
    app_cfg = AppConfig()

    # one engine per variant, all in ONE process back-to-back: the shared
    # tunneled chip drifts 20-60% between processes/hours, so only
    # same-process A/B comparisons are trustworthy.
    # (tag, long_live_k_cap, busy_long_admit_cap, fuse_slot_writes) —
    # stagger on / ration off / dual-fuse off everywhere (all three settled
    # by earlier A/Bs: stagger won at scale SCALE_BENCH r4; rationing and
    # dual-pool fusion lost, note_r4_ab). Round-1 r5 A/B (recorded in git
    # history of MIXED_BENCH.json): the fused slot-state write won huge
    # (p50 276->167, p95 650->426, committed 1512->1214) and is now the
    # default; admit1 (cap=1) cut p95 650->438 pre-fuse; admit1_k4 lost
    # (committed 2811). Round 2 sweeps admit/k caps ON TOP of the fused
    # default, with a no-fuse control.
    variants = [
        ("shipped", 8, 2, True, False),   # the r5 defaults (fused writes)
        ("admit1", 8, 1, True, False),    # + halve per-tick long prefill work
        ("k4", 4, 2, True, False),        # + halve per-tick long decode work
        ("nofuse", 8, 2, False, False),   # the r4 default, control leg
    ]
    if "--int8dec" in sys.argv:
        # the note_r5_close "cheaper interim class" lever: int8-decoder
        # interims run ~166 vs ~195 ms waves (BENCH_DETAIL), shrinking the
        # short class's in-burst demand — the one term of the measured
        # p95 floor (long program + one wave) the cap sweep can't touch
        variants = [("int8dec", 8, 2, True, True)] + (
            [] if "--int8dec-only" in sys.argv else variants
        )
    file_budget = 64 if quick else 256
    for tag, kcap, admit_cap, fusedw, q8 in variants:
        leg_params = params
        if q8 and not quick:
            from sonicscribe_tpu.ops.quant import quantize_params_int8
            leg_params = quantize_params_int8(params, decoder_only=True)
        tr = Transcriber(cfg, leg_params, tokenizer,
                         prefill_buckets=(128, seg_bucket))
        engine = BatchedEngine(
            tr, EnergyVad(), slots=4 if quick else 32,
            max_decode_tokens=file_budget, base_logit_bias=no_eos,
        )
        engine.long_live_k_cap = kcap
        engine.busy_long_admit_cap = admit_cap
        engine.fuse_slot_writes = fusedw
        engine.warmup()
        loop = asyncio.new_event_loop()

        async def run_both(samples=None, file_span=None):
            async def file_job():
                # start after the streams settle, finish within the window
                await asyncio.sleep(4.0)
                t0 = time.perf_counter()
                rs = await asyncio.gather(
                    *[
                        engine.transcribe(s, sr, max_new_tokens=file_budget)
                        for s in segments
                    ]
                )
                assert all(len(r.tokens) == file_budget for r in rs)
                t1 = time.perf_counter()
                if file_span is not None:
                    file_span[:] = [t0, t1]
                return t1 - t0

            load_task = asyncio.ensure_future(
                run_load(engine, app_cfg, n_streams, window_s, realtime=True,
                         samples=samples)
            )
            file_task = asyncio.ensure_future(file_job())
            m = await load_task
            file_s = await file_task
            return m, file_s

        # settle run (compiles the runtime program mix), then measured
        loop.run_until_complete(run_both())
        if engine.tick_trace is not None:
            engine.tick_trace.clear()
        samples: list = []
        span: list = []
        m, file_s = loop.run_until_complete(
            run_both(samples=samples, file_span=span)
        )
        ticks = list(engine.tick_trace or ())
        engine.shutdown()
        loop.close()

        # split latencies into vs outside the file job's wall window
        t_f0, t_f1 = (span + [0.0, 0.0])[:2]
        in_file = [
            lat * 1e3 for (t, kind, lat) in samples
            if kind == "interim" and t_f0 <= t <= t_f1 + lat
        ]
        out_file = [
            lat * 1e3 for (t, kind, lat) in samples
            if kind == "interim" and not (t_f0 <= t <= t_f1 + lat)
        ]
        results[f"{tag}_interim_p50_ms"] = m["interim_p50_ms"]
        results[f"{tag}_interim_p95_ms"] = m["interim_p95_ms"]
        results[f"{tag}_interim_p50_ms_in_file"] = _pct(in_file, 50)
        results[f"{tag}_interim_p95_ms_in_file"] = _pct(in_file, 95)
        results[f"{tag}_interim_p50_ms_out_file"] = _pct(out_file, 50)
        results[f"{tag}_interim_p95_ms_out_file"] = _pct(out_file, 95)
        results[f"{tag}_interim_n_in_file"] = len(in_file)
        results[f"{tag}_committed"] = m["committed_count"]
        results[f"{tag}_committed_p50_ms"] = m.get("committed_p50_ms")
        results[f"{tag}_ingest_lag_s"] = m["max_ingest_lag_s"]
        results[f"{tag}_file_wall_s"] = round(file_s, 2)
        results[f"{tag}_file_rtf"] = round(file_s / (n_seg * seg_seconds), 4)

        # tick decomposition in/out of the file window (the physics record)
        busy = [t for t in ticks if t["n_vad"] or any(n for _, n in t["active"])]
        tin = [t for t in busy if t_f0 <= t["t"] <= t_f1]
        tout = [t for t in busy if not (t_f0 <= t["t"] <= t_f1)]
        decomp = {}
        for name, tset in (("in_file", tin), ("out_file", tout)):
            if not tset:
                continue
            ad = [t["admit_detail"] for t in tset if t.get("admit_detail")]
            decomp[name] = {
                "ticks": len(tset),
                "tick_total_ms": {
                    "p50": _pct([t["total_ms"] for t in tset], 50),
                    "p95": _pct([t["total_ms"] for t in tset], 95),
                },
                "admit_ms": {
                    "p50": _pct([t["admit_ms"] for t in tset], 50),
                    "p95": _pct([t["admit_ms"] for t in tset], 95),
                },
                "resolve_ms": {
                    "p50": _pct([t["resolve_ms"] for t in tset], 50),
                    "p95": _pct([t["resolve_ms"] for t in tset], 95),
                },
                "admit_prep_ms_mean": round(
                    float(np.mean([a["prep_ms"] for a in ad])), 2) if ad else None,
                "admit_write_ms_mean": round(
                    float(np.mean([a["write_ms"] for a in ad])), 2) if ad else None,
                "admit_dispatch_ms_mean": round(
                    float(np.mean([a["dispatch_ms"] for a in ad])), 2) if ad else None,
                "long_groups_total": sum(a["groups_long"] for a in ad),
                "short_groups_total": sum(a["groups_short"] for a in ad),
            }
        results[f"{tag}_tick_decomposition"] = decomp
        print(json.dumps({k: v for k, v in results.items()
                          if k.startswith(tag) and "decomposition" not in k}))

    # --cpu without --quick must also land in a smoke file: a CPU run's
    # numbers must never overwrite the committed chip-measured artifact
    name = (
        "MIXED_BENCH_quick.json"
        if quick or "--cpu" in sys.argv
        else "MIXED_BENCH.json"
    )
    path = os.path.join(repo, name)
    # MERGE into the existing artifact (like bench_scale): a partial run
    # (e.g. --int8dec-only) must update its own legs without dropping the
    # other legs the README cites — a from-scratch rewrite did exactly
    # that once (restored from git history, note_r5_restore)
    merged = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                merged = json.load(f)
        except Exception:
            merged = {}
    merged.update(results)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps({k: results[k] for k in results
                      if "decomposition" not in k}))


if __name__ == "__main__":
    main()
