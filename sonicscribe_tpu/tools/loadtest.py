"""Realtime multi-stream load harness (SURVEY.md §4 level-4 testing).

Simulates N concurrent realtime sessions in-process: each session gets its
own StreamSession (ring buffer + dynamic-threshold gate) fed 64 ms chunks of
synthetic speech/silence cycles at realtime pace, all multiplexed onto the
shared engine (the continuous batcher packs their VAD windows and decodes).

Measures the north-star metrics (BASELINE.json): p50/p95 interim
("tentative") latency, committed-result latency, and ingest health (whether
sessions keep up with the 64 ms cadence) for a given stream count.

Usage:
    python -m sonicscribe_tpu.tools.loadtest --streams 50 --seconds 20 \
        --model tiny-random
"""

from __future__ import annotations

import argparse
import asyncio
import json
import time

import numpy as np

from sonicscribe_tpu.config import AppConfig
from sonicscribe_tpu.serve.session import StreamSession

SR = 16000
CHUNK_SAMPLES = 1024
CHUNK_BYTES = 2048


def tunnel_rtt_ms(n: int = 20) -> float:
    """Measured device round-trip (tiny dispatch + fetch) p50, in ms.

    The tunnel backend's RTT varies by epoch — observed 27 ms healthy vs
    ~60 ms degraded, which scales every dispatch-bound latency in the
    bench artifacts by ~2x. Benches record this alongside their numbers so
    cross-run comparisons can be normalized; within-run A/Bs are unaffected."""
    import time

    import jax
    import jax.numpy as jnp

    x = jnp.ones((8, 8), jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    np.asarray(f(x))  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    return round(float(np.percentile(ts, 50)), 1)


def compile_probe_s() -> float:
    """Wall seconds for ONE tiny fresh compile + first execution.

    The tunnel's remote compile/link service has its own queue, invisible
    to tunnel_rtt_ms (whose program is already compiled) — observed to
    stretch a warmup's dispatch-replay phase 14 s -> 230 s after sustained
    full-grid compile storms while the RTT probe still read ~25 ms. A
    unique shape defeats both the in-process jit cache and the persistent
    compilation cache, so this prices the service queue as-is."""
    import time

    import jax
    import jax.numpy as jnp

    # unique-per-call static shape -> guaranteed fresh compile
    dim = 3 + (time.perf_counter_ns() // 1000) % 97
    x = jnp.ones((int(dim), 5), jnp.float32)
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda a: (a * 2.0).sum(axis=1))(x))
    return round(time.perf_counter() - t0, 2)


def make_stream_audio(
    total_s: float, seed: int, speech_s: float = 2.0, silence_s: float = 1.5
) -> bytes:
    """Speech/silence cycles, default 2.0 s speech / 1.5 s silence.

    NOTE on the default cycle: 1.5 s of silence fits TWO full 640 ms gate
    windows only at favorable phase, and the 3.5 s cycle is not a multiple
    of the window, so the phase drifts — segments often span several cycles
    (~16 s, 130-token finals). That makes the default the WORST-CASE
    committed-latency workload. For utterance-realistic finals pass
    silence_s >= 2.56 (4 full windows: every utterance ends)."""
    rng = np.random.default_rng(seed)
    out = []
    t_done = 0.0
    while t_done < total_s:
        for kind, sec in (("speech", speech_s), ("silence", silence_s)):
            n = int(SR * sec)
            t = np.arange(n) / SR
            if kind == "speech":
                env = 0.5 * (1 + np.sin(2 * np.pi * (3 + seed % 3) * t))
                x = 0.25 * env * sum(
                    np.sin(2 * np.pi * f * t) for f in (210 + 10 * (seed % 7), 700, 1500, 2600)
                ) + 0.002 * rng.standard_normal(n)
            else:
                x = 0.0006 * rng.standard_normal(n)
            out.append(np.clip(x, -1, 1))
            t_done += sec
    pcm = (np.concatenate(out)[: int(SR * total_s)] * 32767).astype("<i2")
    return pcm.tobytes()


async def run_load(
    engine,
    config: AppConfig,
    n_streams: int,
    seconds: float,
    realtime: bool = True,
    speech_s: float = 2.0,
    silence_s: float = 1.5,
    samples: "list | None" = None,
) -> dict:
    """-> metrics dict. `engine` must expose the async engine interface.

    `samples`, when given, collects per-result tuples
    ``(time.perf_counter(), kind, latency_s)`` with kind in
    {"interim", "committed"} — lets callers split latency percentiles by a
    concurrent event's wall-clock window (e.g. MIXED_BENCH's file job)."""
    interim_lat: list[float] = []
    committed_lat: list[float] = []
    committed_count = 0
    errors = 0

    # in accelerated mode the sessions' >=1 s interim cadence must follow
    # STREAM time, not wall time, or interims never fire
    stream_now = [0.0]
    clock = time.monotonic if realtime else (lambda: stream_now[0])

    sessions = []
    for i in range(n_streams):
        async def send(msg, _i=i):
            nonlocal committed_count
            if msg["type"] == "tentative_output":
                interim_lat.append(msg["processing_delay"])
                if samples is not None:
                    samples.append(
                        (time.perf_counter(), "interim", msg["processing_delay"])
                    )
            elif msg["type"] == "committed_output":
                committed_count += 1
                if msg.get("processing_delay") is not None:
                    committed_lat.append(msg["processing_delay"])
                    if samples is not None:
                        samples.append(
                            (time.perf_counter(), "committed",
                             msg["processing_delay"])
                        )

        s = StreamSession(f"load{i}", config, engine, send, clock=clock)
        sessions.append(s)

    audio = [
        make_stream_audio(seconds, seed=i, speech_s=speech_s, silence_s=silence_s)
        for i in range(n_streams)
    ]
    n_chunks = int(seconds * 1000 / config.audio_chunk_duration_ms)
    chunk_period = config.audio_chunk_duration_ms / 1000.0

    t_start = time.perf_counter()
    max_ingest_lag = 0.0
    for c in range(n_chunks):
        stream_now[0] = c * chunk_period
        target_t = t_start + c * chunk_period
        now = time.perf_counter()
        if realtime and target_t > now:
            await asyncio.sleep(target_t - now)
        elif realtime:
            max_ingest_lag = max(max_ingest_lag, now - target_t)
        off = c * CHUNK_BYTES
        for i, s in enumerate(sessions):
            frame = audio[i][off : off + CHUNK_BYTES]
            if len(frame) == CHUNK_BYTES:
                try:
                    await s.on_audio(frame)
                except Exception:
                    errors += 1
        if not realtime and (c + 1) % config.vad_process_window == 0:
            # accelerated mode: keep the synthetic stream clock coherent with
            # gate processing by draining all sessions' VAD queues per window
            await asyncio.gather(
                *[s.flush_vad() for s in sessions], return_exceptions=True
            )
    # drain: finalize open segments
    await asyncio.gather(*[s.flush() for s in sessions], return_exceptions=True)
    for s in sessions:
        await s.cleanup()
    wall = time.perf_counter() - t_start

    def pct(xs, p):
        return float(np.percentile(xs, p)) if xs else None

    return {
        "streams": n_streams,
        "seconds": seconds,
        "wall_s": round(wall, 2),
        "realtime_factor": round(wall / seconds, 3),
        "max_ingest_lag_s": round(max_ingest_lag, 3),
        "interim_count": len(interim_lat),
        "interim_p50_ms": round(pct(interim_lat, 50) * 1000, 1) if interim_lat else None,
        "interim_p95_ms": round(pct(interim_lat, 95) * 1000, 1) if interim_lat else None,
        "committed_count": committed_count,
        "committed_p50_ms": round(pct(committed_lat, 50) * 1000, 1) if committed_lat else None,
        "committed_p95_ms": round(pct(committed_lat, 95) * 1000, 1) if committed_lat else None,
        "errors": errors,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=50)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--model", default="tiny-random")
    ap.add_argument("--vad", default="energy")
    ap.add_argument("--engine", default="batched")
    ap.add_argument("--no-realtime", action="store_true",
                    help="feed chunks as fast as possible")
    args = ap.parse_args(argv)

    from sonicscribe_tpu.serve.app import build_runtime

    config = AppConfig()
    engine, vad, info = build_runtime(args.model, args.vad, config, args.engine)
    if hasattr(engine, "warmup"):
        engine.warmup(budgets=(config.interim_max_new_tokens, config.final_max_tokens))

    async def go():
        return await run_load(
            engine, config, args.streams, args.seconds, realtime=not args.no_realtime
        )

    metrics = asyncio.run(go())
    metrics["model_info"] = info
    engine.shutdown()
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
