"""Eager-finals A/B: speech-end -> committed latency with endpoint speculation.

The VAD gate confirms a speech end only at the SECOND consecutive silent
window (reference: backend/vad_processor_manager.py:154 semantics), so the
final's audio is fully buffered one 640 ms window before confirmation.
With AppConfig.eager_finals the session launches the final decode at the
FIRST silent window and commits the already-(nearly-)finished result on
confirmation — the decode overlaps the gate's own confirmation wait.

This bench A/Bs eager_finals on ONE warmed engine over the
utterance-realistic cycle (2.0 s speech / 2.56 s silence: every utterance
ends) and the worst-case drifting-phase cycle, EOS suppressed (every final
decodes its full 50+5*dur budget). Speculation discarded on speech resume is
priced by the worst-case cycle, whose phase drift produces resumes.

Run on the real chip:  python -m sonicscribe_tpu.tools.bench_eager
Writes EAGER_FINALS_BENCH.json at the repo root.
"""

from __future__ import annotations

import asyncio
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
    engine = BatchedEngine(
        tr, SileroCostProbeVad(), slots=4 if quick else 32,
        max_decode_tokens=200, base_logit_bias=no_eos,
    )
    t0 = time.perf_counter()
    engine.warmup()
    warmup_s = round(time.perf_counter() - t0, 1)

    n_streams = 4 if quick else 50
    seconds = 6.0 if quick else 16.0

    loop = asyncio.new_event_loop()
    results = []
    # (name, eager, silence_s): utterance cycle first — the headline; then
    # the drifting-phase worst case, where resumes discard speculation
    variants = [
        ("utterance_eager_off", False, 2.56),
        ("utterance_eager_on", True, 2.56),
        ("worstcase_eager_off", False, 1.5),
        ("worstcase_eager_on", True, 1.5),
    ]
    for name, eager, silence_s in variants:
        app_cfg = AppConfig()
        app_cfg.eager_finals = eager
        # fresh gate per variant: the drifting-phase workload drives the
        # confirmation EMA down by design; don't leak that into the next run
        engine.eager_accept_ema = 1.0
        engine._eager_probe = 0
        engine._eager_pending.clear()
        # settle pass absorbs scheduling warm-in and compile stragglers
        loop.run_until_complete(
            run_load(engine, app_cfg, n_streams, max(4.0, seconds / 2),
                     realtime=True, silence_s=silence_s)
        )
        cancelled0 = engine.stats.get("cancelled_slots", 0)
        m = loop.run_until_complete(
            run_load(engine, app_cfg, n_streams, seconds, realtime=True,
                     silence_s=silence_s)
        )
        entry = {
            "variant": name,
            "eager_finals": eager,
            "silence_s": silence_s,
            "interim_p50_ms": m["interim_p50_ms"],
            "interim_p95_ms": m["interim_p95_ms"],
            "committed_count": m["committed_count"],
            "committed_p50_ms": m["committed_p50_ms"],
            "committed_p95_ms": m["committed_p95_ms"],
            "cancelled_slots": engine.stats.get("cancelled_slots", 0) - cancelled0,
            "eager_accept_ema": round(engine.eager_accept_ema, 3),
            "errors": m["errors"],
        }
        results.append(entry)
        print(json.dumps(entry))

    engine.shutdown()
    loop.close()

    from sonicscribe_tpu.tools.loadtest import compile_probe_s, tunnel_rtt_ms

    out = {
        "bench": "eager_finals",
        "model": "tiny" if quick else "nano",
        "streams": n_streams,
        "seconds_per_run": seconds,
        "warmup_s": warmup_s,
        "backend": jax.default_backend(),
        "tunnel_rtt_ms": tunnel_rtt_ms(),
        "compile_probe_s": compile_probe_s(),
        "note": "A/B of AppConfig.eager_finals on one warmed engine, EOS "
                "suppressed (worst case: finals decode their full 50+5*dur "
                "budget). committed latency is measured from gate "
                "CONFIRMATION (second silent window) -> committed_output, "
                "the same anchor the server reports as processing_delay; "
                "eager starts the decode one 640 ms window earlier. "
                "cancelled_slots counts engine slots freed mid-decode by "
                "discarded speculation (speech resumed).",
        "variants": results,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "EAGER_FINALS_BENCH.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
