"""On-chip experiment: live decode-k cap vs 50-stream interim latency.

The scheduler dispatches K decode steps per tick; a request arriving mid-tick
waits for the whole in-flight program, so the cap bounds queueing latency at
the cost of more status round trips. This sweeps caps on the real chip with
the exact bench.py stream-engine configuration.

Usage: python -m sonicscribe_tpu.tools.bench_kcap [--caps 32,16,8,4]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--caps", default="32,8,4")
    ap.add_argument("--streams", type=int, default=50)
    ap.add_argument("--seconds", type=float, default=12.0)
    ap.add_argument("--slots", type=int, default=32)
    args = ap.parse_args()

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
    )

    from sonicscribe_tpu.config import AppConfig
    from sonicscribe_tpu.engine.batcher import BatchedEngine
    from sonicscribe_tpu.engine.transcriber import Transcriber
    from sonicscribe_tpu.models import nano
    from sonicscribe_tpu.models.glm_asr import init_params
    from sonicscribe_tpu.models.tokenizer import ByteTokenizer
    from sonicscribe_tpu.tools.loadtest import run_load
    from sonicscribe_tpu.vad.model import EnergyVad

    cfg = nano()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    no_eos = np.zeros((cfg.decoder.vocab_size,), np.float32)
    no_eos[cfg.eos_id] = -1e9

    tr = Transcriber(
        cfg, params, ByteTokenizer(cfg), prefill_buckets=(128, 512)
    )
    tr._zero_bias = jnp.asarray(no_eos)
    engine = BatchedEngine(
        tr, EnergyVad(), slots=args.slots, max_decode_tokens=200
    )
    engine.warmup()
    app_cfg = AppConfig()

    for cap in [int(c) for c in args.caps.split(",")]:
        engine.live_k_cap = cap
        engine.pending_k_cap = min(16, cap)
        loop = asyncio.new_event_loop()
        loop.run_until_complete(
            run_load(engine, app_cfg, args.streams, 8.0, realtime=True)
        )
        m = loop.run_until_complete(
            run_load(engine, app_cfg, args.streams, args.seconds, realtime=True)
        )
        loop.close()
        print(json.dumps({"live_k_cap": cap, **m}))

    engine.shutdown()


if __name__ == "__main__":
    main()
