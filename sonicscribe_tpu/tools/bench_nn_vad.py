"""NN-VAD serving cost: the 50-stream realtime load with the Silero net in
the batched gate path.

No Silero checkpoint exists in this environment (zero egress), and
random-init Silero probabilities would destroy the load harness's
segmentation semantics — so the probe VAD RUNS the full Silero v5 forward
(its device cost) while RETURNING the EnergyVad's functional decisions. The
measured latency therefore includes the NN gate's compute exactly as a
converted checkpoint would incur it.

Usage: python -m sonicscribe_tpu.tools.bench_nn_vad
Writes one JSON line (also NN_VAD_BENCH.json when --out is given).
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from sonicscribe_tpu.vad.model import SileroCostProbeVad


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=50)
    ap.add_argument("--seconds", type=float, default=12.0)
    ap.add_argument("--out", default="")
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

    cfg = nano()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    no_eos = np.zeros((cfg.decoder.vocab_size,), np.float32)
    no_eos[cfg.eos_id] = -1e9
    tr = Transcriber(cfg, params, ByteTokenizer(cfg), prefill_buckets=(128, 512))
    tr._zero_bias = jnp.asarray(no_eos)
    engine = BatchedEngine(tr, SileroCostProbeVad(), slots=32, max_decode_tokens=200)
    engine.warmup()
    app_cfg = AppConfig()
    loop = asyncio.new_event_loop()
    loop.run_until_complete(
        run_load(engine, app_cfg, args.streams, 8.0, realtime=True)
    )
    m = loop.run_until_complete(
        run_load(engine, app_cfg, args.streams, args.seconds, realtime=True)
    )
    engine.shutdown()
    loop.close()
    result = {
        "vad": "silero-v5-cost-probe",
        "streams": args.streams,
        "stream_interim_p50_ms": m["interim_p50_ms"],
        "stream_interim_p95_ms": m["interim_p95_ms"],
        "stream_committed": m["committed_count"],
        "stream_ingest_lag_s": m["max_ingest_lag_s"],
        "backend": jax.default_backend(),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
