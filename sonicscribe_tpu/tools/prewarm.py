"""Build a portable serialized-executable store for deployment.

First boot on a fresh machine pays the full remote-compile cost of the
program grid (measured 53 s in a fast tunnel epoch, 500+ s in a slow one).
The fix is to not compile at boot at all: run this tool ONCE per (model
config, quant mode, engine shape, runtime version) at build/release time,
then ship the output directory alongside the checkpoint — a server started
with SONIC_EXEC_CACHE pointed at it deserializes every program instead of
tracing/lowering/compiling (engine/exec_store.py; measured restart warmup
~15 s vs 30.7-513 s cold). Stale entries self-heal: a binary the runtime
rejects recompiles in place (ExecRouter's donated-arg validation copies).

The store is keyed by a context fingerprint (model config, params
signature, engine shapes, jax/libtpu versions), so one directory can hold
stores for several configurations side by side.

Usage:
  python -m sonicscribe_tpu.tools.prewarm --model nano-random --out DIR
  python -m sonicscribe_tpu.tools.prewarm --model /ckpt/dir --quant int8 \
      --out DIR --full

Matches the deployment need the reference sidesteps by having no compiled
grid (it boots in model-load time but serves eagerly; backend/asr.py).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--model", default="nano-random",
                   help="'tiny-random' | 'nano-random' | checkpoint dir")
    p.add_argument("--vad", default="energy", help="'energy' | 'silero' | weights path")
    p.add_argument("--quant", default="native",
                   choices=("native", "int8", "int8-decoder",
                            "int8-decoder-a8"))
    p.add_argument("--out", required=True, help="store directory to create/extend")
    p.add_argument("--full", action="store_true",
                   help="prewarm the full (bucket, B) prefill grid")
    p.add_argument("--engine-shape", default="server",
                   choices=("server", "bench-stream", "bench-file"),
                   help="which engine construction to mirror: the serve "
                        "default, bench.py's 50-stream engine, or its "
                        "16-segment file engine")
    args = p.parse_args(argv)

    os.environ["SONIC_EXEC_CACHE"] = os.path.abspath(args.out)
    os.makedirs(args.out, exist_ok=True)

    import jax

    from sonicscribe_tpu.config import AppConfig
    from sonicscribe_tpu.serve.app import build_runtime

    cfg = AppConfig()
    if args.quant != "native":
        cfg.quant_mode = args.quant

    t0 = time.perf_counter()
    if args.engine_shape == "server":
        engine, _vad, info = build_runtime(args.model, args.vad, cfg)
    else:
        import jax.numpy as jnp
        import numpy as np

        from sonicscribe_tpu.engine.batcher import BatchedEngine
        from sonicscribe_tpu.engine.transcriber import Transcriber
        from sonicscribe_tpu.models import nano, tiny
        from sonicscribe_tpu.models.glm_asr import init_params
        from sonicscribe_tpu.models.tokenizer import ByteTokenizer
        from sonicscribe_tpu.vad.model import SileroCostProbeVad

        mcfg = tiny() if args.model == "tiny-random" else nano()
        params = init_params(mcfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        no_eos = np.zeros((mcfg.decoder.vocab_size,), np.float32)
        no_eos[mcfg.eos_id] = -1e9
        no_eos[mcfg.pad_id] = -1e9
        if args.engine_shape == "bench-stream":
            tr = Transcriber(mcfg, params, ByteTokenizer(mcfg),
                             prefill_buckets=(128, 512))
            engine = BatchedEngine(tr, SileroCostProbeVad(), slots=32,
                                   max_decode_tokens=200,
                                   base_logit_bias=no_eos)
        else:
            tr = Transcriber(mcfg, params, ByteTokenizer(mcfg),
                             prefill_buckets=(2048,))
            engine = BatchedEngine(tr, SileroCostProbeVad(), slots=16,
                                   max_decode_tokens=256,
                                   base_logit_bias=no_eos,
                                   fuse_dual_decode=False)
        info = {}
    build_s = time.perf_counter() - t0

    store = engine._exec_store
    if store is None:
        print("ERROR: exec store disabled (mesh engine or SONIC_EXEC_CACHE=0)",
              file=sys.stderr)
        sys.exit(2)

    t1 = time.perf_counter()
    engine.warmup(full=args.full)
    warm_s = time.perf_counter() - t1
    engine.shutdown()

    n_entries = sum(
        len(files) for _, _, files in os.walk(os.path.abspath(args.out))
    )
    print(
        f"prewarm done: model={args.model} quant={args.quant} "
        f"shape={args.engine_shape} build={build_s:.1f}s warmup={warm_s:.1f}s "
        f"saves={store.saves} loads={store.loads} store_files={n_entries} "
        f"-> {os.path.abspath(args.out)}"
    )
    print(
        "deploy: ship this directory with the checkpoint and start the "
        "server with SONIC_EXEC_CACHE pointing at it"
    )


if __name__ == "__main__":
    main()
