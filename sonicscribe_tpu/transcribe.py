"""CLI transcription: the minimum end-to-end slice as a command.

Equivalent of the reference's `asr.py` __main__ smoke harness
(reference: backend/asr.py:517-558) plus the SURVEY.md §7 step-4 demo
(single WAV -> NDJSON, no server):

    python -m sonicscribe_tpu.transcribe audio.wav --model <ckpt|tiny-random>
    python -m sonicscribe_tpu.transcribe audio.wav --hotwords jax,tpu --vad
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description="SonicScribe-TPU file transcription")
    ap.add_argument("audio", help="path to an audio file (WAV preferred)")
    ap.add_argument("--model", default="tiny-random",
                    help="'tiny-random' | 'nano-random' | checkpoint dir")
    ap.add_argument("--quant", default="native",
                    choices=("native", "int8", "int8-decoder",
                             "int8-decoder-a8"))
    ap.add_argument("--vad", action="store_true", help="VAD-segment the file")
    ap.add_argument("--hotwords", default="", help="comma-separated, max 10")
    ap.add_argument("--max-new-tokens", type=int, default=256)
    ap.add_argument("--info", action="store_true",
                    help="print model info (get_model_info parity) and exit")
    args = ap.parse_args(argv)

    from sonicscribe_tpu.config import AppConfig
    from sonicscribe_tpu.serve.app import build_runtime
    from sonicscribe_tpu.serve.decode import decode_audio
    from sonicscribe_tpu.serve.files import FileTranscriptionConfig, transcribe_file_stream

    config = AppConfig()
    config.quant_mode = args.quant
    engine, vad, info = build_runtime(args.model, "energy", config, "batched")
    if args.info:
        print(json.dumps(info))
        return 0

    with open(args.audio, "rb") as f:
        data = f.read()
    t0 = time.perf_counter()
    audio = decode_audio(data, args.audio)
    file_cfg = FileTranscriptionConfig(
        vad_enabled=args.vad,
        hotwords=[w.strip() for w in args.hotwords.split(",") if w.strip()][:10],
        max_new_tokens=args.max_new_tokens,
    )

    import asyncio

    async def run():
        async for msg in transcribe_file_stream(
            audio, engine, vad if args.vad else None, file_cfg, args.audio
        ):
            print(json.dumps(msg, ensure_ascii=False), flush=True)

    asyncio.run(run())
    engine.shutdown()
    print(f"# total {time.perf_counter() - t0:.2f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
