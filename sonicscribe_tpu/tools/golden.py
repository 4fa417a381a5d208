"""Golden-data generator: dumps reference fixtures for regression testing.

SURVEY.md §7 build-order #1 ("weights + golden data first"): in environments
with the real checkpoint this runs the PyTorch reference once and dumps mel
features, encoder outputs, and greedy token streams; in the hermetic build
environment it dumps the same artifacts from the independent torch
reimplementation (tools/torch_reference.py) against random-init weights, so
any later numerics regression in the JAX stack is caught by byte comparison.

Usage:
    python -m sonicscribe_tpu.tools.golden <out_dir> [--seed 7]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def generate(out_dir: str, seed: int = 7) -> dict:
    import jax
    import jax.numpy as jnp

    from sonicscribe_tpu.audio.mel import MelConfig, log_mel_spectrogram
    from sonicscribe_tpu.models import tiny
    from sonicscribe_tpu.models.glm_asr import init_params
    from sonicscribe_tpu.models.tokenizer import ByteTokenizer, build_prompt
    from sonicscribe_tpu.tools.torch_reference import (
        encode_audio_torch,
        transcribe_torch,
    )

    os.makedirs(out_dir, exist_ok=True)
    cfg = tiny()
    params = jax.tree.map(
        np.asarray, init_params(cfg, jax.random.PRNGKey(seed), dtype=jnp.float32)
    )
    tok = ByteTokenizer(cfg)

    rng = np.random.default_rng(seed)
    sr = 16000
    manifest = {"seed": seed, "cases": []}
    for name, seconds, hotwords in [
        ("tone", 0.6, None),
        ("noise", 0.4, None),
        ("hotword", 0.5, ["golden", "fixture"]),
    ]:
        t = np.arange(int(sr * seconds)) / sr
        audio = (
            0.3 * np.sin(2 * np.pi * (300 + 100 * len(name)) * t)
            + 0.03 * rng.standard_normal(len(t))
        ).astype(np.float32)
        mel = np.asarray(log_mel_spectrogram(audio, MelConfig()))
        prompt = build_prompt(tok, cfg, hotwords=hotwords)
        enc = encode_audio_torch(params, cfg, mel).numpy()
        tokens = transcribe_torch(
            params, cfg, mel, prompt.prefix_ids, prompt.suffix_ids, 16
        )
        np.savez(
            os.path.join(out_dir, f"{name}.npz"),
            audio=audio,
            mel=mel,
            encoder_out=enc,
            prefix_ids=prompt.prefix_ids,
            suffix_ids=prompt.suffix_ids,
            tokens=np.asarray(tokens, np.int32),
        )
        manifest["cases"].append(
            {"name": name, "seconds": seconds, "hotwords": hotwords,
             "n_tokens": len(tokens)}
        )
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args(argv)
    m = generate(args.out_dir, args.seed)
    print(json.dumps(m))


if __name__ == "__main__":
    main()
