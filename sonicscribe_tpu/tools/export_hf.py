"""Export a native parameter tree to HF checkpoint layout (the inverse of
convert_weights.convert_hf_checkpoint).

Two uses:
- interop: publish a trained/converted model back into the HF ecosystem;
- validation: generate a SYNTHETIC HF checkpoint (safetensors with exactly
  the `HF_NAME_MAP` tensor names and HF layouts) so the HF->native converter,
  the native loader, and the HF tokenizer adapter can be exercised end-to-end
  in an environment that cannot fetch the real GLM-ASR-Nano weights
  (reference loads them with trust_remote_code, backend/asr.py:66-146).

`make_test_tokenizer` builds a real HF-loadable fast tokenizer (byte-level
BPE trained in-process) whose special-token ids match GlmAsrConfig's layout,
standing in for the checkpoint's tokenizer directory.
"""

from __future__ import annotations

import json
import os

import numpy as np

from sonicscribe_tpu.models.config import GlmAsrConfig
from sonicscribe_tpu.tools.convert_weights import (
    HF_NAME_MAP,
    TRANSPOSED_SUFFIXES,
    _flatten,
)


def export_hf_checkpoint(
    params: dict,
    cfg: GlmAsrConfig,
    dst: str,
    name_map: dict[str, str] | None = None,
) -> None:
    """Write `dst/model.safetensors` with HF names/layouts.

    Inverse transforms of convert_hf_checkpoint: linear weights go back to
    HF's [out, in], convs back to [out, in, k], stacked layer tensors are
    unstacked per layer.
    """
    from safetensors.numpy import save_file

    flat = {k: np.asarray(v, np.float32) for k, v in _flatten(params).items()}
    out: dict[str, np.ndarray] = {}
    name_map = name_map or HF_NAME_MAP
    for ours, theirs in name_map.items():
        if "@{L}" in ours:
            base = ours.split("@")[0]
            stacked = flat[base]
            for layer in range(stacked.shape[0]):
                v = stacked[layer]
                if base.endswith(TRANSPOSED_SUFFIXES):
                    v = v.T
                out[theirs.replace("{L}", str(layer))] = np.ascontiguousarray(v)
        else:
            v = flat[ours]
            if ours.endswith(TRANSPOSED_SUFFIXES):
                v = v.T
            if ours.startswith("encoder/conv") and v.ndim == 3:
                # ours [k, in, out] -> HF conv1d [out, in, k]
                v = np.transpose(v, (2, 1, 0))
            out[theirs] = np.ascontiguousarray(v)
    os.makedirs(dst, exist_ok=True)
    save_file(out, os.path.join(dst, "model.safetensors"))
    with open(os.path.join(dst, "config.json"), "w") as f:
        json.dump({"model_type": "glm-asr", "exported_by": "sonicscribe_tpu"}, f)


def make_test_tokenizer(dst: str, vocab_size: int, cfg: GlmAsrConfig) -> None:
    """Build a real HF fast tokenizer directory: byte-level BPE trained
    in-process, with special tokens pinned to GlmAsrConfig's id layout
    (pad=0, bos=1, eos=2, ...). Loadable via AutoTokenizer without
    trust_remote_code."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

    specials = ["<pad>", "<bos>", "<eos>", "<user>", "<assistant>",
                "<audio_start>", "<audio_end>"]
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size,
        special_tokens=specials,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    corpus = [
        "please transcribe this audio into text",
        "pay special attention to these important terms",
        "the quick brown fox jumps over the lazy dog 0123456789",
    ]
    tok.train_from_iterator(corpus, trainer)
    os.makedirs(dst, exist_ok=True)
    tok.save(os.path.join(dst, "tokenizer.json"))
    with open(os.path.join(dst, "tokenizer_config.json"), "w") as f:
        json.dump(
            {
                "tokenizer_class": "PreTrainedTokenizerFast",
                "pad_token": "<pad>",
                "bos_token": "<bos>",
                "eos_token": "<eos>",
                "model_max_length": 1 << 20,
            },
            f,
        )
    with open(os.path.join(dst, "special_tokens_map.json"), "w") as f:
        json.dump(
            {"pad_token": "<pad>", "bos_token": "<bos>", "eos_token": "<eos>"}, f
        )
