"""Checkpoint tooling: native npz format + HF -> JAX conversion.

The reference's "checkpoint" is the HF model directory loaded with
`trust_remote_code` (reference: backend/config.py:13, asr.py:66-82). The TPU
build's checkpoint is a converted parameter tree (SURVEY.md §5.4):

- native format: `<dir>/sonicscribe_config.json` + `<dir>/params.npz`
  (flat /-joined keys). Fast, hermetic, no torch needed to load.
- conversion: `convert_hf_checkpoint(src, dst)` reads an HF GLM-ASR directory
  (safetensors preferred, torch .bin fallback) and maps weights through
  `HF_NAME_MAP`. The mapping table is data, not code — when the real
  checkpoint's module names differ, extend the table, not the model.

CLI:
    python -m sonicscribe_tpu.tools.convert_weights <hf_dir> <out_dir> [--int8]
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable

import numpy as np

from sonicscribe_tpu.models.config import (
    AudioEncoderConfig,
    DecoderConfig,
    GlmAsrConfig,
)

NATIVE_CONFIG = "sonicscribe_config.json"
NATIVE_PARAMS = "params.npz"


# ---------------------------------------------------------------------
# native npz checkpoint
# ---------------------------------------------------------------------


def _flatten(tree: dict, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        elif isinstance(v, list):
            for i, item in enumerate(v):
                out.update(_flatten(item, f"{key}/{i}"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: dict[str, np.ndarray]) -> dict:
    root: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    # convert integer-keyed dicts back to lists
    def fix(node):
        if isinstance(node, dict):
            if node and all(k.isdigit() for k in node):
                return [fix(node[k]) for k in sorted(node, key=int)]
            return {k: fix(v) for k, v in node.items()}
        return node

    return fix(root)


def save_checkpoint(params: dict, cfg: GlmAsrConfig, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    flat = {k: np.asarray(v) for k, v in _flatten(params).items()}
    # bf16 has no numpy dtype; store as uint16 view + dtype tag
    dtypes = {}
    store = {}
    for k, v in flat.items():
        if v.dtype.name == "bfloat16":
            store[k] = v.view(np.uint16) if v.dtype.itemsize == 2 else v
            dtypes[k] = "bfloat16"
        else:
            store[k] = v
            dtypes[k] = v.dtype.name
    np.savez(os.path.join(path, NATIVE_PARAMS), **store)
    with open(os.path.join(path, NATIVE_CONFIG), "w") as f:
        json.dump(
            {
                "model_config": dataclasses.asdict(cfg),
                "dtypes": dtypes,
                "format_version": 1,
            },
            f,
            indent=2,
        )


def _cfg_from_dict(d: dict) -> GlmAsrConfig:
    enc = AudioEncoderConfig(**d.pop("encoder"))
    dec = DecoderConfig(**d.pop("decoder"))
    return GlmAsrConfig(encoder=enc, decoder=dec, **d)


def save_checkpoint_orbax(params: dict, cfg: GlmAsrConfig, path: str) -> None:
    """Orbax alternative to the npz format (sharded, async-capable — the
    ecosystem-standard choice for multi-host deployments)."""
    import orbax.checkpoint as ocp

    os.makedirs(path, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(os.path.abspath(path), "params_orbax"), params)
    with open(os.path.join(path, NATIVE_CONFIG), "w") as f:
        json.dump(
            {"model_config": dataclasses.asdict(cfg), "format": "orbax",
             "format_version": 1},
            f,
            indent=2,
        )


def _load_orbax(path: str):
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.join(os.path.abspath(path), "params_orbax"))


def load_checkpoint(path: str):
    """-> (cfg, params, tokenizer). Accepts native npz or orbax dirs; HF dirs
    must be converted first (clear error otherwise)."""
    import jax.numpy as jnp

    cfg_path = os.path.join(path, NATIVE_CONFIG)
    if not os.path.exists(cfg_path):
        if any(
            os.path.exists(os.path.join(path, f))
            for f in ("model.safetensors", "pytorch_model.bin", "config.json")
        ):
            raise ValueError(
                f"'{path}' looks like an HF checkpoint; convert it first: "
                f"python -m sonicscribe_tpu.tools.convert_weights {path} <out_dir>"
            )
        raise FileNotFoundError(f"no {NATIVE_CONFIG} in '{path}'")

    with open(cfg_path) as f:
        meta = json.load(f)
    cfg = _cfg_from_dict(meta["model_config"])
    dtypes = meta.get("dtypes", {})

    if meta.get("format") == "orbax":
        params = _load_orbax(path)
    else:
        with np.load(os.path.join(path, NATIVE_PARAMS)) as z:
            flat = {}
            for k in z.files:
                v = z[k]
                if dtypes.get(k) == "bfloat16":
                    flat[k] = jnp.asarray(v.view(np.uint16)).view(jnp.bfloat16)
                else:
                    flat[k] = jnp.asarray(v)
        params = _unflatten(flat)

    tok_dir = os.path.join(path, "tokenizer")
    if os.path.isdir(tok_dir):
        from sonicscribe_tpu.models.tokenizer import HFTokenizer

        tokenizer = HFTokenizer(tok_dir)
    else:
        from sonicscribe_tpu.models.tokenizer import ByteTokenizer

        tokenizer = ByteTokenizer(cfg)
    return cfg, params, tokenizer


# ---------------------------------------------------------------------
# HF -> native conversion
# ---------------------------------------------------------------------

# Maps our parameter-tree path (template) to an HF state-dict name (template).
# {L} expands per decoder/encoder layer; weights needing transpose are listed
# in TRANSPOSED (HF Linear stores [out, in]; we store [in, out]).
HF_NAME_MAP: dict[str, str] = {
    "encoder/conv1/w": "audio_encoder.conv1.weight",
    "encoder/conv1/b": "audio_encoder.conv1.bias",
    "encoder/conv2/w": "audio_encoder.conv2.weight",
    "encoder/conv2/b": "audio_encoder.conv2.bias",
    "encoder/layers/ln1_scale@{L}": "audio_encoder.layers.{L}.self_attn_layer_norm.weight",
    "encoder/layers/ln1_bias@{L}": "audio_encoder.layers.{L}.self_attn_layer_norm.bias",
    "encoder/layers/q_w@{L}": "audio_encoder.layers.{L}.self_attn.q_proj.weight",
    "encoder/layers/q_b@{L}": "audio_encoder.layers.{L}.self_attn.q_proj.bias",
    "encoder/layers/k_w@{L}": "audio_encoder.layers.{L}.self_attn.k_proj.weight",
    "encoder/layers/v_w@{L}": "audio_encoder.layers.{L}.self_attn.v_proj.weight",
    "encoder/layers/v_b@{L}": "audio_encoder.layers.{L}.self_attn.v_proj.bias",
    "encoder/layers/o_w@{L}": "audio_encoder.layers.{L}.self_attn.out_proj.weight",
    "encoder/layers/o_b@{L}": "audio_encoder.layers.{L}.self_attn.out_proj.bias",
    "encoder/layers/ln2_scale@{L}": "audio_encoder.layers.{L}.final_layer_norm.weight",
    "encoder/layers/ln2_bias@{L}": "audio_encoder.layers.{L}.final_layer_norm.bias",
    "encoder/layers/fc1_w@{L}": "audio_encoder.layers.{L}.fc1.weight",
    "encoder/layers/fc1_b@{L}": "audio_encoder.layers.{L}.fc1.bias",
    "encoder/layers/fc2_w@{L}": "audio_encoder.layers.{L}.fc2.weight",
    "encoder/layers/fc2_b@{L}": "audio_encoder.layers.{L}.fc2.bias",
    "encoder/ln_post_scale": "audio_encoder.layer_norm.weight",
    "encoder/ln_post_bias": "audio_encoder.layer_norm.bias",
    "adapter/fc1/w": "audio_proj.linear_1.weight",
    "adapter/fc1/b": "audio_proj.linear_1.bias",
    "adapter/fc2/w": "audio_proj.linear_2.weight",
    "adapter/fc2/b": "audio_proj.linear_2.bias",
    "decoder/embed": "model.embed_tokens.weight",
    "decoder/layers/ln1_scale@{L}": "model.layers.{L}.input_layernorm.weight",
    "decoder/layers/qkv_w@{L}": "model.layers.{L}.self_attn.qkv_proj.weight",
    "decoder/layers/qkv_b@{L}": "model.layers.{L}.self_attn.qkv_proj.bias",
    "decoder/layers/o_w@{L}": "model.layers.{L}.self_attn.o_proj.weight",
    "decoder/layers/ln2_scale@{L}": "model.layers.{L}.post_attention_layernorm.weight",
    "decoder/layers/gate_up_w@{L}": "model.layers.{L}.mlp.gate_up_proj.weight",
    "decoder/layers/down_w@{L}": "model.layers.{L}.mlp.down_proj.weight",
    "decoder/ln_f_scale": "model.norm.weight",
}

TRANSPOSED_SUFFIXES = (
    "q_w", "k_w", "v_w", "o_w", "fc1_w", "fc2_w",
    "qkv_w", "gate_up_w", "down_w", "fc1/w", "fc2/w",
)


def _load_hf_state_dict(src: str) -> dict[str, np.ndarray]:
    """Load all tensors from an HF checkpoint dir (safetensors or torch)."""
    tensors: dict[str, np.ndarray] = {}
    st_files = sorted(
        f for f in os.listdir(src) if f.endswith(".safetensors")
    )
    if st_files:
        from safetensors.numpy import load_file  # type: ignore

        for f in st_files:
            tensors.update(load_file(os.path.join(src, f)))
        return tensors
    bin_files = sorted(f for f in os.listdir(src) if f.endswith(".bin"))
    if bin_files:
        import torch

        for f in bin_files:
            sd = torch.load(os.path.join(src, f), map_location="cpu", weights_only=True)
            for k, v in sd.items():
                tensors[k] = v.float().numpy()
        return tensors
    raise FileNotFoundError(f"no safetensors/bin weights in '{src}'")


def convert_hf_checkpoint(
    src: str,
    dst: str,
    cfg: GlmAsrConfig,
    name_map: dict[str, str] | None = None,
    int8: bool = False,
    progress: Callable[[str], None] = print,
) -> None:
    """Convert an HF GLM-ASR checkpoint into the native format."""
    import jax.numpy as jnp

    sd = _load_hf_state_dict(src)
    name_map = name_map or HF_NAME_MAP
    flat: dict[str, np.ndarray] = {}

    def fetch(hf_name: str) -> np.ndarray:
        if hf_name not in sd:
            raise KeyError(
                f"HF tensor '{hf_name}' not found; adjust HF_NAME_MAP "
                f"(available sample: {list(sd)[:8]})"
            )
        return np.asarray(sd[hf_name])

    for ours, theirs in name_map.items():
        if "@{L}" in ours:
            base = ours.split("@")[0]
            n_layers = (
                cfg.encoder.n_layers if base.startswith("encoder") else cfg.decoder.n_layers
            )
            stack = []
            for layer in range(n_layers):
                v = fetch(theirs.replace("{L}", str(layer)))
                if base.endswith(TRANSPOSED_SUFFIXES):
                    v = v.T
                stack.append(v)
            flat[base] = np.stack(stack)
        else:
            v = fetch(theirs)
            if ours.endswith(TRANSPOSED_SUFFIXES):
                v = v.T
            if ours.startswith("encoder/conv"):  # HF conv1d: [out, in, k] -> [k, in, out]
                v = np.transpose(v, (2, 1, 0)) if v.ndim == 3 else v
            flat[ours] = v

    params = _unflatten({k: jnp.asarray(v, jnp.bfloat16) for k, v in flat.items()})
    if int8:
        from sonicscribe_tpu.ops.quant import quantize_params_int8

        params = quantize_params_int8(params)
    save_checkpoint(params, cfg, dst)

    # carry the HF tokenizer along so load_checkpoint serves HFTokenizer
    # (reference's processor/tokenizer live in the same checkpoint dir)
    import shutil

    tok_files = [
        f for f in (
            "tokenizer.json", "tokenizer_config.json",
            "special_tokens_map.json", "vocab.json", "merges.txt",
            "tokenizer.model",
        )
        if os.path.exists(os.path.join(src, f))
    ]
    if tok_files:
        tok_dst = os.path.join(dst, "tokenizer")
        os.makedirs(tok_dst, exist_ok=True)
        for f in tok_files:
            shutil.copy2(os.path.join(src, f), os.path.join(tok_dst, f))
    progress(
        f"converted {len(flat)} tensors -> {dst}"
        + (f" (+ tokenizer: {len(tok_files)} files)" if tok_files else "")
    )


def main(argv=None):
    import argparse

    from sonicscribe_tpu.models.config import nano

    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--int8", action="store_true")
    args = ap.parse_args(argv)
    convert_hf_checkpoint(args.src, args.dst, nano(), int8=args.int8)


if __name__ == "__main__":
    main()
