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
    "qkv_w", "gate_up_w", "down_w", "fc1/w", "fc2/w", "lm_head",
)

# HF tensors that are EXPECTED to have no native mapping: derived buffers
# (rotary tables, position ids), Whisper-style stored sinusoids (we compute
# them), and lm_head when embeddings are tied. Anything else unconsumed is
# reported loudly by convert_hf_checkpoint.
IGNORABLE_HF_PATTERNS = (
    ".rotary_emb.", ".inv_freq", "position_ids", "embed_positions",
    "masked_spec_embed",
)


def expected_shapes(cfg: GlmAsrConfig) -> dict[str, tuple[int, ...]]:
    """Flat native-key -> shape table (mirrors models/glm_asr.init_params
    without materializing weights) so the converter can validate every
    mapped tensor's post-transform shape and break LOUDLY on a layout or
    name-mapping mistake (VERDICT r4 readiness: the real checkpoint's
    module names/dims may differ from the recovered architecture)."""
    enc, dec = cfg.encoder, cfg.decoder
    d, dd = enc.d_model, dec.d_model
    qkv_out = (dec.n_heads + 2 * dec.n_kv_heads) * dec.head_dim
    shapes: dict[str, tuple[int, ...]] = {
        "encoder/conv1/w": (3, enc.n_mels, d),
        "encoder/conv1/b": (d,),
        "encoder/conv2/w": (3, d, d),
        "encoder/conv2/b": (d,),
        "encoder/layers/ln1_scale": (enc.n_layers, d),
        "encoder/layers/ln1_bias": (enc.n_layers, d),
        "encoder/layers/q_w": (enc.n_layers, d, d),
        "encoder/layers/q_b": (enc.n_layers, d),
        "encoder/layers/k_w": (enc.n_layers, d, d),
        "encoder/layers/v_w": (enc.n_layers, d, d),
        "encoder/layers/v_b": (enc.n_layers, d),
        "encoder/layers/o_w": (enc.n_layers, d, d),
        "encoder/layers/o_b": (enc.n_layers, d),
        "encoder/layers/ln2_scale": (enc.n_layers, d),
        "encoder/layers/ln2_bias": (enc.n_layers, d),
        "encoder/layers/fc1_w": (enc.n_layers, d, enc.ffn_mult * d),
        "encoder/layers/fc1_b": (enc.n_layers, enc.ffn_mult * d),
        "encoder/layers/fc2_w": (enc.n_layers, enc.ffn_mult * d, d),
        "encoder/layers/fc2_b": (enc.n_layers, d),
        "encoder/ln_post_scale": (d,),
        "encoder/ln_post_bias": (d,),
        "adapter/fc1/w": (cfg.adapter_stack * d, cfg.adapter_hidden),
        "adapter/fc1/b": (cfg.adapter_hidden,),
        "adapter/fc2/w": (cfg.adapter_hidden, dd),
        "adapter/fc2/b": (dd,),
        "decoder/embed": (dec.vocab_size, dd),
        "decoder/layers/ln1_scale": (dec.n_layers, dd),
        "decoder/layers/qkv_w": (dec.n_layers, dd, qkv_out),
        "decoder/layers/qkv_b": (dec.n_layers, qkv_out),
        "decoder/layers/o_w": (dec.n_layers, dec.n_heads * dec.head_dim, dd),
        "decoder/layers/ln2_scale": (dec.n_layers, dd),
        "decoder/layers/gate_up_w": (dec.n_layers, dd, 2 * dec.ffn_hidden),
        "decoder/layers/down_w": (dec.n_layers, dec.ffn_hidden, dd),
        "decoder/ln_f_scale": (dd,),
    }
    if not dec.tie_embeddings:
        shapes["decoder/lm_head"] = (dd, dec.vocab_size)
    return shapes


def _first(d: dict, *keys, default=None):
    for k in keys:
        if k in d and d[k] is not None:
            return d[k]
    return default


def cfg_from_hf_config(src: str) -> GlmAsrConfig:
    """Derive GlmAsrConfig from an HF checkpoint directory's config.json
    (+ generation_config.json special-token ids, + weight shapes for the
    adapter dims). Mirrors the layout the reference's trust_remote_code
    model publishes (ref backend/asr.py:66-82): nested `audio_config` /
    `text_config` (Whisper-style encoder keys, GLM-style decoder keys),
    with tolerant flat-key fallbacks. Raises with the full missing-field
    list — day-one conversion against the real checkpoint must fail
    loudly, never guess silently."""
    cfg_path = os.path.join(src, "config.json")
    if not os.path.exists(cfg_path):
        raise FileNotFoundError(
            f"no config.json in '{src}' — pass an explicit GlmAsrConfig "
            f"(--preset) or point at a complete HF checkpoint dir"
        )
    with open(cfg_path) as f:
        hf = json.load(f)
    audio = hf.get("audio_config") or hf.get("audio_encoder_config") or hf
    text = hf.get("text_config") or hf.get("llm_config") or hf

    missing: list[str] = []

    def need(d: dict, *keys, scope: str):
        v = _first(d, *keys)
        if v is None:
            missing.append(f"{scope}: one of {keys}")
        return v

    enc_kw = dict(
        n_mels=need(audio, "num_mel_bins", "n_mels", scope="audio"),
        d_model=need(audio, "d_model", "hidden_size", scope="audio"),
        n_heads=need(audio, "encoder_attention_heads", "num_attention_heads",
                     "n_heads", scope="audio"),
        n_layers=need(audio, "encoder_layers", "num_hidden_layers",
                      "n_layers", scope="audio"),
    )
    max_src = _first(audio, "max_source_positions")
    dec_kw = dict(
        vocab_size=need(text, "vocab_size", scope="text"),
        d_model=need(text, "hidden_size", "d_model", scope="text"),
        n_layers=need(text, "num_hidden_layers", "n_layers", scope="text"),
        n_heads=need(text, "num_attention_heads", "n_heads", scope="text"),
        n_kv_heads=need(text, "num_key_value_heads", "n_kv_heads",
                        scope="text"),
        head_dim=_first(text, "head_dim"),
        ffn_hidden=need(text, "intermediate_size", "ffn_hidden", scope="text"),
    )
    if missing:
        raise ValueError(
            "config.json is missing required architecture fields:\n  - "
            + "\n  - ".join(missing)
            + f"\n(top-level keys present: {sorted(hf)[:20]})"
        )
    if dec_kw["head_dim"] is None:
        dec_kw["head_dim"] = dec_kw["d_model"] // dec_kw["n_heads"]
    if max_src is not None:
        # HF Whisper stores post-conv positions; our max_frames is pre-conv
        enc_kw["max_frames"] = int(max_src) * 2
    ffn_mult = _first(audio, "encoder_ffn_dim")
    if ffn_mult is not None:
        enc_kw["ffn_mult"] = int(ffn_mult) // int(enc_kw["d_model"])

    dec = DecoderConfig(
        **{k: int(v) for k, v in dec_kw.items()},
        rope_theta=float(_first(text, "rope_theta", default=10000.0)),
        partial_rotary_factor=float(
            _first(text, "partial_rotary_factor", default=0.5)
        ),
        rms_eps=float(_first(text, "rms_norm_eps", default=1e-5)),
        qkv_bias=bool(_first(text, "attention_bias", "qkv_bias", default=True)),
        tie_embeddings=bool(
            _first(text, "tie_word_embeddings", default=hf.get(
                "tie_word_embeddings", True))
        ),
    )
    enc = AudioEncoderConfig(**{k: int(v) for k, v in enc_kw.items()})

    # adapter dims are not in config.json conventions — read them off the
    # audio_proj weights themselves (shape [hidden, stack*d] in HF layout)
    adapter_stack, adapter_hidden = 4, 4096
    try:
        sd_shapes = _peek_hf_shapes(src, ("audio_proj.linear_1.weight",))
        w = sd_shapes.get("audio_proj.linear_1.weight")
        if w is None:
            # weights ARE present but the adapter tensor isn't: naming
            # drift in the real checkpoint — never default silently
            raise ValueError(
                "weights present but 'audio_proj.linear_1.weight' not "
                "found — adapter naming drift vs the reference's "
                "audio_proj module (ref backend/asr.py:169-210); extend "
                "HF_NAME_MAP/cfg_from_hf_config"
            )
        adapter_hidden = int(w[0])
        if int(w[1]) % enc.d_model:
            raise ValueError(
                f"audio_proj.linear_1.weight in-dim {w[1]} is not a "
                f"multiple of encoder d_model {enc.d_model} — the "
                f"adapter is not frame-stacking; extend the model"
            )
        adapter_stack = int(w[1]) // enc.d_model
    except FileNotFoundError:
        pass  # config-only derivation (no weights present)

    specials: dict[str, int] = {}
    gen_path = os.path.join(src, "generation_config.json")
    if os.path.exists(gen_path):
        with open(gen_path) as f:
            gen = json.load(f)
        for ours, theirs in (("eos_id", "eos_token_id"),
                             ("pad_id", "pad_token_id"),
                             ("bos_id", "bos_token_id")):
            v = gen.get(theirs)
            if isinstance(v, list):
                v = v[0]
            if v is not None:
                specials[ours] = int(v)
    for ours, theirs in (
        ("audio_start_id", "audio_start_token_id"),
        ("audio_end_id", "audio_end_token_id"),
        ("user_id", "user_token_id"),
        ("assistant_id", "assistant_token_id"),
        ("eos_id", "eos_token_id"),
        ("pad_id", "pad_token_id"),
        ("bos_id", "bos_token_id"),
    ):
        v = hf.get(theirs)
        if v is not None and ours not in specials:
            specials[ours] = int(v)

    return GlmAsrConfig(
        encoder=enc, decoder=dec,
        adapter_stack=adapter_stack, adapter_hidden=adapter_hidden,
        **specials,
    )


def _peek_hf_shapes(
    src: str, names: tuple[str, ...]
) -> dict[str, tuple[int, ...]]:
    """Read just the shapes of `names` from the checkpoint's weight files
    (safetensors header only — no tensor data loaded)."""
    out: dict[str, tuple[int, ...]] = {}
    st_files = sorted(f for f in os.listdir(src) if f.endswith(".safetensors"))
    if st_files:
        from safetensors import safe_open  # type: ignore

        for f in st_files:
            with safe_open(os.path.join(src, f), framework="numpy") as sf:
                for n in names:
                    if n in sf.keys():
                        out[n] = tuple(sf.get_slice(n).get_shape())
        return out
    bin_files = sorted(f for f in os.listdir(src) if f.endswith(".bin"))
    if bin_files:
        import torch

        for f in bin_files:
            sd = torch.load(
                os.path.join(src, f), map_location="cpu", weights_only=True
            )
            for n in names:
                if n in sd:
                    out[n] = tuple(sd[n].shape)
        return out
    raise FileNotFoundError(f"no safetensors/bin weights in '{src}'")


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
    cfg: GlmAsrConfig | None = None,
    name_map: dict[str, str] | None = None,
    int8: bool = False,
    progress: Callable[[str], None] = print,
) -> GlmAsrConfig:
    """Convert an HF GLM-ASR checkpoint into the native format.

    With cfg=None (the day-one path against the real checkpoint) the
    architecture is derived from the checkpoint's own config.json
    (`cfg_from_hf_config`); an explicit cfg is CROSS-VALIDATED against
    config.json when one exists. Every mapped tensor's shape is validated
    against the model's expected-shape table, and HF tensors the map never
    consumed are reported — name-mapping drift against the real checkpoint
    breaks loudly, not silently (ref backend/asr.py:66-82)."""
    import jax.numpy as jnp

    derived: GlmAsrConfig | None = None
    if os.path.exists(os.path.join(src, "config.json")):
        try:
            derived = cfg_from_hf_config(src)
        except (ValueError, FileNotFoundError) as e:
            if cfg is None:
                raise
            progress(f"note: config.json not derivable ({e}); using given cfg")
    if cfg is None:
        if derived is None:
            raise FileNotFoundError(
                f"no derivable config.json in '{src}' and no explicit cfg"
            )
        cfg = derived
    elif derived is not None and derived != cfg:
        diffs = []
        for scope, a, b in (
            ("encoder", cfg.encoder, derived.encoder),
            ("decoder", cfg.decoder, derived.decoder),
        ):
            for f in dataclasses.fields(a):
                va, vb = getattr(a, f.name), getattr(b, f.name)
                if va != vb:
                    diffs.append(f"{scope}.{f.name}: given={va} config.json={vb}")
        for f in ("adapter_stack", "adapter_hidden", "pad_id", "bos_id",
                  "eos_id", "audio_start_id", "audio_end_id", "user_id",
                  "assistant_id"):
            va, vb = getattr(cfg, f), getattr(derived, f)
            if va != vb:
                diffs.append(f"{f}: given={va} config.json={vb}")
        raise ValueError(
            "explicit cfg disagrees with the checkpoint's config.json:\n  - "
            + "\n  - ".join(diffs)
        )

    sd = _load_hf_state_dict(src)
    if name_map is None:
        # specialize the static table to THIS architecture: a no-bias
        # checkpoint (attention_bias=false) has no qkv_proj.bias tensors to
        # fetch (the native zeros leaf is synthesized below), and an untied
        # checkpoint (tie_word_embeddings=false) carries a real lm_head the
        # static map deliberately omits for the tied default
        name_map = dict(HF_NAME_MAP)
        if not cfg.decoder.qkv_bias:
            name_map.pop("decoder/layers/qkv_b@{L}")
        if not cfg.decoder.tie_embeddings:
            name_map["decoder/lm_head"] = "lm_head.weight"
    flat: dict[str, np.ndarray] = {}
    consumed: set[str] = set()

    def fetch(hf_name: str) -> np.ndarray:
        if hf_name not in sd:
            raise KeyError(
                f"HF tensor '{hf_name}' not found; adjust HF_NAME_MAP "
                f"(available sample: {list(sd)[:8]})"
            )
        consumed.add(hf_name)
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

    if "decoder/layers/qkv_b" not in flat:
        # no-bias checkpoint: the forward skips the add (cfg.qkv_bias is
        # False) but init_params always carries the leaf — synthesize zeros
        dec = cfg.decoder
        qkv_out = (dec.n_heads + 2 * dec.n_kv_heads) * dec.head_dim
        flat["decoder/layers/qkv_b"] = np.zeros(
            (dec.n_layers, qkv_out), np.float32
        )

    # LOUD validation: every mapped tensor's post-transform shape must match
    # the model's expected-shape table; collect ALL mismatches in one report
    want = expected_shapes(cfg)
    shape_errors = [
        f"{k}: converted {tuple(flat[k].shape)} != expected {want[k]}"
        for k in flat
        if k in want and tuple(flat[k].shape) != want[k]
    ]
    shape_errors += [f"{k}: missing from conversion" for k in want if k not in flat]
    # symmetric check: a converted leaf the model does NOT expect (e.g. a
    # typoed custom name_map entry) would otherwise pass unvalidated and
    # silently produce an extra tree leaf
    shape_errors += [
        f"{k}: converted but not expected by the model (typoed name_map "
        f"entry?)" for k in flat if k not in want
    ]
    if shape_errors:
        raise ValueError(
            "converted tensors do not match the model's expected shapes "
            "(name-mapping or layout drift vs the real checkpoint):\n  - "
            + "\n  - ".join(shape_errors)
        )
    leftovers = [
        n for n in sd
        if n not in consumed
        and not any(p in n for p in IGNORABLE_HF_PATTERNS)
        and not (cfg.decoder.tie_embeddings and n == "lm_head.weight")
    ]
    if leftovers:
        progress(
            f"WARNING: {len(leftovers)} HF tensors were NOT consumed by "
            f"HF_NAME_MAP (first 12): {leftovers[:12]} — extend the map if "
            f"these carry weights the model needs"
        )

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
    return cfg


def main(argv=None):
    import argparse

    from sonicscribe_tpu.models.config import nano, tiny

    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument(
        "--preset", choices=("derive", "nano", "tiny"), default="derive",
        help="'derive' (default) reads the architecture from the "
             "checkpoint's config.json and fails loudly if it can't; "
             "nano/tiny force a preset (cross-validated vs config.json)",
    )
    args = ap.parse_args(argv)
    cfg = {"derive": None, "nano": nano(), "tiny": tiny()}[args.preset]
    convert_hf_checkpoint(args.src, args.dst, cfg, int8=args.int8)


if __name__ == "__main__":
    main()
