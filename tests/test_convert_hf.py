"""HF conversion path, end-to-end (round-1 verdict gap #2).

The environment cannot fetch the real GLM-ASR-Nano-2512 checkpoint
(reference loads it at backend/asr.py:66-146), so a SYNTHETIC HF checkpoint
— safetensors with exactly the `HF_NAME_MAP` tensor names and HF layouts
(Linear [out,in], conv1d [out,in,k], per-layer tensors) plus a real
HF-loadable fast tokenizer — is generated from a random-init parameter tree
and driven through the full path:

    export_hf_checkpoint -> convert_hf_checkpoint -> load_checkpoint
    -> HFTokenizer -> greedy decode TOKEN-EXACT vs the torch twin.

This exercises every transpose/layout rule in the converter, the npz+bf16
loader, the tokenizer carry-over, and the HFTokenizer adapter.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonicscribe_tpu.audio.mel import MelConfig, log_mel_spectrogram
from sonicscribe_tpu.models import tiny
from sonicscribe_tpu.models.glm_asr import (
    embed_tokens,
    encode_audio,
    greedy_generate,
    init_params,
)
from sonicscribe_tpu.models.tokenizer import HFTokenizer, build_prompt
from sonicscribe_tpu.tools.convert_weights import (
    HF_NAME_MAP,
    _flatten,
    convert_hf_checkpoint,
    load_checkpoint,
)
from sonicscribe_tpu.tools.export_hf import (
    export_hf_checkpoint,
    make_test_tokenizer,
)
from sonicscribe_tpu.tools.torch_reference import transcribe_torch


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    cfg = tiny()
    params = init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    hf_dir = str(tmp_path_factory.mktemp("hf_ckpt"))
    export_hf_checkpoint(params, cfg, hf_dir)
    make_test_tokenizer(hf_dir, vocab_size=cfg.decoder.vocab_size, cfg=cfg)
    out = str(tmp_path_factory.mktemp("native_ckpt"))
    convert_hf_checkpoint(hf_dir, out, cfg, progress=lambda _m: None)
    return cfg, params, hf_dir, out


def _mel(seconds=0.5, seed=2):
    rng = np.random.default_rng(seed)
    sr = 16000
    t = np.arange(int(sr * seconds)) / sr
    audio = (
        0.3 * np.sin(2 * np.pi * 350 * t) + 0.05 * rng.standard_normal(len(t))
    ).astype(np.float32)
    return np.asarray(log_mel_spectrogram(audio, MelConfig()))


def test_synthetic_checkpoint_has_every_mapped_name(converted):
    from safetensors.numpy import load_file

    cfg, _params, hf_dir, _out = converted
    sd = load_file(os.path.join(hf_dir, "model.safetensors"))
    for ours, theirs in HF_NAME_MAP.items():
        if "@{L}" in ours:
            n = (
                cfg.encoder.n_layers
                if ours.startswith("encoder")
                else cfg.decoder.n_layers
            )
            for layer in range(n):
                assert theirs.replace("{L}", str(layer)) in sd, theirs
        else:
            assert theirs in sd, theirs


def test_convert_roundtrips_every_tensor_exactly(converted):
    """Every transpose/conv-layout rule must exactly invert the HF layout:
    converted values == original values (bf16-cast, the converter's dtype)."""
    cfg, params, _hf_dir, out = converted
    cfg2, params2, _tok = load_checkpoint(out)
    assert cfg2 == cfg  # config roundtrips through sonicscribe_config.json
    flat_orig = _flatten(jax.tree.map(lambda x: np.asarray(x), params))
    flat_conv = _flatten(jax.tree.map(lambda x: np.asarray(x.astype(jnp.float32)), params2))
    assert set(flat_orig) == set(flat_conv)
    for k, v in flat_orig.items():
        want = np.asarray(jnp.asarray(v, jnp.bfloat16).astype(jnp.float32))
        np.testing.assert_array_equal(flat_conv[k], want, err_msg=k)


def test_hf_tokenizer_loaded_and_special_ids_match(converted):
    cfg, _params, _hf_dir, out = converted
    _cfg2, _params2, tok = load_checkpoint(out)
    assert isinstance(tok, HFTokenizer)
    assert tok.eos_id == cfg.eos_id
    assert tok.pad_id == cfg.pad_id
    ids = tok.encode("transcribe this")
    assert ids and all(0 <= i < cfg.decoder.vocab_size for i in ids)
    # reversible enough for transcripts
    assert "transcribe" in tok.decode(ids)


def test_converted_checkpoint_token_exact_vs_torch(converted):
    """The full gate: converted params + HF tokenizer produce greedy tokens
    token-exact vs the independent torch implementation consuming the same
    converted tree — including a hotword-bearing prompt."""
    cfg, _orig, _hf_dir, out = converted
    cfg2, params_bf16, tok = load_checkpoint(out)
    params = jax.tree.map(lambda x: x.astype(jnp.float32), params_bf16)
    params_np = jax.tree.map(np.asarray, params)
    mel = _mel()
    T = mel.shape[0]
    N = 12

    for hotwords in (None, ["sonic", "tpu"]):
        prompt = build_prompt(tok, cfg2, hotwords=hotwords)
        torch_tokens = transcribe_torch(
            params_np, cfg2, mel, prompt.prefix_ids, prompt.suffix_ids, N
        )

        audio_embeds, n_tok = encode_audio(
            params, cfg2, jnp.asarray(mel)[None], jnp.array([T])
        )
        k = int(n_tok[0])
        embeds = jnp.concatenate(
            [
                embed_tokens(params, jnp.asarray(prompt.prefix_ids))[None],
                audio_embeds[:, :k],
                embed_tokens(params, jnp.asarray(prompt.suffix_ids))[None],
            ],
            axis=1,
        )
        length = jnp.array([embeds.shape[1]])
        jax_tokens = np.asarray(greedy_generate(params, cfg2, embeds, length, N))[0]
        jax_list = []
        for t in jax_tokens:
            jax_list.append(int(t))
            if t == cfg2.eos_id:
                break
            if t == cfg2.pad_id:
                jax_list.pop()
                break
        assert jax_list == torch_tokens, (
            f"hotwords={hotwords}: JAX {jax_list} != torch {torch_tokens}"
        )


def test_untied_nobias_variant_roundtrips(tmp_path):
    """Architectures the derivation path claims to support must actually
    convert (r4 review finding): tie_word_embeddings=false carries a real
    lm_head, attention_bias=false has no qkv bias tensors. Exercises the
    per-architecture name-map specialization in BOTH directions
    (export_hf_checkpoint and convert_hf_checkpoint) plus cfg derivation
    from config.json (cfg=None)."""
    import dataclasses

    from sonicscribe_tpu.tools.export_hf import (
        export_hf_checkpoint,
        make_test_tokenizer,
    )

    base = tiny()
    cfg = dataclasses.replace(
        base,
        decoder=dataclasses.replace(
            base.decoder, tie_embeddings=False, qkv_bias=False
        ),
    )
    params = init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    hf_dir = str(tmp_path / "hf")
    export_hf_checkpoint(params, cfg, hf_dir)
    make_test_tokenizer(hf_dir, vocab_size=cfg.decoder.vocab_size, cfg=cfg)

    from safetensors.numpy import load_file

    sd = load_file(os.path.join(hf_dir, "model.safetensors"))
    assert "lm_head.weight" in sd
    assert not any("qkv_proj.bias" in n for n in sd)

    out = str(tmp_path / "native")
    # cfg=None: derive the variant architecture from config.json
    convert_hf_checkpoint(hf_dir, out, cfg=None, progress=lambda _m: None)
    cfg2, params2, _tok = load_checkpoint(out)
    assert cfg2.decoder.tie_embeddings is False
    assert cfg2.decoder.qkv_bias is False

    flat_orig = _flatten(jax.tree.map(np.asarray, params))
    flat_conv = _flatten(
        jax.tree.map(lambda x: np.asarray(x.astype(jnp.float32)), params2)
    )
    assert set(flat_orig) == set(flat_conv)
    for k, v in flat_orig.items():
        want = np.asarray(jnp.asarray(v, jnp.bfloat16).astype(jnp.float32))
        if k == "decoder/layers/qkv_b":
            # no-bias checkpoints synthesize the (unused) zeros leaf
            want = np.zeros_like(want)
        np.testing.assert_array_equal(flat_conv[k], want, err_msg=k)
