"""Cross-framework parity: the JAX model vs an independent PyTorch
implementation consuming the SAME parameter tree (SURVEY.md §4 level-2,
north-star "token-exact greedy transcripts").

Both sides run f32. Any architecture-level disagreement (rope convention,
GQA grouping, adapter stacking, mask semantics) shows up here as a token or
hidden-state mismatch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sonicscribe_tpu.audio.mel import MelConfig, log_mel_spectrogram
from sonicscribe_tpu.models import tiny
from sonicscribe_tpu.models.glm_asr import (
    encode_audio,
    embed_tokens,
    greedy_generate,
    init_params,
)
from sonicscribe_tpu.models.tokenizer import ByteTokenizer, build_prompt
from sonicscribe_tpu.tools.torch_reference import (
    encode_audio_torch,
    transcribe_torch,
)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny()
    params_jax = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    params_np = jax.tree.map(np.asarray, params_jax)
    return cfg, params_jax, params_np


def _mel(seconds=0.6, seed=0):
    rng = np.random.default_rng(seed)
    sr = 16000
    t = np.arange(int(sr * seconds)) / sr
    audio = (0.3 * np.sin(2 * np.pi * 350 * t) + 0.05 * rng.standard_normal(len(t))).astype(
        np.float32
    )
    return np.asarray(log_mel_spectrogram(audio, MelConfig()))


class TestCrossFrameworkParity:
    def test_encoder_hidden_states_match(self, setup):
        cfg, params_jax, params_np = setup
        mel = _mel()
        T = mel.shape[0]
        ours, n_tok = encode_audio(
            params_jax, cfg, jnp.asarray(mel)[None], jnp.array([T])
        )
        theirs = encode_audio_torch(params_np, cfg, mel).numpy()
        k = int(n_tok[0])
        got = np.asarray(ours[0, :k])
        np.testing.assert_allclose(got, theirs[:k], rtol=2e-4, atol=2e-4)

    def test_greedy_tokens_exact(self, setup):
        """The headline gate: identical greedy token streams, JAX KV-cache
        incremental path vs torch full-context re-forward path."""
        cfg, params_jax, params_np = setup
        tok = ByteTokenizer(cfg)
        mel = _mel(0.5, seed=2)
        T = mel.shape[0]
        prompt = build_prompt(tok, cfg)
        N = 16

        # torch side
        torch_tokens = transcribe_torch(
            params_np, cfg, mel, prompt.prefix_ids, prompt.suffix_ids, N
        )

        # JAX side: same prompt assembly, KV-cache greedy
        audio_embeds, n_tok = encode_audio(
            params_jax, cfg, jnp.asarray(mel)[None], jnp.array([T])
        )
        k = int(n_tok[0])
        embeds = jnp.concatenate(
            [
                embed_tokens(params_jax, jnp.asarray(prompt.prefix_ids))[None],
                audio_embeds[:, :k],
                embed_tokens(params_jax, jnp.asarray(prompt.suffix_ids))[None],
            ],
            axis=1,
        )
        length = jnp.array([embeds.shape[1]])
        jax_tokens = np.asarray(
            greedy_generate(params_jax, cfg, embeds, length, N)
        )[0]
        # trim pads after eos on the jax side
        jax_list = []
        for t in jax_tokens:
            jax_list.append(int(t))
            if t == cfg.eos_id:
                break
            if t == cfg.pad_id:
                jax_list.pop()
                break
        assert jax_list == torch_tokens, (
            f"JAX {jax_list} != torch {torch_tokens}"
        )

    def test_hotword_prompt_token_exact_both_sides(self, setup):
        """Hotword-bearing prompts (long suffix at the traced offset) must be
        token-exact JAX-vs-torch, same as the plain prompt — covers suffix
        placement via dynamic_update_slice with a long suffix."""
        cfg, params_jax, params_np = setup
        tok = ByteTokenizer(cfg)
        mel = _mel(0.4, seed=5)
        T = mel.shape[0]
        N = 8
        hotwords = ["jax", "tpu", "systolic array", "mel spectrogram"]
        prompt = build_prompt(tok, cfg, hotwords=hotwords)
        assert len(prompt.suffix_ids) > 80  # genuinely long suffix
        torch_tokens = transcribe_torch(
            params_np, cfg, mel, prompt.prefix_ids, prompt.suffix_ids, N
        )

        audio_embeds, n_tok = encode_audio(
            params_jax, cfg, jnp.asarray(mel)[None], jnp.array([T])
        )
        k = int(n_tok[0])
        embeds = jnp.concatenate(
            [
                embed_tokens(params_jax, jnp.asarray(prompt.prefix_ids))[None],
                audio_embeds[:, :k],
                embed_tokens(params_jax, jnp.asarray(prompt.suffix_ids))[None],
            ],
            axis=1,
        )
        jax_tokens = np.asarray(
            greedy_generate(
                params_jax, cfg, embeds, jnp.array([embeds.shape[1]]), N
            )
        )[0]
        jax_list = []
        for t in jax_tokens:
            jax_list.append(int(t))
            if t == cfg.eos_id:
                break
            if t == cfg.pad_id:
                jax_list.pop()
                break
        assert jax_list == torch_tokens, f"JAX {jax_list} != torch {torch_tokens}"
