"""Single-request transcription engine: audio -> text, one XLA program.

Capability parity with the reference's ``ASRModel.transcribe``
(reference: backend/asr.py:335-488) minus its deliberate defects
(SURVEY.md §7 "quirks to fix"): no temp-WAV round trip (asr.py:272-277) —
audio stays an array end-to-end; optional peak normalization (kept ON by
default for parity with asr.py:263-267).

Static-shape strategy (the TPU core of the design):
- mel frames are padded to one of a fixed set of buckets;
- the prompt is assembled ON DEVICE into a static-size buffer: prefix tokens,
  then the (padded) audio embeddings, then the instruction suffix written at a
  *traced* offset with `dynamic_update_slice` — so one compiled program serves
  every audio length within a bucket;
- decode budget variants (interim 15 / final 200 / file 256) each get one
  compiled greedy loop.

Hotwords: prompt injection for parity (reference asr.py:303-333) PLUS an
additive logit-bias boost on the hotword token ids (the principled mechanism,
BASELINE.json north star).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sonicscribe_tpu.audio.mel import MelConfig, frame_count, log_mel_spectrogram
from sonicscribe_tpu.audio.resample import resample
from sonicscribe_tpu.models.config import GlmAsrConfig
from sonicscribe_tpu.models.glm_asr import (
    Params,
    embed_tokens,
    encode_audio,
    greedy_generate,
)
from sonicscribe_tpu.models.tokenizer import DEFAULT_INSTRUCTION, build_prompt

# fixed host-side prompt-layout constants (token counts, not samples)
MAX_SUFFIX_TOKENS = 160  # instruction + hotword suffix, padded to this


def assemble_prompt(
    params: Params,
    cfg: GlmAsrConfig,
    mel: jnp.ndarray,  # [1, T_bucket, n_mels]
    n_frames: jnp.ndarray,  # [] int32
    prefix_ids: jnp.ndarray,  # [P]
    suffix_ids: jnp.ndarray,  # [MAX_SUFFIX_TOKENS] pad-filled
    suffix_len: jnp.ndarray,  # [] int32
):
    """mel -> (prompt embeddings buffer [1, P+A_max+S, D], total_len [1]).

    The audio slot is written at a static offset; the instruction suffix is
    written at a TRACED offset (after the true audio-token count) with
    dynamic_update_slice — one compiled program per mel bucket serves every
    audio length within it.
    """
    audio_embeds, n_tok = encode_audio(params, cfg, mel, n_frames[None])
    n_tok = n_tok[0]
    A_max = audio_embeds.shape[1]
    P = prefix_ids.shape[0]
    S = suffix_ids.shape[0]
    D = audio_embeds.shape[-1]

    buf = jnp.zeros((1, P + A_max + S, D), audio_embeds.dtype)
    buf = buf.at[0, :P].set(embed_tokens(params, prefix_ids))
    buf = jax.lax.dynamic_update_slice(buf, audio_embeds, (0, P, 0))
    suffix_embeds = embed_tokens(params, suffix_ids)[None]
    buf = jax.lax.dynamic_update_slice(buf, suffix_embeds, (0, P + n_tok, 0))
    total_len = (P + n_tok + suffix_len)[None]
    return buf, total_len


@partial(jax.jit, static_argnames=("cfg", "max_new_tokens"))
def _transcribe_program(
    params: Params,
    cfg: GlmAsrConfig,
    mel: jnp.ndarray,  # [1, T_bucket, n_mels]
    n_frames: jnp.ndarray,  # [] int32
    prefix_ids: jnp.ndarray,  # [P]
    suffix_ids: jnp.ndarray,  # [MAX_SUFFIX_TOKENS] pad-filled
    suffix_len: jnp.ndarray,  # [] int32
    logit_bias: jnp.ndarray,  # [V] f32
    max_new_tokens: int,
) -> jnp.ndarray:
    """mel -> greedy tokens [1, max_new_tokens]. One compiled program per
    (mel bucket, decode budget)."""
    buf, total_len = assemble_prompt(
        params, cfg, mel, n_frames, prefix_ids, suffix_ids, suffix_len
    )
    return greedy_generate(
        params, cfg, buf, total_len, max_new_tokens, logit_bias=logit_bias
    )


@dataclass
class TranscribeResult:
    text: str
    tokens: np.ndarray
    audio_duration_s: float
    timings: dict = field(default_factory=dict)


class Transcriber:
    """Owns params + compiled programs; thread-safe for read-only params."""

    def __init__(
        self,
        cfg: GlmAsrConfig,
        params: Params,
        tokenizer,
        mel_cfg: MelConfig | None = None,
        prefill_buckets: Sequence[int] = (128, 256, 512, 1024, 2048, 3072),
        peak_normalize: bool = True,
        hotword_bias_strength: float = 3.0,
    ):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.mel_cfg = mel_cfg or MelConfig(n_mels=cfg.encoder.n_mels)
        self.buckets = sorted(prefill_buckets)
        self.peak_normalize = peak_normalize
        self.hotword_bias_strength = hotword_bias_strength
        self._zero_bias = jnp.zeros((cfg.decoder.vocab_size,), jnp.float32)
        self._router = None  # built lazily: params may be re-sharded later

    def _exec_router(self):
        """Serialized-executable router for the (bucket, budget) grid —
        same restart-warmup store the batcher uses (engine/exec_store.py).
        Built on first dispatch, NOT in __init__: BatchedEngine(mesh=...)
        replaces self.params with a mesh-replicated copy after
        construction, and multi-device params disable the store (the
        fingerprint does not cover shardings)."""
        if self._router is None:
            import os

            from sonicscribe_tpu.engine.exec_store import (
                ExecRouter,
                ExecStore,
                params_signature,
            )

            store = None
            env = os.environ.get("SONIC_EXEC_CACHE", "")
            leaf = jax.tree.leaves(self.params)[0]
            single_device = (
                not hasattr(leaf, "devices") or len(leaf.devices()) == 1
            )
            if env != "0" and single_device:
                try:
                    store = ExecStore(
                        env
                        or os.path.join(
                            os.path.expanduser("~"),
                            ".cache",
                            "sonicscribe_exec",
                        ),
                        (
                            "transcriber",
                            repr(self.cfg),
                            params_signature(self.params),
                            repr(self.mel_cfg),
                            tuple(self.buckets),
                        ),
                    )
                except Exception:  # pragma: no cover - defensive
                    store = None
            self._router = ExecRouter(store)
        return self._router

    # ---- host-side helpers ----

    def _pick_bucket(self, frames: int) -> int:
        for b in self.buckets:
            if frames <= b:
                return b
        return self.buckets[-1]

    def _hotword_token_ids(self, hotwords: Optional[list[str]]) -> list[int]:
        """Token ids to boost for hotword logit biasing (deduped)."""
        if not hotwords or self.hotword_bias_strength == 0.0:
            return []
        ids: set[int] = set()
        for w in hotwords[:10]:
            ids.update(self.tokenizer.encode(str(w).strip().lower()))
        return sorted(ids)

    def _hotword_logit_bias(self, hotwords: Optional[list[str]]) -> jnp.ndarray:
        if not hotwords or self.hotword_bias_strength == 0.0:
            return self._zero_bias
        bias = np.zeros((self.cfg.decoder.vocab_size,), np.float32)
        for w in hotwords[:10]:
            for tid in self.tokenizer.encode(str(w).strip().lower()):
                bias[tid] = self.hotword_bias_strength
        return jnp.asarray(bias)

    def prepare_audio(self, audio: np.ndarray, sample_rate: int) -> np.ndarray:
        """Resample to the model rate + optional peak normalization
        (reference asr.py:255-267 semantics)."""
        target = self.mel_cfg.sampling_rate
        x = resample(np.asarray(audio, np.float32), sample_rate, target)
        if self.peak_normalize:
            peak = jnp.max(jnp.abs(x))
            x = jnp.where(peak > 1e-8, x / jnp.maximum(peak, 1e-8), x)
        return x

    # ---- main entry ----

    def transcribe(
        self,
        audio: np.ndarray,
        sample_rate: int,
        max_new_tokens: int = 256,
        hotwords: Optional[list[str]] = None,
        instruction: str = DEFAULT_INSTRUCTION,
    ) -> TranscribeResult:
        t0 = time.perf_counter()
        x = self.prepare_audio(audio, sample_rate)
        duration = float(x.shape[0]) / self.mel_cfg.sampling_rate

        frames = max(1, frame_count(int(x.shape[0]), self.mel_cfg))
        bucket = self._pick_bucket(frames)
        if frames > bucket:  # clamp over-long audio to the largest bucket
            frames = bucket
            x = x[: bucket * self.mel_cfg.hop_length]
        mel = log_mel_spectrogram(x, self.mel_cfg, pad_to_frames=bucket)[None]
        t_mel = time.perf_counter()

        prompt = build_prompt(self.tokenizer, self.cfg, instruction, hotwords)
        suffix = np.full((MAX_SUFFIX_TOKENS,), self.cfg.pad_id, np.int32)
        s = prompt.suffix_ids[:MAX_SUFFIX_TOKENS]
        suffix[: len(s)] = s

        args = (
            self.params,
            self.cfg,
            mel.astype(jnp.bfloat16)
            if jax.tree.leaves(self.params)[0].dtype == jnp.bfloat16
            else mel,
            jnp.asarray(frames, jnp.int32),
            jnp.asarray(prompt.prefix_ids),
            jnp.asarray(suffix),
            jnp.asarray(len(s), jnp.int32),
            self._hotword_logit_bias(hotwords),
            max_new_tokens,
        )
        toks = self._exec_router().run(
            ("transcribe", bucket, max_new_tokens,
             int(args[4].shape[0])),
            _transcribe_program,
            args,
            args[:1] + args[2:8],
        )
        toks = np.asarray(jax.block_until_ready(toks))[0]
        t_gen = time.perf_counter()

        # cut at EOS / pads
        out = []
        for t in toks:
            if t == self.cfg.eos_id or t == self.cfg.pad_id:
                break
            out.append(int(t))
        text = self.tokenizer.decode(out)

        return TranscribeResult(
            text=text,
            tokens=np.asarray(out, np.int32),
            audio_duration_s=duration,
            timings={
                "mel_s": t_mel - t0,
                "generate_s": t_gen - t_mel,
                "total_s": t_gen - t0,
                "rtf": (t_gen - t0) / max(duration, 1e-6),
                "mel_bucket": bucket,
            },
        )

    def warmup(self, buckets: Optional[Sequence[int]] = None,
               budgets: Sequence[int] = (256,)) -> None:
        """Pre-compile the (bucket, budget) program grid."""
        sr = self.mel_cfg.sampling_rate
        for b in buckets or self.buckets:
            n = b * self.mel_cfg.hop_length
            for budget in budgets:
                self.transcribe(np.zeros(n, np.float32), sr, max_new_tokens=budget)
