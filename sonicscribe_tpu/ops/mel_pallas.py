"""Fused Pallas log-mel kernel: windowed DFT -> power -> mel -> log in one
VMEM pass (north star: BASELINE.json "fused JAX/Pallas kernels").

The XLA reference path (sonicscribe_tpu/audio/mel.py) materializes the
[2*n_bins, T] complex spectrum in HBM between the DFT conv and the mel
matmul. Here the whole spectral chain runs per 128-frame block in VMEM:

- frame extraction (overlapping 400-sample windows, hop 160) happens in XLA
  as `conv_general_dilated_patches` — Mosaic's DMA/layout rules require
  128-aligned slices, which a 160-sample hop cannot give inside the kernel,
  and im2col is pure data movement XLA already does well;
- the kernel then runs, per [128, 512] frame block (lane-padded from 400):
  two packed DFT matmuls ([128,512] @ [512,512], real|imag packed), the
  power spectrum on the VPU, the mel matmul ([128,256] @ [256,n_mels]), and
  log10 — the spectrum never leaves VMEM;
- the Whisper dynamic-range clamp needs the GLOBAL max, so the (tiny) final
  normalize runs as XLA elementwise over the [T, n_mels] output.

Numerics match the XLA path and (transitively) HF's WhisperFeatureExtractor
to <= 1e-3 (tests/test_mel_pallas.py; verified compiled on a real v5e chip).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sonicscribe_tpu.audio.mel import MelConfig, _dft_conv_weights, mel_filter_bank

BLOCK = 128  # frames per grid step
_IN_LANES = 512  # n_fft=400 padded to the 128-lane grid
_SPEC_LANES = 512  # 2 * 256: real|imag each padded from 201 bins


@lru_cache(maxsize=4)
def _packed_weights(cfg: MelConfig):
    """-> (dft [512, 512] f32, fb [256, n_mels] f32), lane-padded."""
    w = _dft_conv_weights(cfg)  # [2*bins, n_fft] windowed cos/-sin rows
    n_bins = cfg.n_freq_bins
    dft = np.zeros((_IN_LANES, _SPEC_LANES), np.float32)
    dft[: cfg.n_fft, :n_bins] = w[:n_bins].T  # real -> lanes [0, 256)
    dft[: cfg.n_fft, 256 : 256 + n_bins] = w[n_bins:].T  # imag
    fb = np.zeros((256, cfg.n_mels), np.float32)
    fb[:n_bins] = mel_filter_bank(cfg)
    return dft, fb


def _mel_kernel(frames_ref, dft_ref, fb_ref, out_ref):
    spec = jnp.dot(frames_ref[:], dft_ref[:], preferred_element_type=jnp.float32)
    power = spec[:, :256] ** 2 + spec[:, 256:] ** 2  # [BLOCK, 256]
    mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log10(jnp.maximum(mel, 1e-10))


@partial(jax.jit, static_argnames=("cfg", "n_frames", "interpret"))
def _mel_blocks(audio_padded, cfg: MelConfig, n_frames: int, interpret: bool):
    dft, fb = _packed_weights(cfg)
    # im2col in XLA: [1, 1, N] -> [1, n_fft, T] patches
    patches = jax.lax.conv_general_dilated_patches(
        audio_padded.reshape(1, 1, -1),
        filter_shape=(cfg.n_fft,),
        window_strides=(cfg.hop_length,),
        padding="VALID",
    )[0]  # [n_fft, T_full]
    frames = patches[:, :n_frames].T  # [T, n_fft]
    frames = jnp.pad(frames, ((0, 0), (0, _IN_LANES - cfg.n_fft)))

    n_blocks = n_frames // BLOCK
    return pl.pallas_call(
        _mel_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLOCK, _IN_LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK, cfg.n_mels), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_frames, cfg.n_mels), jnp.float32),
        interpret=interpret,
    )(frames, jnp.asarray(dft), jnp.asarray(fb))


def log_mel_pallas(
    audio: jnp.ndarray,
    cfg: MelConfig = MelConfig(),
    pad_to_frames: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in for audio.mel.log_mel_spectrogram (same numerics, tested to
    1e-3): mono float32 [N] -> [T, n_mels]. `pad_to_frames` must be a
    multiple of 128 (the engine's buckets are)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    audio = jnp.asarray(audio, jnp.float32)
    half = cfg.n_fft // 2
    n_true = int(audio.shape[0]) // cfg.hop_length
    n_frames = pad_to_frames or max(BLOCK, ((n_true + BLOCK - 1) // BLOCK) * BLOCK)
    if n_frames % BLOCK:
        raise ValueError(f"pad_to_frames must be a multiple of {BLOCK}")

    if audio.shape[0] < half + 1:
        audio = jnp.pad(audio, (0, half + 1 - int(audio.shape[0])))
    padded = jnp.pad(audio, (half, half), mode="reflect")
    need = n_frames * cfg.hop_length + cfg.n_fft
    if padded.shape[0] < need:
        padded = jnp.pad(padded, (0, need - int(padded.shape[0])))

    log_spec = _mel_blocks(padded, cfg, n_frames, interpret)

    # Whisper global normalization over the TRUE frames only
    valid = jax.lax.broadcasted_iota(jnp.int32, log_spec.shape, 0) < n_true
    gmax = jnp.max(jnp.where(valid, log_spec, -jnp.inf))
    log_spec = jnp.maximum(log_spec, gmax - cfg.dynamic_range_db_factor)
    log_spec = (log_spec + 4.0) / 4.0
    # padding frames are zeroed (parity with the XLA path's pad_to_frames)
    return jnp.where(valid, log_spec, 0.0)
