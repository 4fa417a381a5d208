"""Whisper-compatible log-mel spectrogram frontend, TPU-native.

Replaces the Whisper-style feature extractor hidden inside the reference's HF
processor (reference: backend/asr.py:66,393 — `processor.feature_extractor`
with a `sampling_rate` attribute). Numerics match
``transformers.WhisperFeatureExtractor`` within 1e-3 (tested in
tests/test_audio.py): periodic Hann window, reflect center-padding, matmul-form
real DFT, Slaney-scale/Slaney-norm mel filter bank, log10 with 8-dB dynamic
range clamp and (x+4)/4 scaling.

TPU mapping: framing+window+DFT is expressed as ONE strided convolution
(2*n_bins filters of length n_fft, stride hop) — XLA lowers this to an
im2col+matmul on the MXU — followed by a [n_bins, n_mels] matmul and fused
elementwise log. A fused Pallas kernel for the same transform lives in
sonicscribe_tpu/ops/mel_pallas.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class MelConfig:
    sampling_rate: int = 16000
    n_fft: int = 400
    hop_length: int = 160
    n_mels: int = 128
    fmin: float = 0.0
    fmax: float = 8000.0
    dynamic_range_db_factor: float = 8.0  # max - 8.0 clamp, Whisper convention

    @property
    def n_freq_bins(self) -> int:
        return self.n_fft // 2 + 1


# ---- Slaney mel scale (matches transformers.audio_utils mel_scale="slaney") ----

_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = 15.0
_LOGSTEP = 27.0 / np.log(6.4)


def hertz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    freq = np.asarray(freq, dtype=np.float64)
    mels = 3.0 * freq / 200.0
    log_region = freq >= _MIN_LOG_HZ
    mels = np.where(
        log_region,
        _MIN_LOG_MEL + np.log(np.maximum(freq, _MIN_LOG_HZ) / _MIN_LOG_HZ) * _LOGSTEP,
        mels,
    )
    return mels


def mel_to_hertz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    freq = 200.0 * mels / 3.0
    log_region = mels >= _MIN_LOG_MEL
    freq = np.where(
        log_region, _MIN_LOG_HZ * np.exp((mels - _MIN_LOG_MEL) / _LOGSTEP), freq
    )
    return freq


@lru_cache(maxsize=8)
def mel_filter_bank(cfg: MelConfig) -> np.ndarray:
    """Triangular Slaney-normalized filter bank, shape [n_freq_bins, n_mels]."""
    fft_freqs = np.linspace(0.0, cfg.sampling_rate / 2.0, cfg.n_freq_bins)
    mel_min = hertz_to_mel_slaney(np.array(cfg.fmin))
    mel_max = hertz_to_mel_slaney(np.array(cfg.fmax))
    mel_pts = np.linspace(mel_min, mel_max, cfg.n_mels + 2)
    hz_pts = mel_to_hertz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    slopes = hz_pts[np.newaxis, :] - fft_freqs[:, np.newaxis]
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    # Slaney area normalization
    enorm = 2.0 / (hz_pts[2 : cfg.n_mels + 2] - hz_pts[: cfg.n_mels])
    fb *= enorm[np.newaxis, :]
    return fb.astype(np.float32)


@lru_cache(maxsize=8)
def _dft_conv_weights(cfg: MelConfig) -> np.ndarray:
    """Windowed real-DFT basis as conv filters, shape [2*n_bins, n_fft].

    Row b (b < n_bins) is  hann * cos(2*pi*b*n/n_fft)   (real part)
    Row n_bins + b is     -hann * sin(2*pi*b*n/n_fft)   (imag part)
    """
    n_fft, n_bins = cfg.n_fft, cfg.n_freq_bins
    window = np.hanning(n_fft + 1)[:-1]  # periodic Hann, torch.hann_window parity
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_bins, dtype=np.float64)[:, None]
    ang = 2.0 * np.pi * k * n[None, :] / n_fft
    basis = np.concatenate([np.cos(ang), -np.sin(ang)], axis=0)
    return (basis * window[None, :]).astype(np.float32)


def frame_count(num_samples: int, cfg: MelConfig = MelConfig()) -> int:
    """Output frame count for a given sample count (HF drops the final frame)."""
    return num_samples // cfg.hop_length


@partial(jax.jit, static_argnames=("cfg", "pad_to_frames"))
def log_mel_spectrogram(
    audio: jnp.ndarray,
    cfg: MelConfig = MelConfig(),
    pad_to_frames: int | None = None,
) -> jnp.ndarray:
    """Mono float32 audio [N] -> log-mel features [T, n_mels], T = N // hop.

    If `pad_to_frames` is given, output is zero-padded on the time axis to that
    static length (for XLA shape bucketing) — padding frames are all zeros.
    """
    audio = jnp.asarray(audio, jnp.float32)
    half = cfg.n_fft // 2
    # Audio shorter than one frame (or too short for reflect padding) is
    # zero-padded up to the minimum; produces >= 1 output frame.
    min_len = max(cfg.hop_length, half + 1)
    if audio.shape[0] < min_len:
        audio = jnp.pad(audio, (0, min_len - int(audio.shape[0])))
    padded = jnp.pad(audio, (half, half), mode="reflect")
    n_frames = int(audio.shape[0]) // cfg.hop_length

    # One strided conv = framing + window + real DFT, on the MXU.
    weights = jnp.asarray(_dft_conv_weights(cfg))  # [2*n_bins, n_fft]
    out = jax.lax.conv_general_dilated(
        padded.reshape(1, 1, -1),
        weights.reshape(weights.shape[0], 1, cfg.n_fft),
        window_strides=(cfg.hop_length,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )[0]  # [2*n_bins, T_full]
    out = out[:, :n_frames]
    n_bins = cfg.n_freq_bins
    power = out[:n_bins] ** 2 + out[n_bins:] ** 2  # [n_bins, T]

    fb = jnp.asarray(mel_filter_bank(cfg))  # [n_bins, n_mels]
    mel = jnp.einsum("bt,bm->tm", power, fb, preferred_element_type=jnp.float32)

    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - cfg.dynamic_range_db_factor)
    log_spec = (log_spec + 4.0) / 4.0

    if pad_to_frames is not None and pad_to_frames > n_frames:
        log_spec = jnp.pad(log_spec, ((0, pad_to_frames - n_frames), (0, 0)))
    return log_spec


def log_mel_batch(
    audio: jnp.ndarray,  # [B, N] f32, rows zero-padded beyond their true length
    n_samples: jnp.ndarray,  # [B] i32 true sample counts
    cfg: MelConfig = MelConfig(),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched log-mel with PER-ROW true-length masking and per-row dynamic
    range normalization. -> (mel [B, N//hop, n_mels] zero-padded, n_frames [B]).

    Used inside the continuous batcher's prefill-from-ring program so many
    sessions' windows share one MXU pass; numerics identical to
    log_mel_spectrogram row-wise (tested).
    """
    B, N = audio.shape
    half = cfg.n_fft // 2
    padded = jnp.pad(audio, ((0, 0), (half, half)), mode="reflect")
    T = N // cfg.hop_length

    weights = jnp.asarray(_dft_conv_weights(cfg))  # [2*bins, n_fft]
    out = jax.lax.conv_general_dilated(
        padded[:, None, :],
        weights.reshape(weights.shape[0], 1, cfg.n_fft),
        window_strides=(cfg.hop_length,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )[:, :, :T]  # [B, 2*bins, T]
    n_bins = cfg.n_freq_bins
    power = out[:, :n_bins] ** 2 + out[:, n_bins:] ** 2

    fb = jnp.asarray(mel_filter_bank(cfg))
    mel = jnp.einsum("bft,fm->btm", power, fb, preferred_element_type=jnp.float32)

    n_frames = (n_samples // cfg.hop_length).astype(jnp.int32)
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (B, T), 1) < n_frames[:, None]
    )[..., None]

    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    row_max = jnp.max(
        jnp.where(valid, log_spec, -jnp.inf), axis=(1, 2), keepdims=True
    )
    log_spec = jnp.maximum(log_spec, row_max - cfg.dynamic_range_db_factor)
    log_spec = (log_spec + 4.0) / 4.0
    return jnp.where(valid, log_spec, 0.0), jnp.maximum(n_frames, 1)
