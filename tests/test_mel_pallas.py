"""Fused Pallas mel kernel vs the XLA reference path (interpret mode on CPU;
the same code compiles to Mosaic on TPU — exercised by bench/serving)."""

import numpy as np
import pytest

from sonicscribe_tpu.audio.mel import MelConfig, log_mel_spectrogram
from sonicscribe_tpu.ops.mel_pallas import BLOCK, log_mel_pallas


def _audio(seconds, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    return (
        0.3 * np.sin(2 * np.pi * 440 * t)
        + 0.1 * np.sin(2 * np.pi * 1337 * t)
        + 0.02 * rng.standard_normal(len(t))
    ).astype(np.float32)


@pytest.mark.parametrize("seconds", [1.28, 2.0])
def test_matches_xla_path(seconds):
    audio = _audio(seconds)
    cfg = MelConfig()
    n_true = len(audio) // cfg.hop_length
    pad = ((n_true + BLOCK - 1) // BLOCK) * BLOCK
    golden = np.asarray(log_mel_spectrogram(audio, cfg, pad_to_frames=pad))
    ours = np.asarray(log_mel_pallas(audio, cfg, pad_to_frames=pad))
    assert ours.shape == golden.shape
    assert np.max(np.abs(ours - golden)) <= 1e-3


def test_matches_whisper_golden():
    """Transitively: pallas == XLA == HF WhisperFeatureExtractor <= 1e-3."""
    from transformers import WhisperFeatureExtractor

    cfg = MelConfig()
    audio = _audio(1.0, seed=3)
    fe = WhisperFeatureExtractor(feature_size=cfg.n_mels, sampling_rate=16000)
    golden = fe(audio, sampling_rate=16000, padding="do_not_pad",
                return_tensors="np")["input_features"][0]  # [n_mels, T]
    n_true = golden.shape[1]
    ours = np.asarray(log_mel_pallas(audio, cfg, pad_to_frames=BLOCK))[:n_true].T
    assert np.max(np.abs(ours - golden)) <= 1e-3


def test_bad_pad_rejected():
    with pytest.raises(ValueError):
        log_mel_pallas(_audio(0.5), MelConfig(), pad_to_frames=100)
