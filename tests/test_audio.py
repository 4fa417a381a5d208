"""Unit tests: WAV codec, resampler vs scipy golden, mel vs HF Whisper golden.

Tolerance targets from SURVEY.md §4 / BASELINE.md: mel parity <= 1e-3 vs the
PyTorch/HF reference feature extractor.
"""

import numpy as np
import pytest

from sonicscribe_tpu.audio import wav
from sonicscribe_tpu.audio.mel import MelConfig, log_mel_spectrogram, mel_filter_bank
from sonicscribe_tpu.audio.resample import resample


def _tone(sr: int, seconds: float = 0.5, f: float = 440.0) -> np.ndarray:
    t = np.arange(int(sr * seconds)) / sr
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


class TestWav:
    def test_roundtrip_16bit(self):
        x = _tone(16000)
        data = wav.write_wav(x, 16000)
        y, sr = wav.read_wav(data)
        assert sr == 16000
        assert y.shape == x.shape
        # write scales by 32767, read by 1/32768 -> ~2 LSB asymmetry max
        np.testing.assert_allclose(y, x, atol=2.0 / 32768)

    def test_multichannel_takes_first(self):
        # build a stereo wav by interleaving manually
        import struct

        left = (_tone(8000, 0.1) * 32767).astype("<i2")
        right = np.zeros_like(left)
        inter = np.empty(left.size * 2, dtype="<i2")
        inter[0::2], inter[1::2] = left, right
        payload = inter.tobytes()
        hdr = (
            b"RIFF"
            + struct.pack("<I", 36 + len(payload))
            + b"WAVE"
            + b"fmt "
            + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 8000 * 4, 4, 16)
            + b"data"
            + struct.pack("<I", len(payload))
        )
        y, sr = wav.read_wav(hdr + payload)
        assert sr == 8000
        np.testing.assert_allclose(y, left.astype(np.float32) / 32768.0, atol=1e-6)

    def test_pcm_bytes_roundtrip(self):
        x = _tone(16000, 0.064)
        b = wav.float_to_pcm16_bytes(x)
        assert len(b) == 2048  # the 64 ms wire chunk
        y = wav.pcm16_bytes_to_float(b)
        np.testing.assert_allclose(y, x, atol=2.0 / 32768)

    def test_reject_garbage(self):
        with pytest.raises(wav.WavError):
            wav.read_wav(b"not a wav file at all")


class TestResample:
    @pytest.mark.parametrize("orig_sr", [8000, 22050, 24000, 44100, 48000])
    def test_matches_scipy(self, orig_sr):
        from scipy.signal import resample_poly
        import math

        rng = np.random.default_rng(0)
        x = rng.standard_normal(orig_sr // 2).astype(np.float32)  # 0.5 s
        g = math.gcd(16000, orig_sr)
        golden = resample_poly(x.astype(np.float64), 16000 // g, orig_sr // g)
        ours = np.asarray(resample(x, orig_sr, 16000))
        assert ours.shape == golden.shape
        np.testing.assert_allclose(ours, golden, atol=2e-4)

    def test_identity(self):
        x = _tone(16000)
        y = np.asarray(resample(x, 16000, 16000))
        np.testing.assert_array_equal(x, y)


class TestMel:
    def test_filterbank_matches_transformers(self):
        from transformers.audio_utils import mel_filter_bank as hf_fb

        cfg = MelConfig()
        golden = hf_fb(
            num_frequency_bins=cfg.n_freq_bins,
            num_mel_filters=cfg.n_mels,
            min_frequency=cfg.fmin,
            max_frequency=cfg.fmax,
            sampling_rate=cfg.sampling_rate,
            norm="slaney",
            mel_scale="slaney",
        )
        ours = mel_filter_bank(cfg)
        np.testing.assert_allclose(ours, golden, atol=1e-6)

    @pytest.mark.parametrize("n_mels", [80, 128])
    def test_matches_whisper_feature_extractor(self, n_mels):
        """North-star gate: <= 1e-3 vs the HF Whisper feature extractor
        (the same class the reference's GLM processor wraps, SURVEY.md §2.4)."""
        from transformers import WhisperFeatureExtractor

        cfg = MelConfig(n_mels=n_mels)
        fe = WhisperFeatureExtractor(feature_size=n_mels, sampling_rate=16000)
        rng = np.random.default_rng(1)
        # 1.0 s of speech-ish noise + tone mix
        t = np.arange(16000) / 16000.0
        audio = (
            0.3 * np.sin(2 * np.pi * 220 * t)
            + 0.1 * np.sin(2 * np.pi * 1330 * t)
            + 0.05 * rng.standard_normal(16000)
        ).astype(np.float32)

        golden = fe(
            audio, sampling_rate=16000, padding="do_not_pad", return_tensors="np"
        )["input_features"][0]  # [n_mels, T]
        ours = np.asarray(log_mel_spectrogram(audio, cfg)).T  # -> [n_mels, T]
        assert ours.shape == golden.shape
        assert np.max(np.abs(ours - golden)) <= 1e-3

    def test_pad_to_frames(self):
        audio = _tone(16000, 0.5)
        out = np.asarray(log_mel_spectrogram(audio, MelConfig(), pad_to_frames=128))
        assert out.shape == (128, 128)
        n = 8000 // 160
        assert np.all(out[n:] == 0)
