"""VAD tests: energy VAD behavior, silero-arch shapes/state, segmentation
semantics (driven by synthetic probability sequences), and the dynamic
threshold gate (exact reference B5 semantics, SURVEY.md §2.1)."""

import numpy as np
import pytest

from sonicscribe_tpu.vad import (
    EnergyVad,
    SileroVad,
    VadGate,
    VadGateConfig,
    get_speech_timestamps,
)
from sonicscribe_tpu.vad.model import WINDOW_SAMPLES, window_probs
from sonicscribe_tpu.vad.segments import timestamps_from_probs


def _speech_like(seconds, sr=16000, seed=0):
    """Modulated multi-tone burst, speech-band energy."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    carrier = sum(np.sin(2 * np.pi * f * t) for f in (220, 560, 1300, 2400))
    envelope = 0.5 * (1 + np.sin(2 * np.pi * 4 * t))
    return (0.2 * carrier * envelope + 0.002 * rng.standard_normal(len(t))).astype(
        np.float32
    )


def _silence(seconds, sr=16000, seed=1):
    rng = np.random.default_rng(seed)
    return (0.0005 * rng.standard_normal(int(sr * seconds))).astype(np.float32)


class TestEnergyVad:
    def test_discriminates_speech_from_silence(self):
        vad = EnergyVad()
        audio = np.concatenate([_silence(1.0), _speech_like(1.0), _silence(1.0)])
        probs = window_probs(vad, audio)
        n = len(probs) // 3
        assert probs[:n].mean() < 0.3
        assert probs[n : 2 * n].mean() > 0.7
        assert probs[2 * n :].mean() < 0.4

    def test_batched_state_independent(self):
        """Streams in a batch must not leak state into each other."""
        import jax.numpy as jnp

        vad = EnergyVad()
        speech = _speech_like(0.032)[:WINDOW_SAMPLES]
        quiet = _silence(0.032)[:WINDOW_SAMPLES]
        state = vad.init_state(2)
        for _ in range(5):
            probs, state = vad.forward(
                None, jnp.stack([speech, quiet]), state
            )
        assert float(probs[0]) > 0.7
        assert float(probs[1]) < 0.3


class TestSileroArch:
    def test_shapes_and_state(self):
        import jax.numpy as jnp

        vad = SileroVad()
        state = vad.init_state(3)
        w = jnp.zeros((3, WINDOW_SAMPLES))
        probs, state2 = vad.forward(vad.params, w, state)
        assert probs.shape == (3,)
        assert np.all((np.asarray(probs) >= 0) & (np.asarray(probs) <= 1))
        # context carried forward
        assert state2["ctx"].shape == state["ctx"].shape
        assert state2["h"].shape == (3, vad.cfg.lstm_hidden)


class TestSegmentation:
    def test_basic_segment(self):
        # 2 s of probs at 31.25/s: silence, speech, silence
        probs = np.concatenate([np.zeros(31), np.ones(31), np.zeros(62)])
        n_samples = len(probs) * WINDOW_SAMPLES
        segs = timestamps_from_probs(probs, n_samples, threshold=0.5)
        assert len(segs) == 1
        assert abs(segs[0].start - 31 * WINDOW_SAMPLES) <= WINDOW_SAMPLES + 480
        assert segs[0].duration_s > 0.9

    def test_min_speech_filters_blips(self):
        probs = np.zeros(120)
        probs[10:13] = 1.0  # 96 ms blip < 300 ms min_speech
        segs = timestamps_from_probs(probs, len(probs) * WINDOW_SAMPLES)
        assert segs == []

    def test_min_silence_bridges_gaps(self):
        probs = np.zeros(200)
        probs[10:40] = 1.0
        probs[45:75] = 1.0  # 160 ms gap < 1000 ms min_silence
        segs = timestamps_from_probs(probs, len(probs) * WINDOW_SAMPLES)
        assert len(segs) == 1

    def test_long_silence_splits(self):
        probs = np.zeros(300)
        probs[10:40] = 1.0
        probs[150:180] = 1.0  # 3.5 s gap > min_silence
        segs = timestamps_from_probs(probs, len(probs) * WINDOW_SAMPLES)
        assert len(segs) == 2

    def test_max_speech_duration_splits(self):
        probs = np.ones(400)  # 6.5 s continuous speech
        segs = timestamps_from_probs(
            probs, len(probs) * WINDOW_SAMPLES, max_speech_duration_s=3.0
        )
        assert len(segs) >= 2
        assert all(s.duration_s <= 3.2 for s in segs)

    def test_end_to_end_with_energy_vad(self):
        audio = np.concatenate(
            [_silence(1.5), _speech_like(2.0), _silence(2.0), _speech_like(1.0), _silence(1.0)]
        )
        segs = get_speech_timestamps(audio, EnergyVad(), threshold=0.5)
        assert len(segs) == 2
        assert abs(segs[0].start / 16000 - 1.5) < 0.3
        assert abs(segs[0].duration_s - 2.0) < 0.5


class TestVadGate:
    """Reference B5 semantics (backend/vad_processor_manager.py:42-182)."""

    def test_start_end_cycle(self):
        g = VadGate()
        assert g.threshold == 0.3
        ev = g.update(0.5, first_chunk_id=0, last_chunk_id=9)
        assert ev.state_changed and ev.speech_start_chunk == 0
        assert g.is_speaking
        assert g.threshold == pytest.approx(0.4)  # +0.1 start boost

        ev = g.update(0.9, 10, 19)  # speech continues
        assert not ev.state_changed
        assert g.threshold == pytest.approx(0.43)  # +0.03

        ev = g.update(0.1, 20, 29)  # first silent window: no end yet
        assert not ev.state_changed
        ev = g.update(0.1, 30, 39)  # second silent window: end
        assert ev.state_changed and ev.speech_end_chunk == 39
        assert not g.is_speaking
        assert g.threshold == 0.3  # reset

    def test_threshold_clamped_at_max(self):
        g = VadGate(VadGateConfig())
        g.update(1.0, 0, 9)
        for i in range(30):
            g.update(1.0, 10 * (i + 1), 10 * (i + 2) - 1)
        assert g.threshold <= 0.9 + 1e-9

    def test_single_silent_window_does_not_end(self):
        g = VadGate()
        g.update(0.9, 0, 9)
        g.update(0.05, 10, 19)
        ev = g.update(0.95, 20, 29)  # speech resumes; counter was reset
        assert g.is_speaking and not ev.state_changed

    def test_backdating(self):
        g = VadGate()
        ev = g.update(0.99, first_chunk_id=42, last_chunk_id=51)
        assert ev.speech_start_chunk == 42

    def test_counter_decay_matches_reference_at_window_3(self):
        """State-trajectory parity vs a direct transliteration of the
        reference's counter/threshold updates (vad_processor_manager.py:
        107-165) at smoothing_window=3 — the regime where counter DECAY
        (max(0, n-1)) and RESET-to-zero semantics diverge (/vad/config
        accepts window >= 3, so the non-default path must match too)."""

        class RefTwin:
            def __init__(self, window):
                self.window = window
                self.speech_count = 0
                self.silence_count = 0
                self.is_speaking = False
                self.threshold = 0.3

            def update(self, prob):
                changed = False
                if prob >= self.threshold:
                    self.speech_count = min(self.speech_count + 1, self.window)
                    self.silence_count = max(0, self.silence_count - 1)
                else:
                    self.silence_count = min(self.silence_count + 1, self.window)
                    self.speech_count = max(0, self.speech_count - 1)
                if not self.is_speaking and self.speech_count >= 1:
                    self.is_speaking = True
                    changed = True
                    self.threshold = min(self.threshold + 0.1, 0.9)
                elif self.is_speaking and self.speech_count > 0:
                    self.threshold = min(self.threshold + 0.1 * 0.3, 0.9)
                elif self.is_speaking and self.silence_count >= self.window:
                    self.is_speaking = False
                    changed = True
                    self.threshold = 0.3
                return changed

        for window in (2, 3, 4):
            g = VadGate(VadGateConfig(smoothing_window=window))
            ref = RefTwin(window)
            rng = np.random.default_rng(window)
            # bursty pattern: runs of speech-ish / silence-ish windows,
            # including single-window blips that exercise the decay
            probs = []
            for _ in range(40):
                lvl = rng.choice([0.05, 0.95])
                probs.extend([float(lvl)] * int(rng.integers(1, 4)))
            for i, p in enumerate(probs):
                ev = g.update(p, 10 * i, 10 * i + 9)
                changed = ref.update(p)
                assert ev.state_changed == changed, (window, i)
                assert g.is_speaking == ref.is_speaking, (window, i)
                assert g.speech_count == ref.speech_count, (window, i)
                assert g.silence_count == ref.silence_count, (window, i)
                assert g.threshold == pytest.approx(ref.threshold), (window, i)

    def test_continue_boost_on_silent_window_with_decayed_count(self):
        """Reference :142-151: the continue-boost keys on speech_count > 0,
        so it fires on a silent window whose decayed count is positive."""
        g = VadGate()
        g.update(0.99, 0, 9)   # start: 0.3 -> 0.4
        g.update(0.99, 10, 19)  # continue: -> 0.43
        g.update(0.0, 20, 29)   # silent, but speech_count 2->1 > 0: -> 0.46
        assert g.threshold == pytest.approx(0.46)
        ev = g.update(0.0, 30, 39)  # speech_count 0, silence_count 2: end
        assert ev.state_changed and not g.is_speaking


class TestSileroUpstreamParity:
    """Probability parity vs the real upstream checkpoint. The environment
    has zero egress, so this runs only when a checkpoint is provided via
    SILERO_CHECKPOINT=<path to silero_vad.jit / .onnx state>; it is the
    gate that validates the v5 graph reimplementation end-to-end."""

    def test_probability_parity(self):
        import os

        path = os.environ.get("SILERO_CHECKPOINT", "")
        if not path or not os.path.exists(path):
            pytest.skip("set SILERO_CHECKPOINT=<silero_vad.jit> to run")
        import torch

        from sonicscribe_tpu.tools.convert_silero import (
            convert_state_dict,
            load_torch_checkpoint,
        )

        params = convert_state_dict(load_torch_checkpoint(path))
        ours = SileroVad(params=params)
        upstream = torch.jit.load(path, map_location="cpu")
        upstream.eval()

        audio = np.concatenate(
            [_silence(0.5), _speech_like(1.0, seed=3), _silence(0.5)]
        )
        got = window_probs(ours, audio)
        upstream.reset_states() if hasattr(upstream, "reset_states") else None
        want = []
        for i in range(len(got)):
            w = audio[i * WINDOW_SAMPLES : (i + 1) * WINDOW_SAMPLES]
            if len(w) < WINDOW_SAMPLES:
                w = np.pad(w, (0, WINDOW_SAMPLES - len(w)))
            want.append(float(upstream(torch.from_numpy(w)[None], 16000)))
        np.testing.assert_allclose(got, want, atol=5e-3)
