"""Integration tests: Transcriber end-to-end on the tiny random model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonicscribe_tpu.engine import Transcriber
from sonicscribe_tpu.models import tiny
from sonicscribe_tpu.models.glm_asr import init_params
from sonicscribe_tpu.models.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def transcriber():
    cfg = tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return Transcriber(cfg, params, ByteTokenizer(cfg), prefill_buckets=(64, 128))


def _audio(seconds=0.5, sr=16000):
    t = np.arange(int(sr * seconds)) / sr
    return (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)


class TestTranscriber:
    def test_end_to_end_runs(self, transcriber):
        r = transcriber.transcribe(_audio(), 16000, max_new_tokens=8)
        assert isinstance(r.text, str)
        assert r.audio_duration_s == pytest.approx(0.5, abs=0.01)
        assert r.timings["rtf"] > 0

    def test_deterministic(self, transcriber):
        a = _audio()
        r1 = transcriber.transcribe(a, 16000, max_new_tokens=8)
        r2 = transcriber.transcribe(a, 16000, max_new_tokens=8)
        np.testing.assert_array_equal(r1.tokens, r2.tokens)

    def test_bucket_invariance(self, transcriber):
        """Same audio must transcribe identically whichever bucket pads it:
        validates the masking/dynamic-slice prompt assembly."""
        a = _audio(0.3)  # 30 frames -> bucket 64
        r_small = transcriber.transcribe(a, 16000, max_new_tokens=8)
        big = Transcriber(
            transcriber.cfg,
            transcriber.params,
            transcriber.tokenizer,
            prefill_buckets=(128,),
        )
        r_big = big.transcribe(a, 16000, max_new_tokens=8)
        np.testing.assert_array_equal(r_small.tokens, r_big.tokens)

    def test_resampled_input(self, transcriber):
        r = transcriber.transcribe(_audio(0.5, 48000), 48000, max_new_tokens=4)
        assert r.audio_duration_s == pytest.approx(0.5, abs=0.01)

    def test_hotword_bias_steers_decode(self, transcriber):
        a = _audio()
        strong = Transcriber(
            transcriber.cfg,
            transcriber.params,
            transcriber.tokenizer,
            prefill_buckets=(64, 128),
            hotword_bias_strength=1e9,
        )
        r = strong.transcribe(a, 16000, max_new_tokens=4, hotwords=["z"])
        # with overwhelming bias every step must pick a hotword token
        zid = transcriber.tokenizer.encode("z")[0]
        assert all(t == zid for t in r.tokens)

    def test_hotwords_change_prompt_only_when_weak(self, transcriber):
        a = _audio()
        r0 = transcriber.transcribe(a, 16000, max_new_tokens=4)
        r1 = transcriber.transcribe(a, 16000, max_new_tokens=4, hotwords=["jax"])
        # no crash; outputs may or may not differ for random weights
        assert isinstance(r1.text, str) and isinstance(r0.text, str)
