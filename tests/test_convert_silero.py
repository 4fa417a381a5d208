"""Silero converter: synthetic upstream state dict -> runnable SileroVad."""

import numpy as np
import pytest

from sonicscribe_tpu.tools.convert_silero import (
    SileroMappingError,
    convert_state_dict,
)
from sonicscribe_tpu.vad.model import SileroConfig, SileroVad, WINDOW_SAMPLES


def _synthetic_sd(cfg: SileroConfig):
    rng = np.random.default_rng(0)
    sd = {}
    c_in = cfg.n_bins
    for i, c_out in enumerate(cfg.conv_channels):
        sd[f"encoder.{i}.reparam_conv.weight"] = rng.standard_normal(
            (c_out, c_in, cfg.kernel)
        ).astype(np.float32) * 0.05
        sd[f"encoder.{i}.reparam_conv.bias"] = np.zeros(c_out, np.float32)
        c_in = c_out
    h = cfg.lstm_hidden
    sd["decoder.rnn.weight_ih"] = rng.standard_normal((4 * h, c_in)).astype(np.float32) * 0.05
    sd["decoder.rnn.weight_hh"] = rng.standard_normal((4 * h, h)).astype(np.float32) * 0.05
    sd["decoder.rnn.bias_ih"] = np.zeros(4 * h, np.float32)
    sd["decoder.rnn.bias_hh"] = np.ones(4 * h, np.float32) * 0.1
    sd["decoder.decoder.2.weight"] = rng.standard_normal((1, h, 1)).astype(np.float32) * 0.1
    sd["decoder.decoder.2.bias"] = np.zeros(1, np.float32)
    # v5 stores the STFT forward basis as a conv buffer [2*bins, 1, n_fft]
    sd["_model.stft.forward_basis_buffer"] = rng.standard_normal(
        (2 * cfg.n_bins, 1, cfg.n_fft)
    ).astype(np.float32) * 0.05
    return sd


def test_convert_and_run():
    import jax.numpy as jnp

    cfg = SileroConfig()
    params = convert_state_dict(_synthetic_sd(cfg), cfg)
    vad = SileroVad(params=params, cfg=cfg)
    state = vad.init_state(2)
    probs, state2 = vad.forward(vad.params, jnp.zeros((2, WINDOW_SAMPLES)), state)
    assert probs.shape == (2,)
    assert np.all((np.asarray(probs) >= 0) & (np.asarray(probs) <= 1))
    # bias_hh summed into the single bias
    np.testing.assert_allclose(np.asarray(params["lstm"]["b"])[:4], 0.1, atol=1e-6)
    # the STFT conv basis came from the checkpoint, reshaped to [2*bins, n_fft]
    assert params["stft"]["basis"].shape == (2 * cfg.n_bins, cfg.n_fft)


def test_missing_key_error_lists_candidates():
    with pytest.raises(SileroMappingError) as e:
        convert_state_dict({"unrelated.weight": np.zeros(3)})
    assert "tried" in str(e.value)


class TestTorchTwinParity:
    """Numerical verification of the v5 graph + converter against the
    independent torch twin (tools/torch_silero.py) — the Silero analogue of
    test_convert_hf.py. Exercises every converter transpose, the reflect-pad
    frame math, the context carry, and the LSTM gate order, stateful over a
    silence/speech/silence signal (VERDICT r2 item 1)."""

    def _audio(self):
        rng = np.random.default_rng(7)
        t = np.arange(16000) / 16000.0
        speech = 0.3 * np.sin(2 * np.pi * 440 * t) * (
            0.5 * (1 + np.sin(2 * np.pi * 3 * t))
        ) + 0.01 * rng.standard_normal(len(t))
        sil = 0.002 * rng.standard_normal(8192)
        audio = np.concatenate([sil, speech, sil]).astype(np.float32)
        # multiple of the 512-sample window: no tail-pad asymmetry
        return audio[: (len(audio) // WINDOW_SAMPLES) * WINDOW_SAMPLES]

    def test_probability_parity_stateful(self):
        import torch

        from sonicscribe_tpu.tools.torch_silero import (
            TorchSileroVad,
            synthetic_state_dict,
        )
        from sonicscribe_tpu.vad.model import window_probs

        sd = synthetic_state_dict(seed=0)
        # the converter sees the real upstream names (incl. _model. prefix)
        assert "_model.stft.forward_basis_buffer" in sd
        assert "_model.encoder.0.reparam_conv.weight" in sd
        assert "_model.decoder.rnn.weight_ih" in sd
        ours = SileroVad(params=convert_state_dict(sd))

        twin = TorchSileroVad(seed=0)
        twin.reset_states()

        audio = self._audio()
        got = window_probs(ours, audio)
        want = []
        for i in range(len(audio) // WINDOW_SAMPLES):
            w = torch.from_numpy(
                audio[i * WINDOW_SAMPLES : (i + 1) * WINDOW_SAMPLES]
            )[None]
            want.append(float(twin(w, 16000)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_8k_graph_ignored(self):
        """`_model_8k.*` keys (the upstream 8 kHz twin graph) must not
        shadow or break the 16 kHz mapping."""
        from sonicscribe_tpu.tools.torch_silero import synthetic_state_dict

        sd = synthetic_state_dict(seed=1)
        sd["_model_8k.encoder.0.reparam_conv.weight"] = np.zeros(
            (1, 1, 1), np.float32
        )
        params = convert_state_dict(sd)
        assert params["convs"][0]["w"].shape[2] == 128  # 16 kHz channels
