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
