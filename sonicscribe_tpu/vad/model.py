"""Voice-activity-detection models, batched and JIT'd for TPU.

Replaces the reference's torch.jit/ONNX Silero runtime (reference:
backend/vad.py:4,13 `load_silero_vad()`), redesigned for the TPU engine: the
hot call is `probs, state = vad.forward(params, windows, state)` over a BATCH
of stream windows — the continuous batcher evaluates every active session's
VAD gate in one program (SURVEY.md §2.9 "batched gating op").

Two interchangeable backends:

- ``SileroVad`` — a JAX reimplementation of the Silero-VAD architecture
  (STFT magnitude front end -> conv encoder -> LSTM cell -> sigmoid head).
  Weights are converted from the upstream checkpoint with
  `sonicscribe_tpu/tools/convert_silero.py` when available; random init is
  only useful for shape/compile tests.
- ``EnergyVad`` — a deterministic DSP gate (band-energy SNR against an
  adaptive noise floor). No weights needed; the out-of-the-box default in
  hermetic environments and the fixture model for protocol tests.

Both operate on 512-sample windows at 16 kHz (31.25 decisions/s), the Silero
granularity the reference's segmentation parameters assume.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

WINDOW_SAMPLES = 512
SAMPLE_RATE = 16000


# ---------------------------------------------------------------------
# Silero-architecture model
# ---------------------------------------------------------------------


@dataclass(frozen=True)
class SileroConfig:
    """Silero-VAD v5 graph constants (recovered from the public jit/ONNX
    export's op structure — the reference consumes the same model through
    `load_silero_vad()`, backend/vad.py:13):

    512-sample window + 64-sample carried context -> reflect pad ->
    STFT as a conv with a stored forward-basis buffer (129 bins x 4 frames)
    -> 4 ReLU conv1d blocks ("reparam_conv", strides 1,2,2,1: 4 frames
    collapse to 1) -> LSTMCell(128) -> [ReLU -> 1x1 conv -> sigmoid] head.
    """

    n_fft: int = 256
    hop: int = 128
    context: int = 64  # samples of left context carried between windows
    pad: int = 64  # reflect padding applied around the 576-sample input
    conv_channels: Tuple[int, ...] = (128, 64, 64, 128)
    conv_strides: Tuple[int, ...] = (1, 2, 2, 1)
    kernel: int = 3
    lstm_hidden: int = 128

    @property
    def n_bins(self) -> int:
        return self.n_fft // 2 + 1


class SileroVad:
    """Silero-VAD v5 speech-probability net in JAX.

    State per stream: (lstm_h, lstm_c, audio_context). The STFT forward
    basis is a PARAMETER (upstream stores it as
    `_model.stft.forward_basis_buffer`), so a converted checkpoint
    reproduces upstream numerics through the converter
    (tools/convert_silero.py) — random init uses the analytic hann-windowed
    DFT basis. Graph + converter numerics are verified per-window ≤1e-5
    against the independent torch twin (tools/torch_silero.py,
    tests/test_convert_silero.py::TestTorchTwinParity); probability parity
    vs the real upstream checkpoint is additionally asserted by the
    checkpoint-gated test in tests/test_vad.py.
    """

    window_samples = WINDOW_SAMPLES

    def __init__(self, params=None, cfg: SileroConfig = SileroConfig(), key=None):
        self.cfg = cfg
        if params is None:
            params = self.init_params(key or jax.random.PRNGKey(0))
        self.params = params

    def _dft_basis(self) -> np.ndarray:
        """Analytic hann-windowed real-DFT basis [2*bins, n_fft]."""
        cfg = self.cfg
        n = np.arange(cfg.n_fft)
        k = np.arange(cfg.n_bins)[:, None]
        ang = 2.0 * np.pi * k * n[None, :] / cfg.n_fft
        win = 0.5 * (1 - np.cos(2 * np.pi * n / cfg.n_fft))
        return np.concatenate(
            [np.cos(ang) * win[None], -np.sin(ang) * win[None]], 0
        ).astype(np.float32)

    def init_params(self, key):
        cfg = self.cfg
        keys = iter(jax.random.split(key, 16))

        def dense(k, shape):
            return jax.random.normal(k, shape, jnp.float32) * 0.05

        convs = []
        c_in = cfg.n_bins
        for c_out in cfg.conv_channels:
            convs.append(
                {
                    "w": dense(next(keys), (cfg.kernel, c_in, c_out)),
                    "b": jnp.zeros((c_out,)),
                }
            )
            c_in = c_out
        h = cfg.lstm_hidden
        return {
            "stft": {"basis": jnp.asarray(self._dft_basis())},
            "convs": convs,
            "lstm": {
                "wi": dense(next(keys), (c_in, 4 * h)),
                "wh": dense(next(keys), (h, 4 * h)),
                "b": jnp.zeros((4 * h,)),
            },
            "out": {"w": dense(next(keys), (h, 1)), "b": jnp.zeros((1,))},
        }

    def init_state(self, batch: int):
        h = self.cfg.lstm_hidden
        return {
            "h": jnp.zeros((batch, h)),
            "c": jnp.zeros((batch, h)),
            "ctx": jnp.zeros((batch, self.cfg.context)),
        }

    @partial(jax.jit, static_argnums=0)
    def forward(self, params, windows: jnp.ndarray, state):
        """windows: [B, 512] float32 -> (probs [B], new_state)."""
        cfg = self.cfg
        x = jnp.concatenate([state["ctx"], windows], axis=1)  # [B, 576]
        new_ctx = windows[:, -cfg.context :]

        # reflect pad then STFT magnitude via the (stored) conv basis:
        # [B, 576] -> [B, 704] -> 4 frames of n_fft at stride hop
        x = jnp.pad(x, ((0, 0), (cfg.pad, cfg.pad)), mode="reflect")
        n_frames = (x.shape[1] - cfg.n_fft) // cfg.hop + 1
        idx = np.arange(n_frames)[:, None] * cfg.hop + np.arange(cfg.n_fft)[None, :]
        frames = x[:, idx]  # [B, F, n_fft]
        basis = params.get("stft", {}).get("basis")
        if basis is None:  # pre-v5-layout converted params
            basis = jnp.asarray(self._dft_basis())
        spec = jnp.einsum(
            "bfn,cn->bfc", frames, basis, preferred_element_type=jnp.float32
        )
        real, imag = spec[..., : cfg.n_bins], spec[..., cfg.n_bins :]
        mag = jnp.sqrt(real**2 + imag**2 + 1e-12)  # [B, F, bins]

        h = mag
        # explicit symmetric padding k//2: upstream's Conv1d(padding=1).
        # NOT "SAME" — for stride 2 XLA SAME pads (0,1) here, which shifts
        # the strided taps off upstream's; caught by the torch-twin parity
        # test (tests/test_convert_silero.py).
        conv_pad = [(cfg.kernel // 2, cfg.kernel // 2)]
        for conv, stride in zip(params["convs"], cfg.conv_strides):
            h = jax.lax.conv_general_dilated(
                h,
                conv["w"],
                window_strides=(stride,),
                padding=conv_pad,
                dimension_numbers=("NHC", "HIO", "NHC"),
            )
            h = jax.nn.relu(h + conv["b"])
        # strides (1,2,2,1) collapse the 4 STFT frames to one
        feat = jnp.mean(h, axis=1)  # [B, C] (exact squeeze when T==1)

        # LSTM cell
        lp = params["lstm"]
        gates = feat @ lp["wi"] + state["h"] @ lp["wh"] + lp["b"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * state["c"] + jax.nn.sigmoid(i) * jnp.tanh(g)
        hh = jax.nn.sigmoid(o) * jnp.tanh(c)

        # decoder head: Dropout(identity at inference) -> ReLU -> 1x1 conv
        # -> sigmoid (upstream decoder.decoder indices 0..3)
        prob = jax.nn.sigmoid(
            jax.nn.relu(hh) @ params["out"]["w"] + params["out"]["b"]
        )[:, 0]
        return prob, {"h": hh, "c": c, "ctx": new_ctx}


# ---------------------------------------------------------------------
# Deterministic DSP fallback
# ---------------------------------------------------------------------


class EnergyVad:
    """Adaptive band-energy VAD: speech probability from the SNR of speech-band
    energy (100-4000 Hz) over a tracked noise floor. Deterministic, no weights.
    """

    window_samples = WINDOW_SAMPLES

    def __init__(self, snr_low_db: float = 3.0, snr_high_db: float = 12.0):
        self.params = None
        self.snr_low = snr_low_db
        self.snr_high = snr_high_db

    def init_state(self, batch: int):
        return {
            "noise": jnp.full((batch,), 1e-8),  # noise-floor band energy
            "init": jnp.zeros((batch,), bool),
        }

    @partial(jax.jit, static_argnums=0)
    def forward(self, params, windows: jnp.ndarray, state):
        del params
        B, W = windows.shape
        # mean-square speech-band energy via matmul DFT on the window
        n = np.arange(W)
        freqs = np.fft.rfftfreq(W, 1.0 / SAMPLE_RATE)
        band = (freqs >= 100.0) & (freqs <= 4000.0)
        k = np.arange(len(freqs))[:, None]
        ang = 2.0 * np.pi * k * n[None, :] / W
        basis = jnp.asarray(
            np.concatenate([np.cos(ang), -np.sin(ang)], 0), jnp.float32
        )
        spec = jnp.einsum("bn,cn->bc", windows, basis, preferred_element_type=jnp.float32)
        nb = len(freqs)
        power = (spec[:, :nb] ** 2 + spec[:, nb:] ** 2) / (W * W)
        band_e = jnp.sum(power * jnp.asarray(band, jnp.float32)[None], axis=1)

        # first window seeds the noise floor (minimum-statistics style
        # tracker); the seed is capped at an ambient level so a stream that
        # starts mid-speech still detects it
        seed = jnp.clip(band_e * 0.7, 1e-10, 1e-5)
        noise = jnp.where(state["init"], state["noise"], seed)
        snr_db = 10.0 * jnp.log10(jnp.maximum(band_e, 1e-12) / jnp.maximum(noise, 1e-12))
        prob = jax.nn.sigmoid(
            (snr_db - 0.5 * (self.snr_low + self.snr_high))
            * (6.0 / max(self.snr_high - self.snr_low, 1e-3))
        )
        # fast down toward quieter minima, very slow upward creep (so a bad
        # high seed recovers but long speech doesn't swallow the floor)
        new_noise = jnp.where(
            band_e < noise, 0.5 * noise + 0.5 * band_e, noise * 1.0005
        )
        new_noise = jnp.maximum(new_noise, 1e-10)
        return prob, {"noise": new_noise, "init": jnp.ones((B,), bool)}


class SileroCostProbeVad:
    """Runs SileroVad.forward for its device cost; gates with EnergyVad's
    functional output.

    Purpose: checkpoint-free benchmarking of the NN gate (this environment
    cannot fetch Silero weights, and random-init probabilities would break
    segmentation semantics). The measured serving latency includes the
    Silero v5 forward exactly as a converted checkpoint would incur it;
    decisions come from the deterministic EnergyVad so the load harness's
    speech/silence cycles segment correctly. bench.py uses this as the
    DEFAULT stream-bench gate (VERDICT r2 item 3); with real converted
    weights, pass them to SileroVad instead."""

    window_samples = WINDOW_SAMPLES

    def __init__(self):
        self.nn = SileroVad()
        self.energy = EnergyVad()
        self.params = {"nn": self.nn.params}

    def init_state(self, batch: int):
        return {
            "nn": self.nn.init_state(batch),
            "energy": self.energy.init_state(batch),
        }

    def forward(self, params, windows, state):
        nn_probs, nn_state = self.nn.forward(params["nn"], windows, state["nn"])
        e_probs, e_state = self.energy.forward(None, windows, state["energy"])
        # keep the NN output in the graph so XLA cannot elide its cost
        probs = e_probs + 0.0 * nn_probs
        return probs, {"nn": nn_state, "energy": e_state}


def window_probs(vad, audio: np.ndarray) -> np.ndarray:
    """Convenience: run a whole mono 16 kHz signal through `vad`, one stream.
    Returns per-512-sample-window probabilities [ceil(N/512)]."""
    n = len(audio)
    n_win = (n + WINDOW_SAMPLES - 1) // WINDOW_SAMPLES
    padded = np.zeros(n_win * WINDOW_SAMPLES, np.float32)
    padded[:n] = audio
    windows = jnp.asarray(padded.reshape(n_win, 1, WINDOW_SAMPLES))
    state = vad.init_state(1)

    def step(state, w):
        p, state = vad.forward(vad.params, w, state)
        return state, p[0]

    _, probs = jax.lax.scan(step, state, windows)
    return np.asarray(probs)
