"""Application configuration and wire-protocol constants.

Capability parity with the reference's env-backed ``AppConfig``
(reference: backend/config.py:9-44) — same timing constants, same env
variables — plus TPU-engine knobs that have no reference counterpart
(batcher slot count, mel bucket sizes, quantization mode).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List


def _env(name: str, default: str) -> str:
    return os.environ.get(name, default)


def _env_bool(name: str, default: bool) -> bool:
    raw = os.environ.get(name)
    if raw is None:
        return default
    return raw.strip().lower() in ("1", "true", "yes", "on")


@dataclass
class AppConfig:
    """Runtime configuration.

    Unlike the reference (which mutates class attributes globally from the
    ``/vad/config`` endpoint, backend/main.py:651-668 — a cross-session race),
    this is an instance owned by the server; per-request overrides are scoped.
    """

    # ---- server (reference: backend/config.py:11-20) ----
    host: str = field(default_factory=lambda: _env("HOST", "0.0.0.0"))
    port: int = field(default_factory=lambda: int(_env("PORT", "8081")))
    checkpoint_path: str = field(
        default_factory=lambda: _env("CHECKPOINT_PATH", "./models/GLM-ASR-Nano-2512")
    )
    device: str = field(default_factory=lambda: _env("DEVICE", "tpu"))
    log_level: str = field(default_factory=lambda: _env("LOG_LEVEL", "INFO"))
    debug_audio_enabled: bool = field(
        default_factory=lambda: _env_bool("DEBUG_AUDIO_ENABLED", False)
    )
    debug_audio_base_dir: str = field(
        default_factory=lambda: _env("DEBUG_AUDIO_BASE_DIR", "./debug_audio")
    )
    use_https: bool = field(default_factory=lambda: _env_bool("USE_HTTPS", False))
    ssl_certfile: str = field(default_factory=lambda: _env("SSL_CERTFILE", ""))
    ssl_keyfile: str = field(default_factory=lambda: _env("SSL_KEYFILE", ""))

    # ---- audio / wire protocol (reference: backend/config.py:22-25) ----
    # 64 ms chunks: 1024 samples @ 16 kHz, int16 mono => 2048 bytes.
    audio_sample_rate: int = 16000
    audio_chunk_duration_ms: int = 64
    audio_chunk_size: int = 2048  # bytes
    max_audio_buffer_seconds: int = 30

    # ---- VAD gate (reference: backend/config.py:28-37) ----
    vad_smoothing_window: int = 2
    vad_speech_threshold: float = 0.6
    vad_process_window: int = 10  # chunks per VAD decision (640 ms)
    # dynamic threshold state machine
    vad_dynamic_base_threshold: float = 0.3
    vad_dynamic_max_threshold: float = 0.9
    vad_dynamic_start_boost: float = 0.1
    vad_dynamic_continue_boost: float = 0.03

    # ---- streaming transcription (reference: backend/config.py:40-44) ----
    temporary_transcription_interval: int = 20  # chunks (1.28 s) per interim decode
    # Reference code says 30.0 but its docs say 20.0 (README-en.md:124);
    # the survey's verdict (SURVEY.md §7) is: pick 20 s, configurable.
    max_segment_duration: float = 20.0
    vad_processing_interval_ms: int = 64
    max_speech_segments: int = 3

    # ---- decode budgets (reference: transcription_manager.py:25,37; main.py:440) ----
    interim_max_new_tokens: int = 15
    final_base_tokens: int = 50
    final_tokens_per_second: int = 5
    final_max_tokens: int = 200
    file_max_new_tokens: int = 256

    # ---- TPU engine (new; no reference counterpart) ----
    quant_mode: str = field(default_factory=lambda: _env("QUANT_MODE", "native"))
    # speculative finals: the final decode verifies the session's banked
    # interim tokens w-at-a-time per weights-read (lossless — greedy-exact;
    # engine verify path, tests/test_spec_decode.py)
    speculative_finals: bool = field(
        default_factory=lambda: _env("SPECULATIVE_FINALS", "true").lower()
        in ("1", "true", "yes")
    )
    # eager finals (endpoint speculation; new, no reference counterpart):
    # the gate confirms a speech end only at the SECOND consecutive silent
    # window (reference vad_processor_manager.py:154 semantics), so the
    # final's audio is fully buffered one 640 ms window before confirmation.
    # The session launches the final decode at the FIRST silent window and
    # commits its result on confirmation (discarded if speech resumes),
    # cutting speech-end -> committed latency by up to the window period.
    # The omitted trailing window is gate-certified silence; launches are
    # capacity-gated by the engine (BatchedEngine.eager_ok) so discarded
    # speculation never displaces confirmed work.
    eager_finals: bool = field(
        default_factory=lambda: _env_bool("EAGER_FINALS", True)
    )
    # speculative interims: an interim decode may verify the PREVIOUS
    # interim's tokens w-at-a-time (same lossless verify path as
    # speculative_finals) when its window START is unchanged. DEFAULT OFF —
    # with the reference's constants it can never fire: the interim window
    # is the sliding last-20-chunks (1.28 s, reference
    # audio_manager.py:106-114) and the cadence is 1 s, so consecutive
    # interim windows never share a start (measured: verify_rounds=0 across
    # a full 50-stream INTERIM_BENCH run). Kept for configurations whose
    # interim window is pinned to the segment start or whose cadence is
    # much shorter than the window; lossless either way.
    speculative_interims: bool = field(
        default_factory=lambda: _env_bool("SPECULATIVE_INTERIMS", False)
    )
    decode_slots: int = field(default_factory=lambda: int(_env("DECODE_SLOTS", "32")))
    # converted Silero weights (.npz from tools/convert_silero.py); when set,
    # `--vad silero` serves these — without them the random-init net is
    # REFUSED (it would gate garbage) and serving falls back to the DSP gate
    silero_weights: str = field(
        default_factory=lambda: _env("SONIC_SILERO_WEIGHTS", "")
    )
    # mel-frame bucket sizes for prefill (static shapes for XLA)
    prefill_buckets: List[int] = field(
        default_factory=lambda: [128, 256, 512, 1024, 2048, 3072]
    )
    data_parallel: int = field(default_factory=lambda: int(_env("DATA_PARALLEL", "1")))
    # Pallas flash-decode attention: "on" | "off"/"auto". Benched SLOWER than
    # the XLA path at nano scale (FLASH_DECODE_BENCH.json: 0.6-0.9x), so the
    # default keeps XLA attention; the short/long KV pool split is the
    # adopted occupancy-scaling mechanism.
    flash_decode: str = field(default_factory=lambda: _env("FLASH_DECODE", "auto"))
    # fused dual-pool decode: one program decodes both KV pools per tick so
    # the layer weights stream from HBM once. Raises mixed-load throughput
    # but puts the long pool's KV read on the interim critical path
    # (DUAL_DECODE_BENCH.json: p95 261->394 ms at 50 streams) => default off;
    # enable for throughput-oriented mixed file+stream deployments.
    fuse_dual_decode: bool = field(
        default_factory=lambda: _env_bool("FUSE_DUAL_DECODE", False)
    )

    @property
    def samples_per_chunk(self) -> int:
        return self.audio_chunk_size // 2

    @property
    def chunks_per_second(self) -> float:
        return 1000.0 / self.audio_chunk_duration_ms

    def final_token_budget(self, duration_s: float) -> int:
        """Duration-scaled final decode budget (reference: transcription_manager.py:37)."""
        return min(
            self.final_base_tokens + int(self.final_tokens_per_second * duration_s),
            self.final_max_tokens,
        )

    def protocol_constants(self) -> dict:
        """Derived constants exposed by /debug/config (reference: main.py:171-191)."""
        return {
            "audio_sample_rate": self.audio_sample_rate,
            "audio_chunk_duration_ms": self.audio_chunk_duration_ms,
            "audio_chunk_size": self.audio_chunk_size,
            "samples_per_chunk": self.samples_per_chunk,
            "vad_process_window": self.vad_process_window,
            "vad_window_ms": self.audio_chunk_duration_ms * self.vad_process_window,
            "temporary_transcription_interval": self.temporary_transcription_interval,
            "max_segment_duration": self.max_segment_duration,
            "max_audio_buffer_seconds": self.max_audio_buffer_seconds,
        }
