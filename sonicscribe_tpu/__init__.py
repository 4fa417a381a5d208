"""SonicScribe-TPU: a TPU-native real-time speech-to-text framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
gengyuchao/SonicScribe (reference surveyed in /root/repo/SURVEY.md):

- realtime WebSocket streaming ASR (64 ms PCM chunks, VAD-gated segmentation,
  two-phase tentative -> committed results),
- streaming file transcription (NDJSON, per-segment timestamps),
- hotword biasing (prompt injection for parity + logit-bias boost),
- INT8 weight-only quantized inference,
- a continuous batcher that packs many concurrent sessions onto one TPU core.

The compute path (resample, fused log-mel, Silero-style VAD, GLM-ASR encoder/
decoder with persistent KV cache and greedy decode) is JIT'd JAX/XLA with
Pallas kernels; the serving layer is asyncio/aiohttp.
"""

__version__ = "0.1.0"

from sonicscribe_tpu.config import AppConfig  # noqa: F401
