"""Async engine facade: all device work happens off the event loop.

The reference's single biggest concurrency defect is a synchronous ASR call on
the asyncio loop (reference: backend/transcription_manager.py:58 — every
decode stalls ALL sessions' ingest, SURVEY.md §3.3). Here every TPU call goes
through an executor; the serving layer only ever awaits.

``ThreadedEngine`` is the simple implementation (one device thread,
serialized programs). The continuous batcher (engine/batcher.py) exposes the
same interface and replaces it for multi-session serving.
"""

from __future__ import annotations

import asyncio
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np

from sonicscribe_tpu.engine.transcriber import Transcriber, TranscribeResult
from sonicscribe_tpu.vad.model import WINDOW_SAMPLES


class ThreadedEngine:
    """Serializes device programs on one worker thread; async interface."""

    def __init__(self, transcriber: Transcriber, vad):
        self.transcriber = transcriber
        self.vad = vad
        self._pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix="tpu")
        # reference parity: 3 concurrent file-segment decodes (main.py:429-430)
        self.concurrency_hint = 3

    async def transcribe(
        self,
        audio: np.ndarray,
        sample_rate: int,
        max_new_tokens: int,
        hotwords: Optional[list[str]] = None,
        draft_tokens=None,  # accepted for interface parity; the threaded
        # engine decodes sequentially and gains nothing from speculation
        speculative: bool = False,  # ditto (no k scheduling to protect)
    ) -> TranscribeResult:
        del draft_tokens, speculative
        loop = asyncio.get_running_loop()
        return await loop.run_in_executor(
            self._pool,
            lambda: self.transcriber.transcribe(
                audio, sample_rate, max_new_tokens=max_new_tokens, hotwords=hotwords
            ),
        )

    async def vad_window_prob(self, audio: np.ndarray, state) -> tuple[float, object]:
        """Max speech probability over the 512-sample sub-windows of one
        gate window (state threads through, per session). One scanned
        program per window count, not one call per sub-window."""

        def run():
            import jax
            import jax.numpy as jnp

            n = len(audio)
            n_win = max(1, n // WINDOW_SAMPLES)
            x = jnp.asarray(
                audio[: n_win * WINDOW_SAMPLES].reshape(n_win, 1, WINDOW_SAMPLES)
            )
            s = state if state is not None else self.vad.init_state(1)

            def step(carry, w):
                st, best = carry
                p, st = self.vad.forward(self.vad.params, w, st)
                return (st, jnp.maximum(best, p[0])), None

            (s, best), _ = jax.lax.scan(step, (s, jnp.float32(0.0)), x)
            return float(best), s

        loop = asyncio.get_running_loop()
        return await loop.run_in_executor(self._pool, run)

    def warmup(self, budgets=(15, 200, 256)) -> None:
        self.transcriber.warmup(budgets=budgets)

    def shutdown(self) -> None:
        self._pool.shutdown(wait=False, cancel_futures=True)
