"""Sessions must hand their banked interim TOKENS to the final decode as a
speculative draft (serve/session.py _segment_draft), with window-slide
banking semantics matching the committed-text assembly, and the
SPECULATIVE_FINALS flag must turn the whole thing off."""

import asyncio

import numpy as np

from sonicscribe_tpu.config import AppConfig
from sonicscribe_tpu.engine.transcriber import TranscribeResult
from sonicscribe_tpu.serve.session import StreamSession

SR = 16000
CHUNK = 1024


class RecordingEngine:
    """Host-audio engine that records every transcribe call's kwargs and
    returns per-call scripted tokens (so the interim token banking is
    observable in the final's draft)."""

    has_ring = False

    def __init__(self):
        self.calls = []
        self.n = 0

    async def vad_window_prob(self, audio, state):
        rms = float(np.sqrt(np.mean(audio**2))) if len(audio) else 0.0
        return (1.0 if rms > 0.01 else 0.0), None

    async def transcribe(self, audio, sample_rate, max_new_tokens,
                         hotwords=None, draft_tokens=None, speculative=False):
        self.n += 1
        self.calls.append({
            "max_new_tokens": max_new_tokens,
            "draft_tokens": None if draft_tokens is None
            else np.asarray(draft_tokens).tolist(),
        })
        return TranscribeResult(
            text=f"t{self.n} ",
            tokens=np.full(4, self.n, np.int32),
            audio_duration_s=len(audio) / sample_rate,
            timings={},
        )


def _chunks(loud: bool, n: int) -> list[bytes]:
    t = np.arange(CHUNK) / SR
    amp = 0.3 if loud else 0.0002
    x = (amp * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    return [x.tobytes()] * n


async def _drive(cfg) -> RecordingEngine:
    msgs = []

    async def send(m):
        msgs.append(m)

    eng = RecordingEngine()
    # interim cadence follows STREAM time (>=1 s between interims), so the
    # non-realtime feed below drives an injected clock, like tools/loadtest
    now = [0.0]
    s = StreamSession("c1", cfg, eng, send, clock=lambda: now[0])
    # long speech run: several >=1 s interim windows fire, then silence ends
    # the segment and triggers the final
    for i, chunk in enumerate(_chunks(True, 60) + _chunks(False, 30)):
        now[0] = i * 0.064
        await s.on_audio(chunk)
        await asyncio.sleep(0)
    await s.flush_vad()
    await s.flush()
    await s.cleanup()
    assert any(m["type"] == "committed_output" for m in msgs)
    return eng


async def test_final_carries_banked_interim_tokens():
    eng = await _drive(AppConfig())
    finals = [c for c in eng.calls if c["max_new_tokens"] > 15]
    interims = [c for c in eng.calls if c["max_new_tokens"] == 15]
    assert finals and interims
    draft = finals[-1]["draft_tokens"]
    assert draft is not None, "final did not carry a draft"
    # the draft is the concatenation of the banked + last interim tokens;
    # every element must come from some interim's scripted tokens, ending
    # with the LAST interim's (the freshest window)
    interim_vals = set(range(1, len(eng.calls) + 1))
    assert set(draft) <= interim_vals
    assert draft[-4:] == [draft[-1]] * 4  # last interim's 4 identical tokens


async def test_flag_disables_drafting():
    cfg = AppConfig()
    cfg.speculative_finals = False
    eng = await _drive(cfg)
    assert all(c["draft_tokens"] is None for c in eng.calls)
