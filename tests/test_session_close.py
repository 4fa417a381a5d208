"""Close-after-speech-end must still deliver the in-flight final.

Regression found by driving the live server end-to-end: a client that sends
{"type": "close"} moments after its last utterance ends (the common "stop
recording" gesture) had its committed decode CANCELLED — flush() only
finalized a still-open segment, while a final spawned by the gate's
speech-end was still decoding in a background task that cleanup() cancels.
Reference semantics deliver that final (connection_manager.py:169-245)."""

import asyncio

import numpy as np

from sonicscribe_tpu.config import AppConfig
from sonicscribe_tpu.engine.transcriber import TranscribeResult
from sonicscribe_tpu.serve.session import StreamSession

SR = 16000
CHUNK = 1024


class SlowFakeEngine:
    """Host-audio engine: energy-threshold VAD, transcribe sleeps to keep a
    decode in flight when the client closes."""

    has_ring = False

    def __init__(self, decode_delay_s: float = 0.4):
        self.decode_delay_s = decode_delay_s
        self.decodes = 0

    async def vad_window_prob(self, audio, state):
        rms = float(np.sqrt(np.mean(audio**2))) if len(audio) else 0.0
        return (1.0 if rms > 0.01 else 0.0), None

    async def transcribe(self, audio, sample_rate, max_new_tokens, hotwords=None,
                         speculative=False):
        self.decodes += 1
        await asyncio.sleep(self.decode_delay_s)
        return TranscribeResult(
            text="final text",
            tokens=np.zeros(3, np.int32),
            audio_duration_s=len(audio) / sample_rate,
            timings={},
        )


def _chunks(loud: bool, n: int) -> list[bytes]:
    t = np.arange(CHUNK) / SR
    amp = 0.3 if loud else 0.0002
    x = (amp * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    return [x.tobytes()] * n


async def test_close_right_after_speech_end_delivers_final():
    cfg = AppConfig()
    msgs = []

    async def send(m):
        msgs.append(m)

    eng = SlowFakeEngine()
    s = StreamSession("c1", cfg, eng, send)
    # 2 loud windows start speech; 3 near-silent windows end it (2
    # consecutive silent windows needed)
    for chunk in _chunks(True, 20) + _chunks(False, 30):
        await s.on_audio(chunk)
    await s.flush_vad()
    await asyncio.sleep(0.05)  # let the gate's commit task start (it sleeps)
    assert eng.decodes >= 1
    assert not any(m["type"] == "committed_output" for m in msgs)

    # the client's close path: flush must WAIT for the in-flight final
    await s.flush()
    await s.cleanup()
    committed = [m for m in msgs if m["type"] == "committed_output"]
    assert committed and committed[0]["text"] == "final text"
