"""Debug audio tap (reference backend/debug.py:14-71 parity): WAV archival
with empty-file/dir cleanup."""

import os
import wave

import numpy as np

from sonicscribe_tpu.serve.debug_tap import DebugAudioTap


def test_writes_valid_wav(tmp_path):
    tap = DebugAudioTap(str(tmp_path), "client1", sample_rate=16000)
    pcm = (np.sin(np.arange(4096) * 0.1) * 20000).astype("<i2").tobytes()
    tap.write(pcm)
    tap.write(pcm)
    tap.close()

    assert os.path.exists(tap.path)
    with wave.open(tap.path, "rb") as w:
        assert w.getnchannels() == 1
        assert w.getframerate() == 16000
        assert w.getsampwidth() == 2
        assert w.getnframes() == 8192  # two writes of 4096 samples
        data = w.readframes(w.getnframes())
    assert data == pcm + pcm


def test_empty_tap_cleans_up_file_and_dir(tmp_path):
    tap = DebugAudioTap(str(tmp_path), "client2", sample_rate=16000)
    session_dir = os.path.dirname(tap.path)
    tap.close()
    assert not os.path.exists(tap.path)
    assert not os.path.exists(session_dir)


def test_spool_flush_threshold(tmp_path):
    """Writes below the flush threshold stay in memory (no file yet); the
    close flush lands everything."""
    tap = DebugAudioTap(str(tmp_path), "client3", sample_rate=16000)
    tap.write(b"\x01\x02" * 100)
    assert not os.path.exists(tap.path)  # spooled, ingest path never blocked
    tap.close()
    with wave.open(tap.path, "rb") as w:
        assert w.getnframes() == 100
