"""ChunkBuffer semantics on BOTH backends (native C++ ring and Python dict)."""

import numpy as np
import pytest

from sonicscribe_tpu.stream.buffer import ChunkBuffer


def _chunk(value: int) -> bytes:
    return np.full(1024, value, dtype="<i2").tobytes()


@pytest.fixture(params=[True, False], ids=["native", "python"])
def buf(request):
    b = ChunkBuffer(use_native=request.param)
    if request.param and b.backend != "native":
        pytest.skip("native lib unavailable")
    return b


class TestChunkBuffer:
    def test_monotonic_ids(self, buf):
        ids = [buf.add_chunk(_chunk(i)).chunk_id for i in range(5)]
        assert ids == [0, 1, 2, 3, 4]
        assert buf.newest_chunk_id == 4

    def test_audio_in_range(self, buf):
        for i in range(6):
            buf.add_chunk(_chunk(i * 1000))
        audio = buf.audio_in_range(2, 4)
        assert audio.shape == (3 * 1024,)
        np.testing.assert_allclose(audio[::1024] * 32768.0, [2000, 3000, 4000])

    def test_segment_lifecycle_and_exact_committed_range(self, buf):
        for i in range(30):
            buf.add_chunk(_chunk(i))
        seg = buf.start_segment(10)
        assert buf.current_segment is seg
        for i in range(30, 40):
            buf.add_chunk(_chunk(i))
        buf.finalize_segment(25)
        audio, start, end = buf.committed_audio(seg)
        # exact [start, end], NOT "to newest" (the reference quirk fixed)
        assert (start, end) == (10, 25)
        assert audio.shape == (16 * 1024,)
        np.testing.assert_allclose(audio[::1024][:3] * 32768.0, [10, 11, 12])

    def test_interim_window(self, buf):
        for i in range(50):
            buf.add_chunk(_chunk(i))
        buf.start_segment(5)
        audio, start, end = buf.interim_audio()
        assert end == 49
        assert start == 30  # last 20 chunks
        assert audio.shape == (20 * 1024,)

    def test_max_segments_cap(self, buf):
        for i in range(10):
            buf.add_chunk(_chunk(i))
        for s in range(5):
            buf.start_segment(s)
            buf.finalize_segment(s)
        assert len(buf.segments) == 3  # MAX_SPEECH_SEGMENTS parity
