"""Native C++ ingest runtime: build, bind, and match the NumPy semantics."""

import numpy as np
import pytest

from sonicscribe_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("g++ unavailable; NumPy fallback covered elsewhere")
    return lib


def test_pcm_conversion_matches_numpy(lib):
    rng = np.random.default_rng(0)
    pcm = rng.integers(-32768, 32768, 4096, dtype=np.int16).tobytes()
    got = native.pcm16_to_f32(pcm)
    want = np.frombuffer(pcm, dtype="<i2").astype(np.float32) / 32768.0
    np.testing.assert_array_equal(got, want)


def test_rms_peak(lib):
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(1024) / 16000)).astype(np.float32)
    pcm = (x * 32767).astype("<i2").tobytes()
    rms, peak = native.rms_peak(pcm)
    assert abs(rms - 0.5 / np.sqrt(2)) < 0.01
    assert abs(peak - 0.5) < 0.01


class TestRing:
    def test_push_read_roundtrip(self, lib):
        ring = native.NativeChunkRing(capacity_chunks=8, chunk_bytes=2048)
        chunks = []
        for i in range(5):
            data = np.full(1024, i * 100, dtype="<i2").tobytes()
            cid = ring.push(data)
            assert cid == i
            chunks.append(data)
        out = ring.read_f32(1, 3)
        want = np.concatenate(
            [np.frombuffer(chunks[i], "<i2").astype(np.float32) / 32768.0
             for i in (1, 2, 3)]
        )
        np.testing.assert_array_equal(out, want)

    def test_eviction(self, lib):
        ring = native.NativeChunkRing(capacity_chunks=4, chunk_bytes=4)
        for i in range(10):
            ring.push(np.int16([i, i]).tobytes())
        assert ring.oldest_id == 6
        assert ring.next_id == 10
        # evicted range is skipped from the front
        out = ring.read_f32(0, 9)
        assert len(out) == 4 * 2
        np.testing.assert_allclose(out[::2] * 32768.0, [6, 7, 8, 9])

    def test_wrong_chunk_size_rejected(self, lib):
        ring = native.NativeChunkRing(4, 2048)
        with pytest.raises(ValueError):
            ring.push(b"\x00" * 100)
