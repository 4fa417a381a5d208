"""ctypes bindings for the native host-side ingest runtime (native/*.cpp).

`load()` returns the bound library or None; callers fall back to NumPy.
`NativeChunkRing` wraps the C++ fixed-chunk monotonic ring buffer.
"""

from __future__ import annotations

import ctypes
import logging
import os
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_LIB_NAME = "libsonic_native.so"
_lib = None
_tried = False


def lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), _LIB_NAME)


def build(force: bool = False) -> Optional[str]:
    """Compile the native library with g++ if absent. Returns path or None."""
    import subprocess

    out = lib_path()
    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "native",
        "sonic_native.cpp",
    )
    if os.path.exists(out) and not force:
        return out
    if not os.path.exists(src):
        return None
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", out, src],
            check=True,
            capture_output=True,
        )
        return out
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning("native build failed (%s); using NumPy fallback", e)
        return None


def load():
    """Load (building on first use) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError as e:
        logger.warning("native load failed (%s); using NumPy fallback", e)
        return None

    i64, f32p, i16p, u8p = (
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int16),
        ctypes.POINTER(ctypes.c_uint8),
    )
    lib.sonic_pcm16_to_f32.argtypes = [i16p, i64, f32p]
    lib.sonic_f32_to_pcm16.argtypes = [f32p, i64, i16p]
    lib.sonic_rms_peak.argtypes = [i16p, i64, f32p, f32p]
    lib.sonic_ring_create.restype = ctypes.c_void_p
    lib.sonic_ring_create.argtypes = [i64, i64]
    lib.sonic_ring_free.argtypes = [ctypes.c_void_p]
    lib.sonic_ring_push.restype = i64
    lib.sonic_ring_push.argtypes = [ctypes.c_void_p, u8p]
    lib.sonic_ring_next_id.restype = i64
    lib.sonic_ring_next_id.argtypes = [ctypes.c_void_p]
    lib.sonic_ring_oldest_id.restype = i64
    lib.sonic_ring_oldest_id.argtypes = [ctypes.c_void_p]
    lib.sonic_ring_read_range.restype = i64
    lib.sonic_ring_read_range.argtypes = [ctypes.c_void_p, i64, i64, u8p]
    lib.sonic_ring_read_range_f32.restype = i64
    lib.sonic_ring_read_range_f32.argtypes = [ctypes.c_void_p, i64, i64, f32p]
    _lib = lib
    return _lib


def pcm16_to_f32(data: bytes) -> np.ndarray:
    lib = load()
    n = len(data) // 2
    if lib is None:
        return np.frombuffer(data[: n * 2], dtype="<i2").astype(np.float32) / 32768.0
    out = np.empty(n, np.float32)
    src = np.frombuffer(data[: n * 2], dtype=np.int16)
    lib.sonic_pcm16_to_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def rms_peak(data: bytes) -> tuple[float, float]:
    lib = load()
    n = len(data) // 2
    src = np.frombuffer(data[: n * 2], dtype=np.int16)
    if lib is None:
        x = src.astype(np.float32) / 32768.0
        return float(np.sqrt(np.mean(x * x))) if n else 0.0, float(
            np.max(np.abs(x))
        ) if n else 0.0
    rms = ctypes.c_float()
    peak = ctypes.c_float()
    lib.sonic_rms_peak(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        n,
        ctypes.byref(rms),
        ctypes.byref(peak),
    )
    return rms.value, peak.value


class NativeChunkRing:
    """Fixed-chunk monotonic ring over the C++ implementation. Returns None
    from the constructor path if the native lib is unavailable — use
    `NativeChunkRing.available()` to check."""

    @staticmethod
    def available() -> bool:
        return load() is not None

    def __init__(self, capacity_chunks: int, chunk_bytes: int):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._ring = self._lib.sonic_ring_create(capacity_chunks, chunk_bytes)
        if not self._ring:
            raise MemoryError("sonic_ring_create failed")
        self.chunk_bytes = chunk_bytes
        self.samples_per_chunk = chunk_bytes // 2

    def push(self, data: bytes) -> int:
        if len(data) != self.chunk_bytes:
            raise ValueError(f"chunk must be {self.chunk_bytes} bytes")
        buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
        return self._lib.sonic_ring_push(self._ring, buf)

    @property
    def next_id(self) -> int:
        return self._lib.sonic_ring_next_id(self._ring)

    @property
    def oldest_id(self) -> int:
        return self._lib.sonic_ring_oldest_id(self._ring)

    def read_f32(self, start_id: int, end_id: int) -> np.ndarray:
        """Chunks [start_id, end_id] as one float32 array (evicted ids skipped)."""
        n = max(0, end_id - start_id + 1)
        out = np.empty(n * self.samples_per_chunk, np.float32)
        got = self._lib.sonic_ring_read_range_f32(
            self._ring, start_id, end_id,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out[: got * self.samples_per_chunk]

    def __del__(self):
        lib, ring = getattr(self, "_lib", None), getattr(self, "_ring", None)
        if lib is not None and ring:
            lib.sonic_ring_free(ring)
            self._ring = None
