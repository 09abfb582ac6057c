"""Real Zstd competitor via ctypes binding to system libzstd.

The reference fetches zstd v1.5.5 and benchmarks ZSTD_compress at
level 3 over rowgroup-sized chunks (102400 values) — see
reference publication/source_code/bench_compression_ratio/zstd.cpp:11-12
("For Zstd we compress rowgroups since it would be unfair to compress
small vectors") and :64 (level 3).  This module binds the system
libzstd with ctypes (no pip installs); if the library is absent,
``HAVE_ZSTD`` is False and callers fall back to the zlib stand-in.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

from ..constants import VECTOR_SIZE, N_VECTORS_PER_ROWGROUP

ROWGROUP_VALUES = VECTOR_SIZE * N_VECTORS_PER_ROWGROUP  # 102400
ZSTD_LEVEL = 3  # reference zstd.cpp:64

_lib = None


def _load() -> "ctypes.CDLL | None":
    global _lib
    if _lib is not None:
        return _lib
    name = ctypes.util.find_library("zstd")
    for cand in ([name] if name else []) + ["libzstd.so.1", "libzstd.so"]:
        try:
            lib = ctypes.CDLL(cand)
        except OSError:
            continue
        lib.ZSTD_compressBound.restype = ctypes.c_size_t
        lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
        lib.ZSTD_compress.restype = ctypes.c_size_t
        lib.ZSTD_compress.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int]
        lib.ZSTD_decompress.restype = ctypes.c_size_t
        lib.ZSTD_decompress.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t]
        lib.ZSTD_isError.restype = ctypes.c_uint
        lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
        lib.ZSTD_versionNumber.restype = ctypes.c_uint
        _lib = lib
        return lib
    return None


HAVE_ZSTD = _load() is not None


def zstd_version() -> str:
    lib = _load()
    if lib is None:
        return "absent"
    v = lib.ZSTD_versionNumber()
    return f"{v // 10000}.{v // 100 % 100}.{v % 100}"


def _compress_chunk(lib, raw: bytes) -> bytes:
    bound = lib.ZSTD_compressBound(len(raw))
    dst = ctypes.create_string_buffer(bound)
    n = lib.ZSTD_compress(dst, bound, raw, len(raw), ZSTD_LEVEL)
    if lib.ZSTD_isError(n):
        raise RuntimeError("ZSTD_compress failed")
    return dst.raw[:n]


def zstd_bits(data: np.ndarray) -> int:
    """Total compressed bits over rowgroup-sized chunks, level 3.

    Mirrors reference zstd.cpp:44-70: chunks of 102400 values (a
    short tail is compressed as its own smaller chunk).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("libzstd not available (check HAVE_ZSTD)")
    flat = np.ascontiguousarray(data).reshape(-1)
    total = 0
    for off in range(0, flat.size, ROWGROUP_VALUES):
        raw = flat[off:off + ROWGROUP_VALUES].tobytes()
        total += len(_compress_chunk(lib, raw)) * 8
    return total


def zstd_roundtrip(data: np.ndarray) -> int:
    """Compress + decompress + bit-exact validate; returns total bits."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libzstd not available (check HAVE_ZSTD)")
    flat = np.ascontiguousarray(data).reshape(-1)
    total = 0
    for off in range(0, flat.size, ROWGROUP_VALUES):
        chunk = flat[off:off + ROWGROUP_VALUES]
        raw = chunk.tobytes()
        blob = _compress_chunk(lib, raw)
        total += len(blob) * 8
        dst = ctypes.create_string_buffer(len(raw))
        n = lib.ZSTD_decompress(dst, len(raw), blob, len(blob))
        if lib.ZSTD_isError(n) or n != len(raw):
            raise RuntimeError("ZSTD_decompress failed")
        out = np.frombuffer(dst.raw[:n], dtype=flat.dtype)
        if out.tobytes() != raw:
            raise RuntimeError("zstd round-trip mismatch")
    return total
