"""ctypes bindings for the native host engine (native/alpcore.cpp).

The TPU path is Pallas (kernels.falp); this is the host-side CPU fallback
— the role the reference's generated C++ kernels play for its users.
The library auto-builds on first use (g++ is in the image); all entry
points raise ``NativeUnavailable`` if no compiler is present, and callers
fall back to the oracle/jnp paths.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_ROOT = pathlib.Path(__file__).resolve().parent.parent
_SRC = _ROOT / "native" / "alpcore.cpp"
_LIB = _ROOT / "native" / "libalpcore.so"


class NativeUnavailable(RuntimeError):
    pass


_lib = None


def build(force: bool = False) -> pathlib.Path:
    if _LIB.exists() and not force \
            and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", str(_LIB), str(_SRC)]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError) as e:
        raise NativeUnavailable(f"failed to build alpcore: {e}") from e
    return _LIB


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(str(build()))
    return _lib


def _ptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def ffor(values: np.ndarray, bw: int, base) -> np.ndarray:
    """[n, 1024] -> [n, bw * L] packed words (FastLanes layout)."""
    n = values.shape[0]
    ut = values.dtype
    L = 1024 // (ut.itemsize * 8)
    out = np.zeros((n, bw * L), ut)
    fn = {2: lib().alp_ffor_u16, 4: lib().alp_ffor_u32,
          8: lib().alp_ffor_u64}[ut.itemsize]
    ct = {2: ctypes.c_uint16, 4: ctypes.c_uint32,
          8: ctypes.c_uint64}[ut.itemsize]
    values = np.ascontiguousarray(values)
    fn(_ptr(values, ct), _ptr(out, ct), int(bw), ct(int(base)), n)
    return out


def unffor(packed: np.ndarray, bw: int, base, ut) -> np.ndarray:
    ut = np.dtype(ut)
    n = packed.shape[0]
    out = np.empty((n, 1024), ut)
    fn = {2: lib().alp_unffor_u16, 4: lib().alp_unffor_u32,
          8: lib().alp_unffor_u64}[ut.itemsize]
    ct = {2: ctypes.c_uint16, 4: ctypes.c_uint32,
          8: ctypes.c_uint64}[ut.itemsize]
    packed = np.ascontiguousarray(packed)
    fn(_ptr(packed, ct), _ptr(out, ct), int(bw), ct(int(base)), n)
    return out


def falp_f64(packed_flat: np.ndarray, offsets: np.ndarray, bws: np.ndarray,
             bases: np.ndarray, facts: np.ndarray,
             fracs: np.ndarray) -> np.ndarray:
    """Fused decode of n vectors with per-vector metadata."""
    n = len(bws)
    out = np.empty((n, 1024), np.float64)
    lib().alp_falp_f64(
        _ptr(np.ascontiguousarray(packed_flat), ctypes.c_uint64),
        _ptr(np.ascontiguousarray(offsets, ), ctypes.c_int32),
        _ptr(np.ascontiguousarray(bws), ctypes.c_uint8),
        _ptr(np.ascontiguousarray(bases), ctypes.c_int64),
        _ptr(np.ascontiguousarray(facts), ctypes.c_int64),
        _ptr(np.ascontiguousarray(fracs), ctypes.c_double),
        _ptr(out, ctypes.c_double), n)
    return out
