"""ctypes bindings for the native host engine (native/alpcore.cpp).

The TPU path is Pallas (kernels.falp); this is the host-side CPU fallback
— the role the reference's generated C++ kernels play for its users.
The library auto-builds on first use (g++ is in the image); all entry
points raise ``NativeUnavailable`` if no compiler is present, and callers
fall back to the oracle/jnp paths.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess

import numpy as np

_ROOT = pathlib.Path(__file__).resolve().parent.parent
_SRC = _ROOT / "native" / "alpcore.cpp"
_CACHE_DIR = pathlib.Path(
    os.environ.get("ALP_TPU_NATIVE_CACHE", _ROOT / "native" / ".cache"))


class NativeUnavailable(RuntimeError):
    pass


_lib = None


def _lib_path() -> pathlib.Path:
    """Artifact path keyed on the source content hash: a fresh checkout
    (git does not preserve mtimes) or an edited source always rebuilds,
    and stale binaries are never loaded."""
    digest = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    return _CACHE_DIR / f"libalpcore-{digest}.so"


def build(force: bool = False) -> pathlib.Path:
    lib_file = _lib_path()
    if lib_file.exists() and not force:
        return lib_file
    _CACHE_DIR.mkdir(parents=True, exist_ok=True)
    # -ffp-contract=off: GCC's default contraction would fuse the magic
    # add into an FMA and change the encode rounding semantics.
    # No -march=native: the artifact directory may be shared between
    # machines; -O2/-O3 autovectorised generic x86-64 is within noise for
    # this engine's bit loops.
    tmp = lib_file.with_suffix(".so.tmp")
    cmd = ["g++", "-O3", "-ffp-contract=off", "-shared",
           "-fPIC", "-o", str(tmp), str(_SRC)]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, lib_file)
    except (OSError, subprocess.CalledProcessError) as e:
        raise NativeUnavailable(f"failed to build alpcore: {e}") from e
    return lib_file


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


def ffor_pv(values: np.ndarray, bw: int, bases: np.ndarray) -> np.ndarray:
    """Per-vector-base batched FFOR pack (u64)."""
    n = values.shape[0]
    out = np.zeros((n, bw * 16), np.uint64)
    lib().alp_ffor_u64_pv(
        _ptr(np.ascontiguousarray(values.view(np.uint64)), ctypes.c_uint64),
        _ptr(out, ctypes.c_uint64), int(bw),
        _ptr(np.ascontiguousarray(bases.view(np.uint64)), ctypes.c_uint64),
        n)
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


def init_f64(data: np.ndarray, offset: int):
    """Rowgroup planning (sampler + top-k search + scheme decision).

    Returns (scheme, combos [k, 2] int32, k)."""
    from . import constants as C
    tc = C.DOUBLE
    combos = np.zeros((C.MAX_K_COMBINATIONS, 2), np.int32)
    k = np.zeros(1, np.int32)
    scheme = lib().alp_init_f64(
        _ptr(np.ascontiguousarray(data), ctypes.c_double),
        ctypes.c_long(len(data)), ctypes.c_long(offset),
        _ptr(tc.exp_arr, ctypes.c_double), _ptr(tc.frac_arr, ctypes.c_double),
        _ptr(tc.fact_arr, ctypes.c_int64), ctypes.c_double(tc.magic_number),
        int(tc.max_exponent), ctypes.c_long(int(tc.rd_size_threshold_limit)),
        _ptr(combos, ctypes.c_int32), _ptr(k, ctypes.c_int32))
    return scheme, combos[:max(int(k[0]), 1)], int(k[0])


def encode_f64(vectors: np.ndarray, combos: np.ndarray):
    """Full ALP encode of [n, 1024] doubles sharing top-k candidates.

    combos: [k, 2] int32 (e, f).  Returns dict of per-vector metadata,
    patched encoded ints, and ragged exception lists — semantics
    identical to the oracle/ops encode (reference encoder.hpp:241-418).
    """
    from . import constants as C
    tc = C.DOUBLE
    n = vectors.shape[0]
    k = combos.shape[0]
    fac = np.empty(n, np.uint8)
    exp = np.empty(n, np.uint8)
    bw = np.empty(n, np.uint8)
    base = np.empty(n, np.int64)
    encoded = np.empty((n, 1024), np.int64)
    exc_values = np.empty((n, 1024), np.float64)
    exc_positions = np.empty((n, 1024), np.uint16)
    exc_count = np.empty(n, np.uint16)
    lib().alp_encode_f64(
        _ptr(np.ascontiguousarray(vectors), ctypes.c_double), n,
        _ptr(np.ascontiguousarray(combos, ), ctypes.c_int32), k,
        _ptr(tc.exp_arr, ctypes.c_double), _ptr(tc.frac_arr, ctypes.c_double),
        _ptr(tc.fact_arr, ctypes.c_int64), ctypes.c_double(tc.magic_number),
        _ptr(fac, ctypes.c_uint8), _ptr(exp, ctypes.c_uint8),
        _ptr(bw, ctypes.c_uint8), _ptr(base, ctypes.c_int64),
        _ptr(encoded, ctypes.c_int64), _ptr(exc_values, ctypes.c_double),
        _ptr(exc_positions, ctypes.c_uint16), _ptr(exc_count, ctypes.c_uint16))
    return {"fac": fac, "exp": exp, "bit_width": bw, "base": base,
            "encoded": encoded, "exc_values": exc_values,
            "exc_positions": exc_positions, "exc_count": exc_count}


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
