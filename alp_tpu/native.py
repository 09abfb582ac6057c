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
_SRC_COMPETITORS = _ROOT / "native" / "competitors.cpp"
_CACHE_DIR = pathlib.Path(
    os.environ.get("ALP_TPU_NATIVE_CACHE", _ROOT / "native" / ".cache"))


class NativeUnavailable(RuntimeError):
    pass


_lib = None
_clib = None
_built: dict = {}


def _build_lib(src: pathlib.Path, name: str,
               force: bool = False) -> pathlib.Path:
    """Build ``src`` into a cache path keyed on its content hash: a
    fresh checkout (git does not preserve mtimes) or an edited source
    always rebuilds, and stale binaries are never loaded.

    -ffp-contract=off: GCC's default contraction would fuse the magic
    add into an FMA and change the encode rounding semantics.
    -march=native vectorises the encode+verify loop (AVX-512DQ vector
    f64<->i64 converts; scalar and vector cvtt have identical
    semantics, including the INT64_MIN "integer indefinite" result);
    the cache key includes the flags AND the machine, so artifact
    directories shared between machines stay safe.
    """
    # memoised per process: the hash inputs (source bytes, gcc target
    # probe subprocess, cpuinfo) cost ~10 ms — far too much to re-run
    # on every compress/decompress call
    if not force and (str(src), name) in _built:
        return _built[(str(src), name)]
    cmd_flags = ["-O3", "-march=native", "-ffp-contract=off", "-fopenmp"]
    # key on the ACTUAL instruction-set capability (-march=native output
    # depends on it): gcc's resolved -march plus the kernel's cpuinfo
    # flags — platform.machine() alone is just 'x86_64' and would let a
    # shared cache serve an AVX-512 .so to a non-AVX-512 host (SIGILL)
    try:
        march = subprocess.run(
            ["gcc", "-march=native", "-Q", "--help=target"],
            capture_output=True, text=True, timeout=30).stdout
    except Exception:
        march = ""
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    digest = hashlib.sha256(
        src.read_bytes() + " ".join(cmd_flags).encode()
        + march.encode() + flags.encode()).hexdigest()[:16]
    lib_file = _CACHE_DIR / f"lib{name}-{digest}.so"
    if lib_file.exists() and not force:
        _built[(str(src), name)] = lib_file
        return lib_file
    _CACHE_DIR.mkdir(parents=True, exist_ok=True)
    tmp = lib_file.with_suffix(".so.tmp")
    cmd = ["g++", *cmd_flags, "-shared", "-fPIC", "-o", str(tmp),
           str(src)]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, lib_file)
    except (OSError, subprocess.CalledProcessError) as e:
        raise NativeUnavailable(f"failed to build {name}: {e}") from e
    _built[(str(src), name)] = lib_file
    return lib_file


def build(force: bool = False) -> pathlib.Path:
    """Build (or fetch the content-hash-cached) alpcore library.

    ``force=True`` recompiles even when a cached artifact for the
    current source hash exists (e.g. after a compiler upgrade)."""
    return _build_lib(_SRC, "alpcore", force=force)


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(str(build()))
    return _lib


def competitors_lib() -> ctypes.CDLL:
    global _clib
    if _clib is None:
        _clib = ctypes.CDLL(str(_build_lib(_SRC_COMPETITORS,
                                           "competitors")))
    return _clib


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


def rd_decode(right_packed: np.ndarray, left_packed: np.ndarray,
              dicts: np.ndarray, dict_size: np.ndarray, rbw: int,
              lbw: int, ut) -> np.ndarray:
    """Fused batched ALP_RD decode (one (rbw, lbw) bucket): [n, rbw*L]
    right words + [n, lbw*64] u16 index words + [n, 8] u16 dictionaries
    -> [n, 1024] glued bit patterns (pre-exception-patch; indexes
    clamped to dict_size - 1 like the host decompress)."""
    ut = np.dtype(ut)
    n = right_packed.shape[0]
    out = np.empty((n, 1024), ut)
    fn = (lib().alp_rd_decode_f64 if ut.itemsize == 8
          else lib().alp_rd_decode_f32)
    ct = ctypes.c_uint64 if ut.itemsize == 8 else ctypes.c_uint32
    fn(_ptr(np.ascontiguousarray(right_packed), ct),
       _ptr(np.ascontiguousarray(left_packed), ctypes.c_uint16),
       _ptr(np.ascontiguousarray(dicts.astype(np.uint16, copy=False)),
            ctypes.c_uint16),
       _ptr(np.ascontiguousarray(dict_size.astype(np.int32)),
            ctypes.c_int32),
       int(rbw), int(lbw), _ptr(out, ct), n)
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
             fracs: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
    """Fused decode of n vectors with per-vector metadata; decodes into
    ``out`` [n, 1024] f64 when given (no copy-out pass)."""
    n = len(bws)
    if out is None:
        out = np.empty((n, 1024), np.float64)
    assert out.shape == (n, 1024) and out.flags.c_contiguous
    lib().alp_falp_f64(
        _ptr(np.ascontiguousarray(packed_flat), ctypes.c_uint64),
        _ptr(np.ascontiguousarray(offsets, ), ctypes.c_int32),
        _ptr(np.ascontiguousarray(bws), ctypes.c_uint8),
        _ptr(np.ascontiguousarray(bases), ctypes.c_int64),
        _ptr(np.ascontiguousarray(facts), ctypes.c_int64),
        _ptr(np.ascontiguousarray(fracs), ctypes.c_double),
        _ptr(out, ctypes.c_double), n)
    return out


# ---------------------------------------------------------------------------
# Competitor codecs (native/competitors.cpp): single-core C++ XOR-family
# encode/decode for table-6-style speed comparisons against the TPU path.
# ---------------------------------------------------------------------------

_RING_CODECS = {"chimp128", "patas"}


def competitor_encode(name: str, data: np.ndarray):
    """Encode f64 ``data`` with a native competitor codec.

    Returns (stream u64[:], n_bits).  Names: gorillas, chimp, chimp128,
    patas."""
    bits = np.ascontiguousarray(data).view(np.uint64)
    n = len(bits)
    # worst case ~(W + meta) bits per value, round up generously
    out = np.zeros(n + (n * 88) // 64 + 4, np.uint64)
    cl = competitors_lib()
    fn = getattr(cl, f"cmp_{name}_encode_f64")
    fn.restype = ctypes.c_long
    if name in _RING_CODECS:
        scratch = np.zeros(1 << 14, np.int64)
        nbits = fn(_ptr(bits, ctypes.c_uint64), ctypes.c_long(n),
                   _ptr(out, ctypes.c_uint64), _ptr(scratch, ctypes.c_int64))
    else:
        nbits = fn(_ptr(bits, ctypes.c_uint64), ctypes.c_long(n),
                   _ptr(out, ctypes.c_uint64))
    return out[: (nbits + 63) // 64], int(nbits)


def competitor_decode(name: str, stream: np.ndarray, n: int,
                      out: np.ndarray | None = None) -> np.ndarray:
    """Decode ``n`` doubles from a native competitor stream.

    ``out``: optional preallocated u64[n] buffer (steady-state benches
    pass a pre-touched buffer; fresh pages fault ~15 us each on some
    hosts, swamping the codec)."""
    if out is None:
        out = np.empty(n, np.uint64)
    cl = competitors_lib()
    fn = getattr(cl, f"cmp_{name}_decode_f64")
    fn(_ptr(np.ascontiguousarray(stream), ctypes.c_uint64),
       ctypes.c_long(n), _ptr(out, ctypes.c_uint64))
    return out.view(np.float64)


_CODEC_IDS = {"gorillas": 0, "chimp": 1, "chimp128": 2, "patas": 3,
              "pde": 4}


def pde_decode(sig: np.ndarray, exp: np.ndarray,
               patches: np.ndarray) -> np.ndarray:
    """Native single-core PDE decode (competitors.cpp
    cmp_pde_decode_f64) + vectorised patch scatter; bit-identical to
    competitors.pde_codec.pde_decode."""
    n = len(sig)
    out = np.empty(n, np.float64)
    cl = competitors_lib()
    cl.cmp_pde_decode_f64(
        _ptr(np.ascontiguousarray(sig), ctypes.c_int32),
        _ptr(np.ascontiguousarray(exp), ctypes.c_uint8),
        ctypes.c_long(n), _ptr(out, ctypes.c_double))
    if len(patches):
        out[exp == 23] = patches
    return out


def pde_chunk_stream(sig: np.ndarray, exp: np.ndarray) -> np.ndarray:
    """One PDE chunk as u64 words for the chunked decoder: sig (i32[n])
    then exp (u8[n]), each padded to whole words."""
    n = len(sig)
    sig_words = (n + 1) // 2
    exp_words = (n + 7) // 8
    buf = np.zeros(sig_words + exp_words, np.uint64)
    buf[:sig_words].view(np.int32)[:n] = sig
    buf[sig_words:].view(np.uint8)[:n] = exp
    return buf


def competitor_decode_chunked(name: str, streams: list, ns: np.ndarray,
                              out: np.ndarray, threads: int) -> None:
    """Thread-parallel decode of independent per-chunk streams
    (competitors.cpp cmp_chunked_decode_f64, OpenMP over chunks — the
    reference's TBB-morsel analog at threads in {1, 8, 16}).

    ``streams``: list of u64 word arrays (one per chunk); ``ns``: chunk
    value counts; ``out``: preallocated u64[sum(ns)] (f64 bits; PDE
    exceptions must be patched by the caller afterwards)."""
    word_off = np.zeros(len(streams) + 1, np.int64)
    np.cumsum([len(s) for s in streams], out=word_off[1:])
    flat = (np.concatenate(streams) if streams
            else np.zeros(1, np.uint64))
    out_off = np.zeros(len(streams), np.int64)
    np.cumsum(ns[:-1], out=out_off[1:])
    cl = competitors_lib()
    cl.cmp_chunked_decode_f64(
        ctypes.c_int(_CODEC_IDS[name]), _ptr(flat, ctypes.c_uint64),
        _ptr(word_off, ctypes.c_long),
        _ptr(np.ascontiguousarray(ns, np.int64), ctypes.c_long),
        _ptr(out_off, ctypes.c_long), ctypes.c_long(len(streams)),
        _ptr(out, ctypes.c_uint64), ctypes.c_int(threads))


def competitor_encode_chunked(name: str, data: np.ndarray, chunk: int,
                              threads: int):
    """Thread-parallel competitor ENCODE over independent rowgroup-sized
    chunks (competitors.cpp cmp_chunked_encode_f64, OpenMP — the
    table-6 COMP-column analog; reference
    publication/tables/table_6.md COMP1 measures the same encode side
    under the e2e TBB pool).

    Returns ``(flat u64 stream words, word_off i64[n_chunks],
    out_words i64[n_chunks], ns i64[n_chunks])`` — per-chunk stream c is
    ``flat[word_off[c] : word_off[c] + out_words[c]]``, decodable with
    :func:`competitor_decode_chunked` for validation."""
    bits = np.ascontiguousarray(data).view(np.uint64)
    n = len(bits)
    n_chunks = -(-n // chunk)
    ns = np.full(n_chunks, chunk, np.int64)
    if n % chunk:
        ns[-1] = n % chunk
    in_off = np.zeros(n_chunks, np.int64)
    np.cumsum(ns[:-1], out=in_off[1:])
    if name == "pde":
        caps = (ns + 1) // 2 + (ns + 7) // 8
    else:
        caps = ns + (ns * 88) // 64 + 4       # worst-case bits/value
    cap_off = np.zeros(n_chunks, np.int64)
    np.cumsum(caps[:-1], out=cap_off[1:])
    out = _scratch("cmp_enc", int(caps.sum()), (int(caps.sum()),),
                   np.uint64)
    out_words = np.zeros(n_chunks, np.int64)
    cl = competitors_lib()
    cl.cmp_chunked_encode_f64(
        ctypes.c_int(_CODEC_IDS[name]), _ptr(bits, ctypes.c_uint64),
        _ptr(in_off, ctypes.c_long), _ptr(ns, ctypes.c_long),
        ctypes.c_long(n_chunks), _ptr(out, ctypes.c_uint64),
        _ptr(cap_off, ctypes.c_long), _ptr(out_words, ctypes.c_long),
        ctypes.c_int(threads))
    return out, cap_off, out_words, ns


_SCRATCH: dict = {}


def _scratch(name: str, n: int, shape, dtype):
    """Reusable page-warm output buffers for the whole-column encode:
    np.empty per call costs a fresh-page fault storm on the GB-scale
    exc/encoded arrays (~20% of host compress).  Callers (container
    _compress) copy out everything they retain, so reuse is safe; the
    pool keeps one buffer per (name, dtype) grown geometrically."""
    key = (name, np.dtype(dtype).str)
    buf = _SCRATCH.get(key)
    need = int(np.prod(shape))
    if buf is None or buf.size < need:
        cap = max(need, int((buf.size if buf is not None else 0) * 2))
        buf = np.empty(cap, dtype)
        _SCRATCH[key] = buf
    return buf[:need].reshape(shape)


def encode_f64_multi(vectors: np.ndarray, combos_rg: np.ndarray,
                     k_rg: np.ndarray,
                     vectors_per_rg: int = 100):
    """Whole-column ALP encode: one native call, one OpenMP region.

    vectors: [n, 1024] f64; combos_rg: [n_rg, max_k, 2] int32 (e, f)
    padded; k_rg: [n_rg] int32.  Same outputs as :func:`encode_f64`.
    The big outputs live in a reused scratch pool — consume (copy out)
    before the next encode call.
    """
    from . import constants as C
    tc = C.DOUBLE
    n = vectors.shape[0]
    max_k = combos_rg.shape[1]
    fac = np.empty(n, np.uint8)
    exp = np.empty(n, np.uint8)
    bw = np.empty(n, np.uint8)
    base = np.empty(n, np.int64)
    encoded = _scratch("enc64", n, (n, 1024), np.int64)
    exc_values = _scratch("excv64", n, (n, 1024), np.float64)
    exc_positions = _scratch("excp64", n, (n, 1024), np.uint16)
    exc_count = np.empty(n, np.uint16)
    enc_max = np.empty(n, np.uint64)
    lib().alp_encode_f64_multi(
        _ptr(np.ascontiguousarray(vectors), ctypes.c_double),
        ctypes.c_long(n),
        _ptr(np.ascontiguousarray(combos_rg, ), ctypes.c_int32),
        _ptr(np.ascontiguousarray(k_rg, ), ctypes.c_int32),
        int(max_k), int(vectors_per_rg),
        _ptr(tc.exp_arr, ctypes.c_double), _ptr(tc.frac_arr, ctypes.c_double),
        _ptr(tc.fact_arr, ctypes.c_int64), ctypes.c_double(tc.magic_number),
        _ptr(fac, ctypes.c_uint8), _ptr(exp, ctypes.c_uint8),
        _ptr(bw, ctypes.c_uint8), _ptr(base, ctypes.c_int64),
        _ptr(encoded, ctypes.c_int64), _ptr(exc_values, ctypes.c_double),
        _ptr(exc_positions, ctypes.c_uint16),
        _ptr(exc_count, ctypes.c_uint16),
        _ptr(enc_max, ctypes.c_uint64))
    return {"fac": fac, "exp": exp, "bit_width": bw, "base": base,
            "encoded": encoded, "exc_values": exc_values,
            "exc_positions": exc_positions, "exc_count": exc_count,
            "enc_max": enc_max}


def ffor_ragged(encoded: np.ndarray, bw: np.ndarray, base: np.ndarray):
    """Whole-column ragged FFOR pack in ONE native call: every vector
    packed at its own bit width into a flat u64 buffer; returns
    (flat_words, word_offsets [n+1]) — slice vector v's packed words as
    ``flat[off[v]:off[v+1]]`` (zero-copy views)."""
    n = encoded.shape[0]
    bw = np.ascontiguousarray(bw, np.uint8)
    sizes = bw.astype(np.int64) * 16
    off = np.zeros(n + 1, np.int64)
    np.cumsum(sizes, out=off[1:])
    flat = np.empty(int(off[-1]), np.uint64)
    lib().alp_ffor_ragged_u64(
        _ptr(np.ascontiguousarray(encoded).view(np.uint64),
             ctypes.c_uint64),
        _ptr(flat, ctypes.c_uint64), _ptr(bw, ctypes.c_uint8),
        _ptr(np.ascontiguousarray(base).view(np.uint64), ctypes.c_uint64),
        _ptr(off, ctypes.c_int64), ctypes.c_long(n))
    return flat, off


def encode_f32_multi(vectors: np.ndarray, combos_rg: np.ndarray,
                     k_rg: np.ndarray,
                     vectors_per_rg: int = 100):
    """Whole-column ALP float encode (the f32 twin of
    :func:`encode_f64_multi`; float reference semantics incl. the
    FACT_ARR OOB quirk and INT32_MIN safe-encode fallback)."""
    from . import constants as C
    tc = C.FLOAT
    n = vectors.shape[0]
    max_k = combos_rg.shape[1]
    fac = np.empty(n, np.uint8)
    exp = np.empty(n, np.uint8)
    bw = np.empty(n, np.uint8)
    base = np.empty(n, np.int32)
    encoded = _scratch("enc32", n, (n, 1024), np.int32)
    exc_values = _scratch("excv32", n, (n, 1024), np.float32)
    exc_positions = _scratch("excp32", n, (n, 1024), np.uint16)
    exc_count = np.empty(n, np.uint16)
    enc_max = np.empty(n, np.uint64)
    lib().alp_encode_f32_multi(
        _ptr(np.ascontiguousarray(vectors, np.float32), ctypes.c_float),
        ctypes.c_long(n),
        _ptr(np.ascontiguousarray(combos_rg), ctypes.c_int32),
        _ptr(np.ascontiguousarray(k_rg), ctypes.c_int32),
        int(max_k), int(vectors_per_rg),
        _ptr(tc.exp_arr, ctypes.c_float), _ptr(tc.frac_arr, ctypes.c_float),
        _ptr(tc.fact_arr, ctypes.c_int32), int(len(tc.fact_arr)),
        ctypes.c_float(tc.magic_number),
        ctypes.c_float(tc.encoding_upper_limit_pt),
        _ptr(fac, ctypes.c_uint8), _ptr(exp, ctypes.c_uint8),
        _ptr(bw, ctypes.c_uint8), _ptr(base, ctypes.c_int32),
        _ptr(encoded, ctypes.c_int32), _ptr(exc_values, ctypes.c_float),
        _ptr(exc_positions, ctypes.c_uint16),
        _ptr(exc_count, ctypes.c_uint16),
        _ptr(enc_max, ctypes.c_uint64))
    return {"fac": fac, "exp": exp, "bit_width": bw, "base": base,
            "encoded": encoded, "exc_values": exc_values,
            "exc_positions": exc_positions, "exc_count": exc_count,
            "enc_max": enc_max}


def ffor_ragged32(encoded: np.ndarray, bw: np.ndarray, base: np.ndarray):
    """Whole-column ragged FFOR pack, u32 lanes (f32 twin of
    :func:`ffor_ragged`; per-vector word size = bw * 32)."""
    n = encoded.shape[0]
    bw = np.ascontiguousarray(bw, np.uint8)
    sizes = bw.astype(np.int64) * 32
    off = np.zeros(n + 1, np.int64)
    np.cumsum(sizes, out=off[1:])
    flat = np.empty(int(off[-1]), np.uint32)
    lib().alp_ffor_ragged_u32(
        _ptr(np.ascontiguousarray(encoded).view(np.uint32),
             ctypes.c_uint32),
        _ptr(flat, ctypes.c_uint32), _ptr(bw, ctypes.c_uint8),
        _ptr(np.ascontiguousarray(base).view(np.uint32), ctypes.c_uint32),
        _ptr(off, ctypes.c_int64), ctypes.c_long(n))
    return flat, off


def init_f32_multi(data: np.ndarray, n_rg: int):
    """Whole-column float rowgroup planning (f32 twin of
    :func:`init_f64_multi`)."""
    from . import constants as C
    tc = C.FLOAT
    schemes = np.empty(n_rg, np.int32)
    combos = np.zeros((n_rg, C.MAX_K_COMBINATIONS, 2), np.int32)
    k = np.zeros(n_rg, np.int32)
    lib().alp_init_f32_multi(
        _ptr(np.ascontiguousarray(data, np.float32), ctypes.c_float),
        ctypes.c_long(len(data)), ctypes.c_long(n_rg),
        int(C.N_VECTORS_PER_ROWGROUP), int(C.MAX_K_COMBINATIONS),
        _ptr(tc.exp_arr, ctypes.c_float), _ptr(tc.frac_arr, ctypes.c_float),
        _ptr(tc.fact_arr, ctypes.c_int32), int(len(tc.fact_arr)),
        ctypes.c_float(tc.magic_number),
        ctypes.c_float(tc.encoding_upper_limit_pt),
        int(tc.max_exponent), ctypes.c_long(int(tc.rd_size_threshold_limit)),
        _ptr(schemes, ctypes.c_int32), _ptr(combos, ctypes.c_int32),
        _ptr(k, ctypes.c_int32))
    return schemes, combos, k


def falp_f32(packed_flat: np.ndarray, offsets: np.ndarray, bws: np.ndarray,
             bases: np.ndarray, facts: np.ndarray,
             fracs: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
    """Fused float decode of n vectors with per-vector metadata (f32
    twin of :func:`falp_f64`)."""
    n = len(bws)
    if out is None:
        out = np.empty((n, 1024), np.float32)
    assert out.shape == (n, 1024) and out.flags.c_contiguous
    lib().alp_falp_f32(
        _ptr(np.ascontiguousarray(packed_flat), ctypes.c_uint32),
        _ptr(np.ascontiguousarray(offsets), ctypes.c_int32),
        _ptr(np.ascontiguousarray(bws), ctypes.c_uint8),
        _ptr(np.ascontiguousarray(bases), ctypes.c_int32),
        _ptr(np.ascontiguousarray(facts), ctypes.c_int32),
        _ptr(np.ascontiguousarray(fracs), ctypes.c_float),
        _ptr(out, ctypes.c_float), n)
    return out


def init_f64_multi(data: np.ndarray, n_rg: int):
    """Whole-column rowgroup planning in one native call (one OpenMP
    region).  Returns (schemes [n_rg], combos [n_rg, 5, 2], k [n_rg])."""
    from . import constants as C
    tc = C.DOUBLE
    schemes = np.empty(n_rg, np.int32)
    combos = np.zeros((n_rg, C.MAX_K_COMBINATIONS, 2), np.int32)
    k = np.zeros(n_rg, np.int32)
    lib().alp_init_f64_multi(
        _ptr(np.ascontiguousarray(data), ctypes.c_double),
        ctypes.c_long(len(data)), ctypes.c_long(n_rg),
        int(C.N_VECTORS_PER_ROWGROUP), int(C.MAX_K_COMBINATIONS),
        _ptr(tc.exp_arr, ctypes.c_double), _ptr(tc.frac_arr, ctypes.c_double),
        _ptr(tc.fact_arr, ctypes.c_int64), ctypes.c_double(tc.magic_number),
        int(tc.max_exponent), ctypes.c_long(int(tc.rd_size_threshold_limit)),
        _ptr(schemes, ctypes.c_int32), _ptr(combos, ctypes.c_int32),
        _ptr(k, ctypes.c_int32))
    return schemes, combos, k
