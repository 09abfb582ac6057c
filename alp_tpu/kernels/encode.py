"""Pallas TPU kernel: exact ALP f64 vector encode.

Computes ``n = (int64)((v * 10^e * 10^-f + MAGIC) - MAGIC)`` plus the
decode-verify exception test (reference encoder.hpp:307-400) entirely on
device, bit-exactly, using unpacked softfloat multiplies and the
integer-path magic rounding (ops.softfloat.magic_round_to_i64).

The only inputs outside the fast path's envelope are *subnormal* values
(|v| < 2^-1022): those raise a ``rare`` flag and the affected vectors
are re-encoded host-side (they are vanishingly rare in real columns and
always decode-mismatch into exceptions anyway).  Overflowing and
underflowing intermediates are exact: an overflowed multiply lands in
the magic round's e>=104 region (INT64_MIN, the cast of ±Inf), an
underflowing one in the e<=51 region's sticky tail (n = 0), matching
the C++ double pipeline case-for-case.

Layout: value bit planes [G, 64, 128] u32 x2 (hi/lo, kernels.layout
plane_to_tile of each half), per-lane constant planes for 10^e / 10^-f /
FACT.  Outputs: encoded int64 (hi, lo) planes, exception mask, rare mask.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from ..ops import softfloat as sf
from ..ops.softfloat import U64

_U32 = jnp.uint32
_I32 = jnp.int32
_BLOCK_GROUPS = 8

_UPPER_BITS = int(np.float64(C.ENCODING_UPPER_LIMIT).view(np.uint64))


def encode_verify_f64(vbits: U64, c1sig: U64, c1b, c2sig: U64, c2b,
                      fact: U64, frsig: U64, frb, *,
                      skip_wide: bool = False):
    """Unpacked-softfloat ALP encode + verify; elementwise on U64 bits.

    c1 = 10^exp (significand/biased-exp), c2 = 10^-fac, fact = FACT[fac]
    (int64), fr = FRAC[exp] decomposed.  Returns (n, exc, rare).

    ``skip_wide=True`` statically drops the magic round's region-B
    arithmetic (|x| in [2^52, 2^104)): non-special values landing there
    raise ``rare`` instead (exact host re-encode, same plumbing as
    subnormals).  With the FINAL (e, f) those values imply bit widths
    in ALP_RD territory, so real columns essentially never hit the
    fixup; the (e, f) SEARCH must keep the default False — candidate
    exponents routinely push x past 2^52.  Special values (NaN/Inf/-0.0
    replaced by ENCODING_UPPER_LIMIT, encoder.hpp:324-338) are exempt:
    whatever n they get, the verify always flags them as exceptions and
    the pack patches their slot, so their n never persists.
    """
    # replace_specials (encoder.hpp:324-338)
    mag_hi = vbits.hi & _U32(0x7FFFFFFF)
    special = (mag_hi >= _U32(0x7FF00000)) | (
        (vbits.hi == _U32(0x80000000)) & (vbits.lo == 0))
    vr = U64(jnp.where(special, _U32(_UPPER_BITS >> 32), vbits.hi),
             jnp.where(special, _U32(_UPPER_BITS & 0xFFFFFFFF), vbits.lo))

    sign = vr.hi >> 31
    be = ((vr.hi >> 20) & _U32(0x7FF)).astype(_I32)
    is_zero = ((vr.hi & _U32(0x7FFFFFFF)) | vr.lo) == 0
    rare = (be == 0) & ~is_zero                    # subnormal input
    sig_v = U64((vr.hi & _U32(0xFFFFF)) | _U32(1 << 20), vr.lo)
    e_v = be - 1023

    sig1, e1 = sf.mul_by_normal_unpacked(sig_v, e_v, c1sig, c1b)
    sig2, e2 = sf.mul_by_normal_unpacked(sig1, e1, c2sig, c2b)
    n = sf.magic_round_to_i64(sign, e2, sig2, skip_wide=skip_wide)
    if skip_wide:
        rare = rare | ((e2 >= 52) & (e2 <= 103) & ~special & ~is_zero)
    zero32 = jnp.zeros_like(n.lo)
    n = U64(jnp.where(is_zero, zero32, n.hi),
            jnp.where(is_zero, zero32, n.lo))

    # verify: decode and compare bits (decoder.hpp:128-131)
    m = sf.mul64_low(n, fact)
    d = sf.i64_to_f64_times_normal(m, frsig, frb)
    exc = ~sf.eq64(d, vr)
    return n, exc, rare


def _encode_kernel(vhi_ref, vlo_ref, c1lo, c1hi, c2lo, c2hi, flo, fhi,
                   frlo, frhi, out_hi, out_lo, out_exc, out_rare):
    vbits = U64(vhi_ref[:], vlo_ref[:])

    def dec_const(lo_ref, hi_ref):
        """FRAC/EXP constant planes -> (sig, biased) broadcast [gb,1,128]."""
        hi = hi_ref[:][:, None, :]
        lo = lo_ref[:][:, None, :]
        sig = U64((hi & _U32(0xFFFFF)) | _U32(1 << 20), lo)
        biased = ((hi >> _U32(20)) & _U32(0x7FF)).astype(_I32)
        return sig, biased

    c1sig, c1b = dec_const(c1lo, c1hi)
    c2sig, c2b = dec_const(c2lo, c2hi)
    fact = U64(fhi[:][:, None, :], flo[:][:, None, :])
    frsig, frb = dec_const(frlo, frhi)

    n, exc, rare = encode_verify_f64(vbits, c1sig, c1b, c2sig, c2b,
                                     fact, frsig, frb, skip_wide=True)
    out_hi[:] = n.hi
    out_lo[:] = n.lo
    out_exc[:] = exc.astype(_U32)
    out_rare[:] = rare.astype(_U32)


_UPPER32 = int(np.float32(C.FLOAT.encoding_upper_limit_pt).view(np.uint32))


def _encode_f32_kernel(v_ref, c1, c2, fact, frac, magicp, out_n,
                       out_exc):
    # All-native f32/i32 (TPU f32 is IEEE): replace specials, scale,
    # magic-round, cvttss2si cast semantics, decode-verify
    # (encoder.hpp:307-400 float instantiation).
    bits = v_ref[:]
    mag = bits & _U32(0x7FFFFFFF)
    special = (mag >= _U32(0x7F800000)) | (bits == _U32(0x80000000))
    vb = jnp.where(special, _U32(_UPPER32), bits)
    v = vb.view(jnp.float32)
    tmp = v * c1[:][:, None, :].view(jnp.float32)
    tmp = tmp * c2[:][:, None, :].view(jnp.float32)
    # the magic round MUST NOT be algebraically simplified: XLA folds
    # (x + c) - c (and the two-add variant) into x, deleting the
    # rounding, and Mosaic has no optimization_barrier — so the magic
    # constant arrives as a runtime input plane the compiler cannot fold
    magic = magicp[:][:, None, :].view(jnp.float32)
    r = (tmp + magic) - magic
    ok = (r >= jnp.float32(-(2.0 ** 31))) & (r < jnp.float32(2.0 ** 31))
    n = jnp.where(ok, r, jnp.float32(0)).astype(_I32)
    n = jnp.where(ok, n, _I32(-(1 << 31)))
    m = n * fact[:][:, None, :].astype(_I32)
    d = m.astype(jnp.float32) * frac[:][:, None, :].view(jnp.float32)
    out_n[:] = n.view(_U32)
    # subnormal inputs are ALWAYS exceptions in the reference: a nonzero
    # decode m * 10^-e has |d| >= 1e-10 >> min normal, so it can never
    # bit-equal a subnormal — but XLA/TPU run DAZ/FTZ, which flushes v
    # to 0.0 and makes the verify compare 0.0 == 0.0; force the flag
    # from the bit pattern (the only FTZ-reachable case, since e >= f
    # keeps tmp = v * 10^(e-f) >= v out of the subnormal range)
    subn = (mag != _U32(0)) & (mag < _U32(0x00800000))
    out_exc[:] = ((~(d == v)) | subn).astype(_U32)


@jax.jit
def _alp_encode_f32_jit(vbits, c1, c2, fact, frac, magicp):
    G = vbits.shape[0]
    gb = min(16, max(G, 1))
    pad = (-G) % gb
    if pad:
        vbits, c1, c2, fact, frac, magicp = (
            jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            for a in (vbits, c1, c2, fact, frac, magicp))
    Gp = G + pad
    meta = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _encode_f32_kernel,
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, 32, 128), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)] + [meta] * 5,
        out_specs=[pl.BlockSpec((gb, 32, 128), lambda i: (i, i * 0, i * 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((Gp, 32, 128), jnp.uint32)] * 2,
        interpret=jax.default_backend() != "tpu",
    )(vbits, c1, c2, fact, frac, magicp)
    return tuple(o[:G] for o in out)


def alp_encode_f32_tiles(vbits, c1, c2, fact, frac):
    """Encode f32 value bit planes [G, 32, 128] -> (n, exc) planes.

    Metadata per-vector lane-expanded [G, 128] u32: c1 = 10^e bits,
    c2 = 10^-f bits, fact = FACT int32, frac = FRAC bits.  Exceptions
    use float equality on the decode-verify (reference semantics; the
    specials were replaced, so no NaN ambiguity).

    The magic-round constant is materialised OUTSIDE the jit and passed
    as a runtime argument: as a traced constant, XLA's simplifier folds
    (x + M) - M into x and deletes the rounding."""
    magicp = jnp.full((vbits.shape[0], 128),
                      np.uint32(np.float32(C.FLOAT.magic_number)
                                .view(np.uint32)), jnp.uint32)
    return _alp_encode_f32_jit(vbits, c1, c2, fact, frac, magicp)


def _encode_f32_stats_kernel(v_ref, c1, c2, fact, frac, magicp, out_n,
                             out_exc, out_stats):
    """f32 encode + verify + fused per-lane analyze/patch statistics
    (the f32 twin of :func:`_encode_stats_kernel`).

    ``out_stats`` [gb, 8, 128] i32 rows per lane: 0 exception count,
    1 first-non-exception value index k (2047 when none), 2 int32 max
    over non-exceptions, 3 int32 min, 4-7 unused.  Cross-lane
    reductions finish in XLA (device_compress.finalize_encode_stats32);
    the value planes never take a second transpose pass for
    patch/count/analyze.
    """
    _encode_f32_kernel(v_ref, c1, c2, fact, frac, magicp, out_n,
                       out_exc)
    n_s = out_n[:].astype(_I32)
    ok = out_exc[:] == _U32(0)
    slot = jax.lax.broadcasted_iota(_I32, n_s.shape, 1)
    lane32 = jax.lax.broadcasted_iota(_I32, n_s.shape, 2) % _I32(32)
    k_idx = slot * _I32(32) + lane32                 # value order index
    first_k = jnp.where(ok, k_idx, _I32(2047)).min(axis=1)
    exc_cnt = _I32(32) - ok.astype(_I32).sum(axis=1, dtype=_I32)
    imin, imax = _I32(-(2**31)), _I32(2**31 - 1)
    mx = jnp.where(ok, n_s, imin).max(axis=1)
    mn = jnp.where(ok, n_s, imax).min(axis=1)
    zero = jnp.zeros_like(exc_cnt)
    out_stats[:] = jnp.stack(
        [exc_cnt, first_k, mx, mn, zero, zero, zero, zero], axis=1)


@jax.jit
def _alp_encode_f32_stats_jit(vbits, c1, c2, fact, frac, magicp):
    G = vbits.shape[0]
    gb = min(16, max(G, 1))
    pad = (-G) % gb
    if pad:
        vbits, c1, c2, fact, frac, magicp = (
            jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            for a in (vbits, c1, c2, fact, frac, magicp))
    Gp = G + pad
    meta = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                        memory_space=pltpu.VMEM)
    plane = pl.BlockSpec((gb, 32, 128), lambda i: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _encode_f32_stats_kernel,
        grid=(Gp // gb,),
        in_specs=[plane] + [meta] * 5,
        out_specs=[plane] * 2
        + [pl.BlockSpec((gb, 8, 128), lambda i: (i, i * 0, i * 0),
                        memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((Gp, 32, 128), jnp.uint32)] * 2
        + [jax.ShapeDtypeStruct((Gp, 8, 128), jnp.int32)],
        interpret=jax.default_backend() != "tpu",
    )(vbits, c1, c2, fact, frac, magicp)
    return tuple(o[:G] for o in out)


def alp_encode_f32_tiles_stats(vbits, c1, c2, fact, frac):
    """f32 encode planes -> (n, exc, stats) with analyze/patch
    statistics fused (see :func:`alp_encode_f32_tiles`)."""
    magicp = jnp.full((vbits.shape[0], 128),
                      np.uint32(np.float32(C.FLOAT.magic_number)
                                .view(np.uint32)), jnp.uint32)
    return _alp_encode_f32_stats_jit(vbits, c1, c2, fact, frac, magicp)


@jax.jit
def analyze_planes_f32(n_plane):
    """analyze_ffor for f32: [G, 32, 128] i32-as-u32 planes ->
    per-vector (bit_width, base, max) in group-major vector order
    [G*4]; max feeds the persisted enc_max plan metadata."""
    G = n_plane.shape[0]
    i = n_plane.astype(jnp.int32).reshape(G, 32, 4, 32)
    mn = i.min(axis=(1, 3)).reshape(-1)
    mx = i.max(axis=(1, 3)).reshape(-1)
    delta = mx.astype(jnp.uint32) - mn.astype(jnp.uint32)
    bw = jnp.zeros(delta.shape, jnp.int32)
    d = delta
    for s in (16, 8, 4, 2, 1):
        big = (d >> jnp.uint32(s)) != 0
        bw = bw + jnp.where(big, jnp.int32(s), 0)
        d = jnp.where(big, d >> jnp.uint32(s), d)
    bw = bw + (d != 0).astype(jnp.int32)
    return bw, mn, mx


@jax.jit
def analyze_planes_f64(nhi, nlo):
    """analyze_ffor on device: encoded int64 (hi, lo) planes
    [G, 64, 128] -> per-vector (bit_width, base, max) in group-major
    vector order [G*8].  XLA (not Pallas): 64-bit emulation is fine for
    a min/max reduction; max feeds the persisted enc_max metadata."""
    G = nhi.shape[0]
    u = (nhi.astype(jnp.uint64) << jnp.uint64(32)) | nlo.astype(jnp.uint64)
    i = u.astype(jnp.int64).reshape(G, 64, 8, 16)
    mn = i.min(axis=(1, 3)).reshape(-1)
    mx = i.max(axis=(1, 3)).reshape(-1)
    delta = (mx.astype(jnp.uint64) - mn.astype(jnp.uint64))
    bw = jnp.zeros(delta.shape, jnp.int32)
    d = delta
    for s in (32, 16, 8, 4, 2, 1):
        big = (d >> jnp.uint64(s)) != 0
        bw = bw + jnp.where(big, jnp.int32(s), 0)
        d = jnp.where(big, d >> jnp.uint64(s), d)
    bw = bw + (d != 0).astype(jnp.int32)
    return bw, mn, mx


@jax.jit
def alp_encode_f64_tiles(vhi, vlo, c1lo, c1hi, c2lo, c2hi, flo, fhi,
                         frlo, frhi):
    """Encode value bit planes [G, 64, 128] x2 -> (n_hi, n_lo, exc, rare)
    planes [G, 64, 128] each, in tile value order."""
    G = vhi.shape[0]
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    if pad:
        vhi, vlo, c1lo, c1hi, c2lo, c2hi, flo, fhi, frlo, frhi = (
            jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            for a in (vhi, vlo, c1lo, c1hi, c2lo, c2hi, flo, fhi,
                      frlo, frhi))
    Gp = G + pad
    meta = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _encode_kernel,
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, 64, 128), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)] * 2 + [meta] * 8,
        out_specs=[pl.BlockSpec((gb, 64, 128), lambda i: (i, i * 0, i * 0),
                                memory_space=pltpu.VMEM)] * 4,
        out_shape=[jax.ShapeDtypeStruct((Gp, 64, 128), jnp.uint32)] * 4,
        interpret=jax.default_backend() != "tpu",
    )(vhi, vlo, c1lo, c1hi, c2lo, c2hi, flo, fhi, frlo, frhi)
    return tuple(o[:G] for o in out)


def _encode_stats_kernel(vhi_ref, vlo_ref, c1lo, c1hi, c2lo, c2hi, flo,
                         fhi, frlo, frhi, out_hi, out_lo, out_exc,
                         out_stats):
    """Encode + verify + fused per-lane analyze/patch statistics.

    ``out_stats`` [gb, 8, 128] i32 rows per lane:
      0 exception count, 1 first-non-exception value index k (2047 when
      the lane has none), 2/3 int64 max over non-exceptions (hi signed /
      lo sign-biased), 4/5 int64 min likewise, 6 rare count, 7 unused.
    Cross-lane (per-vector) reductions finish in XLA on these tiny
    planes (device_compress.finalize_encode_stats) — the full value
    planes never take a second pass for patch/analyze.
    """
    vbits = U64(vhi_ref[:], vlo_ref[:])

    def dec_const(lo_ref, hi_ref):
        hi = hi_ref[:][:, None, :]
        lo = lo_ref[:][:, None, :]
        sig = U64((hi & _U32(0xFFFFF)) | _U32(1 << 20), lo)
        biased = ((hi >> _U32(20)) & _U32(0x7FF)).astype(_I32)
        return sig, biased

    c1sig, c1b = dec_const(c1lo, c1hi)
    c2sig, c2b = dec_const(c2lo, c2hi)
    fact = U64(fhi[:][:, None, :], flo[:][:, None, :])
    frsig, frb = dec_const(frlo, frhi)
    n, exc, rare = encode_verify_f64(vbits, c1sig, c1b, c2sig, c2b,
                                     fact, frsig, frb, skip_wide=True)
    out_hi[:] = n.hi
    out_lo[:] = n.lo
    out_exc[:] = exc.astype(_U32)

    ok = ~exc
    slot = jax.lax.broadcasted_iota(_I32, n.hi.shape, 1)
    lane16 = jax.lax.broadcasted_iota(_I32, n.hi.shape, 2) % _I32(16)
    k_idx = slot * _I32(16) + lane16                  # value order index
    first_k = jnp.where(ok, k_idx, _I32(2047)).min(axis=1)
    exc_cnt = _I32(64) - ok.astype(_I32).sum(axis=1, dtype=_I32)
    hi_s = n.hi.astype(_I32)
    lo_b = (n.lo ^ _U32(0x80000000)).astype(_I32)
    imin, imax = _I32(-(2**31)), _I32(2**31 - 1)
    mxh = jnp.where(ok, hi_s, imin).max(axis=1)
    mxl = jnp.where(ok & (hi_s == mxh[:, None, :]), lo_b, imin).max(axis=1)
    mnh = jnp.where(ok, hi_s, imax).min(axis=1)
    mnl = jnp.where(ok & (hi_s == mnh[:, None, :]), lo_b, imax).min(axis=1)
    rare_cnt = rare.astype(_I32).sum(axis=1, dtype=_I32)
    out_stats[:] = jnp.stack(
        [exc_cnt, first_k, mxh, mxl, mnh, mnl, rare_cnt,
         jnp.zeros_like(exc_cnt)], axis=1)


@jax.jit
def alp_encode_f64_tiles_stats(vhi, vlo, c1lo, c1hi, c2lo, c2hi, flo,
                               fhi, frlo, frhi):
    """Encode value bit planes -> (n_hi, n_lo, exc, stats) with analyze
    and patch statistics fused into the encode pass (stats layout in
    :func:`_encode_stats_kernel`)."""
    G = vhi.shape[0]
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    if pad:
        vhi, vlo, c1lo, c1hi, c2lo, c2hi, flo, fhi, frlo, frhi = (
            jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            for a in (vhi, vlo, c1lo, c1hi, c2lo, c2hi, flo, fhi,
                      frlo, frhi))
    Gp = G + pad
    meta = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                        memory_space=pltpu.VMEM)
    plane = pl.BlockSpec((gb, 64, 128), lambda i: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _encode_stats_kernel,
        grid=(Gp // gb,),
        in_specs=[plane] * 2 + [meta] * 8,
        out_specs=[plane] * 3
        + [pl.BlockSpec((gb, 8, 128), lambda i: (i, i * 0, i * 0),
                        memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((Gp, 64, 128), jnp.uint32)] * 3
        + [jax.ShapeDtypeStruct((Gp, 8, 128), jnp.int32)],
        interpret=jax.default_backend() != "tpu",
    )(vhi, vlo, c1lo, c1hi, c2lo, c2hi, flo, fhi, frlo, frhi)
    return tuple(o[:G] for o in out)
