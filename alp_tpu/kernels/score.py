"""Pallas TPU kernel: (e, f) candidate scoring for rowgroup planning.

The reference's encode-side hot loop outside FFOR is the exhaustive
(e, f) sweep: ~190 candidate pairs x 32 samples per sampled vector,
each scored by encode + decode + compare + FOR-range estimate
(find_top_k_combinations, encoder.hpp:139-235; second-level refinement
encoder.hpp:241-305).  Doing this in plain XLA softfloat materialises
every broadcast intermediate in HBM (~20x slower than the op count);
this kernel keeps the whole sweep in VMEM: candidate pairs live across
VPU *lanes*, samples across sublanes, and one grid step scores a whole
rowgroup (or a block of vectors) with a single non-unrolled
encode+verify op sequence (kernels.encode.encode_verify_f64).

Outputs per (segment, pair): the reference's estimated size
``S * bit_width(max - min over non-exceptions) + exceptions * 80`` and
the non-exception count — exactly the oracle's quantities, so the vote
and tie-break logic downstream is shared with the exact path.  A
``rare`` flag marks segments containing subnormal samples (outside the
fast envelope, encode.py docstring); callers re-plan those exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .encode import encode_verify_f64
from ..ops.softfloat import U64

_U32 = jnp.uint32
_I32 = jnp.int32


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _bit_length(x):
    """SWAR bit length of a u32 array (0 -> 0)."""
    bl = jnp.zeros_like(x, dtype=_I32)
    for s in (16, 8, 4, 2, 1):
        big = (x >> _U32(s)) != 0
        bl = bl + jnp.where(big, _I32(s), _I32(0))
        x = jnp.where(big, x >> _U32(s), x)
    return bl + (x != 0).astype(_I32)


def _score_kernel(shi_ref, slo_ref, c1lo, c1hi, c2lo, c2hi, flo, fhi,
                  frlo, frhi, out_est, out_ne, out_rare, *, n_seg: int,
                  seg: int, exc_bits: int):
    L = shi_ref.shape[-1]
    hi = shi_ref[0].reshape(n_seg, seg, L)
    lo = slo_ref[0].reshape(n_seg, seg, L)

    def dec_const(lo_ref, hi_ref):
        # constants are PER SEGMENT x LANE: row s of the const block is
        # segment s's candidate constants (identical rows when all
        # segments share candidates, e.g. first-level pair sweeps)
        h = hi_ref[0][:n_seg].reshape(n_seg, 1, L)
        l_ = lo_ref[0][:n_seg].reshape(n_seg, 1, L)
        sig = U64((h & _U32(0xFFFFF)) | _U32(1 << 20), l_)
        biased = ((h >> _U32(20)) & _U32(0x7FF)).astype(_I32)
        return sig, biased

    c1sig, c1b = dec_const(c1lo, c1hi)
    c2sig, c2b = dec_const(c2lo, c2hi)
    fact = U64(fhi[0][:n_seg].reshape(n_seg, 1, L),
               flo[0][:n_seg].reshape(n_seg, 1, L))
    frsig, frb = dec_const(frlo, frhi)

    n, exc, rare = encode_verify_f64(U64(hi, lo), c1sig, c1b, c2sig, c2b,
                                     fact, frsig, frb)
    ok = ~exc
    non_exc = ok.astype(_I32).sum(axis=1, dtype=_I32)                    # [n_seg, L]

    # int64 min/max over non-exceptions, two-pass lexicographic on u32
    # limbs (hi compares signed; lo biased to signed).  The all-exception
    # sentinels compose to exactly INT64_MIN / INT64_MAX, matching the
    # oracle's init values (encoder.hpp:268-269).
    hi_s = n.hi.astype(_I32)
    lo_b = (n.lo ^ _U32(0x80000000)).astype(_I32)
    imin, imax = _I32(-(2**31)), _I32(2**31 - 1)
    mxh = jnp.where(ok, hi_s, imin).max(axis=1)
    mxl = jnp.where(ok & (hi_s == mxh[:, None, :]), lo_b, imin).max(axis=1)
    mnh = jnp.where(ok, hi_s, imax).min(axis=1)
    mnl = jnp.where(ok & (hi_s == mnh[:, None, :]), lo_b, imax).min(axis=1)

    # delta = (max - min) mod 2^64 on limbs (equals the oracle's
    # unsigned-viewed subtraction, including the all-exception wrap)
    mxl_u = mxl.astype(_U32) ^ _U32(0x80000000)
    mnl_u = mnl.astype(_U32) ^ _U32(0x80000000)
    d_lo = mxl_u - mnl_u
    borrow = (mxl < mnl).astype(_U32)
    d_hi = mxh.astype(_U32) - mnh.astype(_U32) - borrow
    bits = jnp.where(d_hi != 0, _I32(32) + _bit_length(d_hi),
                     _bit_length(d_lo))
    est = (_I32(seg) * bits
           + (_I32(seg) - non_exc) * _I32(exc_bits))

    n_pad_rows = out_est.shape[1] - n_seg
    zpad = jnp.zeros((max(n_pad_rows, 1), est.shape[-1]), _I32)

    def pad8(x):
        # jnp.pad's fill constant becomes an i64 scalar under x64,
        # which Mosaic cannot lower — concatenate i32 zeros instead
        # (zero-row concats also fail to lower: skip when already full)
        return jnp.concatenate([x, zpad], axis=0) if n_pad_rows else x

    out_est[0] = pad8(est)
    out_ne[0] = pad8(non_exc)
    out_rare[0] = pad8(rare.astype(_I32).sum(axis=1, dtype=_I32))


def _pair_const_planes(tc, es, fs, L):
    """Candidate constants as 8 planes [1, 8, L] (c1=10^e, c2=10^-f,
    FACT[f], FRAC[e]; lo/hi u32 limbs), padded to L lanes with (0, 0)."""
    pe = np.zeros(L, np.int32)
    pf = np.zeros(L, np.int32)
    pe[:len(es)] = es
    pf[:len(fs)] = fs
    planes = []
    for tab, idx in ((tc.exp_arr, pe), (tc.frac_arr, pf),
                     (tc.fact_arr, pf), (tc.frac_arr, pe)):
        u = np.ascontiguousarray(tab[idx]).view(np.uint64)
        planes.append(jnp.asarray(np.broadcast_to(
            (u & np.uint64(0xFFFFFFFF)).astype(np.uint32), (1, 8, L))))
        planes.append(jnp.asarray(np.broadcast_to(
            (u >> np.uint64(32)).astype(np.uint32), (1, 8, L))))
    return tuple(planes)


def _score_rows_kernel(sam_hi_ref, sam_lo_ref, c1lo, c1hi, c2lo, c2hi,
                       flo, fhi, frlo, frhi, out_nhi, out_nlo, out_okr,
                       *, rows: int, halves: int):
    # samples [1, halves, 128] broadcast across the pair rows (row =
    # pair * halves + half); constants are full [rows, 128] planes
    # shared by every grid step (block index (0, 0))
    sh = sam_hi_ref[0]
    sl = sam_lo_ref[0]
    pp = rows // halves
    hi = jnp.broadcast_to(sh[None], (pp, halves, 128)).reshape(rows, 128)
    lo = jnp.broadcast_to(sl[None], (pp, halves, 128)).reshape(rows, 128)

    def dec(lo_ref, hi_ref):
        h = hi_ref[...]
        l_ = lo_ref[...]
        sig = U64((h & _U32(0xFFFFF)) | _U32(1 << 20), l_)
        return sig, ((h >> _U32(20)) & _U32(0x7FF)).astype(_I32)

    c1sig, c1b = dec(c1lo, c1hi)
    c2sig, c2b = dec(c2lo, c2hi)
    fact = U64(fhi[...], flo[...])
    frsig, frb = dec(frlo, frhi)
    n, exc, rare = encode_verify_f64(U64(hi, lo), c1sig, c1b, c2sig,
                                     c2b, fact, frsig, frb)
    out_nhi[0] = n.hi
    out_nlo[0] = n.lo
    out_okr[0] = (~exc).astype(_U32) | (rare.astype(_U32) << 1)


def first_level_scores_f64(chunk_hi, chunk_lo, *, tc):
    """Kernel-backed find_top_k scoring of full-rowgroup samples.

    chunk_hi/lo: [R, V, S] u32 bit planes of the first-level sample.
    Returns (est [R, V, P] i32, non_exc [R, V, P] i32, rare [R] bool)
    with P the ef_pairs count — feed ops.alp.first_level_vote.

    Layout (round 4): candidate PAIRS ride the sublane rows (8-padded,
    ~3% waste) and (vector, sample) pairs fill the 128 lanes — the
    previous pairs-on-lanes layout padded 171 candidates to 256 lanes
    (33% dead compute).  The kernel emits per-(pair, sample) n/ok
    planes; the per-(pair, vector) est/min/max reductions run in XLA on
    the 32-lane segments (identical arithmetic to the old in-kernel
    reduction — oracle parity asserted by the planner-agreement tests).
    Measured ~neutral end to end on the tunnel chip: the saved dead
    lanes are offset by the emitted n/ok planes (the old layout reduced
    over cheap SUBLANE segments in-kernel; lane-axis reductions need
    masked roll trees Mosaic has no shape-cast for).  Kept for the 3.6x
    smaller VMEM staging and the simpler constant layout.
    """
    from ..ops import alp as oalp
    es, fs = oalp.ef_pairs_arrays(tc)
    P = len(es)
    R, V, S = chunk_hi.shape
    if S != 32 or V % 4:
        # odd geometry: fall back to the lane-per-pair layout
        return _first_level_scores_f64_lanes(chunk_hi, chunk_lo, tc=tc,
                                             es=es, fs=fs)
    halves = V // 4
    P8 = -(-P // 8) * 8
    rows = P8 * halves
    # samples: [R, halves, 128] with lane = (v % 4) * 32 + s
    sam_hi = chunk_hi.reshape(R, halves, 128)
    sam_lo = chunk_lo.reshape(R, halves, 128)
    # constants: per pair, repeated per half, broadcast across lanes
    pe = np.zeros(P8, np.int32)
    pf = np.zeros(P8, np.int32)
    pe[:P] = es
    pf[:P] = fs
    consts = []
    for tab, idx in ((tc.exp_arr, pe), (tc.frac_arr, pf),
                     (tc.fact_arr, pf), (tc.frac_arr, pe)):
        u = np.ascontiguousarray(tab[idx]).view(np.uint64)
        u = np.repeat(u, halves)                    # row = p*halves + h
        consts.append(jnp.asarray(np.broadcast_to(
            (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)[:, None],
            (rows, 128))))
        consts.append(jnp.asarray(np.broadcast_to(
            (u >> np.uint64(32)).astype(np.uint32)[:, None],
            (rows, 128))))
    sample_spec = pl.BlockSpec((1, halves, 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((rows, 128), lambda i: (i * 0, i * 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, rows, 128), lambda i: (i, i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    nhi, nlo, okr = pl.pallas_call(
        functools.partial(_score_rows_kernel, rows=rows, halves=halves),
        grid=(R,),
        in_specs=[sample_spec] * 2 + [const_spec] * 8,
        out_specs=[out_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((R, rows, 128), jnp.uint32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(sam_hi, sam_lo, *consts)

    # per-(pair, vector) reductions over the 32-lane sample segments —
    # the same arithmetic as _score_kernel's in-kernel reduction
    def seg(x):
        return x.reshape(R, P8, halves, 4, 32)

    ok = seg(okr & _U32(1)) == 1
    ne = ok.astype(_I32).sum(axis=-1)              # [R, P8, halves, 4]
    hi_s = jax.lax.bitcast_convert_type(seg(nhi), _I32)
    lo_b = jax.lax.bitcast_convert_type(seg(nlo) ^ _U32(0x80000000),
                                        _I32)
    imin, imax = _I32(-(2**31)), _I32(2**31 - 1)
    mxh = jnp.where(ok, hi_s, imin).max(axis=-1)
    mxl = jnp.where(ok & (hi_s == mxh[..., None]), lo_b, imin).max(-1)
    mnh = jnp.where(ok, hi_s, imax).min(axis=-1)
    mnl = jnp.where(ok & (hi_s == mnh[..., None]), lo_b, imax).min(-1)
    mxl_u = mxl.astype(_U32) ^ _U32(0x80000000)
    mnl_u = mnl.astype(_U32) ^ _U32(0x80000000)
    d_lo = mxl_u - mnl_u
    borrow = (mxl < mnl).astype(_U32)
    d_hi = mxh.astype(_U32) - mnh.astype(_U32) - borrow
    bits = jnp.where(d_hi != 0, _I32(32) + _bit_length(d_hi),
                     _bit_length(d_lo))
    est = _I32(32) * bits + (_I32(32) - ne) * _I32(64 + 16)
    # [R, P8, halves, 4] -> [R, V, P]
    est_v = est.transpose(0, 2, 3, 1).reshape(R, V, P8)[:, :, :P]
    ne_v = ne.transpose(0, 2, 3, 1).reshape(R, V, P8)[:, :, :P]
    rare = (okr >> _U32(1)).sum(axis=(1, 2), dtype=_I32) > 0
    return est_v, ne_v, rare


def _first_level_scores_f64_lanes(chunk_hi, chunk_lo, *, tc, es, fs):
    """Fallback pairs-on-lanes layout (pre-round-4) for odd sample
    geometries; shares score_pairs_f64 with the second level."""
    P = len(es)
    L = -(-P // 128) * 128
    R, V, S = chunk_hi.shape
    seg8 = -(-V // 8) * 8
    consts = _pair_const_planes(tc, es, fs, L)
    consts = tuple(jnp.broadcast_to(c[:, :1], (R, seg8, L))
                   for c in consts)
    shi = jnp.broadcast_to(chunk_hi.reshape(R, V * S, 1), (R, V * S, L))
    slo = jnp.broadcast_to(chunk_lo.reshape(R, V * S, 1), (R, V * S, L))
    est, ne, rare = score_pairs_f64(shi, slo, consts, n_seg=V, seg=S)
    return (est[:, :V, :P], ne[:, :V, :P],
            (rare[:, :V, :P].sum(axis=(1, 2)) > 0))


def second_level_scores_f64(shi, slo, combos, k_count, *, tc,
                            sb: int = 8):
    """Kernel-backed second-level candidate scoring.

    shi/slo: [n, S] u32 bit planes of each vector's 32-sample stride;
    combos [n, 5, 2] (e, f); k_count [n].  Returns (est [n, 5] i32,
    rare [n] bool) — feed ops.alp.accept_scan.
    """
    n, S = shi.shape
    VB = 16                                  # vectors per 128-lane row
    KB = 8                                   # combo lanes per vector
    SB = sb                                  # vector rows (segments)/step
    per = VB * SB                            # 128 vectors per grid step
    n_pad = -(-n // per) * per
    G = n_pad // per

    def to_blocks(x):                        # [n, S] -> [G, SB*S, 128]
        xp = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        t = xp.reshape(G, SB, VB, S).transpose(0, 1, 3, 2)
        t = t.reshape(G, SB * S, VB)
        return jnp.repeat(t, KB, axis=2, total_repeat_length=VB * KB)

    shi_b = to_blocks(shi)
    slo_b = to_blocks(slo)
    # per-(segment, vector, combo) constants: segment = vector row,
    # lane = v_in_row * KB + k
    cp = jnp.pad(combos, ((0, n_pad - n), (0, KB - combos.shape[1]),
                          (0, 0)))
    pe = cp[:, :, 0].reshape(G, SB, VB * KB)
    pf = cp[:, :, 1].reshape(G, SB, VB * KB)
    consts = []
    for tab, idx in ((tc.exp_arr, pe), (tc.frac_arr, pf),
                     (tc.fact_arr, pf), (tc.frac_arr, pe)):
        u = jnp.asarray(np.ascontiguousarray(tab).view(np.uint64))[idx]
        consts += [(u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
                   (u >> jnp.uint64(32)).astype(jnp.uint32)]
    est, _, rare = score_pairs_f64(shi_b, slo_b, tuple(consts),
                                   n_seg=SB, seg=S)
    est_v = est[:, :SB, :].reshape(n_pad, KB)[:n, :combos.shape[1]]
    rare_v = rare[:, :SB, :].reshape(n_pad, KB)[:n].sum(axis=1) > 0
    return est_v, rare_v


_UPPER32 = None  # set lazily (constants imports numpy tables)


def _f32_upper() -> int:
    global _UPPER32
    if _UPPER32 is None:
        from .. import constants as C
        _UPPER32 = int(np.float32(C.FLOAT.encoding_upper_limit_pt)
                       .view(np.uint32))
    return _UPPER32


def _score_f32_kernel(sbits_ref, c1, c2, fact, frac, magicp, out_est,
                      out_ne, out_rare, *, n_seg: int, seg: int,
                      exc_bits: int):
    # Native-f32 twin of _score_kernel: the reference's float encode +
    # verify (encoder.hpp:307-400 float instantiation, exactly the math
    # of kernels.encode._encode_f32_kernel) scored per (segment, lane)
    # candidate.  ``rare`` flags subnormal sample inputs: hardware whose
    # f32 compare/multiply flushes denormals could mis-verify them, so
    # callers re-plan those segments with the exact host oracle.
    L = sbits_ref.shape[-1]
    bits = sbits_ref[0].reshape(n_seg, seg, L)

    def cplane(ref):
        return ref[0][:n_seg].reshape(n_seg, 1, L)

    mag = bits & _U32(0x7FFFFFFF)
    special = (mag >= _U32(0x7F800000)) | (bits == _U32(0x80000000))
    rare = (mag != 0) & (mag < _U32(0x00800000))
    vb = jnp.where(special, _U32(_f32_upper()), bits)
    v = vb.view(jnp.float32)
    tmp = v * cplane(c1).view(jnp.float32)
    tmp = tmp * cplane(c2).view(jnp.float32)
    magic = cplane(magicp).view(jnp.float32)
    r = (tmp + magic) - magic
    okr = (r >= jnp.float32(-(2.0 ** 31))) & (r < jnp.float32(2.0 ** 31))
    n = jnp.where(okr, r, jnp.float32(0)).astype(_I32)
    n = jnp.where(okr, n, _I32(-(1 << 31)))
    m = n * cplane(fact).astype(_I32)
    d = m.astype(jnp.float32) * cplane(frac).view(jnp.float32)
    ok = d == v
    non_exc = ok.astype(_I32).sum(axis=1, dtype=_I32)       # [n_seg, L]

    imin, imax = _I32(-(2**31)), _I32(2**31 - 1)
    mx = jnp.where(ok, n, imin).max(axis=1)
    mn = jnp.where(ok, n, imax).min(axis=1)
    # (max - min) mod 2^32 — all-exception sentinels wrap to delta 1,
    # the oracle's INT_MIN/INT_MAX init behaviour (encoder.hpp:268-269)
    bits_w = _bit_length(mx.astype(_U32) - mn.astype(_U32))
    est = _I32(seg) * bits_w + (_I32(seg) - non_exc) * _I32(exc_bits)

    n_pad_rows = out_est.shape[1] - n_seg
    zpad = jnp.zeros((max(n_pad_rows, 1), est.shape[-1]), _I32)

    def pad8(x):
        return jnp.concatenate([x, zpad], axis=0) if n_pad_rows else x

    out_est[0] = pad8(est)
    out_ne[0] = pad8(non_exc)
    out_rare[0] = pad8(rare.astype(_I32).sum(axis=1, dtype=_I32))


def _pair_const_planes_f32(tc, es, fs, L):
    """Candidate constants as 5 planes [1, 8, L]: c1 = 10^e bits,
    c2 = 10^-f bits, FACT[f] int32, FRAC[e] bits, magic-round bits
    (runtime plane so the compiler cannot fold the rounding away).

    Pairs whose f exceeds FACT_ARR (the float (10, 10) candidate — the
    reference reads out of bounds there, constants.hpp:63) verify
    against NaN so every sample is an exception, exactly the oracle's
    deterministic model (oracle/core.py decode_value)."""
    pe = np.zeros(L, np.int32)
    pf = np.zeros(L, np.int32)
    pe[:len(es)] = es
    pf[:len(fs)] = fs
    oob = pf >= len(tc.fact_arr)
    frac_e = tc.frac_arr[pe].view(np.uint32).copy()
    frac_e[oob] = np.uint32(0x7FC00000)               # quiet NaN
    planes = []
    for arr in (tc.exp_arr[pe].view(np.uint32),
                tc.frac_arr[pf].view(np.uint32),
                tc.fact_arr[np.where(oob, 0, pf)].astype(
                    np.int32).view(np.uint32),
                frac_e):
        planes.append(jnp.asarray(np.broadcast_to(
            np.ascontiguousarray(arr), (1, 8, L))))
    magic = np.full(L, np.float32(tc.magic_number).view(np.uint32),
                    np.uint32)
    planes.append(jnp.asarray(np.broadcast_to(magic, (1, 8, L))))
    return tuple(planes)


def first_level_scores_f32(chunk_bits, *, tc):
    """Kernel-backed find_top_k scoring of f32 full-rowgroup samples.

    chunk_bits: [R, V, S] u32 f32 bit planes of the first-level sample.
    Returns (est [R, V, P] i32, non_exc [R, V, P] i32, rare [R] bool) —
    feed ops.alp.first_level_vote."""
    from ..ops import alp as oalp
    es, fs = oalp.ef_pairs_arrays(tc)
    P = len(es)
    L = -(-P // 128) * 128
    R, V, S = chunk_bits.shape
    seg8 = -(-V // 8) * 8
    consts = _pair_const_planes_f32(tc, es, fs, L)
    consts = tuple(jnp.broadcast_to(c[:, :1], (R, seg8, L))
                   for c in consts)
    sb = jnp.broadcast_to(chunk_bits.reshape(R, V * S, 1), (R, V * S, L))
    est, ne, rare = score_pairs_f32(sb, consts, n_seg=V, seg=S)
    return (est[:, :V, :P], ne[:, :V, :P],
            (rare[:, :V, :P].sum(axis=(1, 2)) > 0))


def second_level_scores_f32(sbits, combos, k_count, *, tc, sb: int = 8):
    """Kernel-backed second-level candidate scoring, f32.

    sbits: [n, S] u32 f32 bit planes of each vector's 32-sample stride;
    combos [n, 5, 2] (e, f); k_count [n].  Returns (est [n, 5] i32,
    rare [n] bool) — feed ops.alp.accept_scan."""
    n, S = sbits.shape
    VB = 16
    KB = 8
    SB = sb
    per = VB * SB
    n_pad = -(-n // per) * per
    G = n_pad // per

    xp = jnp.pad(sbits, ((0, n_pad - n), (0, 0)))
    t = xp.reshape(G, SB, VB, S).transpose(0, 1, 3, 2).reshape(
        G, SB * S, VB)
    sb_b = jnp.repeat(t, KB, axis=2, total_repeat_length=VB * KB)

    cp = jnp.pad(combos, ((0, n_pad - n), (0, KB - combos.shape[1]),
                          (0, 0)))
    pe = cp[:, :, 0].reshape(G, SB, VB * KB)
    pf = cp[:, :, 1].reshape(G, SB, VB * KB)
    consts = []
    for tab, idx in ((tc.exp_arr, pe), (tc.frac_arr, pf), (None, pf),
                     (tc.frac_arr, pe)):
        if tab is None:
            u32 = jnp.asarray(tc.fact_arr.astype(np.int32)
                              .view(np.uint32))[idx]
        else:
            u32 = jnp.asarray(tab.view(np.uint32))[idx]
        consts.append(u32)
    consts.append(jnp.full((G, SB, VB * KB),
                           np.float32(tc.magic_number).view(np.uint32),
                           jnp.uint32))
    est, _, rare = score_pairs_f32(sb_b, tuple(consts), n_seg=SB, seg=S)
    est_v = est[:, :SB, :].reshape(n_pad, KB)[:n, :combos.shape[1]]
    rare_v = rare[:, :SB, :].reshape(n_pad, KB)[:n].sum(axis=1) > 0
    return est_v, rare_v


@functools.partial(jax.jit, static_argnames=("n_seg", "seg"))
def score_pairs_f32(sbits, consts, *, n_seg: int, seg: int):
    """Score candidate (e, f) pairs against f32 sample segments.

    sbits: [B, n_seg*seg, L] f32 bit planes pre-broadcast across the L
    candidate lanes; consts: 5 planes [B, pad8(n_seg), L] (c1, c2,
    fact, frac, magic).  Returns (est, non_exc, rare) [B, pad8(n_seg), L]
    int32."""
    B, SS, L = sbits.shape
    assert SS == n_seg * seg
    seg8 = -(-n_seg // 8) * 8
    sample_spec = pl.BlockSpec((1, SS, L), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((1, seg8, L), lambda i: (i, i * 0, i * 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, seg8, L), lambda i: (i, i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    exc_bits = 32 + 16
    out = pl.pallas_call(
        functools.partial(_score_f32_kernel, n_seg=n_seg, seg=seg,
                          exc_bits=exc_bits),
        grid=(B,),
        in_specs=[sample_spec] + [const_spec] * 5,
        out_specs=[out_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((B, seg8, L), jnp.int32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(sbits, *consts)
    return out[0], out[1], out[2]


@functools.partial(jax.jit, static_argnames=("n_seg", "seg"))
def score_pairs_f64(shi, slo, consts, *, n_seg: int, seg: int):
    """Score candidate (e, f) pairs against sample segments.

    shi/slo: [B, n_seg*seg, L] sample f64 bit planes, pre-broadcast
    across the L candidate lanes.  consts: 8 planes [B, pad8(n_seg), L]
    (c1lo, c1hi, c2lo, c2hi, factlo, facthi, frlo, frhi) — candidate
    constants per (segment row, lane).  Returns (est, non_exc, rare)
    each [B, pad8(n_seg), L] int32.
    """
    B, SS, L = shi.shape
    assert SS == n_seg * seg
    seg8 = -(-n_seg // 8) * 8
    sample_spec = pl.BlockSpec((1, SS, L), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((1, seg8, L), lambda i: (i, i * 0, i * 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, seg8, L), lambda i: (i, i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    exc_bits = 64 + 16
    out = pl.pallas_call(
        functools.partial(_score_kernel, n_seg=n_seg, seg=seg,
                          exc_bits=exc_bits),
        grid=(B,),
        in_specs=[sample_spec] * 2 + [const_spec] * 8,
        out_specs=[out_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((B, seg8, L), jnp.int32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(shi, slo, *consts)
    return out[0], out[1], out[2]
