"""Vectorized query engine over compressed columns (end-to-end analog).

The reference's end-to-end benchmark runs Tectorwise-style queries whose
pipelines call the fused falp decode per 1024-vector inside the scan
(reference publication/source_code/bench_end_to_end/src/benchmarks/alp/
queries/q1.cpp:64-88, TBB morsels over 128x1024-value blocks; SCAN/SUM
query set in include/benchmarks/alp/config.hpp:16-92).  The TPU
equivalent keeps decompressed data on device: the decode plan's output
planes feed jnp reductions directly, so SCAN+SUM never materialise
host-side — the pipeline-fusion property the reference demonstrates
against per-column materialisation.

Padding note: decode plans pad each bucket to whole 128-lane groups; the
pad vectors decode the FOR base (bw contributes 0), so aggregates mask
the trailing pad lanes of the last group before reducing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C
from .kernels import decode as kdecode


def _last_group_mask(g, slots: int, lanes_per_vec: int, per_group: int,
                     n_valid_last: int, has_partial_vector: bool):
    """[slots, 128] bool mask of valid values in the LAST group of a bucket.

    Masks (a) whole pad *vectors* (lanes of rows beyond ``g.n_vectors``)
    and (b), when the column's trailing partial vector lives in this
    bucket, the pad *values* inside that vector (positions >=
    ``n_valid_last``; the container pads them with the column's final
    value, container._pad_to_vectors).
    """
    L = lanes_per_vec
    used = g.n_vectors % per_group
    if used == 0:
        used = per_group
    mask = np.broadcast_to(np.arange(128) < used * L, (slots, 128)).copy()
    if has_partial_vector:
        # the partial vector is the highest vector id, hence the last row
        # of this bucket: lanes [within*L, (within+1)*L) of the last group
        within = (g.n_vectors - 1) % per_group
        for lane in range(L):
            mask[:, within * L + lane] = (
                np.arange(slots) * L + lane) < n_valid_last
    return jnp.asarray(mask)


def query_sum(col) -> float:
    """SUM(column), EXACT: the correctly-rounded sum of the column's
    floats (bit-identical to ``math.fsum``), computed on device.

    XLA's float64 on TPU is emulated (double-f32, ~49-bit adds), so
    floating accumulation is neither exact nor deterministic across
    reduction orders.  Instead each value is decomposed with exact
    integer ops into signed digits of ``mantissa << exponent`` in
    32-bit exponent windows — a fixed-point superaccumulator — and the
    host combines the window totals with Python bignums, rounding ONCE
    to float.

    f64 columns run this FUSED into the decode kernels
    (kernels.falp.falp_decode_f64_variant_exact_sum): the decoded
    planes never leave VMEM, only [16, 128]-per-group i32 window
    partials do, so the exact SUM runs at fused-scan speed.  f32
    columns (and rare out-of-envelope ALP_RD buckets) take the general
    XLA segment-sum path (:func:`_query_sum_xla`).
    """
    if col.n_values == 0:
        return 0.0
    total_int, nan_c, pinf, ninf, scale = _query_sum_raw(col)
    return _finish_sum(total_int, nan_c, pinf, ninf, scale)


def query_mean(col) -> float:
    """MEAN(column), correctly rounded: the exact rational
    ``sum / n`` (superaccumulator total over ``n``) rounded ONCE to
    float — one step beyond even ``math.fsum(x) / n``, which rounds
    twice."""
    if col.n_values == 0:
        return float("nan")
    total_int, nan_c, pinf, ninf, scale = _query_sum_raw(col)
    if nan_c or (pinf and ninf):
        return float("nan")
    if pinf:
        return float("inf")
    if ninf:
        return float("-inf")
    if total_int == 0:
        return 0.0
    from fractions import Fraction
    return float(Fraction(total_int, col.n_values << scale))


def _query_sum_raw(col):
    """(total_int, nan, pinf, ninf, scale_pow) of the exact SUM."""
    if col.dtype == np.float64:
        return _query_sum_f64_fused(col) + (1075,)
    return _query_sum_f32_fused(col) + (150,)


def _query_sum_xla(col, plan=None) -> float:
    """General exact SUM via decoded planes + XLA segment-sum windows
    (any dtype, any value range); ``plan`` may restrict the buckets."""
    plan = plan or col.plan()
    outs = plan.run(patch=True)
    total_int, nan_c, pinf, ninf = _exact_sum_ints(col, plan, outs)
    scale_pow = 1075 if col.dtype == np.float64 else 150
    return _finish_sum(total_int, nan_c, pinf, ninf, scale_pow)


def _finish_sum(total_int: int, nan_c: int, pinf: int, ninf: int,
                scale_pow: int) -> float:
    if nan_c or (pinf and ninf):
        return float("nan")
    if pinf:
        return float("inf")
    if ninf:
        return float("-inf")
    if total_int == 0:
        return 0.0
    from fractions import Fraction
    return float(Fraction(total_int, 1 << scale_pow))


def _f64_fixed(bits: int):
    """Host mirror of one value's superaccumulator contribution:
    (signed ``m' << e_eff`` integer, class) of an f64 bit pattern;
    class 0 finite, 1 nan, 2 +inf, 3 -inf."""
    e = (bits >> 52) & 0x7FF
    m = bits & ((1 << 52) - 1)
    s = bits >> 63
    if e == 2047:
        return 0, (1 if m else (3 if s else 2))
    mp = m | (1 << 52) if e else m
    v = mp << max(e, 1)
    return (-v if s else v), 0


def _exception_sum_correction(col, g):
    """Exact fused-SUM correction for a group's exceptions: the kernel
    summed the PATCHED slot value (the vector's fill), so add
    fixed(true stored value) - fixed(decoded slot value) per exception.
    Returns (total_int delta, nan, pinf, ninf deltas)."""
    if g.exc_g is None or not g.exc_g.shape[0]:
        return 0, 0, 0, 0
    true_bits, dec_bits = _group_exception_bits(col, g)
    ti = 0
    cls_c = [0, 0, 0, 0]
    for tb, db in zip(true_bits, dec_bits):
        dv, _ = _f64_fixed(int(db))     # decoded fill: always finite
        ti -= dv
        tv, cls = _f64_fixed(int(tb))
        ti += tv
        cls_c[cls] += 1
    return ti, cls_c[1], cls_c[2], cls_c[3]


def _query_sum_f64_fused(col):
    """Exact f64 SUM raws (total_int, nan, pinf, ninf) with the
    superaccumulator FUSED into the decode kernels (:func:`query_sum`)."""
    from .kernels import falp as kfalp
    plan = col.plan()
    total_int = 0
    nan_c = pinf = ninf = 0
    n_valid_last = col.n_values - (col.n_vectors - 1) * C.VECTOR_SIZE
    v_last = col.n_vectors - 1
    last_fellback = False
    for g in plan.groups:
        args = kdecode.group_arrays(g)
        patched = False
        if g.scheme == C.SCHEME_ALP_RD or g.variant == "const":
            out = kdecode.group_decode(g, np.float64)(*args)
            if (g.scheme == C.SCHEME_ALP_RD and g.exc_g is not None
                    and g.exc_g.shape[0]):
                idx = (g.exc_g, g.exc_slot, g.exc_lane)
                out = (out[0].at[idx].set(g.exc_hi),
                       out[1].at[idx].set(g.exc_lo))
                patched = True
            rows = kfalp.exact_sum_planes_f64(out[0], out[1])
        else:
            rows = kfalp.falp_decode_f64_variant_exact_sum(
                args[0], tuple(args[1:]), variant=g.variant, bw=g.bw,
                flags=g.flags)
        # zero the pad-vector lanes of the bucket's last group, then
        # reduce the [G, 16, 128] rows to [16] exactly on device (i64)
        used = g.n_vectors % 8 or 8
        lane_ok = jnp.arange(128) < used * 16
        rows = rows.at[-1].set(
            jnp.where(lane_ok[None, :], rows[-1], jnp.int32(0)))
        t = np.asarray(rows.astype(jnp.int64).sum(axis=(0, 2)))
        if int(t[15]):
            # out-of-envelope nonzero mantissas (raw ALP_RD patterns,
            # e.g. subnormals): the general path for just this bucket
            sub = kdecode.DecodePlan(plan.dtype, plan.n_vectors, [g], 0)
            outs = sub.run(patch=True)
            ti, nc, pi, ni = _exact_sum_ints(col, sub, outs)
            total_int += ti
            nan_c += nc; pinf += pi; ninf += ni
            if v_last in g.vec_indices:
                last_fellback = True    # pads already masked there
            continue
        for w in range(kfalp._SUM_NWIN):
            tw = int(t[w]) + (int(t[w + kfalp._SUM_NWIN]) << 16)
            if tw:
                total_int += tw << (32 * (kfalp._SUM_W0 + w))
        nan_c += int(t[12]); pinf += int(t[13]); ninf += int(t[14])
        if not patched:
            ti, nc, pi, ni = _exception_sum_correction(col, g)
            total_int += ti
            nan_c += nc; pinf += pi; ninf += ni
    # padded tail of a partial last vector: after the exception
    # corrections every pad slot was accounted as exactly the column's
    # final value (the container pads with it; round-trip is bit-exact)
    pad_count = C.VECTOR_SIZE - n_valid_last
    if pad_count and not last_fellback:
        pos = np.int64(n_valid_last - 1)
        exc_pos = col.exc_positions[v_last]
        hit = np.nonzero(exc_pos == pos)[0]
        rg = v_last // C.N_VECTORS_PER_ROWGROUP
        if col.rg_scheme[rg] == C.SCHEME_ALP_RD:
            left = (int(col.exc_values[v_last][hit[0]]) if hit.size
                    else None)
            bits = _rd_bits_at(col, int(v_last), int(pos), left)
        elif hit.size:
            bits = int(np.asarray(col.exc_values[v_last][hit[0]],
                                  np.float64).view(np.uint64))
        else:
            bits = int(_decode_positions(col, np.array([v_last]),
                                         np.array([pos]))[0])
        v, cls = _f64_fixed(int(bits))
        if cls == 0:
            total_int -= pad_count * v
        elif cls == 1:
            nan_c -= pad_count
        elif cls == 2:
            pinf -= pad_count
        else:
            ninf -= pad_count
    return total_int, nan_c, pinf, ninf


def _f32_fixed(bits: int):
    """f32 twin of :func:`_f64_fixed` (scale 2^-150)."""
    e = (bits >> 23) & 0xFF
    m = bits & ((1 << 23) - 1)
    s = bits >> 31
    if e == 255:
        return 0, (1 if m else (3 if s else 2))
    mp = m | (1 << 23) if e else m
    v = mp << max(e, 1)
    return (-v if s else v), 0


def _exception_sum_correction32(col, g):
    """f32 twin of :func:`_exception_sum_correction`."""
    if g.exc_g is None or not g.exc_g.shape[0]:
        return 0, 0, 0, 0
    true_bits, dec_bits = _group_exception_bits(col, g)
    ti = 0
    cls_c = [0, 0, 0, 0]
    for tb, db in zip(true_bits, dec_bits):
        dv, _ = _f32_fixed(int(db))
        ti -= dv
        tv, cls = _f32_fixed(int(tb))
        ti += tv
        cls_c[cls] += 1
    return ti, cls_c[1], cls_c[2], cls_c[3]


def _query_sum_f32_fused(col):
    """Exact f32 SUM raws (f32 twin of :func:`_query_sum_f64_fused`;
    scale 2^-150)."""
    from .kernels import falp as kfalp
    plan = col.plan()
    total_int = 0
    nan_c = pinf = ninf = 0
    n_valid_last = col.n_values - (col.n_vectors - 1) * C.VECTOR_SIZE
    v_last = col.n_vectors - 1
    last_fellback = False
    for g in plan.groups:
        args = kdecode.group_arrays(g)
        patched = False
        if g.scheme == C.SCHEME_ALP_RD:
            out = kdecode.group_decode(g, np.float32)(*args)
            if g.exc_g is not None and g.exc_g.shape[0]:
                out = out.at[g.exc_g, g.exc_slot, g.exc_lane].set(
                    g.exc_lo)
                patched = True
            rows = kfalp.exact_sum_planes_f32(out)
        else:
            tiles, base, fact, frac = args
            rows = kfalp.falp_decode_f32_exact_sum(tiles, base, fact,
                                                   frac, bw=g.bw)
        used = g.n_vectors % 4 or 4
        lane_ok = jnp.arange(128) < used * 32
        rows = rows.at[-1].set(
            jnp.where(lane_ok[None, :], rows[-1], jnp.int32(0)))
        t = np.asarray(rows.astype(jnp.int64).sum(axis=(0, 2)))
        if int(t[15]):
            sub = kdecode.DecodePlan(plan.dtype, plan.n_vectors, [g], 0)
            outs = sub.run(patch=True)
            ti, nc, pi, ni = _exact_sum_ints(col, sub, outs)
            total_int += ti
            nan_c += nc; pinf += pi; ninf += ni
            if v_last in g.vec_indices:
                last_fellback = True
            continue
        for w in range(kfalp._SUM32_NWIN):
            tw = int(t[w]) + (int(t[w + kfalp._SUM32_NWIN]) << 16)
            if tw:
                total_int += tw << (32 * (kfalp._SUM32_W0 + w))
        nan_c += int(t[12]); pinf += int(t[13]); ninf += int(t[14])
        if not patched:
            ti, nc, pi, ni = _exception_sum_correction32(col, g)
            total_int += ti
            nan_c += nc; pinf += pi; ninf += ni
    pad_count = C.VECTOR_SIZE - n_valid_last
    if pad_count and not last_fellback:
        pos = np.int64(n_valid_last - 1)
        exc_pos = col.exc_positions[v_last]
        hit = np.nonzero(exc_pos == pos)[0]
        rg = v_last // C.N_VECTORS_PER_ROWGROUP
        if col.rg_scheme[rg] == C.SCHEME_ALP_RD:
            left = (int(col.exc_values[v_last][hit[0]]) if hit.size
                    else None)
            bits = _rd_bits_at(col, int(v_last), int(pos), left)
        elif hit.size:
            bits = int(np.asarray(col.exc_values[v_last][hit[0]],
                                  np.float32).view(np.uint32))
        else:
            bits = int(_decode_positions(col, np.array([v_last]),
                                         np.array([pos]))[0])
        v, cls = _f32_fixed(int(bits))
        if cls == 0:
            total_int -= pad_count * v
        elif cls == 1:
            nan_c -= pad_count
        elif cls == 2:
            pinf -= pad_count
        else:
            ninf -= pad_count
    return total_int, nan_c, pinf, ninf


def _exact_sum_ints(col, plan, outs):
    """Masked-bits + chunked segment-sum accumulation: returns raw
    (total_int, nan, pinf, ninf) for the plan's buckets."""
    chunks = []
    for bits, last in _masked_bits(col, plan, outs):
        # zero out pad slots in the last group (+0.0 contributes nothing)
        zero = jnp.zeros((), bits.dtype)
        chunks.append(jnp.concatenate(
            [bits[:-1].reshape(-1),
             jnp.where(last, bits[-1], zero).reshape(-1)]))
    # ONE reduction call on the concatenated buckets, padded to the next
    # chunk multiple with +0.0 (sum-neutral): the jit cache is keyed on
    # a handful of total sizes instead of one entry per bucket shape,
    # and only one [W, 3] partial crosses to the host.
    bits_all = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks)
    n = bits_all.shape[0]
    CH = 1 << 20          # fixed chunk: ONE compile for any column size
    n_pad = -(-max(n, 1) // CH) * CH
    if n_pad != n:
        bits_all = jnp.concatenate(
            [bits_all, jnp.zeros(n_pad - n, bits_all.dtype)])
    d = sp = None
    for c in range(n_pad // CH):
        dc, spc = _exact_sum_partials(bits_all[c * CH:(c + 1) * CH],
                                      col.dtype)
        d = dc if d is None else d + dc      # i64 partial adds: exact,
        sp = spc if sp is None else sp + spc  # no overflow for n < 2^31
    total_int = 0
    dn = np.asarray(d)
    spn = np.asarray(sp)
    for j in range(dn.shape[0]):
        for k in range(dn.shape[1]):
            v = int(dn[j, k])
            if v:
                total_int += v << (32 * j + 32 * k)
    return total_int, int(spn[0]), int(spn[1]), int(spn[2])


def _exact_sum_partials(bits, dtype):
    """Device kernel of the exact SUM: [N] bit patterns -> ([W, D] i64
    signed digit partial sums, [3] i64 special counts (nan, +inf, -inf)).

    f64: value = m' * 2^(e_eff - 1075), m' = mantissa (+2^52 implicit
    for normals), e_eff = max(exponent, 1) in [1, 2046]; window
    j = e_eff >> 5, shift = e_eff & 31; c = m' << shift (<= 84 bits) is
    emitted as three 32-bit digits.  All arithmetic is exact emulated
    integer math.  f32 analogously with bias 150 and two digits.
    """
    return _exact_partials_jit[np.dtype(dtype).itemsize](bits)


@jax.jit
def _exact_partials_f64(bits):
    e = ((bits >> jnp.uint64(52)) & jnp.uint64(0x7FF)).astype(jnp.int32)
    m = bits & jnp.uint64((1 << 52) - 1)
    sign = (bits >> jnp.uint64(63)) != 0
    is_special = e == 2047
    nan_c = (is_special & (m != 0)).sum()
    pinf = (is_special & (m == 0) & ~sign).sum()
    ninf = (is_special & (m == 0) & sign).sum()
    mp = jnp.where(e > 0, m | jnp.uint64(1 << 52), m)
    mp = jnp.where(is_special, jnp.uint64(0), mp)
    e_eff = jnp.maximum(e, 1)
    j = (e_eff >> 5).astype(jnp.int32)                      # [0, 63]
    sh = (e_eff & 31).astype(jnp.uint64)
    m32 = jnp.uint64(0xFFFFFFFF)
    d0 = (mp << sh) & m32
    d1 = ((mp >> jnp.uint64(1)) >> (jnp.uint64(31) - sh)) & m32
    d2 = (mp >> jnp.uint64(33)) >> (jnp.uint64(31) - sh)    # < 2^20
    digs = jnp.stack([d0, d1, d2], axis=-1).astype(jnp.int64)
    digs = jnp.where(sign[:, None], -digs, digs)
    sums = jax.ops.segment_sum(digs, j, num_segments=64)
    return sums, jnp.stack([nan_c, pinf, ninf]).astype(jnp.int64)


@jax.jit
def _exact_partials_f32(bits):
    e = ((bits >> jnp.uint32(23)) & jnp.uint32(0xFF)).astype(jnp.int32)
    m = (bits & jnp.uint32((1 << 23) - 1)).astype(jnp.uint64)
    sign = (bits >> jnp.uint32(31)) != 0
    is_special = e == 255
    nan_c = (is_special & (m != 0)).sum()
    pinf = (is_special & (m == 0) & ~sign).sum()
    ninf = (is_special & (m == 0) & sign).sum()
    mp = jnp.where(e > 0, m | jnp.uint64(1 << 23), m)
    mp = jnp.where(is_special, jnp.uint64(0), mp)
    e_eff = jnp.maximum(e, 1)                               # [1, 254]
    j = (e_eff >> 5).astype(jnp.int32)                      # [0, 7]
    sh = (e_eff & 31).astype(jnp.uint64)
    m32 = jnp.uint64(0xFFFFFFFF)
    d0 = (mp << sh) & m32
    d1 = ((mp >> jnp.uint64(1)) >> (jnp.uint64(31) - sh)) & m32
    d2 = jnp.zeros_like(d0)     # m' < 2^24, c < 2^55: two digits suffice
    digs = jnp.stack([d0, d1, d2], axis=-1).astype(jnp.int64)
    digs = jnp.where(sign[:, None], -digs, digs)
    sums = jax.ops.segment_sum(digs, j, num_segments=8)
    return sums, jnp.stack([nan_c, pinf, ninf]).astype(jnp.int64)


_exact_partials_jit = {8: _exact_partials_f64, 4: _exact_partials_f32}


def make_sum_step(plan):
    """THROUGHPUT-TIMING step for a SUM-shaped query pipeline — NOT a SUM.

    Returns (step, args) where ``step(carry, *args)`` runs fused decode +
    on-device reduction for every bucket in ONE jittable program
    (benchlib.loop_bench-compatible).  The carry is XOR-folded into the
    inputs to defeat cross-iteration deduplication, so iterations after
    the first decode perturbed data and the return value is a *checksum*
    whose only purpose is the data dependence; :func:`query_sum` is the
    correct-answer SUM API.  This models the steady-state query shape —
    plan built once, queries repeated — the reference's q1 pipeline
    analog (bench_end_to_end q1.cpp:64-88)."""
    from .kernels import falp as kfalp
    groups = plan.groups
    arg_tuples = [kdecode.group_arrays(g) for g in groups]
    counts = [len(a) for a in arg_tuples]

    def step(carry, *metas):
        total = jnp.zeros((), jnp.float32)
        acc = carry
        i = 0
        for g, n in zip(groups, counts):
            args = list(metas[i:i + n])
            i += n
            # XOR the carry into the first metadata plane: a real data
            # dependence between iterations, data-independent cost
            args[1] = args[1] ^ carry
            if (plan.dtype == np.float64
                    and g.scheme != C.SCHEME_ALP_RD and g.variant in (
                        "mid", "small", "mid64", "midc96")):
                # fully fused decode + reduction: partial sums are the
                # only kernel output (no decoded-plane traffic)
                part = kfalp.falp_decode_f64_variant_sum(
                    args[0], tuple(args[1:]), variant=g.variant,
                    bw=g.bw, flags=g.flags)
                total = total + part.sum()
                acc = acc ^ jax.lax.bitcast_convert_type(
                    part[0, 0], jnp.uint32)
                continue
            out = kdecode.group_decode(g, plan.dtype)(*args)
            if plan.dtype == np.float64:
                hi, lo = out
                u64 = (hi.astype(jnp.uint64) << jnp.uint64(32)
                       ) | lo.astype(jnp.uint64)
                vals = jax.lax.bitcast_convert_type(u64, jnp.float64)
                total = total + vals.astype(jnp.float32).sum()
                acc = acc ^ hi[0, 0, 0]
            else:
                total = total + out.view(jnp.float32).sum()
                acc = acc ^ out[0, 0, 0]
        return acc ^ total.view(jnp.uint32).astype(jnp.uint32)

    metas = [a for args in arg_tuples for a in args]
    return step, tuple(metas)


def make_exact_sum_step(plan):
    """Throughput step for the EXACT-SUM pipeline (f64): fused decode +
    superaccumulator partials for every ALP bucket
    (kernels.falp.falp_decode_f64_variant_exact_sum; the planes kernel
    for ALP_RD/const buckets) in ONE jittable program — the
    steady-state shape of :func:`query_sum`, which additionally applies
    the tiny host-side exception/pad corrections once per query."""
    from .kernels import falp as kfalp
    assert plan.dtype == np.float64
    groups = plan.groups
    arg_tuples = [kdecode.group_arrays(g) for g in groups]
    counts = [len(a) for a in arg_tuples]

    def step(carry, *metas):
        tot = jnp.zeros((kfalp._SUM_ROWS,), jnp.int64)
        acc = carry
        i = 0
        for g, n in zip(groups, counts):
            args = list(metas[i:i + n])
            i += n
            args[1] = args[1] ^ carry
            if g.scheme == C.SCHEME_ALP_RD or g.variant == "const":
                out = kdecode.group_decode(g, plan.dtype)(*args)
                rows = kfalp.exact_sum_planes_f64(out[0], out[1])
            else:
                rows = kfalp.falp_decode_f64_variant_exact_sum(
                    args[0], tuple(args[1:]), variant=g.variant,
                    bw=g.bw, flags=g.flags)
            tot = tot + rows.astype(jnp.int64).sum(axis=(0, 2))
            acc = acc ^ rows[0, 0, 0].astype(jnp.uint32)
        return acc ^ tot.sum().astype(jnp.uint32)

    metas = [a for args in arg_tuples for a in args]
    return step, tuple(metas)


def make_filter_step(plan, lo: float, hi: float, dtype=np.float64):
    """Throughput step for the predicate-pushdown COUNT pipeline: fused
    decode+count kernels per bucket (every f64 ALP variant plus ALP_RD
    with the on-device dictionary; const buckets count in XLA), one
    jittable program — the filter-query analog of :func:`make_sum_step`
    (exceptions/pad corrections are tiny host-side constants per plan
    and do not belong in the per-iteration loop)."""
    from .kernels import falp as kfalp
    klo = np.uint64(_float_key(lo, dtype))
    khi = np.uint64(_float_key(hi, dtype))
    groups = plan.groups
    arg_tuples = [kdecode.group_arrays(g) for g in groups]
    counts_n = [len(a) for a in arg_tuples]

    def step(carry, *metas):
        total = jnp.zeros((), jnp.int32)
        acc = carry
        i = 0
        for g, n in zip(groups, counts_n):
            args = list(metas[i:i + n])
            i += n
            args[1] = args[1] ^ carry
            G = args[1].shape[0]
            if g.scheme == C.SCHEME_ALP_RD:
                bk = [jnp.full((G, 128), np.uint32(int(k) >> 32),
                               jnp.uint32) for k in (klo, khi)]
                bk += [jnp.full((G, 128), np.uint32(int(k) & 0xFFFFFFFF),
                                jnp.uint32) for k in (klo, khi)]
                cnt = kfalp.rd_decode_dict_f64_count(
                    args[0], args[1], args[2:],
                    (bk[0], bk[2], bk[1], bk[3]), rbw=g.bw,
                    lbw=g.meta[1])
            elif g.variant == "const":
                hi_p, lo_p = args
                key = _key_from_limbs(hi_p, lo_p)
                cnt = ((key >= klo) & (key <= khi)).astype(
                    jnp.int32) * jnp.int32(64)
            else:
                bk = [jnp.full((G, 128), np.uint32(int(k) >> 32),
                               jnp.uint32) for k in (klo, khi)]
                bk += [jnp.full((G, 128), np.uint32(int(k) & 0xFFFFFFFF),
                                jnp.uint32) for k in (klo, khi)]
                bounds = (bk[0], bk[2], bk[1], bk[3])
                if g.variant == "gen":
                    tiles, bl, bh, flo, fhi, frl, frh = args
                    cnt = kfalp.falp_decode_f64_count(
                        tiles, bl, bh, flo, fhi, frl, frh, *bounds,
                        bw=g.bw, fact1=bool(g.flags & 16))
                else:
                    cnt = kfalp.falp_decode_f64_variant_count(
                        args[0], tuple(args[1:]), bounds,
                        variant=g.variant, bw=g.bw, flags=g.flags)
            total = total + cnt.sum(dtype=jnp.int32)
            acc = acc ^ cnt[0, 0].astype(jnp.uint32)
        return acc ^ total.astype(jnp.uint32)

    metas = [a for args in arg_tuples for a in args]
    return step, tuple(metas)


def _masked_keys(col, plan, outs):
    """Yield (total-order keys, mask) per bucket.

    XLA's float64 on TPU is *emulated* (not bit-exact), so float
    comparisons can misorder near-equal doubles.  Aggregate comparisons
    therefore run on the IEEE-754 total-order integer key
    (``bits ^ sign ? ~0 : 2^63``), which is monotone in the float value
    and uses only exact integer ops.  float32 is native/exact but takes
    the same path for uniformity.
    """
    for vals_bits, last_mask in _masked_bits(col, plan, outs):
        if col.dtype == np.float64:
            # canonicalize -0.0 to +0.0 so the total order agrees with
            # IEEE compare (-0.0 == 0.0), not strictly-below
            vals_bits = jnp.where(vals_bits == jnp.uint64(1 << 63),
                                  jnp.uint64(0), vals_bits)
            sign = (vals_bits >> jnp.uint64(63)) != 0
            key = jnp.where(sign, ~vals_bits,
                            vals_bits | jnp.uint64(1 << 63))
        else:
            vals_bits = jnp.where(vals_bits == jnp.uint32(1 << 31),
                                  jnp.uint32(0), vals_bits)
            sign = (vals_bits >> jnp.uint32(31)) != 0
            key = jnp.where(sign, ~vals_bits,
                            vals_bits | jnp.uint32(1 << 31))
        yield key, last_mask


def _masked_bits(col, plan, outs):
    """Yield (value bit patterns, LAST-group mask) device pairs per
    bucket; all groups but the last are fully valid (consumers reduce
    ``bits[:-1]`` unmasked and mask only ``bits[-1]``)."""
    if col.dtype == np.float64:
        slots, L, per_group = 64, 16, 8
    else:
        slots, L, per_group = 32, 32, 4
    n_valid_last = col.n_values - (col.n_vectors - 1) * C.VECTOR_SIZE
    v_last = col.n_vectors - 1
    for g, out in zip(plan.groups, outs):
        if col.dtype == np.float64:
            hi, lo = out
            bits = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(
                jnp.uint64)
        else:
            bits = out
        has_partial = (n_valid_last < C.VECTOR_SIZE
                       and v_last in g.vec_indices)
        last = _last_group_mask(g, slots, L, per_group, n_valid_last,
                                has_partial)
        yield bits, last


def query_min(col) -> float:
    """MIN(column) on device (q1-style aggregate over the fused scan)."""
    plan = col.plan()
    outs = plan.run(patch=True)
    kt = np.uint64 if col.dtype == np.float64 else np.uint32
    fill = kt(np.iinfo(kt).max)
    best = None
    for key, last in _masked_keys(col, plan, outs):
        k = jnp.where(last, key[-1], fill).min()
        if key.shape[0] > 1:
            k = jnp.minimum(k, key[:-1].min())
        best = k if best is None else jnp.minimum(best, k)
    return _key_float(int(best), col.dtype)


def query_max(col) -> float:
    """MAX(column) on device."""
    plan = col.plan()
    outs = plan.run(patch=True)
    best = None
    for key, last in _masked_keys(col, plan, outs):
        k = jnp.where(last, key[-1], 0).max()
        if key.shape[0] > 1:
            k = jnp.maximum(k, key[:-1].max())
        best = k if best is None else jnp.maximum(best, k)
    return _key_float(int(best), col.dtype)


def _keys_biased(key, dtype):
    """Monotone SIGNED reinterpretation of total-order keys (exact
    integer ops; the form jax.lax.top_k / searchsorted consume)."""
    if np.dtype(dtype) == np.float64:
        return jax.lax.bitcast_convert_type(key ^ jnp.uint64(1 << 63),
                                            jnp.int64)
    return jax.lax.bitcast_convert_type(key ^ jnp.uint32(1 << 31),
                                        jnp.int32)


def _key_words_from_limbs(hi, lo):
    """The u64 total-order key of ``_key_from_limbs`` split into native
    u32 words — (key >> 32, key & 0xFFFFFFFF) without ever forming the
    emulated u64."""
    negz = (hi == jnp.uint32(1 << 31)) & (lo == 0)
    hb = jnp.where(negz, jnp.uint32(0), hi)
    lb = jnp.where(negz, jnp.uint32(0), lo)
    sign = (hb >> jnp.uint32(31)) != 0
    return (jnp.where(sign, ~hb, hb | jnp.uint32(1 << 31)),
            jnp.where(sign, ~lb, lb))


def _biased_i32(u):
    """Monotone SIGNED reinterpretation of a u32 key word (the form
    the native lax.top_k consumes)."""
    return jax.lax.bitcast_convert_type(u ^ jnp.uint32(1 << 31),
                                        jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "largest"))
def _topk_f64_program(his, los, masks, *, k: int, largest: bool):
    """ONE traced program: per-bucket key-word build + mask + concat,
    then exact top-k on (HI, LO) u32 word pairs using only NATIVE i32
    ``lax.top_k`` — never emulated-i64 sorts.

    Threshold scheme: h_k = k-th largest HI word.  Every element with
    HI > h_k is in the top-k (there are m <= k-1 of them); the
    remaining k-m winners are the largest LO words among HI == h_k.
    Returns (h_k, m, gv[k], glo[k], tlo[k]) — the host assembles and
    sorts <= k pairs.
    """
    khs, kls = [], []
    z = jnp.uint32(0)
    for hi, lo, mask in zip(his, los, masks):
        kh, kl = _key_words_from_limbs(hi, lo)
        if not largest:
            kh, kl = ~kh, ~kl            # reversed total order
        # pad slots get the minimal key (0, 0): can only tie an equal
        # real key, in which case the assembled float is identical
        khs.append(jnp.concatenate(
            [kh[:-1].reshape(-1), jnp.where(mask, kh[-1], z).reshape(-1)]))
        kls.append(jnp.concatenate(
            [kl[:-1].reshape(-1), jnp.where(mask, kl[-1], z).reshape(-1)]))
    kh = khs[0] if len(khs) == 1 else jnp.concatenate(khs)
    kl = kls[0] if len(kls) == 1 else jnp.concatenate(kls)
    hib = _biased_i32(kh)
    hk = jax.lax.top_k(hib, k)[0][k - 1]
    gt = hib > hk
    m = gt.sum(dtype=jnp.int32)
    neg = jnp.int32(-(2 ** 31))
    gv, gi = jax.lax.top_k(jnp.where(gt, hib, neg), k)
    glo = jnp.take(kl, gi)
    tlo = jax.lax.top_k(jnp.where(hib == hk, _biased_i32(kl), neg), k)[0]
    return hk, m, gv, glo, tlo


@functools.partial(jax.jit, static_argnames=("k", "largest"))
def _topk_f32_program(bits, masks, *, k: int, largest: bool):
    """ONE traced program for the f32 single-word top-k (native i32)."""
    parts = []
    z = jnp.uint32(0)
    for b, mask in zip(bits, masks):
        vb = jnp.where(b == jnp.uint32(1 << 31), z, b)     # -0.0 -> +0.0
        sign = (vb >> jnp.uint32(31)) != 0
        key = jnp.where(sign, ~vb, vb | jnp.uint32(1 << 31))
        if not largest:
            key = ~key
        parts.append(jnp.concatenate(
            [key[:-1].reshape(-1),
             jnp.where(mask, key[-1], z).reshape(-1)]))
    flat = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    return jax.lax.top_k(_biased_i32(flat), k)[0]


_SBIT32 = 1 << 31
_I32_MIN = -(2 ** 31)


def _np_work_keys(bits: np.ndarray, largest: bool) -> np.ndarray:
    """Working-order total-order keys of host bit patterns (canonical
    IEEE-754 total-order keys, -0.0 canonicalised; complemented for
    smallest-k) — the host mirror of kernels.falp._key_words_f64."""
    ut = bits.dtype.type
    sbit = ut(1) << ut(bits.dtype.itemsize * 8 - 1)
    b = np.where(bits == sbit, ut(0), bits)
    sign = (b & sbit) != 0
    key = np.where(sign, ~b, b | sbit)
    return key if largest else ~key


def _bucket_prefix_counts(g, args, thr_hi, thr_lo, *, n_thr: int,
                          invert: bool, f32: bool):
    """[G, E_pad, 128] i32 multi-threshold prefix counts of one bucket
    (count of working-order key <= thr_e per threshold, ONE fused scan),
    dispatching the bucket kind's kernel; const buckets compare their
    per-vector key in XLA (64 equal values per lane column)."""
    from .kernels import falp as kfalp
    if f32:
        if g.scheme == C.SCHEME_ALP_RD:
            return kfalp.rd_decode_dict_f32_prefix_counts(
                args[0], args[1], args[2:], thr_hi, rbw=g.bw,
                lbw=g.meta[1], invert=invert, n_thr=n_thr)
        return kfalp.falp_decode_f32_prefix_counts(
            args[0], args[1], args[2], args[3], thr_hi, bw=g.bw,
            invert=invert, n_thr=n_thr)
    if g.scheme == C.SCHEME_ALP_RD:
        return kfalp.rd_decode_dict_f64_prefix_counts(
            args[0], args[1], args[2:], thr_hi, thr_lo, rbw=g.bw,
            lbw=g.meta[1], invert=invert, n_thr=n_thr)
    if g.variant == "const":
        kh, kl = _key_words_from_limbs(args[0], args[1])
        if invert:
            kh, kl = ~kh, ~kl
        ah, al = _biased_i32(kh), _biased_i32(kl)
        th = _biased_i32(thr_hi)
        tl = _biased_i32(thr_lo)
        rows = []
        for e in range(thr_hi.shape[0]):
            if e < n_thr:
                le = (ah < th[e, 0]) | ((ah == th[e, 0])
                                        & (al <= tl[e, 0]))
                rows.append(le.astype(jnp.int32) * jnp.int32(64))
            else:
                rows.append(jnp.zeros_like(ah))
        return jnp.stack(rows, axis=1)
    return kfalp.falp_decode_f64_variant_prefix_counts(
        args[0], tuple(args[1:]), thr_hi, thr_lo, variant=g.variant,
        bw=g.bw, flags=g.flags, invert=invert, n_thr=n_thr)


def _plan_prog_cache(plan) -> dict:
    cache = getattr(plan, "_prog_cache", None)
    if cache is None:
        cache = plan._prog_cache = {}
    return cache


def _plan_geometry(plan):
    """(f32, values-per-vector-lane-group, lanes-per-vector, slots)."""
    f32 = plan.dtype == np.float32
    return (f32, 4, 32, 32) if f32 else (f32, 8, 16, 64)


def _lane_oks(plan, per: int, L: int):
    """Per-bucket [128] bool masks of valid lanes in the LAST group row
    (pad-vector lanes false) — static numpy, traced as constants."""
    return [np.arange(128) < ((g.n_vectors % per or per) * L)
            for g in plan.groups]


def _topk_fused_program(plan, k: int, largest: bool):
    """Build (and cache on the plan) the ONE-program TOP-K phase: a
    fused per-lane-column KEY-MAX scan -> exact k-th largest column max
    ``t`` (lexicographic, native i32 top_k on the tiny [n/64] candidate
    array) -> candidate column indices (<= k-1 columns exceed ``t``)
    -> a second fused scan of two-threshold prefix counts at [t, t-1]
    with ``t`` as a traced value.  Returns (jitted fn, flat column
    offsets per bucket).  The ``carry`` argument XORs into each
    bucket's first metadata plane (loop_bench data dependence; the
    query passes 0)."""
    cache = _plan_prog_cache(plan)
    ckey = ("topk", k, largest)
    if ckey in cache:
        return cache[ckey]
    from .kernels import falp as kfalp
    inv = not largest
    f32, per, L, _ = _plan_geometry(plan)
    groups = plan.groups
    arg_counts = [len(kdecode.group_arrays(g)) for g in groups]
    lane_oks = _lane_oks(plan, per, L)
    # the threshold search runs on BLOCK maxes (8 group rows per block):
    # 8x fewer top_k candidates for three lax.top_k calls (measured 25 ->
    # ~4 ms at 1.6 GiB), at the cost of block-granular (<= 512-value)
    # candidate columns for the tiny host decode
    blk_counts = [(-(-(-(-g.n_vectors // per)) // 8)) * 128
                  for g in groups]
    imin = jnp.int32(_I32_MIN)

    def keymax(g, args):
        if f32:
            if g.scheme == C.SCHEME_ALP_RD:
                mh = kfalp.rd_decode_dict_f32_keymax(
                    args[0], args[1], args[2:], rbw=g.bw,
                    lbw=g.meta[1], invert=inv)
            else:
                mh = kfalp.falp_decode_f32_keymax(
                    args[0], args[1], args[2], args[3], bw=g.bw,
                    invert=inv)
            return mh, jnp.zeros_like(mh)
        if g.scheme == C.SCHEME_ALP_RD:
            return kfalp.rd_decode_dict_f64_keymax(
                args[0], args[1], args[2:], rbw=g.bw, lbw=g.meta[1],
                invert=inv)
        if g.variant == "const":
            kh, kl = _key_words_from_limbs(args[0], args[1])
            if inv:
                kh, kl = ~kh, ~kl
            return _biased_i32(kh), _biased_i32(kl)
        return kfalp.falp_decode_f64_variant_keymax(
            args[0], tuple(args[1:]), variant=g.variant, bw=g.bw,
            flags=g.flags, invert=inv)

    def prog(carry, *metas):
        mhs, mls, bucket_args = [], [], []
        i = 0
        for g, n, lane_ok in zip(groups, arg_counts, lane_oks):
            args = list(metas[i:i + n])
            i += n
            args[1] = args[1] ^ carry
            bucket_args.append(args)
            mh, ml = keymax(g, args)
            ok = jnp.asarray(lane_ok)
            mh = mh.at[-1].set(jnp.where(ok, mh[-1], imin))
            ml = ml.at[-1].set(jnp.where(ok, ml[-1], imin))
            # lexicographic block max over 8 group rows (XLA reduce)
            G = mh.shape[0]
            pad = (-G) % 8
            if pad:
                fill = jnp.full((pad, 128), imin)
                mh = jnp.concatenate([mh, fill])
                ml = jnp.concatenate([ml, fill])
            mh = mh.reshape(-1, 8, 128)
            ml = ml.reshape(-1, 8, 128)
            bh = mh.max(axis=1)
            bl = jnp.where(mh == bh[:, None, :], ml, imin).max(axis=1)
            mhs.append(bh.reshape(-1))
            mls.append(bl.reshape(-1))
        mh = mhs[0] if len(mhs) == 1 else jnp.concatenate(mhs)
        ml = mls[0] if len(mls) == 1 else jnp.concatenate(mls)
        # exact lexicographic k-th largest column max t = (hk, t_lo)
        hk = jax.lax.top_k(mh, k)[0][k - 1]
        gt_h = mh > hk
        m = gt_h.sum(dtype=jnp.int32)             # <= k-1
        tlo_vals = jax.lax.top_k(jnp.where(mh == hk, ml, imin), k)[0]
        t_lo = tlo_vals[jnp.maximum(k - m - 1, 0)]
        cand = gt_h | ((mh == hk) & (ml > t_lo))  # <= k-1 columns
        c = cand.sum(dtype=jnp.int32)
        # all candidate indices land in the top-k of the 0/1 score
        ci = jax.lax.top_k(cand.astype(jnp.int32), k)[1]
        sb = jnp.uint32(_SBIT32)
        th_u = jax.lax.bitcast_convert_type(hk, jnp.uint32) ^ sb
        tl_u = jax.lax.bitcast_convert_type(t_lo, jnp.uint32) ^ sb
        if f32:
            thr_hi = jnp.zeros((8, 128), jnp.uint32).at[0, :].set(
                th_u).at[1, :].set(th_u - jnp.uint32(1))
            thr_lo = thr_hi
        else:
            tm1_l = tl_u - jnp.uint32(1)
            tm1_h = th_u - (tl_u == 0).astype(jnp.uint32)
            thr_hi = jnp.zeros((8, 128), jnp.uint32).at[0, :].set(
                th_u).at[1, :].set(tm1_h)
            thr_lo = jnp.zeros((8, 128), jnp.uint32).at[0, :].set(
                tl_u).at[1, :].set(tm1_l)
        tot = jnp.zeros((2,), jnp.int64)
        for g, args, lane_ok in zip(groups, bucket_args, lane_oks):
            pc = _bucket_prefix_counts(g, args, thr_hi, thr_lo,
                                       n_thr=2, invert=inv, f32=f32)
            ok = jnp.asarray(lane_ok)
            pc = pc.at[-1].set(jnp.where(ok[None, :], pc[-1],
                                         jnp.int32(0)))
            tot = tot + pc[:, :2, :].astype(jnp.int64).sum(axis=(0, 2))
        return th_u, tl_u, c, ci, tot[0], tot[1]

    entry = (jax.jit(prog), np.cumsum([0] + blk_counts))
    cache[ckey] = entry
    return entry


def _pred_corrections(col, plan, klo, khi) -> int:
    """Exact host corrections of a fused count over [klo, khi]:
    exception slots (true vs decoded fill/garbage) + the padded tail."""
    c = sum(_exception_count_correction(col, g, klo, khi)
            for g in plan.groups)
    return c + _partial_vector_correction(
        col, plan, klo, khi,
        ("mid", "gen", "const", "small", "mid64", "midc96"))


def _query_topk_fused(col, plan, k: int, largest: bool):
    """ONE-program TOP-K (see query_topk).  Returns None when the
    threshold was inflated past the true k-th value by patched fill
    values (pathological duplicate-fill columns) — the caller then
    takes the decoded-plane path."""
    f32, per, L, slots = _plan_geometry(plan)
    total_blks = sum((-(-(-(-g.n_vectors // per)) // 8)) * 128
                     for g in plan.groups)
    if total_blks < k:
        return None
    prog, offs = _topk_fused_program(plan, k, largest)
    metas = [a for g in plan.groups for a in kdecode.group_arrays(g)]
    th_u, tl_u, c, ci, le_t_dev, le_tm1_dev = prog(jnp.uint32(0), *metas)
    kt = np.uint32 if f32 else np.uint64
    width = 32 if f32 else 64
    mask_all = (1 << width) - 1
    t_work = int(th_u) if f32 else ((int(th_u) << 32) | int(tl_u))
    tw = kt(t_work)

    def bounds(thr: int):
        if largest:
            return kt(0), kt(thr)
        return kt((~thr) & mask_all), kt(mask_all)

    le_t = int(le_t_dev) + _pred_corrections(col, plan, *bounds(t_work))
    if t_work == 0:
        le_tm1 = 0
    else:
        le_tm1 = int(le_tm1_dev) + _pred_corrections(
            col, plan, *bounds(t_work - 1))
    gt_t = col.n_values - le_t
    eq_t = le_t - le_tm1
    if gt_t < 0 or eq_t < 0 or gt_t + eq_t < k:
        return None                      # fill-inflated threshold
    # exact host decode of the candidate pool: all true values > t are
    # exceptions (their stored bits) or live in a candidate column
    n_valid_last = col.n_values - (col.n_vectors - 1) * C.VECTOR_SIZE
    v_last = col.n_vectors - 1
    pool = []
    for g in plan.groups:
        if g.exc_g is None or not g.exc_g.shape[0]:
            continue
        wk = _np_work_keys(_group_exception_bits(col, g)[0], largest)
        pool.append(wk[wk > tw])
    ci = np.asarray(ci)[:min(int(c), k)]
    b_of = np.searchsorted(offs, ci, side="right") - 1
    for b in np.unique(b_of):
        g = plan.groups[b]
        g_rows = -(-g.n_vectors // per)
        rel = ci[b_of == b] - offs[b]
        blk = rel // 128
        lane = rel % 128
        # expand each block candidate to its <= 8 member vectors
        rows = (blk[:, None] * 8 + np.arange(8)[None, :]).reshape(-1)
        lane8 = np.repeat(lane, 8)
        vrow = rows * per + lane8 // L
        ok = (rows < g_rows) & (vrow < g.n_vectors)
        vrow, lane8 = vrow[ok], lane8[ok]
        vecs = g.vec_indices[vrow]
        vec_rep = np.repeat(vecs, slots)
        pos = (np.tile(np.arange(slots) * L, len(vrow))
               + np.repeat(lane8 % L, slots))
        if g.scheme == C.SCHEME_ALP_RD:
            bits = np.fromiter(
                (_rd_bits_at(col, int(v), int(p))
                 for v, p in zip(vec_rep, pos)), np.uint64,
                count=len(vec_rep)).astype(kt)
        else:
            bits = _decode_positions(col, vec_rep, pos).astype(kt)
        keep = np.ones(len(bits), bool)
        for j, v in enumerate(vecs):
            ep = col.exc_positions[int(v)]
            if len(ep):
                s = slice(j * slots, (j + 1) * slots)
                keep[s] &= ~np.isin(pos[s], ep)
        if n_valid_last < C.VECTOR_SIZE:
            keep &= ~((vec_rep == v_last) & (pos >= n_valid_last))
        wk = _np_work_keys(bits[keep], largest)
        pool.append(wk[wk > tw])
    pool = np.concatenate(pool) if pool else np.empty(0, kt)
    if len(pool) != gt_t:
        return None                      # inconsistent (not expected)
    pool[::-1].sort()
    keys = list(pool[:k]) + [tw] * max(k - gt_t, 0)
    out = np.empty(k, col.dtype)
    for i, w in enumerate(keys):
        canon = int(w) if largest else (~int(w)) & mask_all
        out[i] = _key_float(canon, col.dtype)
    return out


def make_topk_step(plan, k: int, largest: bool = True):
    """Throughput step for the fused TOP-K pipeline: the one-program
    key-max + two-threshold count phase (two fused scans, no decoded
    planes) — query_topk adds only the <= 64k-value host candidate
    decode and corrections per query."""
    prog, _ = _topk_fused_program(plan, k, largest)

    def step(carry, *metas):
        th_u, tl_u, c, ci, le_t, le_tm1 = prog(carry, *metas)
        return (th_u ^ tl_u ^ c.astype(jnp.uint32)
                ^ ci.sum(dtype=jnp.int32).astype(jnp.uint32)
                ^ le_t.astype(jnp.uint32) ^ le_tm1.astype(jnp.uint32))

    metas = tuple(a for g in plan.groups for a in kdecode.group_arrays(g))
    return step, metas


def query_topk(col, k: int, largest: bool = True) -> np.ndarray:
    """TOP-K(column): the k largest (or smallest) values, sorted, from
    the fused scan on device — the ORDER-BY ... LIMIT k building block.

    All comparisons run on exact IEEE-754 total-order integer keys
    (never emulated-f64 compares) and all device sorting on NATIVE i32
    words.  For k <= 128 the query is ONE jitted program of two fused
    scans (no decoded planes ever leave VMEM): a per-lane-column KEY-MAX
    pass yields the exact k-th-largest column max ``t`` (a valid
    threshold: >= k columns then witness a kernel value >= t), plus a
    two-threshold prefix-count pass at [t, t-1] with ``t`` as a traced
    input; the host then exactly decodes the <= 64*(k-1) values of the
    columns whose max exceeds ``t`` and assembles the answer from them,
    the exception values, and the tie counts (``_query_topk_fused``).
    Larger k falls back to decoding planes + native-i32 threshold top-k
    (``_query_topk_plane``).

    Ordering is the IEEE-754 total order with ±0 canonicalized: -NaN <
    -inf < finite < +inf < +NaN.  ``k`` is clamped to the column length.
    """
    k = min(int(k), col.n_values)
    if k == 0:
        return np.empty(0, col.dtype)
    plan = col.plan()
    if k <= 128:
        out = _query_topk_fused(col, plan, k, largest)
        if out is not None:
            return out
    return _query_topk_plane(col, plan, k, largest)


def _query_topk_plane(col, plan, k: int, largest: bool) -> np.ndarray:
    """TOP-K over decoded planes (native-i32 HI-threshold + LO tiebreak,
    ``_topk_f64_program``) — the large-k / fallback path."""
    outs = plan.run(patch=True)
    if col.dtype == np.float64:
        slots, L, per_group = 64, 16, 8
    else:
        slots, L, per_group = 32, 32, 4
    n_valid_last = col.n_values - (col.n_vectors - 1) * C.VECTOR_SIZE
    v_last = col.n_vectors - 1
    masks = []
    for g in plan.groups:
        has_partial = (n_valid_last < C.VECTOR_SIZE
                       and v_last in g.vec_indices)
        masks.append(_last_group_mask(g, slots, L, per_group,
                                      n_valid_last, has_partial))
    if col.dtype == np.float32:
        top = _topk_f32_program(tuple(outs), tuple(masks),
                                k=k, largest=largest)
        keys = np.asarray(top).view(np.uint32) ^ np.uint32(1 << 31)
        if not largest:
            keys = ~keys
        return np.array([_key_float(int(x), col.dtype) for x in keys],
                        col.dtype)
    his = tuple(out[0] for out in outs)
    los = tuple(out[1] for out in outs)
    hk, m, gv, glo, tlo = _topk_f64_program(his, los, tuple(masks),
                                            k=k, largest=largest)
    m = min(int(m), k)                       # m <= k-1 by construction
    hk_u = int(np.uint32(np.asarray(hk).view(np.uint32))) ^ (1 << 31)
    gv = np.asarray(gv).view(np.uint32)
    glo = np.asarray(glo)
    tlo = np.asarray(tlo).view(np.uint32)
    pairs = [(int(gv[i]) ^ (1 << 31), int(glo[i])) for i in range(m)]
    pairs += [(hk_u, int(tlo[j]) ^ (1 << 31)) for j in range(k - m)]
    pairs.sort(reverse=True)
    out = np.empty(k, np.float64)
    for i, (ph, pl) in enumerate(pairs):
        if not largest:
            ph, pl = ~ph & 0xFFFFFFFF, ~pl & 0xFFFFFFFF
        out[i] = _key_float((ph << 32) | pl, np.float64)
    return out


def query_histogram(col, edges) -> np.ndarray:
    """GROUP-BY-bin COUNT over the compressed column on device,
    ``np.histogram``-compatible: ``len(edges) - 1`` bins
    ``[edges[i], edges[i+1])`` with the last bin closed (bounds rounded
    to the column dtype, ±0 canonicalized).

    Bins come from PREFIX COUNTS through the fused predicate-pushdown
    kernels: one fused scan per edge (each at full pushdown speed, no
    decoded-plane traffic), differenced host-side — integer total-order
    keys make "< edge" exactly "<= key(edge) - 1".  For many edges the
    one-scan searchsorted + segment-sum path wins instead; the
    crossover is ~2 orders of magnitude above typical bin counts."""
    edges = [float(e) for e in edges]
    if len(edges) < 2 or any(a >= b for a, b in zip(edges, edges[1:])):
        raise ValueError("edges must be >= 2 strictly increasing values")
    if len(edges) <= 64:
        plan = col.plan()
        fusable = ("mid", "gen", "const", "small", "mid64", "midc96")
        if all(g.scheme == C.SCHEME_ALP_RD or col.dtype == np.float32
               or g.variant in fusable for g in plan.groups):
            return _query_histogram_fused(col, plan, edges)
    return _query_histogram_scan(col, edges)


def _histogram_program(plan, n_thr: int):
    """Build (and cache on the plan) the ONE-program histogram phase:
    every bucket's multi-threshold prefix counts in one traced program
    (one fused scan per bucket per QUERY — previously one scan per
    THRESHOLD), [n_thr] i64 totals out.  ``carry`` XORs into each
    bucket's first metadata plane (loop_bench shape; queries pass 0)."""
    cache = _plan_prog_cache(plan)
    ckey = ("hist", n_thr)
    if ckey in cache:
        return cache[ckey]
    f32, per, L, _ = _plan_geometry(plan)
    groups = plan.groups
    arg_counts = [len(kdecode.group_arrays(g)) for g in groups]
    lane_oks = _lane_oks(plan, per, L)

    def prog(carry, thr_hi, thr_lo, *metas):
        tot = jnp.zeros((n_thr,), jnp.int64)
        i = 0
        for g, n, lane_ok in zip(groups, arg_counts, lane_oks):
            args = list(metas[i:i + n])
            i += n
            args[1] = args[1] ^ carry
            pc = _bucket_prefix_counts(g, args, thr_hi, thr_lo,
                                       n_thr=n_thr, invert=False,
                                       f32=f32)
            ok = jnp.asarray(lane_ok)
            pc = pc.at[-1].set(jnp.where(ok[None, :], pc[-1],
                                         jnp.int32(0)))
            tot = tot + pc[:, :n_thr, :].astype(jnp.int64).sum(
                axis=(0, 2))
        return tot

    fn = jax.jit(prog)
    cache[ckey] = fn
    return fn


def _histogram_thresholds(khis: np.ndarray, f32: bool):
    """[E_pad, 128] u32 lane-replicated threshold key-word planes
    (hi, lo; the f32 single word rides the hi plane)."""
    n_thr = len(khis)
    E_pad = -(-n_thr // 8) * 8
    thr = np.zeros(E_pad, khis.dtype)
    thr[:n_thr] = khis

    def rep(words):
        return jnp.asarray(np.broadcast_to(
            words.astype(np.uint32)[:, None], (E_pad, 128)).copy())

    if f32:
        plane = rep(thr)
        return plane, plane
    return (rep(thr >> np.uint64(32)),
            rep(thr & np.uint64(0xFFFFFFFF)))


def _query_histogram_fused(col, plan, edges) -> np.ndarray:
    """Prefix counts through ONE fused multi-threshold scan per bucket,
    all buckets traced into ONE program (one dispatch + one [E+1] fetch
    per query), then the cached exception/pad corrections apply per
    threshold host-side."""
    E = len(edges)
    f32 = col.dtype == np.float32
    kt = np.uint32 if f32 else np.uint64
    keys = np.array([_float_key(e, col.dtype) for e in edges], kt)
    # prefix thresholds: "< e_i" is "<= key(e_i) - 1"; the last bin
    # closes with one extra "<= key(e_last)"
    khis = np.concatenate([keys - kt(1), keys[-1:]])      # [E+1]
    thr_hi, thr_lo = _histogram_thresholds(khis, f32)
    prog = _histogram_program(plan, E + 1)
    metas = [a for g in plan.groups for a in kdecode.group_arrays(g)]
    p = np.asarray(prog(jnp.uint32(0), thr_hi, thr_lo,
                        *metas)).astype(np.int64)
    # host corrections per threshold (vectorised over the cached
    # exception bit patterns; klo = 0 covers the whole lower range)
    for i, khi in enumerate(khis):
        p[i] += _pred_corrections(col, plan, kt(0), khi)
    out = np.diff(p[:E])
    out[-1] += p[E] - p[E - 1]
    return out


def make_histogram_step(plan, edges):
    """Throughput step for the fused HISTOGRAM pipeline: the
    one-program multi-threshold scan over every bucket (loop_bench
    shape) — query_histogram adds only tiny host corrections."""
    f32 = plan.dtype == np.float32
    kt = np.uint32 if f32 else np.uint64
    dt = np.float32 if f32 else np.float64
    keys = np.array([_float_key(float(e), dt) for e in edges], kt)
    khis = np.concatenate([keys - kt(1), keys[-1:]])
    thr_hi, thr_lo = _histogram_thresholds(khis, f32)
    prog = _histogram_program(plan, len(khis))

    def step(carry, thr_hi, thr_lo, *metas):
        tot = prog(carry, thr_hi, thr_lo, *metas)
        return tot.sum().astype(jnp.uint32) ^ carry

    metas = tuple(a for g in plan.groups for a in kdecode.group_arrays(g))
    return step, (thr_hi, thr_lo) + metas


def _query_histogram_scan(col, edges) -> np.ndarray:
    """One-scan histogram: searchsorted + segment-sum over exact
    total-order keys of the decoded planes (for large edge counts)."""
    E = len(edges)
    kt = np.uint64 if col.dtype == np.float64 else np.uint32
    keys_e = np.array([_float_key(e, col.dtype) for e in edges], kt)
    be = _keys_biased(jnp.asarray(keys_e), col.dtype)
    k_last = kt(keys_e[-1])
    plan = col.plan()
    outs = plan.run(patch=True)
    total = None
    eq_last = None
    for key, last in _masked_keys(col, plan, outs):
        flat = jnp.concatenate([key[:-1].reshape(-1), key[-1].reshape(-1)])
        w = jnp.concatenate([jnp.ones(key[:-1].size, jnp.int32),
                             last.reshape(-1).astype(jnp.int32)])
        # idx = #edges <= v in the total order: v in [e_i, e_{i+1})
        # lands in segment i+1; below-range in 0, above-range in E
        idx = jnp.searchsorted(be, _keys_biased(flat, col.dtype),
                               side="right").astype(jnp.int32)
        seg = jax.ops.segment_sum(w, idx, num_segments=E + 1)
        total = seg if total is None else total + seg
        eq = (w * (flat == k_last).astype(jnp.int32)).sum()
        eq_last = eq if eq_last is None else eq_last + eq
    counts = np.asarray(total).astype(np.int64)
    out = counts[1:E].copy()
    out[-1] += int(eq_last)        # last bin closed (np.histogram rule)
    return out


def _float_key(v: float, dtype) -> int:
    """Host-side total-order key of a float (inverse of _key_float).

    -0.0 maps to +0.0's key (matching the device-side canonicalization
    in _masked_keys), so bounds behave like IEEE compares at zero."""
    if np.dtype(dtype) == np.float64:
        b = int(np.float64(v).view(np.uint64))
        if b == 1 << 63:
            b = 0
        return (~b) & ((1 << 64) - 1) if b >> 63 else b | (1 << 63)
    b = int(np.float32(v).view(np.uint32))
    if b == 1 << 31:
        b = 0
    return (~b) & ((1 << 32) - 1) if b >> 31 else b | (1 << 31)


def _key_float(k: int, dtype) -> float:
    if np.dtype(dtype) == np.float64:
        b = (k ^ (1 << 63)) if k >> 63 else (~k) & ((1 << 64) - 1)
        return float(np.uint64(b).view(np.float64))
    b = (k ^ (1 << 31)) if k >> 31 else (~k) & ((1 << 32) - 1)
    return float(np.uint32(b).view(np.float32))


def query_filter_count(col, lo: float, hi: float) -> int:
    """SELECT COUNT(*) WHERE lo <= v <= hi — predicated SCAN with the
    predicate PUSHED INTO the decode kernel for every bucket kind (all
    f64 ALP variants, f32, and ALP_RD with the on-device dictionary):
    kernels emit [G, 128] i32 counts and the 8 B/value decoded planes
    never leave VMEM — the reference's q1 fuses its predicate into the
    scan the same way (publication/.../queries/q1.cpp:64-88).
    Exceptions and the padded tail are corrected exactly host-side.

    Bound semantics: ``lo``/``hi`` are rounded to the column dtype
    before comparing (an f32 column compares against ``f32(lo)``), and
    ±0.0 compare equal (keys canonicalize -0.0 to +0.0)."""
    kt = np.uint64 if col.dtype == np.float64 else np.uint32
    return _filter_count_keys(col, kt(_float_key(lo, col.dtype)),
                              kt(_float_key(hi, col.dtype)))


def _filter_count_keys(col, klo, khi) -> int:
    """Fused-pushdown COUNT of values whose total-order key lies in
    [klo, khi] (integer keys; query_filter_count's engine)."""
    from .kernels import falp as kfalp
    plan = col.plan()
    fusable = ("mid", "gen", "const", "small", "mid64", "midc96")
    total = 0
    dev_total = None                    # device accumulator, one fetch
    slow_groups = []
    for g in plan.groups:
        if (g.scheme != C.SCHEME_ALP_RD and col.dtype == np.float64
                and g.variant not in fusable):
            slow_groups.append(g)
            continue
        args = kdecode.group_arrays(g)
        if g.scheme == C.SCHEME_ALP_RD:
            lbw = g.meta[1]
            G = args[0].shape[0]
            if col.dtype == np.float64:
                bk = [jnp.full((G, 128), np.uint32(int(k) >> 32),
                               jnp.uint32) for k in (klo, khi)]
                bk += [jnp.full((G, 128), np.uint32(int(k) & 0xFFFFFFFF),
                                jnp.uint32) for k in (klo, khi)]
                counts = kfalp.rd_decode_dict_f64_count(
                    args[0], args[1], args[2:],
                    (bk[0], bk[2], bk[1], bk[3]), rbw=g.bw, lbw=lbw)
                dev_total = _masked_count_total(g, counts, 16, dev_total)
            else:
                bk = tuple(jnp.full((G, 128), np.uint32(int(k)),
                                    jnp.uint32) for k in (klo, khi))
                counts = kfalp.rd_decode_dict_f32_count(
                    args[0], args[1], args[2:], *bk, rbw=g.bw, lbw=lbw)
                dev_total = _masked_count_total(g, counts, 32, dev_total)
            total += _exception_count_correction(col, g, klo, khi)
            continue
        if col.dtype == np.float32:
            tiles, base, fact, frac = args
            G = base.shape[0]
            bk = tuple(jnp.full((G, 128), np.uint32(int(k)), jnp.uint32)
                       for k in (klo, khi))
            counts = kfalp.falp_decode_f32_count(
                tiles, base, fact, frac, *bk, bw=g.bw)
            dev_total = _masked_count_total(g, counts, 32, dev_total)
            total += _exception_count_correction(col, g, klo, khi)
            continue
        if g.variant == "const":
            hi_p, lo_p = args                           # [G, 128] planes
            key = _key_from_limbs(hi_p, lo_p)
            counts = ((key >= klo) & (key <= khi)).astype(
                jnp.int32) * jnp.int32(64)
        else:
            G = args[1].shape[0]
            bk = [jnp.full((G, 128), np.uint32(int(k) >> 32), jnp.uint32)
                  for k in (klo, khi)]
            bk += [jnp.full((G, 128), np.uint32(int(k) & 0xFFFFFFFF),
                            jnp.uint32) for k in (klo, khi)]
            bounds = (bk[0], bk[2], bk[1], bk[3])
            if g.variant == "gen":
                tiles, bl, bh, flo, fhi, frl, frh = args
                counts = kfalp.falp_decode_f64_count(
                    tiles, bl, bh, flo, fhi, frl, frh, *bounds, bw=g.bw,
                    fact1=bool(g.flags & 16))
            else:
                counts = kfalp.falp_decode_f64_variant_count(
                    args[0], tuple(args[1:]), bounds, variant=g.variant,
                    bw=g.bw, flags=g.flags)
        dev_total = _masked_count_total(g, counts, 16, dev_total)
        total += _exception_count_correction(col, g, klo, khi)
    if dev_total is not None:
        total += int(dev_total)
    total += _partial_vector_correction(col, plan, klo, khi, fusable)
    if slow_groups:
        # reuse DecodePlan.run for decode + exception patching (single
        # source of truth) over just the non-fused buckets
        sub = kdecode.DecodePlan(plan.dtype, plan.n_vectors, slow_groups,
                                 0)
        patched = sub.run(patch=True)
        for key, last in _masked_keys(col, sub, patched):
            inr = (key >= klo) & (key <= khi)
            t = jnp.where(last, inr[-1], False).sum()
            if key.shape[0] > 1:
                t = t + inr[:-1].sum()
            total += int(t)
    return total


def _masked_count_total(g, counts, lanes_per_vec, dev_total):
    """Zero the pad-vector lanes of a bucket's last group and fold the
    [G, 128] counts into the device accumulator (one definition of the
    pad masking for both dtypes; 128 // lanes_per_vec vectors/group)."""
    per_group = 128 // lanes_per_vec
    used = g.n_vectors % per_group or per_group
    lane_ok = jnp.arange(128) < used * lanes_per_vec
    counts = counts.at[-1].set(
        jnp.where(lane_ok, counts[-1], jnp.int32(0)))
    return counts.sum(dtype=jnp.int64) + (
        dev_total if dev_total is not None else 0)


def _key_from_limbs(hi, lo):
    """IEEE-754 total-order u64 key from u32 bit-pattern limbs, -0.0
    canonicalised to +0.0 — the ONE definition shared by the const-
    bucket counts here and mirrored by the kernels' _key_in_range_count
    and the host-side _pred_key."""
    negz = (hi == jnp.uint32(1 << 31)) & (lo == 0)
    hb = jnp.where(negz, jnp.uint32(0), hi)
    lb = jnp.where(negz, jnp.uint32(0), lo)
    sign = (hb >> jnp.uint32(31)) != 0
    return ((jnp.where(sign, ~hb, hb | jnp.uint32(1 << 31))
             .astype(jnp.uint64) << jnp.uint64(32))
            | jnp.where(sign, ~lb, lb).astype(jnp.uint64))


def _pred_key(bits, klo: int, khi: int) -> np.ndarray:
    """Host-side predicate on f64/f32 bit patterns (total-order key in
    [klo, khi], -0.0 canonicalised) — mirror of the device epilogue."""
    ut = bits.dtype.type
    sbit = ut(1) << ut(bits.dtype.itemsize * 8 - 1)
    b = np.where(bits == sbit, ut(0), bits)
    sign = (b & sbit) != 0
    key = np.where(sign, ~b, b | sbit)
    return (key >= ut(klo)) & (key <= ut(khi))


def _unpack_at(words_flat, bw: int, pos: int, eb: int) -> int:
    """One FFOR delta at value position ``pos`` from FastLanes-transposed
    packed words of element width ``eb`` (host mirror of a single
    unpack lane-slot; fastlanes layout: lane = pos % (1024/eb))."""
    if bw == 0:
        return 0
    L = 1024 // eb
    lane = int(pos) % L
    slot = int(pos) // L
    off = slot * bw
    w0, s0 = off // eb, off % eb
    val = int(words_flat[w0 * L + lane]) >> s0
    if s0 + bw > eb:
        val |= int(words_flat[(w0 + 1) * L + lane]) << (eb - s0)
    return val & ((1 << bw) - 1)


def _decode_positions(col, vec_ids: np.ndarray,
                      positions: np.ndarray) -> np.ndarray:
    """Decoded (pre-exception-patch) value bits at specific positions of
    specific vectors, straight from the stored format: unpack the FFOR
    delta at the position and decode with the vector's (fac, exp) —
    exact host floats (decoder.hpp:128-131).  Vectorised over the
    positions (Python touches only the unique vectors' payload views)."""
    from .constants import constants_for
    tc = constants_for(col.dtype)
    f64 = np.dtype(col.dtype) == np.float64
    eb = 64 if f64 else 32
    wt = np.dtype(np.uint64 if f64 else np.uint32)
    L = 1024 // eb
    vec_ids = np.asarray(vec_ids, np.int64)
    positions = np.asarray(positions, np.int64)
    uniq, inv = np.unique(vec_ids, return_inverse=True)
    packs = [col.packed[int(v)].view(wt) for v in uniq]
    sizes = np.array([p.size for p in packs], np.int64)
    word_off = np.zeros(len(uniq) + 1, np.int64)
    np.cumsum(sizes, out=word_off[1:])
    flat = (np.concatenate(packs) if packs else np.empty(0, wt))
    if flat.size == 0:
        flat = np.zeros(1, wt)                 # all-bw-0 guard
    bw = col.bit_width[vec_ids].astype(np.int64)
    lane = positions % L
    slot = positions // L
    off = slot * bw
    w0, s0 = off // eb, off % eb
    base_w = word_off[inv]
    clamp = flat.size - 1
    ia = np.minimum(base_w + w0 * L + lane, clamp)
    need2 = s0 + bw > eb
    ib = np.minimum(base_w + np.where(need2, w0 + 1, w0) * L + lane,
                    clamp)
    delta = flat[ia] >> s0.astype(wt)
    sh2 = np.where(need2, eb - s0, 0).astype(wt)
    delta = delta | np.where(need2, flat[ib] << sh2, wt.type(0))
    mask = np.where(bw >= eb, ~wt.type(0),
                    (wt.type(1) << np.minimum(bw, eb - 1).astype(wt))
                    - wt.type(1))
    delta = np.where(bw > 0, delta & mask, wt.type(0))
    with np.errstate(over="ignore"):
        n = (col.base[vec_ids].astype(tc.st)
             + delta.astype(tc.ut, copy=False).view(tc.st))
        m = n * tc.fact_arr[col.fac[vec_ids]]
    d = m.astype(col.dtype) * tc.frac_arr[col.exp[vec_ids]]
    return d.astype(col.dtype).view(wt)


def _rd_bits_at(col, v: int, pos: int, left: int | None = None) -> int:
    """RD value bits at one position: ``(left << rbw) | right``, with
    ``left`` given (the true left part, for exceptions) or looked up
    from the packed index stream + rowgroup dictionary — exactly what
    the device kernel's select tree yields (zero-padded dict rows), so
    with ``left=None`` this is the kernel's pre-patch value (garbage at
    exception positions, the true value everywhere else)."""
    rg = v // C.N_VECTORS_PER_ROWGROUP
    rbw = int(col.rd_right_bw[rg])
    eb = 64 if np.dtype(col.dtype) == np.float64 else 32
    wt = np.uint64 if eb == 64 else np.uint32
    right = _unpack_at(col.packed[v].view(wt), rbw, pos, eb)
    if left is None:
        lbw = int(col.rd_left_bw[rg])
        idx = _unpack_at(col.left_packed[v], lbw, pos, 16)
        left = int(col.rd_dict[rg][idx])
    return (left << rbw) | right


def _group_exception_bits(col, g):
    """(true stored bits, kernel-decoded slot bits) of a group's
    exceptions, computed ONCE and cached on the group — the corrections
    for every subsequent query (filter/histogram prefix scans/SUM) are
    then vectorised predicate/contribution evaluations."""
    cached = getattr(g, "_exc_bits_cache", None)
    if cached is not None:
        return cached
    exc_g = np.asarray(g.exc_g)
    exc_slot = np.asarray(g.exc_slot)
    exc_lane = np.asarray(g.exc_lane)
    if col.dtype == np.float64:
        true_bits = ((np.asarray(g.exc_hi, np.uint64) << np.uint64(32))
                     | np.asarray(g.exc_lo, np.uint64))
        per, L = 8, 16
    else:
        true_bits = np.asarray(g.exc_lo, np.uint32)
        per, L = 4, 32
    r = exc_g * per + exc_lane // L
    vec_ids = g.vec_indices[r]
    positions = exc_slot * L + exc_lane % L
    if g.scheme == C.SCHEME_ALP_RD:
        dec_bits = np.fromiter(
            (_rd_bits_at(col, int(v), int(p))
             for v, p in zip(vec_ids, positions)),
            true_bits.dtype, count=len(vec_ids))
    else:
        dec_bits = _decode_positions(col, vec_ids, positions)
    g._exc_bits_cache = (true_bits, dec_bits)
    return g._exc_bits_cache


def _exception_count_correction(col, g, klo, khi) -> int:
    """Exact fused-count correction for a group's exceptions: the kernel
    counted the PATCHED slot value (the vector's fill), so add
    pred(true stored value) - pred(decoded slot value) per exception."""
    if g.exc_g is None or not g.exc_g.shape[0]:
        return 0
    true_bits, dec_bits = _group_exception_bits(col, g)
    return int(_pred_key(true_bits, klo, khi).sum()
               - _pred_key(dec_bits, klo, khi).sum())


def _partial_vector_correction(col, plan, klo, khi, fusable) -> int:
    """Subtract the padded tail of a partial last vector from the fused
    count (the container pads with the column's final value)."""
    n_valid = col.n_values - (col.n_vectors - 1) * C.VECTOR_SIZE
    if n_valid == C.VECTOR_SIZE:
        return 0
    v_last = col.n_vectors - 1
    for g in plan.groups:
        fused = (g.scheme == C.SCHEME_ALP_RD
                 or col.dtype == np.float32 or g.variant in fusable)
        if fused and v_last in g.vec_indices:
            # pad value = the column's final value (true value after
            # exception patching)
            pos = np.int64(n_valid - 1)
            exc_pos = col.exc_positions[v_last]
            hit = np.nonzero(exc_pos == pos)[0]
            wt = np.uint64 if col.dtype == np.float64 else np.uint32
            if g.scheme == C.SCHEME_ALP_RD:
                # RD exceptions store the true LEFT part (u16), not the
                # full value; non-exception pad slots resolve through
                # the dictionary (true value there)
                left = (int(col.exc_values[v_last][hit[0]]) if hit.size
                        else None)
                bits = wt(_rd_bits_at(col, int(v_last), int(pos), left))
            elif hit.size:
                bits = np.asarray(col.exc_values[v_last][hit[0]],
                                  col.dtype).view(wt)
            else:
                bits = _decode_positions(col, np.array([v_last]),
                                         np.array([pos]))[0]
            pad_pred = bool(_pred_key(np.array([bits], wt), klo, khi)[0])
            return -int(C.VECTOR_SIZE - n_valid) * int(pad_pred)
    return 0


def query_compression(data: np.ndarray, *, device: bool = False):
    """COMPRESSION query (bench_end_to_end's compression operator): run
    the adaptive compressor over raw input inside the pipeline; returns
    (CompressedColumn, stats) with the reference cost-model ratio."""
    import time
    from . import container
    t0 = time.perf_counter()
    cc = container.compress(data, device=device)
    dt = time.perf_counter() - t0
    return cc, {
        "seconds": dt,
        "throughput_gbps": data.nbytes / dt / 1e9,
        "bits_per_value": cc.bits_per_value(),
    }


def query_scan(col):
    """SCAN: full decompression on device; returns the decode plan's
    patched planes (device arrays) for downstream operators."""
    plan = col.plan()
    return plan, plan.run(patch=True)


def query_count_exceptions(col) -> int:
    """Aggregate over metadata only (no decompression)."""
    return int(np.asarray(col.exc_count, np.int64).sum())


# ---------------------------------------------------------------------------
# GROUP-BY and windowed aggregates (engine breadth beyond the reference's
# SCAN/SUM/filter query set: the reference's e2e harness stops at q1-style
# aggregates, bench_end_to_end/include/benchmarks/alp/config.hpp:16-92;
# GROUP-BY reuses its fused-scan machinery unchanged)
# ---------------------------------------------------------------------------


def _groupby_key_planes(col, plan, keys: np.ndarray, num_groups: int):
    """Per-bucket ``[nG, slots, 128]`` int32 key planes aligned with
    ``plan.run()`` outputs.

    Built host-side from the decode layout (f64: 8 vectors/group on the
    lane axis, value ``p`` of vector ``w`` at ``[p // 16, w*16 + p % 16]``;
    f32: 4 vectors/group, lanes of 32).  Every pad slot — group-pad
    vectors AND the partial last vector's tail — carries the TRASH key
    ``num_groups``, so device segment reductions need no separate
    validity mask.
    """
    if col.dtype == np.float64:
        slots, L, per = 64, 16, 8
    else:
        slots, L, per = 32, 32, 4
    kf = np.full(col.n_vectors * C.VECTOR_SIZE, num_groups, np.int32)
    kf[:col.n_values] = keys
    kv = kf.reshape(col.n_vectors, C.VECTOR_SIZE)
    planes = []
    for g in plan.groups:
        sub = kv[g.vec_indices]                        # [nv, 1024]
        n_g = -(-g.n_vectors // per)
        pad = n_g * per - g.n_vectors
        if pad:
            sub = np.concatenate(
                [sub, np.full((pad, C.VECTOR_SIZE), num_groups, np.int32)])
        planes.append(jnp.asarray(
            sub.reshape(n_g, per, slots, L)
               .transpose(0, 2, 1, 3).reshape(n_g, slots, 128)))
    return planes


def _groupby_key_planes_cached(col, plan, keys: np.ndarray,
                               num_groups: int):
    """Key planes with a per-column identity cache: uploading 4 B/value
    of keys per query dominates warm wall-clock through the transfer
    tunnel (measured 0.04 GB/s), so repeated queries with the SAME keys
    array (the steady-state grouped-query shape) reuse the staged
    device planes.  Hits require object identity — no hashing of the
    key bytes — so callers should keep one keys array per grouping."""
    cache = getattr(col, "_gb_key_cache", None)
    if cache is None:
        cache = []
        try:
            col._gb_key_cache = cache
        except AttributeError:          # frozen dataclass: skip caching
            return _groupby_key_planes(
                col, plan, np.asarray(keys, np.int32), num_groups)
    for k_ref, n_g, p_ref, planes in cache:
        if k_ref is keys and n_g == num_groups and p_ref is plan:
            return planes
    planes = _groupby_key_planes(
        col, plan, np.asarray(keys, np.int32), num_groups)
    cache.append((keys, num_groups, plan, planes))
    del cache[:-4]                      # small LRU
    return planes


@functools.partial(jax.jit, static_argnames=("ng",))
def _groupby_chunk_f64(bits, keys, *, ng: int):
    """One chunk of the GROUP-BY pass (f64): [N] value bit patterns +
    [N] group keys (trash group = ng-1) -> per-group exact-sum digit
    windows, special counts, row counts, and total-order key extremes.

    Sums are the same fixed-point superaccumulator decomposition as
    :func:`_exact_partials_f64`, segment-summed on ``key * 64 + window``;
    min/max run native-i32 two-word (hi then lo tie-break) segment maxes
    on the IEEE-754 total-order key, never emulated-f64 compares."""
    e = ((bits >> jnp.uint64(52)) & jnp.uint64(0x7FF)).astype(jnp.int32)
    m = bits & jnp.uint64((1 << 52) - 1)
    sign = (bits >> jnp.uint64(63)) != 0
    is_special = e == 2047
    spec = jnp.stack([(is_special & (m != 0)).astype(jnp.int32),
                      (is_special & (m == 0) & ~sign).astype(jnp.int32),
                      (is_special & (m == 0) & sign).astype(jnp.int32)],
                     axis=-1)
    mp = jnp.where(e > 0, m | jnp.uint64(1 << 52), m)
    mp = jnp.where(is_special, jnp.uint64(0), mp)
    e_eff = jnp.maximum(e, 1)
    j = (e_eff >> 5).astype(jnp.int32)                       # [0, 63]
    sh = (e_eff & 31).astype(jnp.uint64)
    m32 = jnp.uint64(0xFFFFFFFF)
    d0 = (mp << sh) & m32
    d1 = ((mp >> jnp.uint64(1)) >> (jnp.uint64(31) - sh)) & m32
    d2 = (mp >> jnp.uint64(33)) >> (jnp.uint64(31) - sh)
    digs = jnp.stack([d0, d1, d2], axis=-1).astype(jnp.int64)
    digs = jnp.where(sign[:, None], -digs, digs)
    dsums = jax.ops.segment_sum(digs, keys * 64 + j, num_segments=ng * 64)
    ssums = jax.ops.segment_sum(spec, keys, num_segments=ng)
    counts = jax.ops.segment_sum(jnp.ones_like(keys), keys,
                                 num_segments=ng)
    # total-order key words (canonical -0.0 -> +0.0), biased to i32
    vb = jnp.where(bits == jnp.uint64(1 << 63), jnp.uint64(0), bits)
    ks = (vb >> jnp.uint64(63)) != 0
    ku = jnp.where(ks, ~vb, vb | jnp.uint64(1 << 63))
    khi = _biased_i32((ku >> jnp.uint64(32)).astype(jnp.uint32))
    klo = _biased_i32((ku & m32).astype(jnp.uint32))
    i32min, i32max = jnp.int32(-(1 << 31)), jnp.int32((1 << 31) - 1)
    mh = jax.ops.segment_max(khi, keys, num_segments=ng)
    ml = jax.ops.segment_max(
        jnp.where(khi == mh[keys], klo, i32min), keys, num_segments=ng)
    nh = jax.ops.segment_min(khi, keys, num_segments=ng)
    nl = jax.ops.segment_min(
        jnp.where(khi == nh[keys], klo, i32max), keys, num_segments=ng)
    return dsums.reshape(ng, 64, 3), ssums, counts, mh, ml, nh, nl


@functools.partial(jax.jit, static_argnames=("ng",))
def _groupby_chunk_f32(bits, keys, *, ng: int):
    """f32 analog of :func:`_groupby_chunk_f64` (8 exponent windows,
    two digits, one native key word; lo words returned as zeros so the
    host combine is dtype-uniform)."""
    e = ((bits >> jnp.uint32(23)) & jnp.uint32(0xFF)).astype(jnp.int32)
    m = (bits & jnp.uint32((1 << 23) - 1)).astype(jnp.uint64)
    sign = (bits >> jnp.uint32(31)) != 0
    is_special = e == 255
    spec = jnp.stack([(is_special & (m != 0)).astype(jnp.int32),
                      (is_special & (m == 0) & ~sign).astype(jnp.int32),
                      (is_special & (m == 0) & sign).astype(jnp.int32)],
                     axis=-1)
    mp = jnp.where(e > 0, m | jnp.uint64(1 << 23), m)
    mp = jnp.where(is_special, jnp.uint64(0), mp)
    e_eff = jnp.maximum(e, 1)
    j = (e_eff >> 5).astype(jnp.int32)                       # [0, 7]
    sh = (e_eff & 31).astype(jnp.uint64)
    m32 = jnp.uint64(0xFFFFFFFF)
    d0 = (mp << sh) & m32
    d1 = ((mp >> jnp.uint64(1)) >> (jnp.uint64(31) - sh)) & m32
    digs = jnp.stack([d0, d1], axis=-1).astype(jnp.int64)
    digs = jnp.where(sign[:, None], -digs, digs)
    dsums = jax.ops.segment_sum(digs, keys * 8 + j, num_segments=ng * 8)
    ssums = jax.ops.segment_sum(spec, keys, num_segments=ng)
    counts = jax.ops.segment_sum(jnp.ones_like(keys), keys,
                                 num_segments=ng)
    vb = jnp.where(bits == jnp.uint32(1 << 31), jnp.uint32(0), bits)
    ks = (vb >> jnp.uint32(31)) != 0
    ku = jnp.where(ks, ~vb, vb | jnp.uint32(1 << 31))
    khi = _biased_i32(ku)
    zero = jnp.zeros((ng,), jnp.int32)
    mh = jax.ops.segment_max(khi, keys, num_segments=ng)
    nh = jax.ops.segment_min(khi, keys, num_segments=ng)
    d3 = jnp.concatenate([dsums.reshape(ng, 8, 2),
                          jnp.zeros((ng, 8, 1), jnp.int64)], axis=-1)
    return d3, ssums, counts, mh, zero, nh, zero


_GB_CHUNK = 1 << 20       # scatter-path chunk (one compile per size class)
_GB_MXU_CHUNK = 8192      # bf16-matmul chunk: 8192 * 255 < 2^24 keeps the
                          # f32 accumulator exact
_GB_MXU_MAX_GROUPS = 128  # one-hot width cutoff; larger goes to scatter


def _mxu_digit_cols(bits, keys, ng: int, f64: bool):
    """Traced core of the one-hot MXU GROUP-BY pass: per-value feature
    columns + one-hot column ids.

    Scatter/segment ops SERIALIZE on TPU (segment_sum measured 0.1 GB/s
    end to end), so grouped exact sums are reformulated as matmuls: each
    value contributes its superaccumulator digits as signed 8-bit BYTE
    parts (exact in bf16) to one-hot column ``key * n_windows + window``
    and an MXU matmul reduces chunks of 8192 rows with EXACT f32
    accumulation (8192 * 255 < 2^24).

    Windows use the plan-time envelope (docs/DEVNOTES.md): f64
    ALP-decoded magnitudes give biased-exponent windows j in [30, 33]
    (f32: [2, 4]).  Values OUTSIDE the envelope — rare patched
    exceptions and raw-double ALP_RD payloads (incl. subnormals) — are
    flagged in the returned mask for host bignum correction; zeros and
    specials stay in-window with zeroed digits.

    Returns ``(X [n, C] f32, colid [n] i32, oob [n] bool)`` with C = 16
    for f64 (12 digit parts: window w, digit k, byte t at column
    key*4+w with weight 2^(32*(30+w) + 32k + 8t); NaN/+inf/-inf
    indicators at 12-14 on the w=0 column; row-count ones at 15) and
    C = 12 for f32 (8 parts, 3 windows, weight 2^(32*(2+w) + 32k + 8t),
    indicators 8-10, ones 11).
    """
    if f64:
        e = ((bits >> jnp.uint64(52)) & jnp.uint64(0x7FF)).astype(
            jnp.int32)
        m = bits & jnp.uint64((1 << 52) - 1)
        sign = (bits >> jnp.uint64(63)) != 0
        spec = e == 2047
        mp = jnp.where(e > 0, m | jnp.uint64(1 << 52), m)
        mp = jnp.where(spec, jnp.uint64(0), mp)
        base_w, n_w, n_dig = 30, 4, 3
    else:
        e = ((bits >> jnp.uint32(23)) & jnp.uint32(0xFF)).astype(
            jnp.int32)
        m = (bits & jnp.uint32((1 << 23) - 1)).astype(jnp.uint64)
        sign = (bits >> jnp.uint32(31)) != 0
        spec = e == 255
        mp = jnp.where(e > 0, m | jnp.uint64(1 << 23), m)
        mp = jnp.where(spec, jnp.uint64(0), mp)
        base_w, n_w, n_dig = 2, 3, 2
    e_eff = jnp.maximum(e, 1)
    j = (e_eff >> 5).astype(jnp.int32)
    jw = j - base_w
    sh = (e_eff & 31).astype(jnp.uint64)
    m32 = jnp.uint64(0xFFFFFFFF)
    digs = [((mp << sh) & m32).astype(jnp.uint32),
            (((mp >> jnp.uint64(1)) >> (jnp.uint64(31) - sh))
             & m32).astype(jnp.uint32)]
    if n_dig == 3:
        digs.append(((mp >> jnp.uint64(33))
                     >> (jnp.uint64(31) - sh)).astype(jnp.uint32))
    s = jnp.where(sign, jnp.float32(-1), jnp.float32(1))
    cols = []
    for d in digs:
        for t in range(4):
            cols.append(((d >> jnp.uint32(8 * t))
                         & jnp.uint32(0xFF)).astype(jnp.int32)
                        .astype(jnp.float32) * s)
    one = jnp.ones_like(s)
    cols.append(jnp.where(spec & (m != 0), one, 0.0))      # NaN
    cols.append(jnp.where(spec & (m == 0) & ~sign, one, 0.0))
    cols.append(jnp.where(spec & (m == 0) & sign, one, 0.0))
    cols.append(one)                                       # row count
    X = jnp.stack(cols, axis=-1)
    okw = (jw >= 0) & (jw < n_w)
    ok_row = spec | okw | (mp == jnp.uint64(0))  # zeros: window 0, digits 0
    valid_key = keys < ng
    colid = jnp.where(valid_key & ok_row,
                      keys * n_w + jnp.where(okw, jw, 0),
                      jnp.int32(ng * n_w))                 # trash column
    oob = valid_key & ~ok_row
    return X, colid, oob


def _mxu_reduce(X, colid, n_cols_onehot: int):
    """Chunked bf16 one-hot matmul: [n, C] features x [n, G] one-hot ->
    [C, G] i64 exact column sums (per-chunk f32 partials are exact,
    combined in i64)."""
    n, C = X.shape
    B = n // _GB_MXU_CHUNK
    Xb = X.reshape(B, _GB_MXU_CHUNK, C).astype(jnp.bfloat16)
    A = (colid.reshape(B, _GB_MXU_CHUNK, 1)
         == jnp.arange(n_cols_onehot, dtype=jnp.int32)).astype(
             jnp.bfloat16)
    out = jnp.einsum("bnp,bng->bpg", Xb, A,
                     preferred_element_type=jnp.float32)
    return out.astype(jnp.int32).astype(jnp.int64).sum(axis=0)


def _mxu_scan(bits, keys, ng: int, f64: bool):
    """Streamed form of digit-cols + one-hot matmul for large columns:
    ``lax.map`` over value slices keeps the materialized one-hot and
    feature operands bounded (~64 MB per step) — at GiB scale the
    whole-column operands would exceed HBM (the one-hot alone is
    ~2 B/value/group).  Returns ([C, G] i64 exact sums, [n] bool oob).
    """
    n = bits.shape[0]
    n_w = 4 if f64 else 3
    G = ng * n_w + 1
    B = n // _GB_MXU_CHUNK
    bc = max(1, min(B, (64 * 1024 * 1024)
                    // (_GB_MXU_CHUNK * max(G, 16) * 2)))
    S = -(-B // bc)
    m = bc * _GB_MXU_CHUNK
    pad = S * m - n
    if pad:
        bits = jnp.concatenate([bits, jnp.zeros(pad, bits.dtype)])
        keys = jnp.concatenate(
            [keys, jnp.full(pad, np.int32(ng), jnp.int32)])

    def body(args):
        b, k = args
        X, colid, oob = _mxu_digit_cols(b, k, ng, f64)
        return _mxu_reduce(X, colid, G), oob

    parts, oob = jax.lax.map(
        body, (bits.reshape(S, m), keys.reshape(S, m)))
    return parts.sum(axis=0), oob.reshape(-1)[:n]


def _mxu_extremes(bits, keys, ng: int, f64: bool):
    """Per-group total-order key extremes via broadcast-select reduces
    (fused by XLA; no scatter), streamed over ~4M-value slices with a
    lexicographic (hi, lo) combine so nothing [n, G]-shaped ever
    materializes.  Returns biased-i32 words (mh, ml, nh, nl), lo words
    zero for f32."""
    iota = jnp.arange(ng, dtype=jnp.int32)
    i32min, i32max = jnp.int32(-(1 << 31)), jnp.int32((1 << 31) - 1)
    n = bits.shape[0]
    m = min(n, 1 << 22)
    S = -(-n // m)
    pad = S * m - n
    if pad:
        bits = jnp.concatenate([bits, jnp.zeros(pad, bits.dtype)])
        keys = jnp.concatenate(
            [keys, jnp.full(pad, np.int32(ng), jnp.int32)])

    def body(args):
        b, k = args
        if f64:
            vb = jnp.where(b == jnp.uint64(1 << 63), jnp.uint64(0), b)
            ks = (vb >> jnp.uint64(63)) != 0
            ku = jnp.where(ks, ~vb, vb | jnp.uint64(1 << 63))
            khi = _biased_i32((ku >> jnp.uint64(32)).astype(jnp.uint32))
            klo = _biased_i32((ku & jnp.uint64(0xFFFFFFFF)).astype(
                jnp.uint32))
        else:
            vb = jnp.where(b == jnp.uint32(1 << 31), jnp.uint32(0), b)
            ks = (vb >> jnp.uint32(31)) != 0
            ku = jnp.where(ks, ~vb, vb | jnp.uint32(1 << 31))
            khi = _biased_i32(ku)
            klo = jnp.zeros_like(khi)
        mm = k[:, None] == iota[None, :]
        mh = jnp.max(jnp.where(mm, khi[:, None], i32min), axis=0)
        mhn = jnp.max(jnp.where(mm, mh[None, :], i32min), axis=1)
        ml = jnp.max(jnp.where(mm & (khi == mhn)[:, None], klo[:, None],
                               i32min), axis=0)
        nh = jnp.min(jnp.where(mm, khi[:, None], i32max), axis=0)
        nhn = jnp.min(jnp.where(mm, nh[None, :], i32max), axis=1)
        nl = jnp.min(jnp.where(mm & (khi == nhn)[:, None], klo[:, None],
                               i32max), axis=0)
        return mh, ml, nh, nl

    mh_s, ml_s, nh_s, nl_s = jax.lax.map(
        body, (bits.reshape(S, m), keys.reshape(S, m)))
    mh = mh_s.max(axis=0)
    ml = jnp.max(jnp.where(mh_s == mh[None, :], ml_s, i32min), axis=0)
    nh = nh_s.min(axis=0)
    nl = jnp.min(jnp.where(nh_s == nh[None, :], nl_s, i32max), axis=0)
    return mh, ml, nh, nl


@functools.partial(jax.jit, static_argnames=("ng",))
def _groupby_mxu_f64(bits, keys, *, ng: int):
    C, oob = _mxu_scan(bits, keys, ng, True)
    mh, ml, nh, nl = _mxu_extremes(bits, keys, ng, True)
    return (C, oob, oob.sum(dtype=jnp.int32), mh, ml, nh, nl)


@functools.partial(jax.jit, static_argnames=("ng",))
def _groupby_mxu_f32(bits, keys, *, ng: int):
    C, oob = _mxu_scan(bits, keys, ng, False)
    mh, ml, nh, nl = _mxu_extremes(bits, keys, ng, False)
    return (C, oob, oob.sum(dtype=jnp.int32), mh, ml, nh, nl)


def _groupby_raw(col, keys_id, num_groups: int):
    """Device GROUP-BY pass returning RAW per-group accumulators —
    (integer digit ``totals`` at the dtype's superaccumulator scale,
    ``sp`` [G, 3] special counts, ``ct`` [G] row counts, and biased-i32
    total-order key extreme words (mh, ml, nh, nl)) — exactly additive
    across groups, which is what sliding windows combine before their
    single rounding.  ``keys_id`` is the caller's key array (identity
    key for the staged-plane cache)."""
    f64 = col.dtype == np.float64
    plan = col.plan()
    outs = plan.run(patch=True)
    kplanes = _groupby_key_planes_cached(col, plan, keys_id, num_groups)
    use_mxu = num_groups <= _GB_MXU_MAX_GROUPS
    totals = [0] * num_groups
    sp = np.zeros((num_groups, 3), np.int64)
    ct = np.zeros(num_groups, np.int64)
    if use_mxu:
        # per-BUCKET device passes (no whole-column bits concat: at GiB
        # scale the planes + concatenated u64 bits + scan temporaries
        # together exceed HBM), combined exactly on the host
        fn = _groupby_mxu_f64 if f64 else _groupby_mxu_f32
        fixed = _f64_fixed if f64 else _f32_fixed
        Cs = None
        mh = ml = nh = nl = None
        for (bits, _), kp in zip(_masked_bits(col, plan, outs), kplanes):
            b, k = bits.reshape(-1), kp.reshape(-1)
            nb = b.shape[0]
            nb_pad = -(-nb // _GB_MXU_CHUNK) * _GB_MXU_CHUNK
            if nb_pad != nb:
                b = jnp.concatenate(
                    [b, jnp.zeros(nb_pad - nb, b.dtype)])
                k = jnp.concatenate(
                    [k, jnp.full(nb_pad - nb, np.int32(num_groups),
                                 jnp.int32)])
            C, oob, ocnt, h, l, h2, l2 = fn(b, k, ng=num_groups)
            C = np.asarray(C)
            h, l, h2, l2 = (np.asarray(h), np.asarray(l),
                            np.asarray(h2), np.asarray(l2))
            Cs = C if Cs is None else Cs + C
            if mh is None:
                mh, ml, nh, nl = h, l, h2, l2
            else:
                take = (h > mh) | ((h == mh) & (l > ml))
                mh, ml = np.where(take, h, mh), np.where(take, l, ml)
                take = (h2 < nh) | ((h2 == nh) & (l2 < nl))
                nh, nl = np.where(take, h2, nh), np.where(take, l2, nl)
            if int(ocnt):
                # host bignum corrections for out-of-envelope values
                # (rare: extreme exceptions, ALP_RD raw doubles incl.
                # subnormals)
                idx = jnp.asarray(np.flatnonzero(np.asarray(oob)))
                ob = np.asarray(jnp.take(b, idx))
                ok = np.asarray(jnp.take(k, idx))
                for bb, g in zip(ob.tolist(), ok.tolist()):
                    fx, cls = fixed(int(bb))
                    ct[g] += 1
                    if cls:
                        sp[g, cls - 1] += 1
                    else:
                        totals[g] += fx
        n_w, base_w = (4, 30) if f64 else (3, 2)
        n_parts = 12 if f64 else 8
        pz, cz = np.nonzero(Cs[:n_parts, :num_groups * n_w])
        for p, c in zip(pz.tolist(), cz.tolist()):
            g, w = divmod(c, n_w)
            totals[g] += int(Cs[p, c]) << (
                32 * (base_w + w) + 32 * (p // 4) + 8 * (p % 4))
        for g in range(num_groups):
            sp[g] += Cs[n_parts:n_parts + 3, g * n_w]
            ct[g] += Cs[n_parts + 3, g * n_w:(g + 1) * n_w].sum()
    else:
        key_chunks = []
        bit_chunks = []
        for (bits, _), kp in zip(_masked_bits(col, plan, outs), kplanes):
            bit_chunks.append(bits.reshape(-1))
            key_chunks.append(kp.reshape(-1))
        bits_all = (bit_chunks[0] if len(bit_chunks) == 1
                    else jnp.concatenate(bit_chunks))
        keys_all = (key_chunks[0] if len(key_chunks) == 1
                    else jnp.concatenate(key_chunks))
        n = bits_all.shape[0]
        n_pad = -(-n // _GB_CHUNK) * _GB_CHUNK
        if n_pad != n:
            bits_all = jnp.concatenate(
                [bits_all, jnp.zeros(n_pad - n, bits_all.dtype)])
            keys_all = jnp.concatenate(
                [keys_all,
                 jnp.full(n_pad - n, np.int32(num_groups), jnp.int32)])
        chunk = _groupby_chunk_f64 if f64 else _groupby_chunk_f32
        ngp = num_groups + 1
        dn = spn = ctn = None
        mh = ml = nh = nl = None
        for c in range(n_pad // _GB_CHUNK):
            sl = slice(c * _GB_CHUNK, (c + 1) * _GB_CHUNK)
            d, s, cc_, h, l, h2, l2 = chunk(bits_all[sl], keys_all[sl],
                                            ng=ngp)
            d, s, cc_ = np.asarray(d), np.asarray(s), np.asarray(cc_)
            h, l, h2, l2 = (np.asarray(h), np.asarray(l),
                            np.asarray(h2), np.asarray(l2))
            if dn is None:
                dn, spn, ctn, mh, ml, nh, nl = d, s, cc_, h, l, h2, l2
            else:
                dn += d
                spn += s
                ctn += cc_
                # lexicographic (hi, lo) max/min combine across chunks
                take = (h > mh) | ((h == mh) & (l > ml))
                mh, ml = np.where(take, h, mh), np.where(take, l, ml)
                take = (h2 < nh) | ((h2 == nh) & (l2 < nl))
                nh, nl = np.where(take, h2, nh), np.where(take, l2, nl)
        gz, jz, kz = np.nonzero(dn[:num_groups])
        for g, j, k in zip(gz.tolist(), jz.tolist(), kz.tolist()):
            totals[g] += int(dn[g, j, k]) << (32 * j + 32 * k)
        sp = spn[:num_groups].astype(np.int64)
        ct = ctn[:num_groups].astype(np.int64)
        mh, ml = mh[:num_groups], ml[:num_groups]
        nh, nl = nh[:num_groups], nl[:num_groups]
    return totals, sp, ct, mh, ml, nh, nl


def _distinct_program(plan):
    """ONE-dispatch COUNT(DISTINCT): fused decode + exception patch per
    bucket, canonical total-order keys (pad slots duplicated onto a real
    value, every NaN collapsed to one canonical key), a full-column
    2-key i32 sort, and the adjacent-unequal count.  Cached per plan."""
    cache = _plan_prog_cache(plan)
    if "distinct" in cache:
        return cache["distinct"]
    f32, per, L, slots = _plan_geometry(plan)
    groups = plan.groups
    arg_counts = [len(kdecode.group_arrays(g)) for g in groups]
    excs = []
    for g in groups:
        if g.exc_g is not None and g.exc_g.shape[0]:
            excs.append(tuple(jnp.asarray(x) for x in (
                g.exc_g, g.exc_slot, g.exc_lane,
                g.exc_hi if g.exc_hi is not None else g.exc_lo,
                g.exc_lo)))
        else:
            excs.append(None)
    lane_oks = _lane_oks(plan, per, L)
    dt = np.float32 if f32 else np.float64
    k_pinf = _float_key(float("inf"), np.dtype(dt))
    k_ninf = _float_key(float("-inf"), np.dtype(dt))

    def prog(*metas):
        khs, kls = [], []
        i = 0
        for g, n, exc, lane_ok in zip(groups, arg_counts, excs,
                                      lane_oks):
            args = list(metas[i:i + n])
            i += n
            out = kdecode.group_decode(g, dt)(*args)
            if f32:
                if exc is not None:
                    out = out.at[(exc[0], exc[1], exc[2])].set(exc[4])
                vb = jnp.where(out == jnp.uint32(1 << 31),
                               jnp.uint32(0), out)
                sign = (vb >> jnp.uint32(31)) != 0
                kh = jnp.where(sign, ~vb, vb | jnp.uint32(1 << 31))
                kl = jnp.zeros_like(kh)
            else:
                if exc is not None:
                    idx = (exc[0], exc[1], exc[2])
                    out = (out[0].at[idx].set(exc[3]),
                           out[1].at[idx].set(exc[4]))
                kh, kl = _key_words_from_limbs(out[0], out[1])
            ok = jnp.asarray(lane_ok)
            fill_h = kh[0, 0, 0]
            fill_l = kl[0, 0, 0]
            kh = kh.at[-1].set(jnp.where(ok[None, :], kh[-1], fill_h))
            kl = kl.at[-1].set(jnp.where(ok[None, :], kl[-1], fill_l))
            khs.append(kh.reshape(-1))
            kls.append(kl.reshape(-1))
        kh = khs[0] if len(khs) == 1 else jnp.concatenate(khs)
        kl = kls[0] if len(kls) == 1 else jnp.concatenate(kls)
        # collapse every NaN (above +inf or below -inf in the total
        # order) onto ONE canonical key
        if f32:
            nan = (kh > jnp.uint32(k_pinf)) | (kh < jnp.uint32(k_ninf))
            kh = jnp.where(nan, jnp.uint32(k_pinf) + 1, kh)
        else:
            ph = jnp.uint32(k_pinf >> 32)
            pl2 = jnp.uint32(k_pinf & 0xFFFFFFFF)
            nh = jnp.uint32(k_ninf >> 32)
            nl2 = jnp.uint32(k_ninf & 0xFFFFFFFF)
            nan = ((kh > ph) | ((kh == ph) & (kl > pl2))
                   | (kh < nh) | ((kh == nh) & (kl < nl2)))
            kh = jnp.where(nan, ph + jnp.uint32(1), kh)
            kl = jnp.where(nan, jnp.uint32(0), kl)
        sh, sl = jax.lax.sort((_biased_i32(kh), _biased_i32(kl)),
                              num_keys=2)
        ne = (sh[1:] != sh[:-1]) | (sl[1:] != sl[:-1])
        return ne.astype(jnp.int32).sum(dtype=jnp.int64) + 1

    fn = jax.jit(prog)
    cache["distinct"] = fn
    return fn


def query_distinct(col) -> int:
    """COUNT(DISTINCT v): the exact number of distinct values, entirely
    on device in ONE dispatch (decode + patch + canonical total-order
    keys + 2-key sort + adjacent-unequal count).

    Semantics: -0.0 == 0.0 (canonicalised keys, like MIN/MAX); every
    NaN counts as ONE distinct value regardless of payload.  The
    reference engine has no DISTINCT (its e2e set stops at SCAN/SUM,
    bench_end_to_end/include/benchmarks/alp/config.hpp:16-92)."""
    if col.n_values == 0:
        return 0
    plan = col.plan()
    prog = _distinct_program(plan)
    metas = [a for g in plan.groups for a in kdecode.group_arrays(g)]
    base = int(prog(*metas))
    # pad-slot correction: padded tail slots duplicate the column's
    # final value and pad lanes its bucket's first value — duplicates
    # never change a distinct count, so `base` is already exact
    return base


# ---------------------------------------------------------------------------
# Sorted-permutation GROUP-BY: the scan-speed repeated-keys path.
#
# The one-hot MXU formulation pays ~2 B/value/group of HBM one-hot traffic
# per query and falls off a cliff past 128 groups.  For repeated queries
# with the SAME keys array (the steady-state grouped-query shape) we
# instead cache a GROUP-SORTED re-encoding of the column: a stable argsort
# of the keys turns every group into a contiguous value range, so grouped
# exact SUM/COUNT/MIN/MAX reduce to per-vector superaccumulator partials
# (kernels.falp.exact_sum_planes_f64) + an exclusive prefix sum + two
# static gathers per group — no [n, G] operand, no scatter, no group-count
# dependence.  Group-boundary-straddling vectors, the padded last vector,
# and out-of-envelope vectors (rare: specials/subnormal-magnitude
# exceptions) are precomputed ONCE at cache build from the true permuted
# bits; every query re-runs only the fused decode + partials pass.
# The reference has no GROUP-BY at all (its e2e set stops at SCAN/SUM,
# publication/source_code/bench_end_to_end/include/benchmarks/alp/
# config.hpp:16-92).
# ---------------------------------------------------------------------------

_GB_SORT_MAX_GROUPS = 1 << 16      # host boundary math is O(G) per build
_GB_SORT_MIN_USES = 2              # build the cache on the 2nd same-keys
                                   # query; first touch stays on the MXU
                                   # path (the build costs a decode +
                                   # gather + device re-encode)


def _lex_scan_combine(a, b):
    """Segmented lexicographic (min, max) combine for associative_scan:
    state = (gid, mnh, mnl, mxh, mxl); a new segment resets."""
    ga, mnh_a, mnl_a, mxh_a, mxl_a = a
    gb_, mnh_b, mnl_b, mxh_b, mxl_b = b
    same = ga == gb_
    lt = (mnh_a < mnh_b) | ((mnh_a == mnh_b) & (mnl_a < mnl_b))
    mnh = jnp.where(same & lt, mnh_a, mnh_b)
    mnl = jnp.where(same & lt, mnl_a, mnl_b)
    gt = (mxh_a > mxh_b) | ((mxh_a == mxh_b) & (mxl_a > mxl_b))
    mxh = jnp.where(same & gt, mxh_a, mxh_b)
    mxl = jnp.where(same & gt, mxl_a, mxl_b)
    return gb_, mnh, mnl, mxh, mxl


def _sorted_gb_build(col, keys: np.ndarray, num_groups: int):
    """Build the sorted GROUP-BY cache entry (f64 columns).

    Returns a dict with the permuted column, static per-bucket index
    arrays and the host-precomputed contributions of every vector the
    device pass cannot aggregate (boundary / padded / out-of-envelope),
    or None when the column is ineligible (too many host-handled
    vectors: the envelope covers all ALP-decodable magnitudes, so this
    only triggers for subnormal-heavy raw-double data)."""
    from . import device_compress as dcz
    from .kernels import falp as kfalp
    n = col.n_values
    plan = col.plan()
    order = np.argsort(keys, kind="stable").astype(np.int64)
    bounds = np.zeros(num_groups + 1, np.int64)
    np.cumsum(np.bincount(keys.astype(np.int64),
                          minlength=num_groups), out=bounds[1:])
    # concat position of every global value in the bucket-major plane
    # flattening (vector-major value order inside each bucket)
    pos_of_value = np.empty(n, np.int64)
    ar = np.arange(C.VECTOR_SIZE)
    base = 0
    for g in plan.groups:
        gr = -(-g.n_vectors // 8)
        vecs = np.asarray(g.vec_indices, np.int64)
        starts = (base + np.arange(len(vecs))) * C.VECTOR_SIZE
        full = vecs * C.VECTOR_SIZE + C.VECTOR_SIZE <= n
        if full.any():
            pos_of_value[(vecs[full] * C.VECTOR_SIZE)[:, None] + ar] = (
                starts[full][:, None] + ar)
        for v, s in zip(vecs[~full].tolist(), starts[~full].tolist()):
            m = n - v * C.VECTOR_SIZE         # the one partial vector
            pos_of_value[v * C.VECTOR_SIZE:n] = s + ar[:m]
        base += gr * 8
    perm = pos_of_value[order].astype(np.int32)

    nv2 = -(-n // C.VECTOR_SIZE)
    G2 = -(-nv2 // 8)
    padn = G2 * 8 * C.VECTOR_SIZE - n
    # the boundary/last part of H is known before any device work
    H = {nv2 - 1}
    for b in bounds[1:-1]:
        if b % C.VECTOR_SIZE:
            H.add(int(b) // C.VECTOR_SIZE)
    H0 = np.array(sorted(v for v in H if v < nv2), np.int64)
    if len(H0) > max(4 * num_groups + 64, 2048):
        return None                       # host math is O(|H| * 1024)

    # staged permute (small programs keep peak HBM ~2.5x the column:
    # donation cannot alias the shape-changing buffers here): bucket
    # planes -> value order -> gather by the group-sorted permutation
    # -> tile planes; the boundary vectors' true bits are sliced while
    # the value-ordered copy is still alive
    nb = len(plan.groups)

    def _flatten(*planes):
        fh, fl = [], []
        for b in range(nb):
            hi, lo = planes[2 * b], planes[2 * b + 1]
            Gb = hi.shape[0]
            fh.append(hi.reshape(Gb, 64, 8, 16)
                      .transpose(0, 2, 1, 3).reshape(-1))
            fl.append(lo.reshape(Gb, 64, 8, 16)
                      .transpose(0, 2, 1, 3).reshape(-1))
        return (fh[0] if nb == 1 else jnp.concatenate(fh),
                fl[0] if nb == 1 else jnp.concatenate(fl))

    def _gather(cat, pidx):
        ph = jnp.take(cat, pidx)
        if padn:
            ph = jnp.concatenate(
                [ph, jnp.broadcast_to(ph[-1], (padn,))])
        return ph

    def _to_planes(ph, bidx):
        bnd = jnp.take(ph.reshape(-1, C.VECTOR_SIZE), bidx, axis=0)
        v = ph.reshape(G2, 8, 64, 16).transpose(0, 2, 1, 3).reshape(
            G2, 64, 128)
        return v, bnd

    outs = plan.run(patch=True)
    flat_planes = [a for pair in outs for a in pair]
    del outs
    cat_h, cat_l = jax.jit(_flatten)(*flat_planes)
    jax.block_until_ready((cat_h, cat_l))
    del flat_planes
    pidx = jnp.asarray(perm)
    bidx = jnp.asarray(H0 if len(H0) else np.zeros(1, np.int64))
    g_jit = jax.jit(_gather, donate_argnums=(0,))
    p_jit = jax.jit(_to_planes, donate_argnums=(0,))
    ph = g_jit(cat_h, pidx)
    jax.block_until_ready(ph)
    del cat_h
    vhi, bnd_h = p_jit(ph, bidx)
    jax.block_until_ready(vhi)
    del ph
    pl_ = g_jit(cat_l, pidx)
    jax.block_until_ready(pl_)
    del cat_l, pidx
    vlo, bnd_l = p_jit(pl_, bidx)
    jax.block_until_ready(vlo)
    del pl_
    bnd_h, bnd_l = jax.device_get((bnd_h, bnd_l))

    # out-of-envelope vectors (exact-sum row 15 on the TRUE permuted
    # planes): rare patched values / subnormal raw doubles the device
    # digit pass cannot aggregate
    rows = kfalp.exact_sum_planes_f64(vhi, vlo)
    oob_v = np.flatnonzero(
        np.asarray(rows[:, 15, :].astype(jnp.int64))
        .reshape(G2, 8, 16).sum(axis=2).reshape(-1) > 0)
    del rows
    oob_new = sorted(int(v) for v in oob_v if v < nv2 and v not in H)
    H.update(oob_new)
    H = np.array(sorted(v for v in H if v < nv2), np.int64)
    if len(H) > max(4 * num_groups + 64, 2048):
        return None
    if oob_new:
        # tiny per-class slices of the planes (8 lane classes)
        ov = np.array(oob_new, np.int64)
        parts_h = np.empty((len(ov), C.VECTOR_SIZE), np.uint32)
        parts_l = np.empty((len(ov), C.VECTOR_SIZE), np.uint32)
        for c in range(8):
            sel = np.flatnonzero(ov % 8 == c)
            if not len(sel):
                continue
            rows_c = jnp.take(vhi, jnp.asarray(ov[sel] // 8), axis=0)
            rl_c = jnp.take(vlo, jnp.asarray(ov[sel] // 8), axis=0)
            hc, lc = jax.device_get(
                (rows_c[:, :, 16 * c:16 * c + 16],
                 rl_c[:, :, 16 * c:16 * c + 16]))
            parts_h[sel] = hc.reshape(len(sel), -1)
            parts_l[sel] = lc.reshape(len(sel), -1)
        bmap = {int(v): i for i, v in enumerate(H0.tolist())}
        omap = {int(v): i for i, v in enumerate(oob_new)}
        hb = np.empty((len(H), C.VECTOR_SIZE), np.uint32)
        lb = np.empty((len(H), C.VECTOR_SIZE), np.uint32)
        for i, v in enumerate(H.tolist()):
            if v in bmap:
                hb[i], lb[i] = bnd_h[bmap[v]], bnd_l[bmap[v]]
            else:
                hb[i], lb[i] = parts_h[omap[v]], parts_l[omap[v]]
    elif len(H):
        hb, lb = bnd_h, bnd_l
    else:
        hb = lb = np.zeros((0, C.VECTOR_SIZE), np.uint32)
    hbits = (hb.astype(np.uint64) << np.uint64(32)) | lb.astype(
        np.uint64)

    # already-ordered keys (windows / pre-sorted groupings): every
    # group is contiguous in the COLUMN's own row order, so the column
    # IS its own sorted re-encoding — skip the device re-compress (and
    # the extra resident pcol)
    ordered = bool(n < 2 or np.all(keys[1:] >= keys[:-1]))
    if ordered:
        pcol, pplan = col, plan
    else:
        pcol = dcz.compress_device(planes=(vhi, vlo), n_values=n)
        pplan = pcol.plan()
    del vhi, vlo

    # per-group host contributions from H vectors (exact fixed-point)
    h_tot = [0] * num_groups
    h_sp = np.zeros((num_groups, 3), np.int64)
    h_cnt = np.zeros(num_groups, np.int64)
    h_keys = [[] for _ in range(num_groups)]
    for row, v in enumerate(H.tolist()):
        v0 = v * C.VECTOR_SIZE
        v1 = min(v0 + C.VECTOR_SIZE, n)
        gs = np.searchsorted(bounds, v0, side="right") - 1
        ge = np.searchsorted(bounds, v1 - 1, side="right") - 1
        bits = hbits[row]
        for g in range(int(gs), int(ge) + 1):
            a = max(int(bounds[g]), v0) - v0
            b = min(int(bounds[g + 1]), v1) - v0
            if a >= b:
                continue
            sl = bits[a:b]
            h_cnt[g] += b - a
            e = (sl >> np.uint64(52)).astype(np.int64) & 0x7FF
            m = sl & np.uint64((1 << 52) - 1)
            s = (sl >> np.uint64(63)).astype(np.int64)
            spec = e == 2047
            h_sp[g, 0] += int((spec & (m != 0)).sum())
            h_sp[g, 1] += int((spec & (m == 0) & (s == 0)).sum())
            h_sp[g, 2] += int((spec & (m == 0) & (s == 1)).sum())
            fin = ~spec
            if fin.any():
                mp = np.where(e > 0, m | np.uint64(1 << 52), m)[fin]
                ee = np.maximum(e[fin], 1)
                sg = 1 - 2 * s[fin]
                t = 0
                for mi, ei, si in zip(mp.tolist(), ee.tolist(),
                                      sg.tolist()):
                    t += si * (mi << ei)
                h_tot[g] += t
            # extremes use the IEEE total order, specials included
            # (NaN above +inf / below -inf, matching query_min/max)
            h_keys[g].append(_np_work_keys(sl, True))
    h_mn = np.full(num_groups, np.iinfo(np.uint64).max, np.uint64)
    h_mx = np.zeros(num_groups, np.uint64)
    h_has = np.zeros(num_groups, bool)
    for g in range(num_groups):
        if h_keys[g]:
            kk = np.concatenate(h_keys[g])
            h_mn[g] = kk.min()
            h_mx[g] = kk.max()
            h_has[g] = True

    # static per-bucket machinery for the device pass
    Hset = set(H.tolist())
    b_static = []
    for g in pplan.groups:
        vecs = np.asarray(g.vec_indices, np.int64)
        interior = np.array([v not in Hset for v in vecs.tolist()])
        # full-vector range of each group in vector space
        lo_vec = -(-bounds[:-1] // C.VECTOR_SIZE)
        hi_vec = bounds[1:] // C.VECTOR_SIZE
        lo_idx = np.searchsorted(vecs, lo_vec).astype(np.int32)
        hi_idx = np.searchsorted(vecs, hi_vec).astype(np.int32)
        # per-vector group id (H vectors keep their containing group;
        # they are masked out of the reductions anyway)
        gid = (np.searchsorted(bounds, vecs * C.VECTOR_SIZE,
                               side="right") - 1).astype(np.int32)
        # last interior vector index per group (for the segmented-scan
        # gather); has[g] marks groups with >= 1 interior vector here
        endi = np.zeros(num_groups, np.int32)
        has = np.zeros(num_groups, bool)
        gi = gid.copy()
        gi[~interior] = -1
        for i_, gg in enumerate(gi.tolist()):
            if gg >= 0:
                endi[gg] = i_
                has[gg] = True
        b_static.append(dict(
            interior=interior, lo_idx=lo_idx, hi_idx=hi_idx, gid=gid,
            endi=endi, has=has))

    counts = np.array(
        [int(bounds[g + 1] - bounds[g]) for g in range(num_groups)],
        np.int64)
    return dict(pcol=pcol, pplan=pplan, bounds=bounds, G=num_groups,
                b_static=b_static, h_tot=h_tot, h_sp=h_sp, h_cnt=h_cnt,
                h_mn=h_mn, h_mx=h_mx, h_has=h_has, counts=counts)


def _make_grouped_pass(entry):
    """ONE traced program per cache entry: fused decode (+ exception
    patch) of the permuted column, per-vector superaccumulator partials
    and key extremes, exclusive prefix + static gathers for grouped
    sums, and a segmented associative scan for grouped extremes.
    Returns (jitted fn, flat device args)."""
    from .kernels import falp as kfalp
    pplan = entry["pplan"]
    G = entry["G"]
    groups = pplan.groups
    arg_counts = []
    flat = []
    excs = []
    for g in groups:
        a = kdecode.group_arrays(g)
        arg_counts.append(len(a))
        flat.extend(a)
        if g.exc_g is not None and g.exc_g.shape[0]:
            excs.append((jnp.asarray(g.exc_g), jnp.asarray(g.exc_slot),
                         jnp.asarray(g.exc_lane), jnp.asarray(g.exc_hi),
                         jnp.asarray(g.exc_lo)))
        else:
            excs.append(None)
    b_static = entry["b_static"]
    imin = jnp.int32(_I32_MIN)
    imax = jnp.int32(2 ** 31 - 1)

    def prog(*metas):
        tot = jnp.zeros((G, 16), jnp.int64)
        mnh = jnp.full((G,), imax)
        mnl = jnp.full((G,), imax)
        mxh = jnp.full((G,), imin)
        mxl = jnp.full((G,), imin)
        i = 0
        for g, narg, exc, st in zip(groups, arg_counts, excs, b_static):
            args = list(metas[i:i + narg])
            i += narg
            out = kdecode.group_decode(g, np.float64)(*args)
            if exc is not None:
                idx = (exc[0], exc[1], exc[2])
                out = (out[0].at[idx].set(exc[3]),
                       out[1].at[idx].set(exc[4]))
            hi, lo = out
            nvb = g.n_vectors
            se = kfalp.sum_extremes_planes_f64(hi, lo)
            rows = se[:, 0:16, :]
            ext = se[:, 16:24, :]
            pv = (rows.astype(jnp.int64).reshape(-1, 16, 8, 16)
                  .sum(axis=3).transpose(0, 2, 1)
                  .reshape(-1, 16))[:nvb]
            pv = jnp.where(jnp.asarray(st["interior"])[:, None], pv, 0)
            csx = jnp.concatenate(
                [jnp.zeros((1, 16), jnp.int64),
                 jnp.cumsum(pv, axis=0)])
            tot = tot + (jnp.take(csx, jnp.asarray(st["hi_idx"]),
                                  axis=0)
                         - jnp.take(csx, jnp.asarray(st["lo_idx"]),
                                    axis=0))
            er = ext.reshape(-1, 8, 8, 16)        # [Gb, row, vec, lane]
            a_ = er[:, 0]
            b_ = er[:, 1]
            vh = jnp.min(a_, axis=2)
            vl = jnp.min(jnp.where(a_ == vh[..., None], b_, imax),
                         axis=2)
            c_ = er[:, 2]
            d_ = er[:, 3]
            wh = jnp.max(c_, axis=2)
            wl = jnp.max(jnp.where(c_ == wh[..., None], d_, imin),
                         axis=2)
            vh, vl, wh, wl = (x.reshape(-1)[:nvb]
                              for x in (vh, vl, wh, wl))
            ok = jnp.asarray(st["interior"])
            vh = jnp.where(ok, vh, imax)
            vl = jnp.where(ok, vl, imax)
            wh = jnp.where(ok, wh, imin)
            wl = jnp.where(ok, wl, imin)
            gid = jnp.asarray(st["gid"])
            _, sh, sl_, th, tl = jax.lax.associative_scan(
                _lex_scan_combine, (gid, vh, vl, wh, wl))
            endi = jnp.asarray(st["endi"])
            has = jnp.asarray(st["has"])
            eh = jnp.where(has, jnp.take(sh, endi), imax)
            el = jnp.where(has, jnp.take(sl_, endi), imax)
            fh = jnp.where(has, jnp.take(th, endi), imin)
            fl = jnp.where(has, jnp.take(tl, endi), imin)
            lt = (eh < mnh) | ((eh == mnh) & (el < mnl))
            mnh = jnp.where(lt, eh, mnh)
            mnl = jnp.where(lt, el, mnl)
            gt = (fh > mxh) | ((fh == mxh) & (fl > mxl))
            mxh = jnp.where(gt, fh, mxh)
            mxl = jnp.where(gt, fl, mxl)
        return tot, mnh, mnl, mxh, mxl

    return jax.jit(prog), tuple(flat)


def _query_groupby_sorted_raw(col, entry):
    """One fused device pass over the sorted cache + host assembly:
    returns RAW per-group accumulators (``totals`` integer digit sums,
    ``sp`` [G, 3] special counts, ``ct`` counts, and u64 total-order
    key extremes ``kmn``/``kmx`` with a ``has`` validity mask) —
    exactly additive across groups (the sliding-window combine
    contract)."""
    from .kernels import falp as kfalp
    prog_ent = entry.get("prog")
    if prog_ent is None:
        prog_ent = entry["prog"] = _make_grouped_pass(entry)
    prog, flat = prog_ent
    G = entry["G"]
    tot, mnh, mnl, mxh, mxl = jax.device_get(prog(*flat))
    tot = tot.astype(np.int64)
    assert not tot[:, 15].any()           # interiors are in-envelope
    totals = []
    W0, NW = kfalp._SUM_W0, kfalp._SUM_NWIN
    for g in range(G):
        t = int(entry["h_tot"][g])
        for w in range(NW):
            tw = int(tot[g, w]) + (int(tot[g, w + NW]) << 16)
            if tw:
                t += tw << (32 * (W0 + w))
        totals.append(t)
    sp = entry["h_sp"] + tot[:, 12:15]
    ct = entry["counts"]
    sb = np.uint32(1 << 31)
    dev_mn = ((mnh.astype(np.int64).astype(np.uint64)
               & np.uint64(0xFFFFFFFF)) ^ sb) << np.uint64(32)
    dev_mn |= ((mnl.astype(np.int64).astype(np.uint64)
                & np.uint64(0xFFFFFFFF)) ^ sb)
    dev_mx = ((mxh.astype(np.int64).astype(np.uint64)
               & np.uint64(0xFFFFFFFF)) ^ sb) << np.uint64(32)
    dev_mx |= ((mxl.astype(np.int64).astype(np.uint64)
                & np.uint64(0xFFFFFFFF)) ^ sb)
    dev_has = mnh < (2 ** 31 - 1)
    kmn = np.where(entry["h_has"]
                   & (~dev_has | (entry["h_mn"] < dev_mn)),
                   entry["h_mn"], dev_mn)
    kmx = np.where(entry["h_has"]
                   & (~dev_has | (entry["h_mx"] > dev_mx)),
                   entry["h_mx"], dev_mx)
    return totals, sp, ct, kmn, kmx


def _query_groupby_sorted(col, entry, aggs):
    """Answer a grouped query from the sorted cache: one fused device
    pass + the precomputed host pieces."""
    totals, sp, ct, kmn, kmx = _query_groupby_sorted_raw(col, entry)
    G = entry["G"]
    res = {}
    if "count" in aggs:
        res["count"] = ct.copy()
    if "sum" in aggs:
        res["sum"] = np.array(
            [_finish_sum(totals[g], int(sp[g, 0]), int(sp[g, 1]),
                         int(sp[g, 2]), 1075) for g in range(G)],
            np.float64)
    if "mean" in aggs:
        from fractions import Fraction
        means = np.full(G, np.nan, np.float64)
        for g in range(G):
            if ct[g] == 0:
                continue
            if sp[g, 0] or (sp[g, 1] and sp[g, 2]):
                continue
            elif sp[g, 1]:
                means[g] = np.inf
            elif sp[g, 2]:
                means[g] = -np.inf
            elif totals[g] == 0:
                means[g] = 0.0
            else:
                means[g] = np.float64(float(Fraction(
                    totals[g], int(ct[g]) << 1075)))
        res["mean"] = means
    if "min" in aggs or "max" in aggs:
        if "max" in aggs:
            vals = np.full(G, np.nan, np.float64)
            for g in range(G):
                if ct[g]:
                    vals[g] = _key_float(int(kmx[g]), np.float64)
            res["max"] = vals
        if "min" in aggs:
            vals = np.full(G, np.nan, np.float64)
            for g in range(G):
                if ct[g]:
                    vals[g] = _key_float(int(kmn[g]), np.float64)
            res["min"] = vals
    return {a: res[a] for a in aggs if a in res}


def _sorted_gb_entry(col, keys_id, keys, num_groups: int):
    """Sorted-cache lookup with a use-counter build policy: entries
    build on the :data:`_GB_SORT_MIN_USES`-th query with the same keys
    identity (immediately when the MXU gate would overflow).  Returns
    the entry dict, or None (not built / ineligible)."""
    cache = getattr(col, "_gb_sorted", None)
    if cache is None:
        try:
            cache = col._gb_sorted = {}
        except AttributeError:
            return None
    k = (id(keys_id), num_groups)
    ent = cache.get(k)
    if isinstance(ent, dict):
        return ent
    if ent == "ineligible":
        return None
    uses = cache.get(("uses", k), 0) + 1
    cache[("uses", k)] = uses
    if uses < _GB_SORT_MIN_USES and num_groups <= _GB_MXU_MAX_GROUPS:
        return None
    built = _sorted_gb_build(col, keys, num_groups)
    cache[k] = built if built is not None else "ineligible"
    # hold a reference to the keys object so id() stays unique
    cache[("ref", k)] = keys_id
    if built is not None:
        # the MXU path's staged key planes (~4 B/value of HBM) are
        # superseded by the sorted entry: drop them for this identity
        kc = getattr(col, "_gb_key_cache", None)
        if kc is not None:
            kc[:] = [e for e in kc
                     if not (e[0] is keys_id and e[1] == num_groups)]
    return built


def query_groupby(col, keys, num_groups: int,
                  aggs=("sum", "count", "min", "max", "mean")) -> dict:
    """GROUP-BY aggregate: ``SELECT key, AGG(v) ... GROUP BY key`` over a
    compressed column and an int key column, entirely on device except
    the final per-group bignum assembly.

    ``keys`` is an int array of length ``col.n_values`` with values in
    ``[0, num_groups)``.  Returns a dict of ``[num_groups]`` numpy
    arrays for the requested aggregates:

    - ``sum``/``mean``: EXACT — each group's result is the correctly-
      rounded float of the group's true rational sum (mean: sum/n),
      bit-identical to ``math.fsum`` per group, via the same
      superaccumulator windows as :func:`query_sum` reduced per group.
      IEEE special rules per group (any NaN, or +inf with -inf -> NaN;
      else the infinity wins).  Empty groups: sum 0.0, mean NaN.
    - ``count``: rows per group (COUNT(*), specials included).
    - ``min``/``max``: exact total-order extremes (native-i32 two-word
      compares — XLA's emulated f64 compares are NOT exact on TPU,
      round-2 finding).  NaN sorts above +inf / below -inf per the
      IEEE total order (matching :func:`query_min`); empty groups NaN.

    The decode side is the standard fused per-bucket scan
    (``plan.run(patch=True)`` — exceptions are already patched).  The
    grouped reduction itself is the one-hot MXU matmul formulation
    (:func:`_mxu_digit_cols`: scatter serializes on TPU) for up to
    ``_GB_MXU_MAX_GROUPS`` groups, with host bignum corrections for the
    rare out-of-envelope values; larger group counts take the general
    segment-sum path (exact everywhere, slower on TPU).
    """
    keys_id = keys                       # identity key for the plane cache
    # identity fast path: a built sorted-cache entry already validated
    # this exact keys object — skip the O(n) conversion/min/max scans
    cache0 = getattr(col, "_gb_sorted", None)
    if cache0 is not None:
        ent0 = cache0.get((id(keys_id), num_groups))
        if isinstance(ent0, dict):
            return _query_groupby_sorted(col, ent0, aggs)
    keys = np.ascontiguousarray(np.asarray(keys, np.int64))
    if keys.shape != (col.n_values,):
        raise ValueError(f"keys must have shape ({col.n_values},)")
    if num_groups <= 0 or num_groups > (1 << 24):
        raise ValueError("num_groups must be in [1, 2^24]")
    if keys.size and (keys.min() < 0 or keys.max() >= num_groups):
        raise ValueError("keys out of range [0, num_groups)")
    f64 = col.dtype == np.float64
    out = {}
    if col.n_values == 0:
        for a in aggs:
            if a == "count":
                out[a] = np.zeros(num_groups, np.int64)
            elif a == "sum":
                out[a] = np.zeros(num_groups, col.dtype)
            else:
                out[a] = np.full(num_groups, np.nan, col.dtype)
        return out
    if f64 and num_groups <= _GB_SORT_MAX_GROUPS:
        # scan-speed sorted-permutation path (repeated keys; always for
        # group counts past the MXU one-hot gate)
        ent = _sorted_gb_entry(col, keys_id, keys, num_groups)
        if ent is not None:
            return _query_groupby_sorted(col, ent, aggs)
    totals, sp, ct, mh, ml, nh, nl = _groupby_raw(
        col, keys_id, num_groups)
    scale = 1075 if f64 else 150
    res = {}
    if "count" in aggs:
        res["count"] = ct.copy()
    if "sum" in aggs:
        res["sum"] = np.array(
            [_finish_sum(totals[g], int(sp[g, 0]), int(sp[g, 1]),
                         int(sp[g, 2]), scale)
             for g in range(num_groups)], col.dtype)
    if "mean" in aggs:
        from fractions import Fraction
        means = np.full(num_groups, np.nan, col.dtype)
        for g in range(num_groups):
            if ct[g] == 0:
                continue
            if sp[g, 0] or (sp[g, 1] and sp[g, 2]):
                continue                      # NaN
            elif sp[g, 1]:
                means[g] = np.inf
            elif sp[g, 2]:
                means[g] = -np.inf
            elif totals[g] == 0:
                means[g] = 0.0
            else:
                means[g] = col.dtype.type(float(Fraction(
                    totals[g], int(ct[g]) << scale)))
        res["mean"] = means

    def _key_of(h, l):
        # un-bias the i32 reduce words back to the u32 total-order key
        # halves (inverse of _biased_i32)
        if f64:
            return ((int(np.uint32(np.int64(h) & 0xFFFFFFFF)
                         ^ np.uint32(1 << 31))) << 32) | int(
                np.uint32(np.int64(l) & 0xFFFFFFFF) ^ np.uint32(1 << 31))
        return int(np.uint32(np.int64(h) & 0xFFFFFFFF)
                   ^ np.uint32(1 << 31))

    if "max" in aggs:
        vals = np.full(num_groups, np.nan, col.dtype)
        for g in range(num_groups):
            if ct[g]:
                vals[g] = _key_float(_key_of(mh[g], ml[g]), col.dtype)
        res["max"] = vals
    if "min" in aggs:
        vals = np.full(num_groups, np.nan, col.dtype)
        for g in range(num_groups):
            if ct[g]:
                vals[g] = _key_float(_key_of(nh[g], nl[g]), col.dtype)
        res["min"] = vals
    return {a: res[a] for a in aggs if a in res}


def query_window(col, window: int,
                 aggs=("sum", "count", "min", "max", "mean"),
                 hop: int | None = None) -> dict:
    """Windowed aggregates over row order, EXACT like
    :func:`query_groupby`.

    Tumbling (default, ``hop is None`` or ``hop == window``): window
    ``w`` covers rows ``[w*window, (w+1)*window)``; returns
    ``[ceil(n / window)]`` arrays.

    Sliding (``hop < window``, ``hop`` must divide ``window``): window
    ``i`` covers ``[i*hop, i*hop + window)``.  One device GROUP-BY pass
    computes hop-sized CELLS; each sliding window then combines its
    ``window/hop`` cells' INTEGER digit totals / counts / special
    counts / key extremes on the host and rounds ONCE — so overlapping
    windows stay bit-identical to ``math.fsum`` over their rows, at the
    device cost of a single non-overlapping pass.
    """
    if window <= 0:
        raise ValueError("window must be positive")
    n = col.n_values
    if hop is None:
        hop = window
    if hop <= 0 or window % hop:
        raise ValueError("hop must be positive and divide window")
    ncells = max(-(-n // hop), 1)
    # reuse one keys array per hop size so the key-plane cache hits on
    # repeated queries (identity-keyed; _groupby_key_planes_cached)
    wc = getattr(col, "_window_keys_cache", None)
    if wc is None:
        wc = {}
        try:
            col._window_keys_cache = wc
        except AttributeError:
            pass
    keys = wc.get(hop)
    if keys is None:
        keys = np.arange(n, dtype=np.int64) // hop
        wc[hop] = keys
    if hop == window:
        return query_groupby(col, keys, ncells, aggs)
    k = window // hop
    if n == 0:
        return query_groupby(col, keys, 1, aggs)
    f64 = col.dtype == np.float64
    ent = (None if not f64 or ncells > _GB_SORT_MAX_GROUPS
           else _sorted_gb_entry(col, keys, keys, ncells))
    if ent is not None:
        # hop cells are contiguous rows: the sorted machinery serves
        # them with pcol == col (no re-encode, no [n, G] operand)
        totals, sp, ct, kmn, kmx = _query_groupby_sorted_raw(col, ent)
    else:
        totals, sp, ct, mh, ml, nh, nl = _groupby_raw(col, keys, ncells)

        def _cell_key(h, l):
            if f64:
                return ((int(np.uint32(np.int64(h) & 0xFFFFFFFF)
                             ^ np.uint32(1 << 31))) << 32) | int(
                    np.uint32(np.int64(l) & 0xFFFFFFFF)
                    ^ np.uint32(1 << 31))
            return int(np.uint32(np.int64(h) & 0xFFFFFFFF)
                       ^ np.uint32(1 << 31))

        kmx = np.array([_cell_key(mh[j], ml[j]) for j in range(ncells)],
                       np.uint64)
        kmn = np.array([_cell_key(nh[j], nl[j]) for j in range(ncells)],
                       np.uint64)
    nw = max(-(-max(n - window, 0) // hop) + 1, 1)
    scale = 1075 if f64 else 150
    res = {}
    w_tot = [sum(totals[i:i + k]) for i in range(nw)]
    w_sp = np.stack([sp[i:i + k].sum(axis=0) for i in range(nw)])
    w_ct = np.array([ct[i:i + k].sum() for i in range(nw)], np.int64)
    if "count" in aggs:
        res["count"] = w_ct
    if "sum" in aggs:
        res["sum"] = np.array(
            [_finish_sum(w_tot[i], int(w_sp[i, 0]), int(w_sp[i, 1]),
                         int(w_sp[i, 2]), scale) for i in range(nw)],
            col.dtype)
    if "mean" in aggs:
        from fractions import Fraction
        means = np.full(nw, np.nan, col.dtype)
        for i in range(nw):
            if w_ct[i] == 0:
                continue
            if w_sp[i, 0] or (w_sp[i, 1] and w_sp[i, 2]):
                continue
            elif w_sp[i, 1]:
                means[i] = np.inf
            elif w_sp[i, 2]:
                means[i] = -np.inf
            elif w_tot[i] == 0:
                means[i] = 0.0
            else:
                means[i] = col.dtype.type(float(Fraction(
                    w_tot[i], int(w_ct[i]) << scale)))
        res["mean"] = means

    if "max" in aggs or "min" in aggs:
        maxs = np.full(nw, np.nan, col.dtype)
        mins = np.full(nw, np.nan, col.dtype)
        for i in range(nw):
            if w_ct[i] == 0:
                continue
            live = [j for j in range(i, min(i + k, ncells)) if ct[j]]
            maxs[i] = _key_float(max(int(kmx[j]) for j in live),
                                 col.dtype)
            mins[i] = _key_float(min(int(kmn[j]) for j in live),
                                 col.dtype)
        if "max" in aggs:
            res["max"] = maxs
        if "min" in aggs:
            res["min"] = mins
    return {a: res[a] for a in aggs if a in res}


def groupby_keys(kcol) -> tuple:
    """Factorize a compressed column into dense GROUP-BY keys:
    ``(keys, uniques)`` with ``uniques[keys[i]] == decompress(kcol)[i]``
    (NaNs collapse to one group).  The helper for grouping one
    compressed column BY another."""
    from . import container
    vals = container.decompress(kcol)
    uniques, keys = np.unique(vals, return_inverse=True)
    return keys.astype(np.int64), uniques


def make_groupby_step(col, keys, num_groups: int, plan=None):
    """Throughput step for the GROUP-BY pipeline: fused per-bucket
    decode + one-hot MXU digit reduction (:func:`_mxu_digit_cols`) in
    ONE jittable program (loop_bench convention — carry XORed into the
    metadata, checksum out).  Models the steady-state grouped-aggregate
    scan; :func:`query_groupby` is the exact-answer API (it adds the
    host bignum assembly and out-of-envelope corrections per query)."""
    plan = plan or col.plan()
    keys = np.asarray(keys, np.int32)
    kplanes = _groupby_key_planes(col, plan, keys, num_groups)
    groups = plan.groups
    arg_tuples = [kdecode.group_arrays(g) for g in groups]
    counts = [len(a) for a in arg_tuples]
    f64 = plan.dtype == np.float64
    if num_groups > _GB_MXU_MAX_GROUPS:
        raise ValueError("groupby step supports <= "
                         f"{_GB_MXU_MAX_GROUPS} groups")
    n_onehot = num_groups * (4 if f64 else 3) + 1

    def step(carry, *args):
        n_meta = sum(counts)
        metas, kps = args[:n_meta], args[n_meta:]
        acc = carry
        ctot = None
        i = 0
        for g, n, kp in zip(groups, counts, kps):
            a = list(metas[i:i + n])
            i += n
            a[1] = a[1] ^ carry
            out = kdecode.group_decode(g, plan.dtype)(*a)
            if f64:
                hi, lo = out
                bits = (hi.astype(jnp.uint64) << jnp.uint64(32)
                        ) | lo.astype(jnp.uint64)
                acc = acc ^ hi[0, 0, 0]
            else:
                bits = out
                acc = acc ^ out[0, 0, 0]
            c, _ = _mxu_scan(bits.reshape(-1), kp.reshape(-1),
                             num_groups, f64)
            ctot = c if ctot is None else ctot + c
        return acc ^ ctot.sum().astype(jnp.uint32)

    metas = [a for args in arg_tuples for a in args]
    return step, tuple(metas) + tuple(kplanes)


# ---------------------------------------------------------------------------
# QUANTILE / MEDIAN: exact rank selection over the fused scan (engine
# breadth beyond the reference's q1 aggregate set)
# ---------------------------------------------------------------------------


def _rank_corr_arrays(col, plan):
    """Device-resident exact-count correction arrays for the
    single-dispatch rank bisection, built once per plan and cached:

    - (ckh, ckl, cw): biased-i32 total-order key words + i32 weights of
      every correction term — each exception contributes its TRUE
      stored key at +1 and its kernel-decoded slot key at -1 (the fused
      counts see the patched fill), and the partial last vector's pad
      slots contribute the pad value's key at -(pad count).  This is
      the uploaded mirror of :func:`_pred_corrections`.
    - (tkh, tkl): biased-i32 key words of the TRUE exception keys only,
      for the bracket min/max snap (kernel extremes miss values stored
      as exceptions).
    """
    cached = getattr(plan, "_rank_corr", None)
    if cached is not None:
        return cached
    f32 = plan.dtype == np.float32
    keys_c, w_c, keys_t = [], [], []
    for g in plan.groups:
        if g.exc_g is None or not g.exc_g.shape[0]:
            continue
        tb, db = _group_exception_bits(col, g)
        tk = _np_work_keys(tb, True)
        dk = _np_work_keys(db, True)
        keys_c.append(tk)
        w_c.append(np.ones(len(tk), np.int32))
        keys_c.append(dk)
        w_c.append(np.full(len(dk), -1, np.int32))
        keys_t.append(tk)
    # padded tail of the partial last vector (same fused-pad semantics
    # as _partial_vector_correction: every bucket kind counts pads here)
    n_valid = col.n_values - (col.n_vectors - 1) * C.VECTOR_SIZE
    if n_valid != C.VECTOR_SIZE:
        v_last = col.n_vectors - 1
        pos = np.int64(n_valid - 1)
        exc_pos = col.exc_positions[v_last]
        hit = np.nonzero(exc_pos == pos)[0]
        wt = np.uint64 if not f32 else np.uint32
        gl = next(g for g in plan.groups if v_last in g.vec_indices)
        if gl.scheme == C.SCHEME_ALP_RD:
            left = (int(col.exc_values[v_last][hit[0]]) if hit.size
                    else None)
            bits = wt(_rd_bits_at(col, int(v_last), int(pos), left))
        elif hit.size:
            bits = np.asarray(col.exc_values[v_last][hit[0]],
                              col.dtype).view(wt)
        else:
            bits = _decode_positions(col, np.array([v_last]),
                                     np.array([pos]))[0]
        keys_c.append(_np_work_keys(np.array([bits], wt), True))
        w_c.append(np.array([-(C.VECTOR_SIZE - n_valid)], np.int32))

    def biased_words(keys):
        if f32:
            kh = (keys.astype(np.uint32) ^ np.uint32(1 << 31)).view(
                np.int32)
            return kh, np.zeros_like(kh)
        kh = ((keys >> np.uint64(32)).astype(np.uint32)
              ^ np.uint32(1 << 31)).view(np.int32)
        kl = ((keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
              ^ np.uint32(1 << 31)).view(np.int32)
        return kh, kl

    kt = np.uint32 if f32 else np.uint64
    kc = (np.concatenate(keys_c) if keys_c else np.zeros(0, kt))
    wc = (np.concatenate(w_c) if w_c else np.zeros(0, np.int32))
    tc = (np.concatenate(keys_t) if keys_t else np.zeros(0, kt))
    if not len(kc):                       # keep shapes non-empty
        kc, wc = np.zeros(1, kt), np.zeros(1, np.int32)
    if not len(tc):
        tc = None                         # sentinel: no true-key snaps
    ckh, ckl = biased_words(kc)
    arrs = (jnp.asarray(ckh), jnp.asarray(ckl), jnp.asarray(wc))
    if tc is None:
        tkh = jnp.full((1,), np.int32(2 ** 31 - 1), jnp.int32)
        tkl = tkh
        arrs += (tkh, tkl, False)
    else:
        tkh, tkl = biased_words(tc)
        arrs += (jnp.asarray(tkh), jnp.asarray(tkl), True)
    plan._rank_corr = arrs
    return arrs


def _bucket_rankpass(g, args, thr_hi, thr_lo, br, *, n_thr: int,
                     n_rank: int, f32: bool):
    """Counts + bracketed extremes of one bucket (rank-pass dispatch;
    const buckets compare their per-vector key in XLA)."""
    from .kernels import falp as kfalp
    if f32:
        if g.scheme == C.SCHEME_ALP_RD:
            return kfalp.rd_decode_dict_f32_rankpass(
                args[0], args[1], args[2:], thr_hi, br, rbw=g.bw,
                lbw=g.meta[1], n_thr=n_thr, n_rank=n_rank)
        return kfalp.falp_decode_f32_rankpass(
            args[0], args[1], args[2], args[3], thr_hi, br, bw=g.bw,
            n_thr=n_thr, n_rank=n_rank)
    if g.scheme == C.SCHEME_ALP_RD:
        return kfalp.rd_decode_dict_f64_rankpass(
            args[0], args[1], args[2:], thr_hi, thr_lo, br, rbw=g.bw,
            lbw=g.meta[1], n_thr=n_thr, n_rank=n_rank)
    if g.variant == "const":
        kh, kl = _key_words_from_limbs(args[0], args[1])
        ah, al = _biased_i32(kh), _biased_i32(kl)
        th, tl = _biased_i32(thr_hi), _biased_i32(thr_lo)
        rows = []
        zero = jnp.zeros_like(ah)
        for e in range(thr_hi.shape[0]):
            if e < n_thr:
                le = (ah < th[e, 0]) | ((ah == th[e, 0])
                                        & (al <= tl[e, 0]))
                rows.append(le.astype(jnp.int32) * jnp.int32(64))
            else:
                rows.append(zero)
        pc = jnp.stack(rows, axis=1)
        brb = _biased_i32(br)
        imin = jnp.int32(_I32_MIN)
        imax = jnp.int32(2 ** 31 - 1)
        mrows = []
        for r in range(br.shape[0] // 4):
            if r < n_rank:
                lh, ll = brb[4 * r, 0], brb[4 * r + 1, 0]
                hh, hl = brb[4 * r + 2, 0], brb[4 * r + 3, 0]
                ge = (ah > lh) | ((ah == lh) & (al >= ll))
                le = (ah < hh) | ((ah == hh) & (al <= hl))
                inb = ge & le
                mrows.append(jnp.where(inb, ah, imax))
                mrows.append(jnp.where(inb, al, imax))
                mrows.append(jnp.where(inb, ah, imin))
                mrows.append(jnp.where(inb, al, imin))
            else:
                mrows += [zero] * 4
        return pc, jnp.stack(mrows, axis=1)
    return kfalp.falp_decode_f64_variant_rankpass(
        args[0], tuple(args[1:]), thr_hi, thr_lo, br, variant=g.variant,
        bw=g.bw, flags=g.flags, n_thr=n_thr, n_rank=n_rank)


_RANK_MAX_IT = 36          # the key-space uniform probes alone shrink
                           # >= 4x/pass: 4^36 >> 2^64; value-space
                           # probes, snap and interpolation only help


def _rank_bisect_program(plan, R: int, has_true: bool):
    """Build (and cache on the plan) the ONE-dispatch rank-selection
    program: a ``lax.while_loop`` whose body runs one fused
    multi-threshold count + bracketed-extreme scan over every bucket,
    applies the uploaded exception/pad corrections EXACTLY, narrows
    each rank's bracket with the probe counts, and SNAPS it to the
    lexicographic [min, max] key actually present inside (combining
    kernel extremes with the true exception keys) — on decimal-
    quantized data the snap collapses brackets to the value lattice in
    a handful of passes.  Returns a jitted
    ``fn(ranks, ckh, ckl, cw, tkh, tkl, *metas) ->
    (lo, hi, n_negnan, le_pinf, iters)``.
    """
    cache = _plan_prog_cache(plan)
    ckey = ("rankbisect", R, has_true)
    if ckey in cache:
        return cache[ckey]
    f32, per, L, _ = _plan_geometry(plan)
    groups = plan.groups
    arg_counts = [len(kdecode.group_arrays(g)) for g in groups]
    lane_oks = _lane_oks(plan, per, L)
    B = max(4, 20 // R)                  # probes per rank per pass
    n_thr = R * B + 2                    # + (negnan, le_pinf) specials
    E_pad = -(-n_thr // 8) * 8
    rows_pr = 2 if f32 else 4
    M_pad = -(-(R * rows_pr) // 8) * 8
    width = 32 if f32 else 64
    kt = jnp.uint32 if f32 else jnp.uint64
    npkt = np.uint32 if f32 else np.uint64
    TOP = npkt((1 << width) - 1)
    dt = np.float32 if f32 else np.float64
    k_ninf = npkt(_float_key(float("-inf"), np.dtype(dt)) - 1)
    k_pinf = npkt(_float_key(float("inf"), np.dtype(dt)))
    imin = jnp.int32(_I32_MIN)
    imax = jnp.int32(2 ** 31 - 1)

    def lex_min(h, l):
        mh = jnp.min(h)
        return mh, jnp.min(jnp.where(h == mh, l, imax))

    def lex_max(h, l):
        mh = jnp.max(h)
        return mh, jnp.max(jnp.where(h == mh, l, imin))

    def words(u):
        # biased-i32 (hi, lo) words of u64/u32 working keys
        if f32:
            return _biased_i32(u), jnp.zeros(u.shape, jnp.int32)
        return (_biased_i32((u >> jnp.uint64(32)).astype(jnp.uint32)),
                _biased_i32((u & jnp.uint64(0xFFFFFFFF)).astype(
                    jnp.uint32)))

    def unwords(bh, bl):
        uh = jax.lax.bitcast_convert_type(bh, jnp.uint32) ^ jnp.uint32(
            1 << 31)
        if f32:
            return uh
        ul = jax.lax.bitcast_convert_type(bl, jnp.uint32) ^ jnp.uint32(
            1 << 31)
        return (uh.astype(jnp.uint64) << jnp.uint64(32)) | ul.astype(
            jnp.uint64)

    B_u = B - B // 3                     # uniform probes...
    B_k = max(2, B_u // 2)               # ...in key space (closure)
    B_v = B_u - B_k                      # ...in value space (floats
    #                                      are log-spaced in key space;
    #                                      value-linear probes match
    #                                      real CDFs across exponents)
    B_g = B - B_u                        # CDF-interpolated cluster
    SBK = (np.uint32(1 << 31) if f32 else np.uint64(1 << 63))
    ft = jnp.float32                     # probe arithmetic (see key2f)

    def prog(ranks, nvals, lo0, hi0, ckh, ckl, cw, tkh, tkl, *metas):
        # key <-> approximate value, all-native ops: the TPU X64
        # rewriter has no f64<->u64 bitcast, so f64 keys go through an
        # f32 approximation (probe positions only steer convergence;
        # exactness never depends on them).  f32 keys bitcast natively.
        if f32:
            def key2f(k):
                bits = jnp.where(k >= SBK, k ^ SBK, ~k)
                return jax.lax.bitcast_convert_type(bits, jnp.float32)

            def f2key(v):
                bits = jax.lax.bitcast_convert_type(v, jnp.uint32)
                return jnp.where(bits >= SBK, ~bits, bits | SBK)
        else:
            def key2f(k):
                bits = jnp.where(k >= SBK, k ^ SBK, ~k)
                h = (bits >> jnp.uint64(32)).astype(jnp.uint32)
                s = h >> jnp.uint32(31)
                e11 = ((h >> jnp.uint32(20)) & jnp.uint32(0x7FF)).astype(
                    jnp.int32)
                m20 = h & jnp.uint32(0xFFFFF)
                e8 = jnp.clip(e11 - 1023 + 127, 1, 254).astype(jnp.uint32)
                fb = ((s << jnp.uint32(31)) | (e8 << jnp.uint32(23))
                      | (m20 << jnp.uint32(3)))
                return jax.lax.bitcast_convert_type(fb, jnp.float32)

            def f2key(v):
                fb = jax.lax.bitcast_convert_type(v, jnp.uint32)
                s = fb >> jnp.uint32(31)
                e8 = ((fb >> jnp.uint32(23)) & jnp.uint32(0xFF)).astype(
                    jnp.int32)
                m23 = fb & jnp.uint32(0x7FFFFF)
                e11 = jnp.clip(e8 - 127 + 1023, 0, 2046).astype(
                    jnp.uint32)
                h = ((s << jnp.uint32(31)) | (e11 << jnp.uint32(20))
                     | (m23 >> jnp.uint32(3)))
                bits = h.astype(jnp.uint64) << jnp.uint64(32)
                neg = bits >= SBK
                return jnp.where(neg, ~bits, bits | SBK)
        def body(state):
            it, lo, hi, c_lo, c_hi, _, _ = state
            W = hi - lo
            # uniform half, STAGGERED across ranks: adjacent quantile
            # ranks carry near-identical brackets, so un-staggered
            # per-rank probes collapse into duplicates and the shared
            # fanout drops from R*B_u to ~B_u (measured: 5x shrink per
            # pass instead of 21x).  Rank j probes at
            # t = lo + floor(W * (k*R + j) / (B_u*R)): identical
            # brackets yield R*B_u DISTINCT probes, and rank 0 still
            # probes lo itself (duplicate-heavy closure; every key in
            # [lo, hi) is probed once W <= B_u*R)
            D = B_k * R
            m = (jnp.arange(B_k, dtype=kt)[None, :] * kt(R)
                 + jnp.arange(R, dtype=kt)[:, None])      # [R, B_k]
            q = W // kt(D)
            rem = W % kt(D)
            t_u = lo[:, None] + m * q[:, None] + (m * rem[:, None]) // kt(D)
            # value-space uniform probes (same stagger), clamped into
            # [lo, hi); ±inf/NaN endpoints produce SOME key — probe
            # positions never affect exactness, only convergence speed
            Dv = B_v * R + 1
            mv = (jnp.arange(B_v, dtype=jnp.int32)[None, :] * R
                  + jnp.arange(R, dtype=jnp.int32)[:, None] + 1)
            vlo = key2f(lo)[:, None]
            vhi = key2f(hi)[:, None]
            vv = vlo + (vhi - vlo) * (mv.astype(ft) / ft(Dv))
            t_v = jnp.clip(f2key(vv), lo[:, None],
                           lo[:, None] + jnp.maximum(W, kt(1))[:, None]
                           - kt(1))
            # interpolated half: geometric cluster around the CDF
            # estimate t* = lo + W * (r - c_lo) / (c_hi - c_lo) — on
            # smooth count profiles this is interpolation search
            # (probe placement only; exactness never depends on it)
            den = jnp.maximum(c_hi - c_lo, jnp.int64(1))
            num = jnp.clip(ranks - c_lo, 0, den)
            frac = num.astype(jnp.float32) / den.astype(jnp.float32)
            toff = jnp.minimum((W.astype(jnp.float32) * frac).astype(kt),
                               jnp.maximum(W, kt(1)) - kt(1))
            tstar = lo + toff
            # ladder scales stagger by rank too (W/8, W/64, ... for rank
            # 0; W/16, W/128, ... for rank 1), halving duplicate probes
            # when brackets coincide
            jr = jnp.arange(R, dtype=kt)
            gs = [tstar]
            j = 1
            while len(gs) < B_g:
                d = W >> (kt(3 * j) + jr)
                gs.append(jnp.minimum(tstar + d,
                                      lo + jnp.maximum(W, kt(1))
                                      - kt(1)))
                if len(gs) < B_g:
                    gs.append(jnp.where(tstar - lo >= d, tstar - d, lo))
                j += 1
            t = jnp.concatenate([t_u, t_v,
                                 jnp.stack(gs[:B_g], axis=1)],
                                axis=1)                       # [R, B]
            thrs = jnp.concatenate(
                [t.reshape(-1),
                 jnp.array([k_ninf, k_pinf], npkt),
                 jnp.full((E_pad - n_thr,), k_pinf, kt)])
            if f32:
                thr_hi = jnp.broadcast_to(thrs[:, None], (E_pad, 128))
                thr_lo = thr_hi
            else:
                thr_hi = jnp.broadcast_to(
                    (thrs >> jnp.uint64(32)).astype(jnp.uint32)[:, None],
                    (E_pad, 128))
                thr_lo = jnp.broadcast_to(
                    (thrs & jnp.uint64(0xFFFFFFFF)).astype(
                        jnp.uint32)[:, None], (E_pad, 128))
            # bracket planes (u32 working words, rows_pr rows per rank)
            if f32:
                brv = jnp.stack([lo, hi], axis=1).reshape(-1)
            else:
                brv = jnp.stack(
                    [(lo >> jnp.uint64(32)).astype(jnp.uint64),
                     lo & jnp.uint64(0xFFFFFFFF),
                     (hi >> jnp.uint64(32)).astype(jnp.uint64),
                     hi & jnp.uint64(0xFFFFFFFF)],
                    axis=1).reshape(-1)
            brv = jnp.concatenate(
                [brv, jnp.zeros(M_pad - R * rows_pr, brv.dtype)]).astype(
                    jnp.uint32)
            br = jnp.broadcast_to(brv[:, None], (M_pad, 128))

            tot = jnp.zeros((n_thr,), jnp.int64)
            mn_h = [[] for _ in range(R)]
            mn_l = [[] for _ in range(R)]
            mx_h = [[] for _ in range(R)]
            mx_l = [[] for _ in range(R)]
            i = 0
            for g, n, lane_ok in zip(groups, arg_counts, lane_oks):
                args = list(metas[i:i + n])
                i += n
                pc, mm = _bucket_rankpass(g, args, thr_hi, thr_lo, br,
                                          n_thr=n_thr, n_rank=R,
                                          f32=f32)
                ok = jnp.asarray(lane_ok)
                pc = pc.at[-1].set(jnp.where(ok[None, :], pc[-1],
                                             jnp.int32(0)))
                tot = tot + pc[:, :n_thr, :].astype(jnp.int64).sum(
                    axis=(0, 2))
                for r in range(R):
                    if f32:
                        a = mm[:, 2 * r, :]
                        b = mm[:, 2 * r + 1, :]
                        a = a.at[-1].set(jnp.where(ok, a[-1], imax))
                        b = b.at[-1].set(jnp.where(ok, b[-1], imin))
                        h1, l1 = jnp.min(a), jnp.zeros((), jnp.int32)
                        h2, l2 = jnp.max(b), jnp.zeros((), jnp.int32)
                    else:
                        a = mm[:, 4 * r, :]
                        b = mm[:, 4 * r + 1, :]
                        c = mm[:, 4 * r + 2, :]
                        d = mm[:, 4 * r + 3, :]
                        a = a.at[-1].set(jnp.where(ok, a[-1], imax))
                        b = b.at[-1].set(jnp.where(ok, b[-1], imax))
                        c = c.at[-1].set(jnp.where(ok, c[-1], imin))
                        d = d.at[-1].set(jnp.where(ok, d[-1], imin))
                        h1, l1 = lex_min(a, b)
                        h2, l2 = lex_max(c, d)
                    mn_h[r].append(h1)
                    mn_l[r].append(l1)
                    mx_h[r].append(h2)
                    mx_l[r].append(l2)
            # exact count corrections (exceptions + pad tail)
            th_b, tl_b = words(thrs[:n_thr])
            le = ((ckh[:, None] < th_b[None, :])
                  | ((ckh[:, None] == th_b[None, :])
                     & (ckl[:, None] <= tl_b[None, :])))
            tot = tot + (le * cw[:, None]).astype(jnp.int64).sum(axis=0)
            # per-rank extreme combine (+ true exception keys in bracket)
            lo_bh, lo_bl = words(lo)
            hi_bh, hi_bl = words(hi)
            key_mn, key_mx = [], []
            for r in range(R):
                hset = jnp.stack(mn_h[r])
                lset = jnp.stack(mn_l[r])
                Hset = jnp.stack(mx_h[r])
                Lset = jnp.stack(mx_l[r])
                if has_true:
                    ge = ((tkh > lo_bh[r]) | ((tkh == lo_bh[r])
                                              & (tkl >= lo_bl[r])))
                    le_ = ((tkh < hi_bh[r]) | ((tkh == hi_bh[r])
                                               & (tkl <= hi_bl[r])))
                    inb = ge & le_
                    eh, el = lex_min(jnp.where(inb, tkh, imax),
                                     jnp.where(inb, tkl, imax))
                    Eh, El = lex_max(jnp.where(inb, tkh, imin),
                                     jnp.where(inb, tkl, imin))
                    hset = jnp.concatenate([hset, eh[None]])
                    lset = jnp.concatenate([lset, el[None]])
                    Hset = jnp.concatenate([Hset, Eh[None]])
                    Lset = jnp.concatenate([Lset, El[None]])
                h1, l1 = lex_min(hset, lset)
                h2, l2 = lex_max(Hset, Lset)
                key_mn.append(unwords(h1, l1))
                key_mx.append(unwords(h2, l2))
            key_mn = jnp.stack(key_mn)
            key_mx = jnp.stack(key_mx)
            # probe update (EVERY probe narrows EVERY rank — adjacent
            # quantile ranks share nearly-identical brackets) + snap;
            # (c_lo, c_hi) track the exact counts at (lo - 1, hi) for
            # the next pass's interpolation (count monotonicity keeps
            # them consistent under cross-rank and snap updates)
            cnt_all = tot[:R * B]
            t_all = t.reshape(-1)
            ge = cnt_all[None, :] >= ranks[:, None]       # [R, R*B]
            hi_c = jnp.min(jnp.where(ge, t_all[None, :], TOP), axis=1)
            lo_c = jnp.max(jnp.where(ge, kt(0),
                                     t_all[None, :] + kt(1)), axis=1)
            big = jnp.int64(1 << 62)
            c_hi_n = jnp.minimum(c_hi, jnp.min(
                jnp.where(ge, cnt_all[None, :], big), axis=1))
            c_lo_n = jnp.maximum(c_lo, jnp.max(
                jnp.where(ge, jnp.int64(-1), cnt_all[None, :]), axis=1))
            hi_n = jnp.minimum(jnp.minimum(hi, hi_c), key_mx)
            lo_n = jnp.maximum(jnp.maximum(lo, lo_c), key_mn)
            return (it + 1, lo_n, hi_n, c_lo_n, c_hi_n,
                    tot[n_thr - 2], tot[n_thr - 1])

        def cond(state):
            it, lo, hi = state[0], state[1], state[2]
            # it == 0: always run one pass — the NaN counts ride the
            # scan even when the extent init already closed the bracket
            return (it < _RANK_MAX_IT) & ((it == 0) | jnp.any(lo < hi))

        state0 = (jnp.int32(0), jnp.broadcast_to(lo0, (R,)),
                  jnp.broadcast_to(hi0, (R,)),
                  jnp.zeros((R,), jnp.int64),
                  jnp.full((R,), 1, jnp.int64) * nvals, jnp.int64(0),
                  jnp.int64(0))
        it, lo, hi, _, _, negnan, le_pinf = jax.lax.while_loop(
            cond, body, state0)
        return lo, hi, negnan, le_pinf, it

    fn = jax.jit(prog)
    cache[ckey] = fn
    return fn


def _key_extent_fused(col, plan):
    """[min, max] total-order key envelope of the column via the fused
    per-lane-column keymax kernels in both orders — no decoded planes
    ever hit HBM.  Kernel extremes cover every NON-exception value
    (exception slots decode fills — themselves values — or RD garbage,
    either of which can only move the kernel envelope INWARD or
    outward harmlessly); the true exception keys widen it exactly."""
    f32, per, L, _ = _plan_geometry(plan)
    lane_oks = _lane_oks(plan, per, L)
    kt = np.uint32 if f32 else np.uint64
    imin = jnp.int32(_I32_MIN)
    width = 32 if f32 else 64
    mask_all = (1 << width) - 1

    def bucket_max(g, args, inv):
        from .kernels import falp as kfalp
        if f32:
            if g.scheme == C.SCHEME_ALP_RD:
                mh = kfalp.rd_decode_dict_f32_keymax(
                    args[0], args[1], args[2:], rbw=g.bw,
                    lbw=g.meta[1], invert=inv)
            else:
                mh = kfalp.falp_decode_f32_keymax(
                    args[0], args[1], args[2], args[3], bw=g.bw,
                    invert=inv)
            return mh, jnp.zeros_like(mh)
        if g.scheme == C.SCHEME_ALP_RD:
            return kfalp.rd_decode_dict_f64_keymax(
                args[0], args[1], args[2:], rbw=g.bw, lbw=g.meta[1],
                invert=inv)
        if g.variant == "const":
            kh, kl = _key_words_from_limbs(args[0], args[1])
            if inv:
                kh, kl = ~kh, ~kl
            return _biased_i32(kh), _biased_i32(kl)
        return kfalp.falp_decode_f64_variant_keymax(
            args[0], tuple(args[1:]), variant=g.variant, bw=g.bw,
            flags=g.flags, invert=inv)

    def work_max(inv):
        best = None
        for g, lane_ok in zip(plan.groups, lane_oks):
            args = kdecode.group_arrays(g)
            mh, ml = bucket_max(g, args, inv)
            ok = jnp.asarray(lane_ok)
            mh = mh.at[-1].set(jnp.where(ok, mh[-1], imin))
            ml = ml.at[-1].set(jnp.where(ok, ml[-1], imin))
            h = jnp.max(mh)
            lv = jnp.max(jnp.where(mh == h, ml, imin))
            h, lv = int(h), int(lv)
            if best is None or (h, lv) > best:
                best = (h, lv)
        sb = 1 << 31
        uh = (best[0] & 0xFFFFFFFF) ^ sb       # i32 -> u32 un-bias
        ul = (best[1] & 0xFFFFFFFF) ^ sb
        k = uh if f32 else ((uh << 32) | ul)
        if inv:
            k = (~k) & mask_all
        return k

    try:
        kmax = work_max(False)
        kmin = work_max(True)
    except Exception:
        return None
    # widen with the true exception keys (host, cached bits)
    for g in plan.groups:
        if g.exc_g is None or not g.exc_g.shape[0]:
            continue
        tk = _np_work_keys(_group_exception_bits(col, g)[0], True)
        if len(tk):
            kmin = min(kmin, int(tk.min()))
            kmax = max(kmax, int(tk.max()))
    return kt(kmin), kt(kmax)


def _select_rank_keys_device(col, plan, ranks) -> dict:
    """Single-dispatch exact rank selection: the whole bisection runs
    on device (:func:`_rank_bisect_program`); also returns the column's
    (negative-NaN, positive-NaN) counts from the same dispatch.  At
    most 4 ranks per dispatch; more chunk into several.  Returns
    ``(keys dict, n_negnan, n_posnan)``."""
    ckh, ckl, cw, tkh, tkl, has_true = _rank_corr_arrays(col, plan)
    metas = [a for g in plan.groups for a in kdecode.group_arrays(g)]
    kt = np.uint32 if col.dtype == np.float32 else np.uint64
    top = kt(~kt(0))
    # global key extent, computed once per plan: fused keymax scans in
    # both orders (no decoded-plane materialization — query_min/max
    # would transiently hold ~2x the column in HBM), widened by the
    # true exception keys (kernel extremes see fills/garbage, which can
    # only SHRINK the kernel envelope).  Starting the bisection
    # pre-zoomed saves one full pass per query; the extent only needs
    # to CONTAIN every true key, never to be tight.
    ext = getattr(plan, "_key_extent", None)
    if ext is None:
        ext = _key_extent_fused(col, plan)
        if ext is None or ext[0] > ext[1]:
            ext = (kt(0), top)
        plan._key_extent = ext
    out = {}
    negnan = posnan = 0
    for s in range(0, len(ranks), 4):
        chunk = list(ranks[s:s + 4])
        R = len(chunk)
        prog = _rank_bisect_program(plan, R, has_true)
        outs = prog(
            jnp.asarray(np.array(chunk, np.int64)),
            jnp.int64(col.n_values), ext[0], ext[1],
            ckh, ckl, cw, tkh, tkl, *metas)
        lo, hi, nn, lep, it = jax.device_get(outs)   # ONE fetch
        if not (lo == hi).all():          # cannot happen (probe t_0=lo
            return None                   # guarantees progress); guard
        negnan = int(nn)
        posnan = col.n_values - int(lep)
        for r, k in zip(chunk, lo.tolist()):
            out[r] = int(k)
    return out, negnan, posnan


def _select_rank_keys(col, plan, ranks) -> dict:
    """Exact total-order keys at the given 1-based ascending ranks, by
    multi-way bisection over the key space with the SAME cached
    128-threshold fused count program the histogram uses — no decoded
    planes, no candidate extraction, ~``ceil(width / log2(127))``
    one-program passes (10 for f64, 5 for f32).

    Invariant per rank r: ``count(key <= lo - 1) < r <= count(key <=
    hi)``; each pass spreads up to 126 probe thresholds across the
    active brackets and every fused count is corrected exactly for
    exception slots and the padded tail (:func:`_pred_corrections`),
    so the returned key is the EXACT r-th smallest IEEE-754 total-order
    key in the column."""
    f32 = col.dtype == np.float32
    kt = np.uint32 if f32 else np.uint64
    width = 32 if f32 else 64
    top = (1 << width) - 1
    prog = _histogram_program(plan, 128)
    metas = [a for g in plan.groups for a in kdecode.group_arrays(g)]

    def counts_for(thrs):
        m = len(thrs)
        pad = np.full(128, thrs[0], kt)
        pad[:m] = thrs
        thr_hi, thr_lo = _histogram_thresholds(pad, f32)
        p = np.asarray(prog(jnp.uint32(0), thr_hi, thr_lo,
                            *metas)).astype(np.int64)
        for i in range(m):
            p[i] += _pred_corrections(col, plan, kt(0), kt(int(thrs[i])))
        return p[:m]

    bracket = {r: (0, top) for r in ranks}
    for _ in range(width):          # converges in ~width/7 passes
        active = sorted({b for b in bracket.values() if b[0] < b[1]})
        if not active:
            break
        budget = max(1, 126 // len(active))
        thrs, spans = [], []
        for lo, hi in active:
            s = len(thrs)
            probes = np.unique(
                lo + np.arange(1, budget + 1, dtype=object)
                * (hi - lo) // (budget + 1))
            probes = [int(t) for t in probes if lo <= t < hi]
            if not probes:
                probes = [lo]
            thrs.extend(probes)
            spans.append(((lo, hi), slice(s, len(thrs))))
        cnt = counts_for(np.array(thrs, kt))
        for r, (lo, hi) in list(bracket.items()):
            if lo >= hi:
                continue
            for (blo, bhi), sl in spans:
                if (blo, bhi) == (lo, hi):
                    ts = thrs[sl]
                    cs = cnt[sl]
                    for t, c in zip(ts, cs):
                        if c >= r:
                            hi = min(hi, t)
                        else:
                            lo = max(lo, t + 1)
                    bracket[r] = (lo, hi)
                    break
    assert all(lo == hi for lo, hi in bracket.values())
    return {r: b[0] for r, b in bracket.items()}


def _special_rank_counts(col, plan):
    """(negative-NaN count, positive-NaN count): one fused 2-threshold
    pass at the total-order boundaries key(-inf) - 1 and key(+inf)."""
    f32 = col.dtype == np.float32
    kt = np.uint32 if f32 else np.uint64
    prog = _histogram_program(plan, 128)
    metas = [a for g in plan.groups for a in kdecode.group_arrays(g)]
    k_ninf = _float_key(float("-inf"), col.dtype) - 1
    k_pinf = _float_key(float("inf"), col.dtype)
    thrs = np.full(128, kt(k_pinf))
    thrs[0] = kt(k_ninf)
    thr_hi, thr_lo = _histogram_thresholds(thrs, f32)
    p = np.asarray(prog(jnp.uint32(0), thr_hi, thr_lo,
                        *metas)).astype(np.int64)
    n_negnan = int(p[0]) + _pred_corrections(col, plan, kt(0), kt(k_ninf))
    le_pinf = int(p[1]) + _pred_corrections(col, plan, kt(0), kt(k_pinf))
    return n_negnan, col.n_values - le_pinf


def query_quantile(col, q, interpolation: str = "linear"):
    """QUANTILE(column, q): exact rank selection on device — the
    ORDER-BY-offset / MEDIAN building block, numpy-compatible.

    ``q`` is a scalar or sequence in [0, 1]; returns a float (or array)
    matching ``np.quantile(values, q, method=interpolation)`` for the
    methods ``linear`` / ``lower`` / ``higher`` / ``midpoint`` /
    ``nearest``.  Any NaN in the column propagates (numpy semantics).

    The neighbor values at the straddling ranks are found EXACTLY via
    total-order-key bisection over fused count scans
    (:func:`_select_rank_keys`); only the final interpolation arithmetic
    is floating-point (performed exactly as numpy's ``_lerp``).
    """
    qs = np.atleast_1d(np.asarray(q, np.float64))
    if qs.size and (np.isnan(qs).any() or qs.min() < 0 or qs.max() > 1):
        raise ValueError("quantiles must be in [0, 1]")
    n = col.n_values
    scalar = np.isscalar(q) or getattr(q, "ndim", 1) == 0
    if n == 0:
        out = np.full(qs.shape, np.nan, col.dtype)
        return col.dtype.type(out[0]) if scalar else out
    plan = col.plan()
    hs = qs * (n - 1)
    ranks = set()
    for h in hs:
        i = int(np.floor(h))
        ranks.add(i + 1)
        # the upper neighbor is the CEIL-rank value: at integer h it is
        # the same element (numpy semantics), so only straddling
        # positions need a second rank
        if h != i and interpolation in (
                "linear", "higher", "midpoint", "nearest") and i + 1 < n:
            ranks.add(i + 2)
    # single-dispatch on-device bisection (NaN counts ride the same
    # dispatch); the multi-pass host bisection remains as the guard
    # fallback
    res = _select_rank_keys_device(col, plan, sorted(ranks))
    if res is not None:
        keys, n_negnan, n_posnan = res
        if n_negnan or n_posnan:
            out = np.full(qs.shape, np.nan, col.dtype)
            return col.dtype.type(out[0]) if scalar else out
    else:
        n_negnan, n_posnan = _special_rank_counts(col, plan)
        if n_negnan or n_posnan:
            out = np.full(qs.shape, np.nan, col.dtype)
            return col.dtype.type(out[0]) if scalar else out
        keys = _select_rank_keys(col, plan, sorted(ranks))
    vals = {r: _key_float(k, col.dtype) for r, k in keys.items()}
    dt = col.dtype.type
    out = np.empty(qs.shape, col.dtype)
    for ix, h in np.ndenumerate(hs):
        i = int(np.floor(h))
        t = h - i
        a = vals[i + 1]
        b = vals[i + 2] if (t > 0 and (i + 2) in vals) else a
        if interpolation == "lower":
            r = a
        elif interpolation == "higher":
            r = b if t > 0 else a
        elif interpolation == "midpoint":
            r = (dt(a) + dt(b)) / dt(2) if t > 0 else dt(a)
        elif interpolation == "nearest":
            # numpy: round half toward the EVEN-index neighbor
            if t < 0.5 or (t == 0.5 and i % 2 == 0):
                r = a
            else:
                r = b
        elif interpolation == "linear":
            if t == 0:
                r = a          # exact rank hit: no arithmetic (a == b)
            else:
                # numpy's _lerp, reproduced operation-for-operation
                diff = dt(b) - dt(a)
                r = dt(a) + diff * dt(t)
                if t >= 0.5:
                    r = dt(b) - diff * dt(1 - t)
        else:
            raise ValueError(f"unknown interpolation {interpolation!r}")
        out[ix] = r
    return dt(out[0]) if scalar else out


def query_median(col) -> float:
    """MEDIAN(column): exact rank selection; ``np.median`` analog."""
    return query_quantile(col, 0.5)


# ---------------------------------------------------------------------------
# Filtered aggregation: SELECT SUM(v) WHERE lo <= v <= hi (exact)
# ---------------------------------------------------------------------------


def _mxu_digit_cols_pred(bits, klo_hi, klo_lo, khi_hi, khi_lo,
                         f64: bool):
    """Value-predicate variant of :func:`_mxu_digit_cols`: the column
    id comes from the value's own total-order key lying in
    ``[klo, khi]`` (two biased-i32 word compares, hi-then-lo) instead
    of a positional key plane, so the one-hot is only
    ``n_windows + 1`` columns wide.  Out-of-range and trash rows fall
    into the last column; the oob mask flags out-of-envelope values
    whose predicate the HOST re-evaluates exactly."""
    X, colid0, oob = _mxu_digit_cols(
        bits, jnp.zeros(bits.shape[0], jnp.int32), 1, f64)
    n_w = 4 if f64 else 3
    if f64:
        vb = jnp.where(bits == jnp.uint64(1 << 63), jnp.uint64(0), bits)
        ks = (vb >> jnp.uint64(63)) != 0
        ku = jnp.where(ks, ~vb, vb | jnp.uint64(1 << 63))
        ah = _biased_i32((ku >> jnp.uint64(32)).astype(jnp.uint32))
        al = _biased_i32((ku & jnp.uint64(0xFFFFFFFF)).astype(
            jnp.uint32))
        ge = (ah > klo_hi) | ((ah == klo_hi) & (al >= klo_lo))
        le = (ah < khi_hi) | ((ah == khi_hi) & (al <= khi_lo))
    else:
        vb = jnp.where(bits == jnp.uint32(1 << 31), jnp.uint32(0), bits)
        ks = (vb >> jnp.uint32(31)) != 0
        ku = jnp.where(ks, ~vb, vb | jnp.uint32(1 << 31))
        ah = _biased_i32(ku)
        ge, le = ah >= klo_hi, ah <= khi_hi
    inr = ge & le
    # key-0 colid already routes oob rows to the trash column; the
    # predicate additionally trashes out-of-range rows
    colid = jnp.where(inr, colid0, jnp.int32(n_w))
    return X, colid, oob


def _mxu_scan_pred(bits, valid, kws, f64: bool):
    """Streamed digit-cols + one-hot matmul for the predicate SUM
    (lax.map slices, same bounds as :func:`_mxu_scan`).  ``valid``
    masks plan pad slots (group-pad vectors, the partial last vector's
    tail) into the trash column."""
    n = bits.shape[0]
    n_w = 4 if f64 else 3
    G = n_w + 1
    B = n // _GB_MXU_CHUNK
    bc = max(1, min(B, (64 * 1024 * 1024) // (_GB_MXU_CHUNK * 16 * 2)))
    S = -(-B // bc)
    m = bc * _GB_MXU_CHUNK
    pad = S * m - n
    if pad:
        bits = jnp.concatenate([bits, jnp.zeros(pad, bits.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])

    def body(args):
        b, v = args
        X, colid, oob = _mxu_digit_cols_pred(b, *kws, f64)
        colid = jnp.where(v, colid, jnp.int32(n_w))
        return _mxu_reduce(X, colid, G), oob & v

    parts, oob = jax.lax.map(
        body, (bits.reshape(S, m), valid.reshape(S, m)))
    return parts.sum(axis=0), oob.reshape(-1)[:n]


@functools.partial(jax.jit, static_argnames=("f64",))
def _filter_sum_mxu(bits, valid, klo_hi, klo_lo, khi_hi, khi_lo, *,
                    f64: bool):
    C, oob = _mxu_scan_pred(bits, valid,
                            (klo_hi, klo_lo, khi_hi, khi_lo), f64)
    return C, oob, oob.sum(dtype=jnp.int32)


def query_filter_sum(col, lo: float, hi: float) -> float:
    """SELECT SUM(v) WHERE lo <= v <= hi — EXACT (the correctly-rounded
    sum of the selected values, bit-identical to ``math.fsum`` over
    them), with the predicate evaluated on exact total-order keys
    inside the same one-hot MXU digit pass the GROUP-BY uses (the
    one-hot is just n_windows+1 columns, so the pass is nearly free on
    top of the decode).  Empty selection sums to 0.0; a selected
    +inf/-inf pair (or any NaN inside the range — only possible when a
    bound is NaN) follows IEEE rules like :func:`query_sum`.
    """
    if col.n_values == 0:
        return 0.0
    f64 = col.dtype == np.float64
    kt = np.uint64 if f64 else np.uint32
    klo = kt(_float_key(lo, col.dtype))
    khi = kt(_float_key(hi, col.dtype))
    if klo > khi:
        return 0.0
    sb = np.uint32(1 << 31)
    if f64:
        kws = tuple(jnp.int32(np.int32(w ^ sb)) for w in (
            np.uint32(klo >> np.uint64(32)),
            np.uint32(klo & np.uint64(0xFFFFFFFF)),
            np.uint32(khi >> np.uint64(32)),
            np.uint32(khi & np.uint64(0xFFFFFFFF))))
    else:
        kws = (jnp.int32(np.int32(np.uint32(klo) ^ sb)), jnp.int32(0),
               jnp.int32(np.int32(np.uint32(khi) ^ sb)), jnp.int32(0))
    plan = col.plan()
    outs = plan.run(patch=True)
    total = 0
    sp = np.zeros(3, np.int64)
    fixed = _f64_fixed if f64 else _f32_fixed
    n_w, base_w = (4, 30) if f64 else (3, 2)
    n_parts = 12 if f64 else 8
    Cs = None
    for bits, last in _masked_bits(col, plan, outs):
        b = bits.reshape(-1)
        nb = b.shape[0]
        # all groups but the last are fully valid; `last` masks the
        # final group's pad slots (they decode REAL bit patterns that
        # must not enter the predicate sum)
        valid = jnp.concatenate(
            [jnp.ones(nb - last.size, bool), last.reshape(-1)])
        nb_pad = -(-nb // _GB_MXU_CHUNK) * _GB_MXU_CHUNK
        if nb_pad != nb:
            b = jnp.concatenate([b, jnp.zeros(nb_pad - nb, b.dtype)])
            valid = jnp.concatenate(
                [valid, jnp.zeros(nb_pad - nb, bool)])
        C, oob, ocnt = _filter_sum_mxu(b, valid, *kws, f64=f64)
        Cn = np.asarray(C)
        Cs = Cn if Cs is None else Cs + Cn
        if int(ocnt):
            idx = jnp.asarray(np.flatnonzero(np.asarray(oob)))
            ob = np.asarray(jnp.take(b, idx))
            sel = _pred_key(ob.astype(kt), int(klo), int(khi))
            for bb in ob[sel].tolist():
                fx, cls = fixed(int(bb))
                if cls:
                    sp[cls - 1] += 1
                else:
                    total += fx
    pz, cz = np.nonzero(Cs[:n_parts, :n_w])
    for p, c in zip(pz.tolist(), cz.tolist()):
        total += int(Cs[p, c]) << (
            32 * (base_w + c) + 32 * (p // 4) + 8 * (p % 4))
    sp += Cs[n_parts:n_parts + 3, 0]
    return col.dtype.type(_finish_sum(
        total, int(sp[0]), int(sp[1]), int(sp[2]), 1075 if f64 else 150))
