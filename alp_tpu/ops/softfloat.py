"""Exact IEEE-754 binary64 arithmetic on uint32 limbs, in pure jnp.

TPUs have no native float64: XLA emulates f64 *approximately* (not
correctly rounded), which breaks ALP's bit-exact encode/verify contract
(reference include/alp/encoder.hpp:82-89 relies on exact double math).
TPU *integer* ops, however, are exact.  This module therefore implements
the handful of f64 operations ALP needs — multiply, add, int64<->double
conversion, truncating cast, comparisons — as correctly-rounded softfloat
on pairs of uint32 limbs.

Everything here is elementwise jnp on uint32/int32 arrays, so the same
functions trace inside plain jit *and* inside Pallas TPU kernels (which
support only 32-bit lanes).  A "64-bit value" is a :class:`U64` pair
``(hi, lo)``; doubles are their IEEE bit patterns, int64s their two's
complement.

Scope: full IEEE semantics for finite values including subnormals,
overflow to ±Inf, and NaN propagation (canonical quiet NaN, no payload
preservation — ALP only ever checks "is NaN").  Round-to-nearest-even
only (the mode ALP assumes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32
_I32 = jnp.int32


def _u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=_U32)


class U64(NamedTuple):
    """A 64-bit integer (or f64 bit pattern) as two uint32 limbs."""
    hi: jnp.ndarray
    lo: jnp.ndarray

    @staticmethod
    def const(value: int, like: jnp.ndarray | None = None) -> "U64":
        value &= (1 << 64) - 1
        hi = _u32(value >> 32)
        lo = _u32(value & 0xFFFFFFFF)
        if like is not None:
            hi = jnp.broadcast_to(hi, like.shape)
            lo = jnp.broadcast_to(lo, like.shape)
        return U64(hi, lo)


def u64_from_np(arr: np.ndarray) -> U64:
    """Host-side: split a numpy (u)int64/f64 array into uint32 limbs."""
    bits = np.ascontiguousarray(arr).view(np.uint64)
    return U64(_u32(bits >> np.uint64(32)), _u32(bits & np.uint64(0xFFFFFFFF)))


def u64_to_np(x: U64) -> np.ndarray:
    """Host-side: reassemble numpy uint64 from limbs."""
    return (np.asarray(x.hi, dtype=np.uint64) << np.uint64(32)) | np.asarray(
        x.lo, dtype=np.uint64)


# ---------------------------------------------------------------------------
# 64-bit integer primitives on u32 limbs
# ---------------------------------------------------------------------------

def add64(a: U64, b: U64) -> U64:
    lo = a.lo + b.lo
    carry = (lo < a.lo).astype(_U32)
    return U64(a.hi + b.hi + carry, lo)


def sub64(a: U64, b: U64) -> U64:
    lo = a.lo - b.lo
    borrow = (a.lo < b.lo).astype(_U32)
    return U64(a.hi - b.hi - borrow, lo)


def neg64(a: U64) -> U64:
    return add64(U64(~a.hi, ~a.lo), U64.const(1, a.hi))


def or64(a: U64, b: U64) -> U64:
    return U64(a.hi | b.hi, a.lo | b.lo)


def and64(a: U64, b: U64) -> U64:
    return U64(a.hi & b.hi, a.lo & b.lo)


def eq64(a: U64, b: U64) -> jnp.ndarray:
    return (a.hi == b.hi) & (a.lo == b.lo)


def is_zero64(a: U64) -> jnp.ndarray:
    return (a.hi | a.lo) == 0


def ltu64(a: U64, b: U64) -> jnp.ndarray:
    return (a.hi < b.hi) | ((a.hi == b.hi) & (a.lo < b.lo))


def _min_small(a: jnp.ndarray, b) -> jnp.ndarray:
    """min on small non-negative values via int32 (Mosaic has no minui)."""
    return jnp.minimum(a.astype(_I32), _I32(b)).astype(_U32)


def _max_small(a: jnp.ndarray, b) -> jnp.ndarray:
    return jnp.maximum(a.astype(_I32), _I32(b)).astype(_U32)


def _shl32(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """x << k with k in [0, 32]: well-defined 0 result at k == 32."""
    k = k.astype(_U32)
    safe = jnp.left_shift(x, _min_small(k, 31))
    # split k==32.. into two shifts to stay in defined range
    extra = jnp.left_shift(safe, _max_small(k, 31) - _u32(31))
    return jnp.where(k > 31, jnp.where(k > 63, _u32(0), extra), safe)


def _shr32(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """x >> k (logical) with k in [0, 32]: 0 at k == 32."""
    k = k.astype(_U32)
    safe = jnp.right_shift(x, _min_small(k, 31))
    extra = jnp.right_shift(safe, _max_small(k, 31) - _u32(31))
    return jnp.where(k > 31, jnp.where(k > 63, _u32(0), extra), safe)


def shl64(a: U64, k) -> U64:
    """a << k for k in [0, 64] (elementwise, k may be an array)."""
    k = _u32(k)
    kk = jnp.broadcast_to(k, jnp.broadcast_shapes(k.shape, a.hi.shape))
    lo_small = _shl32(a.lo, kk)
    hi_small = _shl32(a.hi, kk) | _shr32(a.lo, _u32(32) - kk)
    lo_big = _u32(0)
    hi_big = _shl32(a.lo, kk - _u32(32))
    big = kk >= 32
    return U64(jnp.where(big, hi_big, hi_small),
               jnp.where(big, lo_big, lo_small))


def shr64(a: U64, k) -> U64:
    """a >> k (logical) for k in [0, 64]."""
    k = _u32(k)
    kk = jnp.broadcast_to(k, jnp.broadcast_shapes(k.shape, a.hi.shape))
    hi_small = _shr32(a.hi, kk)
    lo_small = _shr32(a.lo, kk) | _shl32(a.hi, _u32(32) - kk)
    hi_big = _u32(0)
    lo_big = _shr32(a.hi, kk - _u32(32))
    big = kk >= 32
    return U64(jnp.where(big, hi_big, hi_small),
               jnp.where(big, lo_big, lo_small))


def _popcount32(x: jnp.ndarray) -> jnp.ndarray:
    x = x - ((x >> 1) & _u32(0x55555555))
    x = (x & _u32(0x33333333)) + ((x >> 2) & _u32(0x33333333))
    x = (x + (x >> 4)) & _u32(0x0F0F0F0F)
    return (x * _u32(0x01010101)) >> 24


def clz32(x: jnp.ndarray) -> jnp.ndarray:
    """Count leading zeros of u32 (32 for 0); pure integer SWAR."""
    y = x
    y |= y >> 1
    y |= y >> 2
    y |= y >> 4
    y |= y >> 8
    y |= y >> 16
    return _u32(32) - _popcount32(y)


def clz64(a: U64) -> jnp.ndarray:
    return jnp.where(a.hi != 0, clz32(a.hi), _u32(32) + clz32(a.lo))


def umul32_wide(a: jnp.ndarray, b: jnp.ndarray) -> U64:
    """Full 32x32 -> 64-bit unsigned product via 16-bit halves."""
    a = _u32(a)
    b = _u32(b)
    al = a & _u32(0xFFFF)
    ah = a >> 16
    bl = b & _u32(0xFFFF)
    bh = b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = lh + hl
    mid_carry = (mid < lh).astype(_U32)  # overflow of lh + hl
    lo = ll + (mid << 16)
    lo_carry = (lo < ll).astype(_U32)
    hi = hh + (mid >> 16) + (mid_carry << 16) + lo_carry
    return U64(hi, lo)


def mul64_low(a: U64, b: U64) -> U64:
    """Low 64 bits of a*b (wrapping 64-bit multiply)."""
    p = umul32_wide(a.lo, b.lo)
    hi = p.hi + a.lo * b.hi + a.hi * b.lo
    return U64(hi, p.lo)


class U128(NamedTuple):
    """128-bit value as four uint32 limbs, most significant first."""
    x3: jnp.ndarray
    x2: jnp.ndarray
    x1: jnp.ndarray
    x0: jnp.ndarray


def umul64_wide(a: U64, b: U64) -> U128:
    """Full 64x64 -> 128-bit unsigned product."""
    p00 = umul32_wide(a.lo, b.lo)
    p01 = umul32_wide(a.lo, b.hi)
    p10 = umul32_wide(a.hi, b.lo)
    p11 = umul32_wide(a.hi, b.hi)

    x0 = p00.lo
    # limb 1: p00.hi + p01.lo + p10.lo (collect carries into limb 2)
    s1 = p00.hi + p01.lo
    c1 = (s1 < p00.hi).astype(_U32)
    x1 = s1 + p10.lo
    c1 = c1 + (x1 < s1).astype(_U32)
    # limb 2: p01.hi + p10.hi + p11.lo + c1
    s2 = p01.hi + p10.hi
    c2 = (s2 < p01.hi).astype(_U32)
    s2b = s2 + p11.lo
    c2 = c2 + (s2b < s2).astype(_U32)
    x2 = s2b + c1
    c2 = c2 + (x2 < s2b).astype(_U32)
    x3 = p11.hi + c2
    return U128(x3, x2, x1, x0)


def _u128_shr_into_u64(p: U128, k: jnp.ndarray) -> U64:
    """(p >> k) truncated to 64 bits, for k in [0, 127]."""
    # Select the two 64-bit windows around the shift and combine.
    k = _u32(k)
    word = k >> 5          # which 32-bit limb the low bit lands in (0..3)
    s = k & _u32(31)
    limbs = [p.x0, p.x1, p.x2, p.x3, _u32(0) * p.x0, _u32(0) * p.x0,
             _u32(0) * p.x0]

    def pick(i):
        # limbs[word + i] via nested where (word in 0..3)
        r = limbs[i]
        for w in range(1, 4):
            r = jnp.where(word == w, limbs[w + i], r)
        return r

    l0, l1, l2 = pick(0), pick(1), pick(2)
    lo = _shr32(l0, s) | _shl32(l1, _u32(32) - s)
    hi = _shr32(l1, s) | _shl32(l2, _u32(32) - s)
    return U64(hi, lo)


def _u128_low_bits_nonzero(p: U128, k: jnp.ndarray) -> jnp.ndarray:
    """True iff any of the low k bits of p are set, k in [0, 127]."""
    k = _u32(k)

    def low_mask_nonzero(x, bits):
        # bits in [0, 32]
        mask = _shr32(_u32(0xFFFFFFFF), _u32(32) - bits)
        return (x & mask) != 0

    limbs = [p.x0, p.x1, p.x2, p.x3]
    result = jnp.zeros_like(p.x0, dtype=jnp.bool_)
    for i, limb in enumerate(limbs):
        lo_bit = i * 32
        in_limb = jnp.clip(k.astype(_I32) - lo_bit, 0, 32).astype(_U32)
        result = result | low_mask_nonzero(limb, in_limb)
    return result


# ---------------------------------------------------------------------------
# IEEE-754 binary64 on bit patterns
# ---------------------------------------------------------------------------

_EXP_MASK_HI = 0x7FF00000
_MANT_MASK_HI = 0x000FFFFF
_QNAN = (0x7FF80000, 0)
_INF_HI = 0x7FF00000


def f64_sign(a: U64) -> jnp.ndarray:
    return a.hi >> 31


def f64_biased_exp(a: U64) -> jnp.ndarray:
    return (a.hi >> 20) & _u32(0x7FF)


def f64_mantissa(a: U64) -> U64:
    return U64(a.hi & _u32(_MANT_MASK_HI), a.lo)


def f64_is_nan(a: U64) -> jnp.ndarray:
    m = f64_mantissa(a)
    return (f64_biased_exp(a) == 0x7FF) & ~is_zero64(m)


def f64_is_inf(a: U64) -> jnp.ndarray:
    m = f64_mantissa(a)
    return (f64_biased_exp(a) == 0x7FF) & is_zero64(m)


def f64_is_zero(a: U64) -> jnp.ndarray:
    return is_zero64(U64(a.hi & _u32(0x7FFFFFFF), a.lo))


def f64_is_finite(a: U64) -> jnp.ndarray:
    return f64_biased_exp(a) != 0x7FF


def _pack_with_carry(sign, biased_exp: jnp.ndarray,
                     mant: U64, round_up: jnp.ndarray) -> U64:
    """(exp << 52) + mant + round_up; the add lets rounding carry ripple
    from the mantissa into the exponent (2^53 overflow and subnormal ->
    normal promotion both come out right).  ``sign`` may be a static
    Python int (0/1) when the caller proved the whole block's sign."""
    base = U64((biased_exp.astype(_U32) << 20) + mant.hi, mant.lo)
    out = add64(base, U64(_u32(0), round_up.astype(_U32)))
    if isinstance(sign, int):
        if sign:
            return U64(out.hi | _u32(0x80000000), out.lo)
        return out
    return U64(out.hi | (sign.astype(_U32) << 31), out.lo)


def _normalize(a: U64):
    """Decompose finite nonzero |a| into (e, sig53) with sig53 in
    [2^52, 2^53) and value = sig53 * 2^(e - 52) (unbiased e).
    Subnormals are normalized via clz."""
    be = f64_biased_exp(a).astype(_I32)
    mant = f64_mantissa(a)
    is_sub = be == 0
    # normal: implicit bit 52
    sig_norm = or64(mant, U64.const(1 << 52, a.hi))
    # subnormal: shift mantissa up so MSB lands at bit 52
    lz = clz64(mant).astype(_I32)           # >= 12 for nonzero subnormal
    shift = lz - 11
    sig_sub = shl64(mant, jnp.maximum(shift, 0).astype(_U32))
    e_norm = be - 1023
    e_sub = (1 - 1023) - shift              # exponent 1, minus normalization
    sig = U64(jnp.where(is_sub, sig_sub.hi, sig_norm.hi),
              jnp.where(is_sub, sig_sub.lo, sig_norm.lo))
    e = jnp.where(is_sub, e_sub, e_norm)
    return e, sig


def f64_mul(a: U64, b: U64) -> U64:
    """Correctly-rounded (RNE) IEEE-754 binary64 multiply on bit patterns."""
    sa, sb = f64_sign(a), f64_sign(b)
    sign = sa ^ sb

    ea, ma = _normalize(a)
    eb, mb = _normalize(b)
    p = umul64_wide(ma, mb)                 # in [2^104, 2^106)
    bit105 = (p.x3 >> (105 - 96)) & _u32(1)
    # unbiased exponent of the leading bit
    er = ea + eb + bit105.astype(_I32)
    biased = er + 1023

    # shift so that 53 bits remain: leading bit at position 104 + bit105
    shift = _u32(52) + bit105
    # subnormal: need extra right shift
    extra = jnp.maximum(1 - biased, 0).astype(_U32)
    # deep underflow guard: cap total shift (result rounds to 0 anyway)
    total = _min_small(shift + extra, 120)
    kept = _u128_shr_into_u64(p, total)
    guard_pos = total - _u32(1)
    guard = _u128_shr_into_u64(p, guard_pos).lo & _u32(1)
    sticky = _u128_low_bits_nonzero(p, guard_pos)
    round_up = (guard == 1) & (sticky | ((kept.lo & _u32(1)) == 1))

    out_exp = jnp.maximum(biased, 1) - 1  # biased-1 because sig53 has
    # explicit bit 52 which adds 1<<52 during packing; subnormal (biased<=0)
    # packs with exp 0 and no implicit-bit compensation needed since the
    # leading bit was shifted into the mantissa field.
    out_exp = jnp.where(biased <= 0, 0, out_exp).astype(_U32)
    packed = _pack_with_carry(sign, out_exp, kept, round_up)

    # overflow to inf
    overflow = biased >= 2047
    inf = U64((sign << 31) | _u32(_INF_HI), _u32(0) * a.lo)
    packed = U64(jnp.where(overflow, inf.hi, packed.hi),
                 jnp.where(overflow, inf.lo, packed.lo))

    # zeros
    zero_in = f64_is_zero(a) | f64_is_zero(b)
    szero = U64(sign << 31, _u32(0) * a.lo)
    packed = U64(jnp.where(zero_in, szero.hi, packed.hi),
                 jnp.where(zero_in, szero.lo, packed.lo))

    # inf * finite-nonzero = inf; inf * 0 = nan; nan anywhere = nan
    any_inf = f64_is_inf(a) | f64_is_inf(b)
    packed = U64(jnp.where(any_inf & ~zero_in, inf.hi, packed.hi),
                 jnp.where(any_inf & ~zero_in, inf.lo, packed.lo))
    any_nan = f64_is_nan(a) | f64_is_nan(b) | (any_inf & zero_in)
    packed = U64(jnp.where(any_nan, _u32(_QNAN[0]), packed.hi),
                 jnp.where(any_nan, _u32(_QNAN[1]), packed.lo))
    return packed


def f64_add(a: U64, b: U64) -> U64:
    """Correctly-rounded (RNE) IEEE-754 binary64 add on bit patterns."""
    sa, sb = f64_sign(a), f64_sign(b)

    # Order so |x| >= |y| (by magnitude bits).
    mag_a = U64(a.hi & _u32(0x7FFFFFFF), a.lo)
    mag_b = U64(b.hi & _u32(0x7FFFFFFF), b.lo)
    a_small = ltu64(mag_a, mag_b)

    def sel(cond, x, y):
        return U64(jnp.where(cond, x.hi, y.hi), jnp.where(cond, x.lo, y.lo))

    x = sel(a_small, b, a)
    y = sel(a_small, a, b)
    sx, sy = f64_sign(x), f64_sign(y)

    ex, mx = _normalize(x)
    ey, my = _normalize(y)
    # Working significands with 3 extra bits (guard/round/sticky).
    X = shl64(mx, 3)
    Y = shl64(my, 3)
    d = (ex - ey).astype(_I32)                    # >= 0
    d_cap = jnp.minimum(d, 60).astype(_U32)
    y_shifted = shr64(Y, d_cap)
    y_dropped = ~eq64(shl64(y_shifted, d_cap), Y)  # any bits lost
    y_aligned = or64(y_shifted,
                     U64(jnp.zeros_like(X.hi), y_dropped.astype(_U32)))

    same_sign = sx == sy
    ssum = add64(X, y_aligned)
    sdiff = sub64(X, y_aligned)
    S = sel(same_sign, ssum, sdiff)

    # Normalize S: it lives in [0, 2^57).  Find leading bit.
    lz = clz64(S).astype(_I32)
    # Target: leading bit at position 55 (53 sig bits + guard(2) + sticky?).
    # We renormalize to put MSB at bit 55, keeping a 53-bit mantissa at
    # [3..55], guard at 2.. — simpler: shift so MSB is at bit 55.
    msb_pos = 63 - lz                              # valid when S != 0
    shift_left = jnp.maximum(55 - msb_pos, 0)
    shift_right = jnp.maximum(msb_pos - 55, 0)    # 0 or 1 (carry case)
    S_l = shl64(S, shift_left.astype(_U32))
    lost = (S.lo & _u32(1)) & (shift_right > 0).astype(_U32)
    S_r = or64(shr64(S, shift_right.astype(_U32)),
               U64(jnp.zeros_like(S.hi), lost))
    S_n = sel(shift_right > 0, S_r, S_l)
    e_res = ex + (msb_pos - 55)                   # unbiased exp of MSB(=52)

    # S_n has MSB at 55; mantissa = bits [3..55], guard bit 2, sticky [0..2)
    biased = e_res + 1023
    extra = jnp.maximum(1 - biased, 0).astype(_U32)
    total = _min_small(_u32(3) + extra, 60)
    kept = shr64(S_n, total)
    guard = shr64(S_n, total - _u32(1)).lo & _u32(1)
    # sticky = any bits of S_n strictly below the guard position
    low_mask_bits = total - _u32(1)
    low = sub64(S_n, shl64(shr64(S_n, low_mask_bits), low_mask_bits))
    sticky = ~is_zero64(low)
    round_up = (guard == 1) & (sticky | ((kept.lo & _u32(1)) == 1))

    out_exp = jnp.where(biased <= 0, 0, jnp.maximum(biased, 1) - 1)
    packed = _pack_with_carry(sx, out_exp.astype(_U32), kept, round_up)

    # exact zero result (x == -y): sign is + for RNE
    exact_zero = is_zero64(S) & ~same_sign
    packed = U64(jnp.where(exact_zero, _u32(0), packed.hi),
                 jnp.where(exact_zero, _u32(0), packed.lo))

    # y == 0: result is x (covers +0 + -0 = +0 via magnitude order too)
    y_zero = f64_is_zero(y)
    x_zero = f64_is_zero(x)
    both_zero = x_zero & y_zero
    packed = sel(y_zero & ~both_zero, x, packed)
    minus_zero = U64(_u32(0x80000000) + jnp.zeros_like(a.hi), _u32(0) * a.lo)
    zz = sel((sx == 1) & (sy == 1), minus_zero,
             U64(_u32(0) * a.hi, _u32(0) * a.lo))
    packed = sel(both_zero, zz, packed)

    # overflow
    overflow = (biased >= 2047) & ~is_zero64(S)
    inf = U64((sx << 31) | _u32(_INF_HI), _u32(0) * a.lo)
    packed = sel(overflow, inf, packed)

    # inf/nan propagation: |x| >= |y| so any inf is in x (or both)
    opposite_infs = f64_is_inf(x) & f64_is_inf(y) & ~same_sign
    packed = sel(f64_is_inf(x), inf, packed)
    nan = U64(_u32(_QNAN[0]) + jnp.zeros_like(a.hi), _u32(_QNAN[1]) * a.lo)
    any_nan = f64_is_nan(a) | f64_is_nan(b) | opposite_infs
    packed = sel(any_nan, nan, packed)
    return packed


def f64_sub(a: U64, b: U64) -> U64:
    return f64_add(a, U64(b.hi ^ _u32(0x80000000), b.lo))


def i64_to_f64(x: U64) -> U64:
    """Correctly-rounded int64 -> double conversion (two's complement in)."""
    sign = x.hi >> 31
    mag = U64(jnp.where(sign == 1, neg64(x).hi, x.hi),
              jnp.where(sign == 1, neg64(x).lo, x.lo))
    lz = clz64(mag).astype(_I32)
    msb = 63 - lz
    # Shift so MSB lands at bit 55 (53 bits + guard + room for sticky calc).
    shift_left = jnp.maximum(55 - msb, 0).astype(_U32)
    shift_right = jnp.maximum(msb - 55, 0).astype(_U32)
    up = shl64(mag, shift_left)
    # sticky = any bits shifted out on the right (msb > 55) path
    low = sub64(mag, shl64(shr64(mag, shift_right), shift_right))
    down_sticky = ~is_zero64(low)
    down = shr64(mag, shift_right)
    S = U64(jnp.where(msb > 55, down.hi, up.hi),
            jnp.where(msb > 55, down.lo, up.lo))
    # For the down path the sticky must exclude the guard bit, so compute
    # rounding from S (MSB at 55): mantissa bits [3..55], guard 2, rest sticky.
    kept = shr64(S, 3)
    guard = (S.lo >> 2) & _u32(1)
    sticky = ((S.lo & _u32(3)) != 0) | (jnp.where(msb > 55,
                                                  down_sticky,
                                                  jnp.zeros_like(down_sticky)))
    round_up = (guard == 1) & (sticky | ((kept.lo & _u32(1)) == 1))
    biased = (msb + 1023).astype(_U32)
    out_exp = biased - _u32(1)  # compensate implicit bit in kept (bit 52)
    packed = _pack_with_carry(sign, out_exp, kept, round_up)
    zero = is_zero64(x)
    return U64(jnp.where(zero, _u32(0), packed.hi),
               jnp.where(zero, _u32(0), packed.lo))


def _msb32(x: jnp.ndarray) -> jnp.ndarray:
    """floor(log2(x)) for x != 0, via the f32 exponent field.

    u32->f32 conversion is correctly rounded; rounding can only push the
    exponent one too high (x rounds up to a power of two), fixed by one
    check.  ~7 ops vs ~25 for SWAR clz."""
    top = (x >> 31) == 1                      # Mosaic has no u32->f32;
    f = x.astype(_I32).astype(jnp.float32)    # i32 convert + top-bit guard
    e = (f.view(_U32) >> 23).astype(_I32) - 127
    e = jnp.minimum(e, 30)
    over = (x >> e.astype(_U32)) == 0
    return jnp.where(top, _I32(31), jnp.where(over, e - 1, e))


def i64_to_f64_times_normal(m: U64, fsig: U64, f_biased: jnp.ndarray) -> U64:
    """Fused ``double(int64 m) * f`` for a *normal, positive* f with
    significand ``fsig`` in [2^52, 2^53) and biased exponent ``f_biased``,
    when the product can neither overflow nor go subnormal.

    This is the falp decode hot path (reference src/falp.cpp:100-120:
    ``(int64)(packed + base) * FACT`` converted to double, times
    ``FRAC_ARR[exp]`` = 10^-e with e <= 18): |m| <= 2^63 and
    2^-60 < f <= 1 keep every intermediate normal, so the generic
    :func:`i64_to_f64` + :func:`f64_mul` pipeline (clz-normalize, 128-bit
    dynamic shifts, subnormal/NaN/Inf handling) collapses to one clz, one
    dynamic shift, and static bit extractions.  Both roundings (convert,
    then multiply) are performed exactly as the two-step reference does.
    """
    sign = m.hi >> 31
    neg = neg64(m)
    mag = U64(jnp.where(sign == 1, neg.hi, m.hi),
              jnp.where(sign == 1, neg.lo, m.lo))
    # --- normalize so MSB lands at bit 63: 2-case shift via fast msb ----
    hi_z = mag.hi == 0
    msb_in = _msb32(jnp.where(hi_z, mag.lo, mag.hi) | _u32(1))
    k = (_I32(31) - msb_in).astype(_U32)          # shift within the limb
    kc = _u32(32) - k                              # complement, in [1, 32]
    # hi != 0: S = (hi<<k | lo>>(32-k), lo<<k); 32-k==32 only when k==0
    top_a = (mag.hi << k) | jnp.where(k == 0, _u32(0), mag.lo >> kc)
    top_a = jnp.where(k == 0, mag.hi, top_a)
    S_a = U64(top_a, mag.lo << k)
    # hi == 0: S = (lo<<k, 0), total shift 32 + k
    S_b = U64(mag.lo << k, jnp.zeros_like(mag.lo))
    S = U64(jnp.where(hi_z, S_b.hi, S_a.hi), jnp.where(hi_z, S_b.lo, S_a.lo))
    lz = jnp.where(hi_z, k + _u32(32), k)
    kept = U64(S.hi >> 11, (S.lo >> 11) | (S.hi << 21))  # 53b, MSB at 52
    guard = (S.lo >> 10) & _u32(1)
    sticky = (S.lo & _u32(0x3FF)) != 0
    round_up = (guard == 1) & (sticky | ((kept.lo & _u32(1)) == 1))
    sig_m = add64(kept, U64(_u32(0) * kept.hi, round_up.astype(_U32)))
    carry = (sig_m.hi >> 21) & _u32(1)            # rounded up to 2^53
    sig_m = U64(jnp.where(carry == 1, _u32(1 << 20), sig_m.hi), sig_m.lo)
    e_m = (_u32(63) - lz + carry).astype(_I32)    # unbiased exponent of d

    # --- significand product: p in [2^104, 2^106) ------------------------
    p = umul64_wide(sig_m, fsig)
    bit105 = (p.x3 >> 9) & _u32(1)
    # keep 53 bits below the leading bit: variable window (sh = 20 +
    # bit105) instead of two-case selects; p < 2^106 keeps x3 < 2^10 so
    # the hi extraction needs no 21-bit mask in either case
    sh2 = _u32(20) + bit105
    shc2 = _u32(12) - bit105                       # 32 - sh2
    kept2 = U64((p.x2 >> sh2) | (p.x3 << shc2),
                (p.x1 >> sh2) | (p.x2 << shc2))
    guard2 = (p.x1 >> (sh2 - _u32(1))) & _u32(1)
    sticky2 = (p.x0 | (p.x1 << (shc2 + _u32(1)))) != 0
    round2 = (guard2 == 1) & (sticky2 | ((kept2.lo & _u32(1)) == 1))

    # biased(result) = e_m + e_f + bit105 + 1023 = e_m + f_biased + bit105
    biased_out = (e_m + bit105.astype(_I32)
                  + f_biased.astype(_I32)).astype(_U32)
    packed = _pack_with_carry(sign, biased_out - _u32(1), kept2, round2)
    zero = is_zero64(m)
    return U64(jnp.where(zero, _u32(0), packed.hi),
               jnp.where(zero, _u32(0), packed.lo))


def i32c96_to_f64(n: jnp.ndarray, c2: jnp.ndarray, c1: jnp.ndarray,
                  c0: jnp.ndarray, fb2: jnp.ndarray, *,
                  c0zero: bool = False, nonneg: bool = False,
                  cheap_msb: bool = False, nozero: bool = False,
                  alo_zero: bool = False,
                  k_static: int | None = None) -> U64:
    """``RN(n * C * 2^E)`` for int32 ``n`` and a per-vector positive
    constant ``C'`` top-aligned into [2^95, 2^96) as three u32 limbs.

    The falp decode mid-magnitude fast path: with ``FACT = 10^f =
    2^f * 5^f``, the int64 ``m = n_int * FACT`` converts to double
    exactly whenever its odd part ``n * 5^f`` fits 53 bits (the 2^f is
    pure exponent), so the reference's two-step rounding collapses to a
    single correctly rounded product ``n * (5^f * fsig(FRAC))`` — and
    that constant is at most 42 + 53 = 95 bits, exactly representable in
    three u32 limbs computed at plan-build time.  ``fb2`` carries the
    whole per-vector exponent term ``f_biased + 74 + f - shiftC``.

    Exact on the domain |n| <= 2^31, |n * 5^f| < 2^53 (plan-build
    bounds check); ~2/3 the work of :func:`i64_to_f64_times_normal`.
    ``nozero`` additionally skips the n == 0 select (FOR base > 0).
    """
    if nonneg:
        sign = jnp.zeros_like(n)
        mag = n
    else:
        mask = (n.astype(_I32) >> 31).astype(_U32)
        sign = mask & _u32(1)
        mag = (n ^ mask) - mask
    if k_static is not None:
        # block-constant normalize shift (banded magnitudes)
        k = int(k_static)
        M = mag << _u32(k) if k else mag
    elif cheap_msb:
        # |n| < 2^24 for the whole bucket: i32->f32 convert is exact, the
        # exponent field IS the msb (no round-up-to-power-of-2 guard)
        f = (mag | _u32(1)).astype(_I32).astype(jnp.float32)
        nb = ((f.view(_U32) >> 23) - _u32(127)).astype(_I32)
        k = (_I32(31) - nb).astype(_U32)
        M = mag << k                               # [2^31, 2^32)
    else:
        nb = _msb32(mag | _u32(1))
        k = (_I32(31) - nb).astype(_U32)
        M = mag << k                               # [2^31, 2^32)
    # exact 32x96 product: p = M * C' in [2^126, 2^128) as 4 u32 limbs;
    # the 16-bit split of M is shared across the three partial products
    # (the splits of c2/c1/c0 are per-vector metadata planes — 1/slots
    # the cost of a value-plane op).  ``alo_zero``: |n| < 2^16 for the
    # whole block, so k >= 16 and M's low 16-bit digit is zero — each
    # partial product collapses to a halved schoolbook multiply.
    ah = M >> 16

    if alo_zero:
        def mul_c(c):
            bl = c & _u32(0xFFFF)
            bh = c >> 16
            hl = ah * bl
            hh = ah * bh
            return U64(hh + (hl >> 16), hl << 16)
    else:
        al = M & _u32(0xFFFF)

        def mul_c(c):
            bl = c & _u32(0xFFFF)
            bh = c >> 16
            ll = al * bl
            lh = al * bh
            hl = ah * bl
            hh = ah * bh
            mid = lh + hl
            midc = (mid < lh).astype(_U32)
            lo = ll + (mid << 16)
            loc = (lo < ll).astype(_U32)
            return U64(hh + (mid >> 16) + (midc << 16) + loc, lo)

    p1 = mul_c(c1)
    p2 = mul_c(c2)
    if c0zero:
        x0 = None
        x1 = p1.lo
        s2 = p1.hi + p2.lo
        cb = (s2 < p2.lo).astype(_U32)
        x2 = s2
    else:
        p0 = mul_c(c0)
        x0 = p0.lo
        x1 = p0.hi + p1.lo
        ca = (x1 < p1.lo).astype(_U32)
        s2 = p1.hi + p2.lo
        cb = (s2 < p2.lo).astype(_U32)
        x2 = s2 + ca
        cb = cb | (x2 < ca).astype(_U32)
    x3 = p2.hi + cb
    packed = _p126_round_pack(x3, x2, x1, x0, fb2, k, sign)
    if nozero:
        return packed
    zero = mag == 0
    return U64(jnp.where(zero, _u32(0), packed.hi),
               jnp.where(zero, _u32(0), packed.lo))


def _p126_round_pack(x3, x2, x1, x0, fb2, k, sign) -> U64:
    """Round-and-pack the exact product p in [2^126, 2^128) (four u32
    limbs, x0 may be None when provably zero) into an f64; shared by the
    mid/mid64 single-rounding decode paths.  biased(result) =
    fb2 + bit127(p) - k."""
    t = x3 >> 31                                   # leading bit 127 vs 126
    # variable shifts cost the same as static ones on the VPU, so one
    # data-dependent window (sh = 10 + t) replaces the two-case selects
    # (~8 fewer ops/value).  t == 0 implies bit 127 clear, so the hi
    # extraction needs no 21-bit mask in either case.
    sh = _u32(10) + t
    shc = _u32(22) - t                             # 32 - sh
    lo = (x2 >> sh) | (x3 << shc)
    hi = x3 >> sh
    guard = (x2 >> (sh - _u32(1))) & _u32(1)
    low = x1 | (x2 << (shc + _u32(1)))             # bits below guard
    if x0 is not None:
        low = low | x0
    sticky = low != 0
    round_up = (guard == 1) & (sticky | ((lo & _u32(1)) == 1))
    biased_out = fb2 + t - k
    return _pack_with_carry(sign, biased_out - _u32(1), U64(hi, lo),
                            round_up)


def _normalize_mag53(mag: U64, maghi: bool, k_static: int | None = None):
    """Normalize a magnitude < 2^53 into M in [2^63, 2^64); returns
    (M, k64).  ``maghi`` statically asserts mag >= 2^32 for the whole
    block: mag.hi != 0 kills the two-case select, and mag.hi < 2^21
    (|n| < 2^53) guarantees k in [11, 31] so no shift guard is needed.
    ``k_static``: every magnitude of the block shares one msb (plan
    proof: min |n| and max |n| in the same octave), so the shift is a
    compile-time constant — no msb computation at all, and the exponent
    arithmetic folds at trace time."""
    if k_static is not None:
        k = int(k_static)
        if k == 0:
            return U64(mag.hi, mag.lo), 0
        if k < 32:
            return U64((mag.hi << _u32(k)) | (mag.lo >> _u32(32 - k)),
                       mag.lo << _u32(k)), k
        if k == 32:
            return U64(mag.lo, jnp.zeros_like(mag.lo)), k
        return U64(mag.lo << _u32(k - 32), jnp.zeros_like(mag.lo)), k
    if maghi:
        # mag.hi in [1, 2^21): the i32->f32 convert is exact (< 2^24),
        # so the exponent field IS the msb — no round-up/top-bit guards
        f = mag.hi.astype(_I32).astype(jnp.float32)
        msb = ((f.view(_U32) >> 23) - _u32(127)).astype(_I32)
        k = (_I32(31) - msb).astype(_U32)
        M = U64((mag.hi << k) | (mag.lo >> (_u32(32) - k)), mag.lo << k)
        return M, k
    hi_z = mag.hi == 0
    msb_in = _msb32(jnp.where(hi_z, mag.lo, mag.hi) | _u32(1))
    k = (_I32(31) - msb_in).astype(_U32)
    kc = _u32(32) - k
    top_a = (mag.hi << k) | jnp.where(k == 0, _u32(0), mag.lo >> kc)
    top_a = jnp.where(k == 0, mag.hi, top_a)
    M = U64(jnp.where(hi_z, mag.lo << k, top_a),
            jnp.where(hi_z, jnp.zeros_like(mag.lo), mag.lo << k))
    k64 = jnp.where(hi_z, k + _u32(32), k)
    return M, k64


def i64c64_to_f64(n: U64, c1: jnp.ndarray, c0: jnp.ndarray,
                  fb2: jnp.ndarray, *, nonneg: bool = False,
                  nozero: bool = False, alo_zero: bool = False,
                  k_static: int | None = None) -> U64:
    """``RN(int64(n) * C * 2^E)`` for |n| < 2^53 beyond int32 range and a
    per-vector constant ``C' = 5^fac * fsig(FRAC)`` that fits 64 bits
    (fac <= 4), top-aligned into [2^63, 2^64) as limbs (c1, c0).

    The mid64 falp decode fast path (bit widths 33..52): double(m) is
    exact because the odd part |n * 5^fac| < 2^53, so one 64x64 product
    with a single rounding replaces the generic two-rounding pipeline.
    ``fb2`` carries ``f_biased + 74 + fac - shiftC`` (same form as
    :func:`i32c96_to_f64`).  Static flags prune work the caller proved
    impossible for the whole block: ``nonneg`` (no negative n — FOR base
    >= 0), ``nozero`` (no zero n — FOR base > 0).  Callers that proved
    an all-negative block feed |n| directly to
    :func:`u64mag_c64_to_f64` with static sign 1.
    """
    if nonneg:
        return u64mag_c64_to_f64(n, 0, c1, c0, fb2, nozero=nozero,
                                 alo_zero=alo_zero, k_static=k_static)
    smask = (n.hi.astype(_I32) >> 31).astype(_U32)
    sign = smask & _u32(1)
    negd = neg64(n)
    mag = U64(jnp.where(smask != 0, negd.hi, n.hi),
              jnp.where(smask != 0, negd.lo, n.lo))
    return u64mag_c64_to_f64(mag, sign, c1, c0, fb2, nozero=nozero,
                             alo_zero=alo_zero, k_static=k_static)


def u64mag_c64_to_f64(mag: U64, sign, c1: jnp.ndarray, c0: jnp.ndarray,
                      fb2: jnp.ndarray, *, maghi: bool = False,
                      nozero: bool = False, alo_zero: bool = False,
                      k_static: int | None = None) -> U64:
    """Magnitude-entry core of :func:`i64c64_to_f64`: ``sign`` is a 0/1
    array or a static Python int (whole-block sign proof — the allneg
    fast path computes |n| = (-base) - u with one subtract and passes
    sign=1).  ``maghi``: every |n| >= 2^32 (see _normalize_mag53).
    ``alo_zero``: every |n| < 2^48 for the block, so the normalize shift
    is >= 16 and M.lo's low 16-bit digit is zero — the two M.lo partial
    products collapse to halved schoolbook multiplies (4 fewer muls).
    ``k_static``: block-constant normalize shift (see _normalize_mag53)."""
    M, k64 = _normalize_mag53(mag, maghi, k_static)
    # exact 64x64 product p = M * C' in [2^126, 2^128); shared splits
    ah = M.lo >> 16
    bl = M.hi & _u32(0xFFFF)
    bh = M.hi >> 16

    def mul_c(a_lo16, a_hi16, c):
        cl = c & _u32(0xFFFF)
        ch = c >> 16
        ll = a_lo16 * cl
        lh = a_lo16 * ch
        hl = a_hi16 * cl
        hh = a_hi16 * ch
        mid = lh + hl
        midc = (mid < lh).astype(_U32)
        lo = ll + (mid << 16)
        loc = (lo < ll).astype(_U32)
        return U64(hh + (mid >> 16) + (midc << 16) + loc, lo)

    def mul_c_a0(a_hi16, c):
        # a's low 16-bit digit is zero: a*c = (a_hi16*c) << 16 exactly;
        # hh + (hl >> 16) cannot carry (hh <= (2^16-1)^2)
        cl = c & _u32(0xFFFF)
        ch = c >> 16
        hl = a_hi16 * cl
        hh = a_hi16 * ch
        return U64(hh + (hl >> 16), hl << 16)

    if alo_zero:
        p00 = mul_c_a0(ah, c0)       # M.lo * c0 (al == 0)
        p01 = mul_c_a0(ah, c1)       # M.lo * c1 (al == 0)
    else:
        al = M.lo & _u32(0xFFFF)
        p00 = mul_c(al, ah, c0)      # M.lo * c0
        p01 = mul_c(al, ah, c1)      # M.lo * c1
    p10 = mul_c(bl, bh, c0)          # M.hi * c0
    p11 = mul_c(bl, bh, c1)          # M.hi * c1
    x0 = p00.lo
    s1 = p00.hi + p01.lo
    c1_ = (s1 < p01.lo).astype(_U32)
    x1 = s1 + p10.lo
    c1_ = c1_ + (x1 < s1).astype(_U32)
    s2 = p01.hi + p10.hi
    c2_ = (s2 < p01.hi).astype(_U32)
    s2b = s2 + p11.lo
    c2_ = c2_ + (s2b < s2).astype(_U32)
    x2 = s2b + c1_
    c2_ = c2_ + (x2 < s2b).astype(_U32)
    x3 = p11.hi + c2_
    packed = _p126_round_pack(x3, x2, x1, x0, fb2, k64, sign)
    if nozero:
        return packed
    zero = is_zero64(mag)
    return U64(jnp.where(zero, _u32(0), packed.hi),
               jnp.where(zero, _u32(0), packed.lo))


def i64c96_to_f64(n: U64, c2: jnp.ndarray, c1: jnp.ndarray,
                  c0: jnp.ndarray, fb2: jnp.ndarray, *,
                  nonneg: bool = False, nozero: bool = False,
                  alo_zero: bool = False,
                  k_static: int | None = None) -> U64:
    """``RN(int64(n) * C * 2^E)`` for |n| < 2^53 beyond int32 range and a
    per-vector constant ``C' = 5^fac * fsig(FRAC)`` wider than 64 bits
    (fac 5..9), top-aligned into [2^95, 2^96) as limbs (c2, c1, c0).

    Covers the falp fast-path gap between mid64 (C fits 64 bits) and the
    generic two-rounding pipeline: e.g. CMS/1 (fac 5, bw 41) and
    Medicare/1 (fac 5, bw 38).  double(m) is exact because the odd part
    |n * 5^fac| < 2^53, so one 64x96 product with a single rounding is
    the correctly rounded result.  ``fb2`` carries
    ``f_biased + 106 + fac - shiftC``.

    CONTRACT: c0's low 16 bits must be zero for every element (true for
    fac <= 11: shiftC = 95 - bitlen(C) + 1 >= 16); the two c0 partial
    products use a halved schoolbook multiply that relies on it.
    """
    if nonneg:
        return u64mag_c96_to_f64(n, 0, c2, c1, c0, fb2, nozero=nozero,
                                 alo_zero=alo_zero, k_static=k_static)
    smask = (n.hi.astype(_I32) >> 31).astype(_U32)
    sign = smask & _u32(1)
    negd = neg64(n)
    mag = U64(jnp.where(smask != 0, negd.hi, n.hi),
              jnp.where(smask != 0, negd.lo, n.lo))
    return u64mag_c96_to_f64(mag, sign, c2, c1, c0, fb2, nozero=nozero,
                             alo_zero=alo_zero, k_static=k_static)


def u64mag_c96_to_f64(mag: U64, sign, c2: jnp.ndarray, c1: jnp.ndarray,
                      c0: jnp.ndarray, fb2: jnp.ndarray, *,
                      maghi: bool = False, nozero: bool = False,
                      alo_zero: bool = False,
                      k_static: int | None = None) -> U64:
    """Magnitude-entry core of :func:`i64c96_to_f64` (see
    :func:`u64mag_c64_to_f64` for the sign/maghi/alo_zero/k_static
    contracts; with ``alo_zero`` the three M.lo partials lose 5 muls)."""
    M, k64 = _normalize_mag53(mag, maghi, k_static)
    # exact 64x96 product p = M * C' in [2^158, 2^160), five u32 limbs
    ah = M.lo >> 16
    bl = M.hi & _u32(0xFFFF)
    bh = M.hi >> 16

    def mul_c(a_lo16, a_hi16, c):
        cl = c & _u32(0xFFFF)
        ch = c >> 16
        ll = a_lo16 * cl
        lh = a_lo16 * ch
        hl = a_hi16 * cl
        hh = a_hi16 * ch
        mid = lh + hl
        midc = (mid < lh).astype(_U32)
        lo = ll + (mid << 16)
        loc = (lo < ll).astype(_U32)
        return U64(hh + (mid >> 16) + (midc << 16) + loc, lo)

    def mul_c_h(a_lo16, a_hi16, c):
        # c's low 16 bits are zero (contract): two muls, no carries
        ch = c >> 16
        lh = a_lo16 * ch
        hh = a_hi16 * ch
        return U64(hh + (lh >> 16), lh << 16)

    def mul_c_a0(a_hi16, c):
        # a's low 16-bit digit is zero: halved schoolbook (see c64 core)
        cl = c & _u32(0xFFFF)
        ch = c >> 16
        hl = a_hi16 * cl
        hh = a_hi16 * ch
        return U64(hh + (hl >> 16), hl << 16)

    if alo_zero:
        # al == 0 and c0's low 16 bits zero: M.lo * c0 = (ah*ch0) << 32
        p00 = U64(ah * (c0 >> 16), jnp.zeros_like(ah))
        p01 = mul_c_a0(ah, c1)       # M.lo * c1 (al == 0)
        p02 = mul_c_a0(ah, c2)       # M.lo * c2 (al == 0)
    else:
        al = M.lo & _u32(0xFFFF)
        p00 = mul_c_h(al, ah, c0)    # M.lo * c0
        p01 = mul_c(al, ah, c1)      # M.lo * c1
        p02 = mul_c(al, ah, c2)      # M.lo * c2
    p10 = mul_c_h(bl, bh, c0)        # M.hi * c0
    p11 = mul_c(bl, bh, c1)          # M.hi * c1
    p12 = mul_c(bl, bh, c2)          # M.hi * c2
    y0 = p00.lo
    s1 = p00.hi + p01.lo
    c1a = (s1 < p01.lo).astype(_U32)
    y1 = s1 + p10.lo
    carry1 = c1a + (y1 < s1).astype(_U32)
    s2 = p01.hi + p02.lo
    c2a = (s2 < p02.lo).astype(_U32)
    s2b = s2 + p10.hi
    c2b = c2a + (s2b < s2).astype(_U32)
    s2c = s2b + p11.lo
    c2c = c2b + (s2c < s2b).astype(_U32)
    y2 = s2c + carry1
    carry2 = c2c + (y2 < s2c).astype(_U32)
    s3 = p02.hi + p11.hi
    c3a = (s3 < p11.hi).astype(_U32)
    s3b = s3 + p12.lo
    c3b = c3a + (s3b < s3).astype(_U32)
    y3 = s3b + carry2
    carry3 = c3b + (y3 < s3b).astype(_U32)
    y4 = p12.hi + carry3
    # round/pack: window+guard live in (y4, y3); y2/y1/y0 are pure
    # sticky, so fold them into _p126_round_pack's sticky-only slots
    packed = _p126_round_pack(y4, y3, y2 | y1, y0, fb2, k64, sign)
    if nozero:
        return packed
    zero = is_zero64(mag)
    return U64(jnp.where(zero, _u32(0), packed.hi),
               jnp.where(zero, _u32(0), packed.lo))


def i32fact_to_f64_times_normal(n: jnp.ndarray, fact: jnp.ndarray,
                                fsig_hi21: jnp.ndarray, fsig_lo: jnp.ndarray,
                                f_biased: jnp.ndarray) -> U64:
    """Fused ``double(int64(n) * fact) * f`` when ``|n * fact| < 2^32``.

    The falp decode small-magnitude fast path: when the per-vector FFOR
    bounds prove every ``m = (packed + base) * FACT`` of a vector fits a
    32-bit magnitude, ``double(m)`` is *exact* (|m| < 2^32 <= 2^53), so
    the reference's two-step rounding (int64->double convert, then the
    FRAC multiply, src/falp.cpp:100-120) collapses to a single correctly
    rounded product of the exact integer ``m`` with the normal positive
    constant ``f`` — about half the generic softfloat work of
    :func:`i64_to_f64_times_normal`.

    ``n`` is an int32 (two's-complement in a u32 plane), ``fact`` a u32,
    ``fsig_hi21``/``fsig_lo`` the 53-bit significand of ``f`` with the
    implicit bit already set in the high limb (bits 52..32 -> 21 bits),
    ``f_biased`` its biased exponent.  Plan-build precomputes the three
    constants per vector.
    """
    mask = (n.astype(_I32) >> 31).astype(_U32)    # 0 or ~0 (sign spread)
    sign = mask & _u32(1)
    mag_n = (n ^ mask) - mask                      # |n| as u32
    mmag = mag_n * fact                            # |m| < 2^32 by contract
    # normalize |m| to [2^31, 2^32): one 32-bit shift, msb via f32 trick
    nb = _msb32(mmag | _u32(1))
    k = (_I32(31) - nb).astype(_U32)
    M = mmag << k
    # exact 32x53 product: p = M * fsig in [2^83, 2^85) as 3 u32 limbs
    ll = umul32_wide(M, fsig_lo)
    lh = umul32_wide(M, fsig_hi21)
    x0 = ll.lo
    x1 = ll.hi + lh.lo
    x2 = lh.hi + (x1 < lh.lo).astype(_U32)
    t = (x2 >> 20) & _u32(1)                       # leading bit 84 vs 83
    up = t == 1
    # keep 53 bits below the leading bit; guard/sticky straddle x0
    lo = jnp.where(up, x1, (x0 >> 31) | (x1 << 1))
    hi = jnp.where(up, x2, (x1 >> 31) | (x2 << 1)) & _u32(0x1FFFFF)
    guard = jnp.where(up, x0 >> 31, (x0 >> 30) & _u32(1))
    sticky = (x0 & jnp.where(up, _u32(0x7FFFFFFF), _u32(0x3FFFFFFF))) != 0
    round_up = (guard == 1) & (sticky | ((lo & _u32(1)) == 1))
    # r = ±p * 2^(f_unbiased - 52 - k - 31): biased(r) = f_biased + 31 + t - k
    biased_out = f_biased + _u32(31) + t - k
    packed = _pack_with_carry(sign, biased_out - _u32(1), U64(hi, lo),
                              round_up)
    zero = mmag == 0
    return U64(jnp.where(zero, _u32(0), packed.hi),
               jnp.where(zero, _u32(0), packed.lo))


# ---------------------------------------------------------------------------
# ALP encode fast path: v * 10^e * 10^-f + MAGIC - MAGIC, cast to int64,
# computed exactly on unpacked operands with integer-only magic rounding.
# Values outside the fast path's envelope (subnormal input, overflow /
# subnormal intermediates) raise a `rare` flag for host-side fixup — on
# real columns these are vanishingly rare (they always become exceptions).
# ---------------------------------------------------------------------------

# M * 8 as u32 limbs (M = 2^52 + 2^51); plain ints so traced functions
# materialise them inside the trace (Pallas rejects captured arrays)
_MAGIC8_HI = (3 << 54) >> 32
_MAGIC8_LO = (3 << 54) & 0xFFFFFFFF


def mul_by_normal_unpacked(sig_a: U64, e_a: jnp.ndarray,
                           csig: U64, c_biased: jnp.ndarray):
    """(sig_a * 2^(e_a-52)) * c for normal positive c given by
    significand/biased-exponent; inputs and outputs are unpacked
    normalized significands in [2^52, 2^53) with unbiased exponents.
    Correctly rounded (RNE).  Sign is handled by the caller."""
    p = umul64_wide(sig_a, csig)                  # [2^104, 2^106)
    bit105 = (p.x3 >> 9) & _u32(1)
    # variable 53-bit window (see i64_to_f64_times_normal): p < 2^106
    # keeps x3 < 2^10, so no hi mask is needed in either case
    shw = _u32(20) + bit105
    shwc = _u32(12) - bit105                      # 32 - shw
    kept = U64((p.x2 >> shw) | (p.x3 << shwc),
               (p.x1 >> shw) | (p.x2 << shwc))
    guard = (p.x1 >> (shw - _u32(1))) & _u32(1)
    sticky = (p.x0 | (p.x1 << (shwc + _u32(1)))) != 0
    round_up = (guard == 1) & (sticky | ((kept.lo & _u32(1)) == 1))
    sig = add64(kept, U64(_u32(0) * kept.hi, round_up.astype(_U32)))
    carry = (sig.hi >> 21) & _u32(1)              # rounded to 2^53
    sig = U64(jnp.where(carry == 1, _u32(1 << 20), sig.hi), sig.lo)
    e_out = (e_a + bit105.astype(_I32) + carry.astype(_I32)
             + c_biased.astype(_I32) - 1023)
    return sig, e_out


def magic_round_to_i64(sign: jnp.ndarray, e2: jnp.ndarray, sig2: U64,
                       *, skip_wide: bool = False):
    """Exact ``(int64)((x + MAGIC) - MAGIC)`` for x = ±sig2·2^(e2-52)
    (normal), with x86 cast semantics, as pure integer arithmetic.

    Three exact regions (derivation in the module docstring of the
    encode kernel): |x| < 2^52 via 1/8-fixed-point around M; e2 in
    [52, 103] via ulp-scaled integer add (M is a multiple of ulp(x)
    there); e2 >= 104 gives |result| >= 2^103 -> INT64_MIN regardless
    of the ±ulp wobble of the two additions.

    ``skip_wide=True`` statically drops the region-B arithmetic
    (~70 vector ops) and returns INT64_MIN for 52 <= e2 <= 103 — the
    caller MUST treat those values as needing exact host fixup (the
    encode kernel's ``rare`` flag).  Correct only where |x| >= 2^52
    non-special values are escape-hatched; the (e, f) SEARCH must not
    use it (candidate exponents routinely push x past 2^52)."""
    zero = jnp.zeros_like(sig2.lo)
    int_min = U64(_u32(0x80000000) + zero, zero)
    # ---- region A: e2 <= 51 (|x| < 2^52) -------------------------------
    # (x + M) - M is evaluated CLOSED-FORM instead of replicating the two
    # float additions in 1/8-fixed-point (~2x fewer ops).  Case analysis
    # on ulp(x + M), with M = 2^52 + 2^51 (even):
    #   * positives with e2 <= 50 and all negatives with e2 <= 50:
    #     |x| + M (resp. M - |x|) stays in [2^52, 2^53) -> ulp 1, and
    #     because M is even the tie-to-even parity of the sum equals the
    #     parity of |x|'s integer part -> n = ±RNE_int(|x|) exactly.
    #   * positive, e2 == 51 (x in [2^51, 2^52)): x + M >= 2^53 -> ulp 2:
    #     n = 2 * RNE(x / 2) with ties to even (M/2 = 2^51 + 2^50 even).
    #   * negative, e2 == 51: M - x in (2^51, 2^52) -> ulp 1/2, and x is
    #     ON the half grid (x = sig2 * 2^-1), so both float ops are EXACT
    #     and the int64 cast truncates: n = -(sig2 >> 1) = -floor(x).
    # RNE_int(|x|) = drop s = 52 - e2 bits of sig2 with guard/sticky
    # (s clamped to 63: sig2 < 2^53 keeps bits 62-63 clear, so kept and
    # guard are 0 and n = 0 for any e2 < -11, as the float dance gives).
    evt = e2 == 51
    pos = sign == 0
    sh = _u32(jnp.clip(jnp.where(evt & pos, _I32(2), _I32(52) - e2),
                       _I32(1), _I32(63)))    # e2 >= 52 lanes: region-
    # select below discards nA, the clamp only keeps shifts in range.
    # Raw masked shifts (amounts provably in [0, 31]) instead of the
    # generic shr64/shl64 helpers — this path is the encode hot spot.
    big = sh >= _u32(32)
    sa = sh & _u32(31)
    hi_sa = jnp.right_shift(sig2.hi, sa)
    kept = U64(jnp.where(big, _u32(0), hi_sa),
               jnp.where(big, hi_sa,
                         jnp.right_shift(sig2.lo, sa)
                         | jnp.left_shift(sig2.hi,
                                          (_u32(32) - sh) & _u32(31))))
    shm1 = sh - _u32(1)
    gbig = shm1 >= _u32(32)
    gm1 = shm1 & _u32(31)
    g = jnp.where(gbig, jnp.right_shift(sig2.hi, gm1),
                  jnp.right_shift(sig2.lo, gm1)) & _u32(1)
    # sticky = any bit of sig2 strictly below the guard bit
    one = _u32(1) + zero
    sub_mask = jnp.left_shift(one, gm1) - _u32(1)
    m_lo = jnp.where(gbig, _u32(0xFFFFFFFF), sub_mask)
    m_hi = jnp.where(gbig, sub_mask, _u32(0))
    sticky = ((sig2.lo & m_lo) | (sig2.hi & m_hi)) != 0
    upA = (g == 1) & (sticky | ((kept.lo & _u32(1)) == 1))
    n_mag = add64(kept, U64(zero, upA.astype(_U32)))
    # positive e2 == 51: unit-2 result is 2 * RNE(sig2 >> 2)
    n_mag = U64(jnp.where(evt & pos, (n_mag.hi << 1) | (n_mag.lo >> 31),
                          n_mag.hi),
                jnp.where(evt & pos, n_mag.lo << 1, n_mag.lo))
    # negative e2 == 51: exact half-grid value, cast truncates magnitude
    nev = evt & ~pos
    n_mag = U64(jnp.where(nev, sig2.hi >> 1, n_mag.hi),
                jnp.where(nev, (sig2.lo >> 1) | (sig2.hi << 31),
                          n_mag.lo))
    neg_nA = neg64(n_mag)
    nA = U64(jnp.where(pos, n_mag.hi, neg_nA.hi),
             jnp.where(pos, n_mag.lo, neg_nA.lo))

    if skip_wide:
        in_A = e2 <= 51
        return U64(jnp.where(in_A, nA.hi, int_min.hi),
                   jnp.where(in_A, nA.lo, int_min.lo))

    # ---- region B: 52 <= e2 <= 103 ------------------------------------
    # M is an exact multiple of ulp(x) = 2^(e2-52) here.  Negative x:
    # x + M cancels (|x| in [M/2, 2M] or |x| - M fits), both adds are
    # exact, r = x -> n = trunc(x) = ±sig2 << (e2-52).  Positive x:
    # sum = sig2 + M/ulp may need 54 bits (round RNE once), and
    # s - M = 2*s2 - Msc may need 54 bits again (round RNE once more).
    eb = jnp.minimum(jnp.maximum(e2 - 52, _I32(0)), _I32(51)).astype(_U32)
    # msc = M / ulp = 3 << (51 - eb), built from raw masked shifts (the
    # generic shr64 costs ~3x: its per-limb clamps don't fold for a
    # variable amount)
    k2 = _u32(51) - eb                             # in [0, 51]
    k2m = k2 & _u32(31)
    three = _u32(3) + zero
    big2 = k2 >= _u32(32)
    # hi: 3 << (k2-32) when big; (3 << k2) >> 32 = 3 >> (32-k2) else
    hi_small = jnp.where(k2 == _u32(0), _u32(0) + zero,
                         three >> ((_u32(32) - k2) & _u32(31)))
    msc = U64(jnp.where(big2, three << k2m, hi_small),
              jnp.where(big2, _u32(0) + zero, three << k2m))
    sumB = add64(sig2, msc)
    has54 = (sumB.hi >> 21) != 0                   # sum >= 2^53
    gB = sumB.lo & _u32(1)
    half = shr64(sumB, _u32(1))
    upB = (gB == 1) & ((half.lo & _u32(1)) == 1)   # RNE, no sticky below
    s2 = add64(half, U64(zero, upB.astype(_U32)))
    r54 = sub64(shl64(s2, _u32(1)), msc)
    need2 = (r54.hi >> 21) != 0                    # r >= 2^53: round again
    g2 = r54.lo & _u32(1)
    h2 = shr64(r54, _u32(1))
    up2 = (g2 == 1) & ((h2.lo & _u32(1)) == 1)
    r54b = shl64(add64(h2, U64(zero, up2.astype(_U32))), _u32(1))
    r_pos = U64(jnp.where(need2, r54b.hi, r54.hi),
                jnp.where(need2, r54b.lo, r54.lo))
    use_exact = (~has54) | (sign == 1)
    r_int = U64(jnp.where(use_exact, sig2.hi, r_pos.hi),
                jnp.where(use_exact, sig2.lo, r_pos.lo))
    # n = ± r_int << (e2 - 52); overflow (>= 2^63) -> INT64_MIN unless
    # the value is exactly -2^63 (same bit pattern either way).
    # raw masked shifts (eb in [0, 51]; see msc above)
    ebm = eb & _u32(31)
    bigE = eb >= _u32(32)
    lo_sh = r_int.lo << ebm
    cross = jnp.where(eb == _u32(0), _u32(0) + zero,
                      r_int.lo >> ((_u32(32) - eb) & _u32(31)))
    nB_mag = U64(jnp.where(bigE, lo_sh, (r_int.hi << ebm) | cross),
                 jnp.where(bigE, _u32(0) + zero, lo_sh))
    # overflow iff r_int >= 2^(115 - e2)  <=>  bitlen(r_int) > 115 - e2
    bl = jnp.where((r_int.hi >> 22) != 0, _I32(55),
                   jnp.where((r_int.hi >> 21) != 0, _I32(54),
                             jnp.where((r_int.hi >> 20) != 0, _I32(53),
                                       _I32(52))))
    ofB = bl > (115 - e2)
    neg_nB = neg64(nB_mag)
    nB = U64(jnp.where(sign == 1, neg_nB.hi, nB_mag.hi),
             jnp.where(sign == 1, neg_nB.lo, nB_mag.lo))
    nB = U64(jnp.where(ofB, int_min.hi, nB.hi),
             jnp.where(ofB, int_min.lo, nB.lo))

    # ---- select region -------------------------------------------------
    in_A = e2 <= 51
    in_D = e2 >= 104
    n = U64(jnp.where(in_A, nA.hi, nB.hi), jnp.where(in_A, nA.lo, nB.lo))
    n = U64(jnp.where(in_D, int_min.hi, n.hi),
            jnp.where(in_D, int_min.lo, n.lo))
    return n


def f64_to_i64_x86(a: U64) -> U64:
    """Truncating double -> int64 cast with x86 cvttsd2si semantics:
    NaN and out-of-range produce INT64_MIN (reference casts rely on this,
    see oracle.core._float_to_int_cast)."""
    sign = f64_sign(a)
    be = f64_biased_exp(a).astype(_I32)
    e = be - 1023
    sig = or64(f64_mantissa(a), U64.const(1 << 52, a.hi))  # normals only
    # |a| < 1 -> 0 (covers subnormals: be=0 -> e=-1023)
    small = e < 0
    # shift mantissa: value = sig * 2^(e-52)
    sl = jnp.clip(e - 52, 0, 63).astype(_U32)
    sr = jnp.clip(52 - e, 0, 63).astype(_U32)
    val = U64(jnp.where(e >= 52, shl64(sig, sl).hi, shr64(sig, sr).hi),
              jnp.where(e >= 52, shl64(sig, sl).lo, shr64(sig, sr).lo))
    mag_ok = (e < 63) | ((e == 63) & (sign == 1) & is_zero64(f64_mantissa(a)))
    res = U64(jnp.where(sign == 1, neg64(val).hi, val.hi),
              jnp.where(sign == 1, neg64(val).lo, val.lo))
    int_min = U64.const(1 << 63, a.hi)
    bad = ~mag_ok | f64_is_nan(a) | (be == 0x7FF)
    res = U64(jnp.where(bad, int_min.hi, res.hi),
              jnp.where(bad, int_min.lo, res.lo))
    return U64(jnp.where(small & ~bad, _u32(0), res.hi),
               jnp.where(small & ~bad, _u32(0), res.lo))


def f64_eq_ieee(a: U64, b: U64) -> jnp.ndarray:
    """IEEE == : bit equality, except +-0 are equal and NaN != NaN."""
    both_zero = f64_is_zero(a) & f64_is_zero(b)
    return (eq64(a, b) | both_zero) & ~f64_is_nan(a) & ~f64_is_nan(b)


def _order_key(a: U64) -> U64:
    """Map f64 bits to an unsigned key preserving numeric order."""
    sign = a.hi >> 31
    flip_all = U64(~a.hi, ~a.lo)
    flip_sign = U64(a.hi ^ _u32(0x80000000), a.lo)
    return U64(jnp.where(sign == 1, flip_all.hi, flip_sign.hi),
               jnp.where(sign == 1, flip_all.lo, flip_sign.lo))


def f64_lt(a: U64, b: U64) -> jnp.ndarray:
    ok = ~f64_is_nan(a) & ~f64_is_nan(b)
    both_zero = f64_is_zero(a) & f64_is_zero(b)
    return ok & ~both_zero & ltu64(_order_key(a), _order_key(b))


def f64_gt(a: U64, b: U64) -> jnp.ndarray:
    return f64_lt(b, a)


def f64_signbit(a: U64) -> jnp.ndarray:
    return f64_sign(a) == 1
