"""Softfloat vs native IEEE-754: exhaustive fuzz on CPU.

The softfloat layer (alp_tpu.ops.softfloat) must be bit-identical to
hardware binary64 arithmetic (round-to-nearest-even) for every operation
ALP uses.  These tests fuzz random bit patterns — including subnormals,
powers of two, near-overflow, ties — against NumPy's native f64.
"""

import numpy as np
import pytest

import jax

import jax.numpy as jnp

from alp_tpu import constants as C
from alp_tpu.ops import softfloat as sf

N = 200_000
RNG = np.random.default_rng(2024)


def _random_doubles(n, include_specials=False):
    """Bit patterns stratified over exponent ranges (incl. subnormals)."""
    sign = RNG.integers(0, 2, n).astype(np.uint64) << np.uint64(63)
    # mix: uniform exponents, clustered near 1023 (typical data), subnormal
    exp = np.concatenate([
        RNG.integers(0, 2047, n // 3),
        RNG.integers(960, 1086, n // 3),
        np.zeros(n - 2 * (n // 3), dtype=np.int64),
    ]).astype(np.uint64) << np.uint64(52)
    mant = RNG.integers(0, 1 << 52, n, dtype=np.uint64)
    # sprinkle exact ties and powers of two
    mant[:: 97] = 0
    mant[1:: 101] = np.uint64(1 << 51)
    bits = sign | exp | mant
    if include_specials:
        bits[:8] = [0x7FF0000000000000, 0xFFF0000000000000,  # +-inf
                    0x7FF8000000000000,                       # nan
                    0x0000000000000000, 0x8000000000000000,  # +-0
                    0x0000000000000001,                       # min subnormal
                    0x7FEFFFFFFFFFFFFF,                       # max finite
                    0x3FF0000000000000]                       # 1.0
    return bits.view(np.float64)


def _pack(a: np.ndarray) -> sf.U64:
    return sf.u64_from_np(a)


def _unpack_f64(x: sf.U64) -> np.ndarray:
    return sf.u64_to_np(x).view(np.float64)


def _assert_bits_equal(result: np.ndarray, expect: np.ndarray, what: str):
    rb = result.view(np.uint64)
    eb = expect.view(np.uint64)
    # canonical-NaN tolerance: any NaN == any NaN
    nan_ok = np.isnan(result) & np.isnan(expect)
    ok = (rb == eb) | nan_ok
    if not ok.all():
        idx = np.nonzero(~ok)[0][:5]
        raise AssertionError(
            f"{what} mismatch at {idx}:\n got    {rb[idx]}\n expect {eb[idx]}")


jit_mul = jax.jit(sf.f64_mul)
jit_add = jax.jit(sf.f64_add)
jit_i2f = jax.jit(sf.i64_to_f64)
jit_f2i = jax.jit(sf.f64_to_i64_x86)


def test_u64_primitives():
    a = RNG.integers(0, 1 << 63, 50_000, dtype=np.uint64) * np.uint64(2) + 1
    b = RNG.integers(0, 1 << 63, 50_000, dtype=np.uint64)
    A, B = _pack(a.view(np.float64)), _pack(b.view(np.float64))
    with np.errstate(over="ignore"):
        np.testing.assert_array_equal(sf.u64_to_np(sf.add64(A, B)), a + b)
        np.testing.assert_array_equal(sf.u64_to_np(sf.sub64(A, B)), a - b)
        np.testing.assert_array_equal(sf.u64_to_np(sf.mul64_low(A, B)), a * b)
    k = RNG.integers(0, 65, 50_000).astype(np.uint32)
    shifted = sf.u64_to_np(sf.shl64(A, k))
    expect = np.where(k == 64, 0, a << (k.astype(np.uint64) % np.uint64(64)))
    np.testing.assert_array_equal(shifted, expect.astype(np.uint64))
    shifted = sf.u64_to_np(sf.shr64(A, k))
    expect = np.where(k == 64, 0, a >> (k.astype(np.uint64) % np.uint64(64)))
    np.testing.assert_array_equal(shifted, expect.astype(np.uint64))
    # clz
    lz = np.asarray(sf.clz64(A))
    expect = 64 - np.vectorize(lambda v: int(v).bit_length())(a)
    np.testing.assert_array_equal(lz, expect)


def test_umul64_wide():
    a = RNG.integers(0, 1 << 53, 50_000, dtype=np.uint64)
    b = RNG.integers(0, 1 << 53, 50_000, dtype=np.uint64)
    p = sf.umul64_wide(_pack(a.view(np.float64)), _pack(b.view(np.float64)))
    got = (int(0),)
    x3, x2, x1, x0 = (np.asarray(v, dtype=np.uint64) for v in p)
    got = (x3 << np.uint64(32) | x2).astype(object) * (1 << 64) + \
          (x1 << np.uint64(32) | x0).astype(object)
    expect = a.astype(object) * b.astype(object)
    assert (got == expect).all()


def test_f64_mul_fuzz():
    a = _random_doubles(N, include_specials=True)
    b = _random_doubles(N, include_specials=True)
    with np.errstate(all="ignore"):
        expect = a * b
    got = _unpack_f64(jit_mul(_pack(a), _pack(b)))
    _assert_bits_equal(got, expect, "f64_mul")


def test_f64_mul_powers_of_ten():
    """The exact multiplies ALP performs: v * 10^e and n * 10^-f."""
    from alp_tpu.constants import DOUBLE
    v = _random_doubles(50_000)
    for table in (DOUBLE.exp_arr, DOUBLE.frac_arr):
        for c in table[::3]:
            cc = np.full_like(v, c)
            with np.errstate(all="ignore"):
                expect = v * cc
            got = _unpack_f64(jit_mul(_pack(v), _pack(cc)))
            _assert_bits_equal(got, expect, f"mul by {c}")


def test_f64_add_fuzz():
    a = _random_doubles(N, include_specials=True)
    b = _random_doubles(N, include_specials=True)
    with np.errstate(all="ignore"):
        expect = a + b
    got = _unpack_f64(jit_add(_pack(a), _pack(b)))
    _assert_bits_equal(got, expect, "f64_add")


def test_f64_add_magic():
    """The magic-number round trick: (x + M) - M (encoder.hpp:87)."""
    M = np.float64(0x0018000000000000)
    scale = np.float64(2) ** RNG.integers(-30, 70, N)
    x = _random_doubles(N) * scale
    x = np.where(np.isfinite(x), x, 1.0)
    expect = (x + M) - M
    Mv = np.full_like(x, M)
    got = _unpack_f64(jit_add(jit_add(_pack(x), _pack(Mv)),
                              _pack(-Mv)))
    _assert_bits_equal(got, expect, "magic trick")


def test_f64_add_cancellation():
    """Near-total cancellation and tie cases."""
    a = _random_doubles(N // 2)
    ulp = np.finfo(np.float64).eps
    b = -a * (1 + ulp * RNG.integers(-2, 3, N // 2))
    expect = a + b
    got = _unpack_f64(jit_add(_pack(a), _pack(b)))
    _assert_bits_equal(got, expect, "cancellation")


def test_i64_to_f64():
    x = np.concatenate([
        RNG.integers(-(1 << 62), 1 << 62, N, dtype=np.int64),
        RNG.integers(-(1 << 30), 1 << 30, N // 4, dtype=np.int64),
        np.array([0, 1, -1, (1 << 63) - 1, -(1 << 63), 1 << 53, (1 << 53) + 1,
                  -(1 << 53) - 1, (1 << 62) + (1 << 9)], dtype=np.int64),
    ])
    expect = x.astype(np.float64)
    got = _unpack_f64(jit_i2f(sf.u64_from_np(x)))
    _assert_bits_equal(got, expect, "i64_to_f64")


def test_f64_to_i64_x86():
    a = np.concatenate([
        _random_doubles(N),
        RNG.integers(-(1 << 55), 1 << 55, N // 4).astype(np.float64),
        np.array([0.0, -0.0, 0.5, -0.5, 1.5, -1.5, 2.0 ** 62, -(2.0 ** 63),
                  2.0 ** 63, np.inf, -np.inf, np.nan, 2.0 ** 63 - 1024.0]),
    ])
    # x86 semantics: out-of-range/NaN -> INT64_MIN; else trunc toward zero
    lo, hi = np.float64(-(2.0 ** 63)), np.float64(2.0 ** 63)
    with np.errstate(invalid="ignore"):
        ok = (a >= lo) & (a < hi)
        expect = np.where(ok, np.where(ok, a, 0).astype(np.int64),
                          np.int64(-(1 << 63)))
    got = sf.u64_to_np(jit_f2i(_pack(a))).view(np.int64)
    np.testing.assert_array_equal(got, expect)


def test_comparisons():
    a = _random_doubles(N, include_specials=True)
    b = _random_doubles(N, include_specials=True)
    b[::5] = a[::5]  # force equal cases
    A, B = _pack(a), _pack(b)
    np.testing.assert_array_equal(np.asarray(sf.f64_eq_ieee(A, B)), a == b)
    with np.errstate(invalid="ignore"):
        np.testing.assert_array_equal(np.asarray(sf.f64_lt(A, B)), a < b)
        np.testing.assert_array_equal(np.asarray(sf.f64_gt(A, B)), a > b)
    np.testing.assert_array_equal(np.asarray(sf.f64_is_nan(A)), np.isnan(a))
    np.testing.assert_array_equal(np.asarray(sf.f64_is_finite(A)),
                                  np.isfinite(a))


class TestFastDecodeVariants:
    """Randomized cross-checks of the single-rounding fast paths against
    numpy's exact f64 (the two-step reference semantics collapse to one
    rounding on these domains; see kernels/decode.py build_plan)."""

    def _frac_parts(self, e):
        frac = C.DOUBLE.frac_arr[e]
        fb = frac.view(np.uint64)
        return frac, fb

    def test_i32c96_fuzz(self):
        rng = np.random.default_rng(0)
        N = 60000
        f = rng.integers(0, 19, N)
        e = rng.integers(0, 19, N)
        o5 = np.array([5**k for k in range(19)], object)[f]
        lim = np.array([min((2**53 - 1) // int(o), 2**31 - 1,
                            (2**63 - 1) // 10**int(k))
                        for o, k in zip(o5, f)])
        n = np.array([rng.integers(-l, l + 1) for l in lim])
        frac = C.DOUBLE.frac_arr[e]
        expect = (n * C.DOUBLE.fact_arr[f]).astype(np.float64) * frac
        fb = frac.view(np.uint64)
        fsig = ((fb & np.uint64((1 << 52) - 1)) | np.uint64(1 << 52))
        f_biased = ((fb >> np.uint64(52)) & np.uint64(0x7FF)).astype(
            np.int64)
        cc = np.array([int(a) * int(b) for a, b in zip(o5, fsig)], object)
        msb = np.array([c.bit_length() - 1 for c in cc])
        s_c = 95 - msb
        cp = np.array([int(c) << int(s) for c, s in zip(cc, s_c)], object)
        c0 = np.array([int(c) & 0xFFFFFFFF for c in cp], np.uint32)
        c1 = np.array([(int(c) >> 32) & 0xFFFFFFFF for c in cp], np.uint32)
        c2 = np.array([(int(c) >> 64) for c in cp], np.uint32)
        fb2 = (f_biased + 74 + f - s_c).astype(np.uint32)
        out = sf.i32c96_to_f64(
            jnp.asarray(n.astype(np.int32).view(np.uint32)),
            jnp.asarray(c2), jnp.asarray(c1), jnp.asarray(c0),
            jnp.asarray(fb2))
        got = ((np.asarray(out.hi, np.uint64) << np.uint64(32))
               | np.asarray(out.lo, np.uint64))
        np.testing.assert_array_equal(got, expect.view(np.uint64))
        # flagged sub-domains must agree too
        for kw, m in ((dict(c0zero=True), c0 == 0),
                      (dict(nonneg=True), n >= 0),
                      (dict(cheap_msb=True), np.abs(n) < 2**24)):
            idx = np.nonzero(m)[0]
            o = sf.i32c96_to_f64(
                jnp.asarray(n[idx].astype(np.int32).view(np.uint32)),
                jnp.asarray(c2[idx]), jnp.asarray(c1[idx]),
                jnp.asarray(c0[idx]), jnp.asarray(fb2[idx]), **kw)
            g = ((np.asarray(o.hi, np.uint64) << np.uint64(32))
                 | np.asarray(o.lo, np.uint64))
            np.testing.assert_array_equal(
                g, expect.view(np.uint64)[idx], err_msg=str(kw))

    def test_i32fact_fuzz(self):
        rng = np.random.default_rng(1)
        N = 60000
        f = rng.integers(0, 14, N)            # 5^f < 2^32
        e = rng.integers(0, 19, N)
        o5 = np.array([5**k for k in range(19)], object)[f]
        lim = np.array([min((2**32 - 1) // int(o), 2**31 - 1)
                        for o in o5])
        n = np.array([rng.integers(-l, l + 1) for l in lim])
        frac = C.DOUBLE.frac_arr[e]
        expect = (n * C.DOUBLE.fact_arr[f]).astype(np.float64) * frac
        fb = frac.view(np.uint64)
        out = sf.i32fact_to_f64_times_normal(
            jnp.asarray(n.astype(np.int32).view(np.uint32)),
            jnp.asarray(np.array([int(o) & 0xFFFFFFFF for o in o5],
                                 np.uint32)),
            jnp.asarray((((fb >> np.uint64(32)) & np.uint64(0xFFFFF))
                         | np.uint64(1 << 20)).astype(np.uint32)),
            jnp.asarray((fb & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray((((fb >> np.uint64(52)) & np.uint64(0x7FF))
                         + f.astype(np.uint64)).astype(np.uint32)))
        got = ((np.asarray(out.hi, np.uint64) << np.uint64(32))
               | np.asarray(out.lo, np.uint64))
        np.testing.assert_array_equal(got, expect.view(np.uint64))


def test_alo_zero_prune_exact():
    """alo_zero (|n| < 2^48 wide / < 2^16 mid) must be bit-identical to
    the full multiply on boundary and random magnitudes."""
    import numpy as np
    import jax.numpy as jnp
    from alp_tpu.ops import softfloat as sf
    from alp_tpu.ops.softfloat import U64
    from alp_tpu import constants as C

    rng = np.random.default_rng(31)
    mags = np.concatenate([
        rng.integers(1, 2**48, 500, dtype=np.uint64),
        np.array([1, 2, 2**16 - 1, 2**16, 2**32 - 1, 2**32,
                  2**47, 2**48 - 1], np.uint64)])
    hi = jnp.asarray((mags >> 32).astype(np.uint32))
    lo = jnp.asarray((mags & 0xFFFFFFFF).astype(np.uint32))
    for fac, exp in ((0, 9), (3, 12)):
        frac_u = int(np.float64(C.DOUBLE.frac_arr[exp]).view(np.uint64))
        fsig = (frac_u & ((1 << 52) - 1)) | (1 << 52)
        cc = (5 ** fac) * fsig
        s_c = 63 - (cc.bit_length() - 1)
        cc <<= s_c
        fb = (frac_u >> 52) & 0x7FF
        c1 = jnp.full(len(mags), np.uint32(cc >> 32), jnp.uint32)
        c0 = jnp.full(len(mags), np.uint32(cc & 0xFFFFFFFF), jnp.uint32)
        fb2 = jnp.full(len(mags), np.uint32(fb + 74 + fac - s_c),
                       jnp.uint32)
        a = sf.u64mag_c64_to_f64(U64(hi, lo), 0, c1, c0, fb2)
        b = sf.u64mag_c64_to_f64(U64(hi, lo), 0, c1, c0, fb2,
                                 alo_zero=True)
        assert (np.asarray(a.hi) == np.asarray(b.hi)).all()
        assert (np.asarray(a.lo) == np.asarray(b.lo)).all()
    for fac, exp in ((5, 14), (7, 16)):
        frac_u = int(np.float64(C.DOUBLE.frac_arr[exp]).view(np.uint64))
        fsig = (frac_u & ((1 << 52) - 1)) | (1 << 52)
        cc = (5 ** fac) * fsig
        s_c = 95 - (cc.bit_length() - 1)
        cc <<= s_c
        fb = (frac_u >> 52) & 0x7FF
        mk = lambda v: jnp.full(len(mags), np.uint32(v & 0xFFFFFFFF),
                                jnp.uint32)
        c2p, c1p, c0p = mk(cc >> 64), mk(cc >> 32), mk(cc)
        fb2 = mk(fb + 106 + fac - s_c)
        a = sf.u64mag_c96_to_f64(U64(hi, lo), 0, c2p, c1p, c0p, fb2)
        b = sf.u64mag_c96_to_f64(U64(hi, lo), 0, c2p, c1p, c0p, fb2,
                                 alo_zero=True)
        assert (np.asarray(a.hi) == np.asarray(b.hi)).all()
        assert (np.asarray(a.lo) == np.asarray(b.lo)).all()
    # mid twin: |n| < 2^16
    n16 = np.concatenate([
        rng.integers(-(2**16) + 1, 2**16, 500, dtype=np.int64),
        np.array([1, -1, 2**16 - 1, -(2**16) + 1, 255, -255], np.int64)])
    nj = jnp.asarray(n16.astype(np.int32).view(np.uint32))
    for fac, exp in ((2, 10),):
        frac_u = int(np.float64(C.DOUBLE.frac_arr[exp]).view(np.uint64))
        fsig = (frac_u & ((1 << 52) - 1)) | (1 << 52)
        cc = (5 ** fac) * fsig
        s_c = 95 - (cc.bit_length() - 1)
        cc <<= s_c
        fb = (frac_u >> 52) & 0x7FF
        mk = lambda v: jnp.full(len(n16), np.uint32(v & 0xFFFFFFFF),
                                jnp.uint32)
        c2p, c1p, c0p = mk(cc >> 64), mk(cc >> 32), mk(cc)
        fb2 = mk(fb + 106 + fac - s_c)
        a = sf.i32c96_to_f64(nj, c2p, c1p, c0p, fb2)
        b = sf.i32c96_to_f64(nj, c2p, c1p, c0p, fb2, alo_zero=True)
        assert (np.asarray(a.hi) == np.asarray(b.hi)).all()
        assert (np.asarray(a.lo) == np.asarray(b.lo)).all()
