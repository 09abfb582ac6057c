"""Pallas kernel tests (interpret mode on CPU): layout converters,
FFOR pack/unpack tiles, fused falp decode vs the oracle.

Mirrors the reference generated-kernel tests
(publication/source_code/generated/*/.._falp_test.cpp:46-80): fused and
unfused decode must produce identical, exact results.
"""

import numpy as np
import pytest

from alp_tpu import constants as C
from alp_tpu.oracle import core as ocore
from alp_tpu.oracle import fastlanes as ofl
from alp_tpu.kernels import layout, falp

rng = np.random.default_rng(42)


def _tile_out_to_vals64(hi, lo):
    G = hi.shape[0]
    t = np.empty((G, 128, 128), np.uint32)
    t[:, 0::2, :] = np.asarray(lo)
    t[:, 1::2, :] = np.asarray(hi)
    return t


def _u64_planes(arr_u64, eb):
    lo = (arr_u64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (arr_u64 >> np.uint64(32)).astype(np.uint32)
    return (layout.lane_expand(lo, eb), layout.lane_expand(hi, eb))


@pytest.mark.parametrize("bw", [0, 1, 7, 17, 31, 32, 33, 45, 63, 64])
def test_layout_roundtrip_f64(bw):
    n = 16
    vals = rng.integers(0, 1 << min(bw, 62), size=(n, 1024),
                        dtype=np.int64) if bw else np.zeros((n, 1024),
                                                            np.int64)
    packed = np.stack([ofl.ffor_pack(v, bw, np.int64(0)) for v in vals])
    tile = layout.ref_to_tile(packed, bw, 64)
    back = layout.tile_to_ref(tile, bw, 64, n)
    assert (back == packed).all()


@pytest.mark.parametrize("bw", [0, 3, 13, 32, 45, 64])
def test_unffor_ffor_tile_f64(bw):
    n = 16
    base = np.int64(-37)
    lim = min(bw, 62)
    if bw == 0:
        vals = np.full((n, 1024), base, dtype=np.int64)
    else:
        vals = rng.integers(0, 1 << lim, size=(n, 1024),
                            dtype=np.int64) + base
    packed = np.stack([ofl.ffor_pack(v, bw, base) for v in vals])
    tile = layout.ref_to_tile(packed, bw, 64)
    b = np.full(n, base, np.int64).view(np.uint64)
    blo, bhi = _u64_planes(b, 64)
    hi, lo = falp.unffor_tile(tile, blo, bhi, bw=bw, element_bits=64)
    got = layout.tile_to_values(_tile_out_to_vals64(hi, lo), 64,
                                np.int64, n)
    assert (got == vals).all()
    if bw:
        vt = layout.values_to_tile(vals, 64)
        repacked = falp.ffor_tile(vt, blo, bhi, bw=bw, element_bits=64)
        assert (np.asarray(repacked) == tile).all()


@pytest.mark.parametrize("bw,fac,exp", [(0, 2, 3), (13, 5, 9), (33, 10, 14),
                                        (64, 18, 18), (20, 0, 0)])
def test_falp_f64_vs_oracle(bw, fac, exp):
    n = 16
    tc = C.DOUBLE
    base = np.int64(3)
    lim = min(bw, 40)
    if bw == 0:
        ints = np.full((n, 1024), base, dtype=np.int64)
    else:
        ints = rng.integers(0, 1 << lim, size=(n, 1024),
                            dtype=np.int64) + base
    expect = ocore.decode_value(ints, fac, exp, tc)
    packed = np.stack([ofl.ffor_pack(v, bw, base) for v in ints])
    tile = layout.ref_to_tile(packed, bw, 64)
    with np.errstate(over="ignore"):
        bf = np.full(n, base, np.int64) * tc.fact_arr[fac]
    blo, bhi = _u64_planes(bf.view(np.uint64), 64)
    flo, fhi = _u64_planes(
        np.full(n, tc.fact_arr[fac], np.int64).view(np.uint64), 64)
    frlo, frhi = _u64_planes(
        np.full(n, tc.frac_arr[exp], np.float64).view(np.uint64), 64)
    hi, lo = falp.falp_decode_f64(tile, blo, bhi, flo, fhi, frlo, frhi,
                                  bw=bw)
    got = layout.tile_to_values(_tile_out_to_vals64(hi, lo), 64,
                                np.float64, n)
    np.testing.assert_array_equal(got.view(np.uint64),
                                  expect.view(np.uint64))


@pytest.mark.parametrize("bw,fac,exp", [(0, 1, 2), (4, 3, 6), (17, 9, 10),
                                        (32, 5, 5)])
def test_falp_f32_vs_oracle(bw, fac, exp):
    n = 8
    tc = C.FLOAT
    base = np.int32(-5)
    lim = min(bw, 20)
    if bw == 0:
        ints = np.full((n, 1024), base, dtype=np.int32)
    else:
        ints = rng.integers(0, 1 << lim, size=(n, 1024),
                            dtype=np.int32) + base
    expect = ocore.decode_value(ints, fac, exp, tc)
    packed = np.stack([ofl.ffor_pack(v, bw, base) for v in ints])
    tile = layout.ref_to_tile(packed, bw, 32)
    b = layout.lane_expand(np.full(n, base, np.int32).view(np.uint32), 32)
    fa = layout.lane_expand(
        np.full(n, tc.fact_arr[fac], np.int32).view(np.uint32), 32)
    fr = layout.lane_expand(
        np.full(n, tc.frac_arr[exp], np.float32).view(np.uint32), 32)
    out = falp.falp_decode_f32(tile, b, fa, fr, bw=bw)
    got = layout.tile_to_values(np.asarray(out), 32, np.float32, n)
    np.testing.assert_array_equal(got.view(np.uint32),
                                  expect.view(np.uint32))


def _mid_planes(n, base, fac, exp, tc):
    """Plan-style metadata planes for the mid-variant kernel."""
    frac_u = np.full(n, tc.frac_arr[exp], np.float64).view(np.uint64)
    f_biased = int((frac_u[0] >> np.uint64(52)) & np.uint64(0x7FF))
    fsig = int((frac_u[0] & np.uint64((1 << 52) - 1)) | np.uint64(1 << 52))
    cc = (5 ** fac) * fsig
    s_c = 95 - (cc.bit_length() - 1)
    cc <<= s_c
    mk = lambda v: np.repeat(np.full(n, v, np.uint32).reshape(-1, 8), 16,
                             axis=1)
    return (mk(np.uint32(np.int32(base))), mk(cc >> 64),
            mk((cc >> 32) & 0xFFFFFFFF), mk(cc & 0xFFFFFFFF),
            mk(f_biased + 74 + fac - s_c))


@pytest.mark.parametrize("bw,fac,exp", [(0, 13, 14), (11, 13, 14),
                                        (16, 9, 14), (25, 4, 14),
                                        (31, 0, 18), (8, 18, 18)])
def test_falp_f64_mid_vs_oracle(bw, fac, exp):
    """Mid-variant kernel parity on its domain |n * 5^fac| < 2^53."""
    n = 16
    tc = C.DOUBLE
    lim_n = min((2**53 - 1) // 5**fac, (2**63 - 1) // 10**fac, 2**31 - 1)
    base = np.int64(max(-lim_n, -990))
    hi_n = min(lim_n, int(base) + (1 << bw) - 1) if bw else int(base)
    if bw == 0:
        ints = np.full((n, 1024), base, dtype=np.int64)
    else:
        ints = rng.integers(int(base), hi_n + 1, size=(n, 1024),
                            dtype=np.int64)
    expect = ocore.decode_value(ints, fac, exp, tc)
    packed = np.stack([ofl.ffor_pack(v, bw, base) for v in ints])
    tile = layout.ref_to_tile(packed, bw, 64)
    b32, c2, c1, c0, fb2 = _mid_planes(n, base, fac, exp, tc)
    hi, lo = falp.falp_decode_f64_mid(tile, b32, c2, c1, c0, fb2, bw=bw)
    got = layout.tile_to_values(_tile_out_to_vals64(hi, lo), 64,
                                np.float64, n)
    np.testing.assert_array_equal(got.view(np.uint64),
                                  expect.view(np.uint64))


@pytest.mark.parametrize("bw,fac,exp", [(0, 2, 3), (11, 3, 5), (20, 1, 14),
                                        (31, 0, 0)])
def test_falp_f64_small_vs_oracle(bw, fac, exp):
    """Small-variant kernel parity on its domain |n * 5^fac| < 2^32."""
    n = 16
    tc = C.DOUBLE
    lim_n = min((2**32 - 1) // 5**fac, 2**31 - 1)
    base = np.int64(-min(lim_n, 500))
    hi_n = min(lim_n, int(base) + (1 << bw) - 1) if bw else int(base)
    if bw == 0:
        ints = np.full((n, 1024), base, dtype=np.int64)
    else:
        ints = rng.integers(int(base), hi_n + 1, size=(n, 1024),
                            dtype=np.int64)
    expect = ocore.decode_value(ints, fac, exp, tc)
    packed = np.stack([ofl.ffor_pack(v, bw, base) for v in ints])
    tile = layout.ref_to_tile(packed, bw, 64)
    frac_u = np.full(n, tc.frac_arr[exp], np.float64).view(np.uint64)
    mk = lambda v: np.repeat(np.asarray(v, np.uint32).reshape(-1, 8)
                             if np.ndim(v) else
                             np.full(n, v, np.uint32).reshape(-1, 8), 16,
                             axis=1)
    fives = np.uint32((5 ** fac) & 0xFFFFFFFF)
    fsig_hi = np.uint32(((int(frac_u[0]) >> 32) & 0xFFFFF) | (1 << 20))
    fsig_lo = np.uint32(int(frac_u[0]) & 0xFFFFFFFF)
    fbias = np.uint32(((int(frac_u[0]) >> 52) & 0x7FF) + fac)
    hi, lo = falp.falp_decode_f64_small(
        tile, mk(np.uint32(np.int32(base))), mk(fives), mk(fsig_hi),
        mk(fsig_lo), mk(fbias), bw=bw)
    got = layout.tile_to_values(_tile_out_to_vals64(hi, lo), 64,
                                np.float64, n)
    np.testing.assert_array_equal(got.view(np.uint64),
                                  expect.view(np.uint64))


@pytest.mark.parametrize("bw,fac,exp", [(38, 1, 14), (42, 4, 14),
                                        (48, 0, 10), (52, 0, 0)])
def test_falp_f64_mid64_vs_oracle(bw, fac, exp):
    """mid64 kernel parity on its domain (|n*5^fac| < 2^53, 64-bit C')."""
    n = 16
    tc = C.DOUBLE
    lim_n = min((2**53 - 1) // 5**fac, (2**63 - 1) // 10**fac)
    base = np.int64(max(-(lim_n // 2), -(1 << 50)))
    hi_n = min(lim_n, int(base) + (1 << bw) - 1)
    ints = rng.integers(int(base), hi_n + 1, size=(n, 1024),
                        dtype=np.int64)
    expect = ocore.decode_value(ints, fac, exp, tc)
    packed = np.stack([ofl.ffor_pack(v, bw, base) for v in ints])
    tile = layout.ref_to_tile(packed, bw, 64)
    frac_u = int(np.float64(tc.frac_arr[exp]).view(np.uint64))
    fsig = (frac_u & ((1 << 52) - 1)) | (1 << 52)
    cc = (5 ** fac) * fsig
    assert cc.bit_length() <= 64
    s_c = 63 - (cc.bit_length() - 1)
    cc <<= s_c
    base_u = int(np.int64(base).view(np.uint64))
    mk = lambda v: np.repeat(np.full(n, v & 0xFFFFFFFF,
                                     np.uint32).reshape(-1, 8), 16, axis=1)
    hi, lo = falp.falp_decode_f64_mid64(
        tile, mk(base_u), mk(base_u >> 32), mk(cc >> 32), mk(cc),
        mk(((frac_u >> 52) & 0x7FF) + 74 + fac - s_c), bw=bw)
    got = layout.tile_to_values(_tile_out_to_vals64(hi, lo), 64,
                                np.float64, n)
    np.testing.assert_array_equal(got.view(np.uint64),
                                  expect.view(np.uint64))


@pytest.mark.parametrize("bw,fac,exp,flags", [
    (38, 5, 14, 0), (36, 6, 14, 0), (34, 8, 16, 0),
    (38, 5, 14, 2), (38, 5, 14, 10), (33, 9, 18, 10)])
def test_falp_f64_midc96_vs_oracle(bw, fac, exp, flags):
    """mid64c96 kernel parity on its domain: |n*5^fac| < 2^53 with a
    65..80-bit constant 5^fac * fsig (fac 5..9 — the reference's hard
    high-precision columns, e.g. CMS/1 and Medicare/1)."""
    n = 16
    tc = C.DOUBLE
    lim_n = min((2**53 - 1) // 5**fac, (2**63 - 1) // 10**fac)
    if flags & 8:
        base = np.int64(1)              # nozero: every n > 0
    elif flags & 2:
        base = np.int64(0)              # nonneg (n == 0 still possible)
    else:
        base = np.int64(max(-(lim_n // 2), -(1 << 50)))
    hi_n = min(lim_n, int(base) + (1 << bw) - 1)
    ints = rng.integers(int(base), hi_n + 1, size=(n, 1024),
                        dtype=np.int64)
    ints[0, :7] = base                  # FOR minimum hit, incl. n=0/1
    expect = ocore.decode_value(ints, fac, exp, tc)
    packed = np.stack([ofl.ffor_pack(v, bw, base) for v in ints])
    tile = layout.ref_to_tile(packed, bw, 64)
    frac_u = int(np.float64(tc.frac_arr[exp]).view(np.uint64))
    fsig = (frac_u & ((1 << 52) - 1)) | (1 << 52)
    cc = (5 ** fac) * fsig
    assert 64 < cc.bit_length() <= 80
    s_c = 95 - (cc.bit_length() - 1)
    cc <<= s_c
    assert cc & 0xFFFF == 0
    base_u = int(np.int64(base).view(np.uint64))
    mk = lambda v: np.repeat(np.full(n, v & 0xFFFFFFFF,
                                     np.uint32).reshape(-1, 8), 16, axis=1)
    hi, lo = falp.falp_decode_f64_midc96(
        tile, mk(base_u), mk(base_u >> 32), mk(cc >> 64), mk(cc >> 32),
        mk(cc), mk(((frac_u >> 52) & 0x7FF) + 106 + fac - s_c), bw=bw,
        nonneg=bool(flags & 2), nozero=bool(flags & 8))
    got = layout.tile_to_values(_tile_out_to_vals64(hi, lo), 64,
                                np.float64, n)
    np.testing.assert_array_equal(got.view(np.uint64),
                                  expect.view(np.uint64))


@pytest.mark.parametrize("flags", [0, 2, 10])
def test_falp_f64_mid64_flags_vs_oracle(flags):
    """mid64 nonneg/nozero static flags: identical output to the
    unflagged kernel on a domain where the flags' proofs hold."""
    n, bw, fac, exp = 16, 42, 1, 14
    tc = C.DOUBLE
    base = np.int64(1 if flags & 8 else 0)
    hi_n = min((2**53 - 1) // 5, int(base) + (1 << bw) - 1)
    ints = rng.integers(int(base), hi_n + 1, size=(n, 1024),
                        dtype=np.int64)
    ints[0, 0] = base
    expect = ocore.decode_value(ints, fac, exp, tc)
    packed = np.stack([ofl.ffor_pack(v, bw, base) for v in ints])
    tile = layout.ref_to_tile(packed, bw, 64)
    frac_u = int(np.float64(tc.frac_arr[exp]).view(np.uint64))
    fsig = (frac_u & ((1 << 52) - 1)) | (1 << 52)
    cc = (5 ** fac) * fsig
    s_c = 63 - (cc.bit_length() - 1)
    cc <<= s_c
    base_u = int(np.int64(base).view(np.uint64))
    mk = lambda v: np.repeat(np.full(n, v & 0xFFFFFFFF,
                                     np.uint32).reshape(-1, 8), 16, axis=1)
    hi, lo = falp.falp_decode_f64_mid64(
        tile, mk(base_u), mk(base_u >> 32), mk(cc >> 32), mk(cc),
        mk(((frac_u >> 52) & 0x7FF) + 74 + fac - s_c), bw=bw,
        nonneg=bool(flags & 2), nozero=bool(flags & 8))
    got = layout.tile_to_values(_tile_out_to_vals64(hi, lo), 64,
                                np.float64, n)
    np.testing.assert_array_equal(got.view(np.uint64),
                                  expect.view(np.uint64))


@pytest.mark.parametrize("variant,flags", [
    ("mid64", 32), ("mid64", 96), ("midc96", 32), ("midc96", 96)])
def test_falp_f64_wide_allneg_vs_oracle(variant, flags):
    """allneg (every n < 0: magnitude = (-base) - u) and maghi
    (min |n| >= 2^32: one-case normalize) static flags on the wide
    variants match the oracle bit-exactly."""
    n, bw = 16, 36
    fac, exp = (1, 14) if variant == "mid64" else (6, 16)
    tc = C.DOUBLE
    # all-negative domain: n in [base, base + 2^bw - 1], base + span < 0;
    # maghi additionally needs |n| >= 2^32 everywhere
    lo_mag = 2**33 if flags & 64 else 1
    base = np.int64(-(lo_mag + (1 << bw) - 1))
    hi_n = int(base) + (1 << bw) - 1
    assert hi_n < 0
    ints = rng.integers(int(base), hi_n + 1, size=(n, 1024),
                        dtype=np.int64)
    ints[0, 0] = base                   # FOR minimum (largest magnitude)
    ints[0, 1] = hi_n                   # smallest magnitude
    expect = ocore.decode_value(ints, fac, exp, tc)
    packed = np.stack([ofl.ffor_pack(v, bw, base) for v in ints])
    tile = layout.ref_to_tile(packed, bw, 64)
    frac_u = int(np.float64(tc.frac_arr[exp]).view(np.uint64))
    fsig = (frac_u & ((1 << 52) - 1)) | (1 << 52)
    cc = (5 ** fac) * fsig
    # allneg buckets stage -base (the kernel computes |n| = (-base) - u)
    nbase_u = int(np.int64(-base).view(np.uint64))
    mk = lambda v: np.repeat(np.full(n, v & 0xFFFFFFFF,
                                     np.uint32).reshape(-1, 8), 16, axis=1)
    kw = dict(bw=bw, allneg=True, maghi=bool(flags & 64))
    if variant == "mid64":
        s_c = 63 - (cc.bit_length() - 1)
        cc <<= s_c
        hi, lo = falp.falp_decode_f64_mid64(
            tile, mk(nbase_u), mk(nbase_u >> 32), mk(cc >> 32), mk(cc),
            mk(((frac_u >> 52) & 0x7FF) + 74 + fac - s_c), **kw)
    else:
        s_c = 95 - (cc.bit_length() - 1)
        cc <<= s_c
        hi, lo = falp.falp_decode_f64_midc96(
            tile, mk(nbase_u), mk(nbase_u >> 32), mk(cc >> 64),
            mk(cc >> 32), mk(cc),
            mk(((frac_u >> 52) & 0x7FF) + 106 + fac - s_c), **kw)
    got = layout.tile_to_values(_tile_out_to_vals64(hi, lo), 64,
                                np.float64, n)
    np.testing.assert_array_equal(got.view(np.uint64),
                                  expect.view(np.uint64))


@pytest.mark.parametrize("bw", [53, 60, 64])
def test_falp_f64_generic_fact1(bw):
    """fact1 static flag (fac == 0 bucket-wide: FACT multiply skipped)
    matches both the oracle and the unflagged generic kernel."""
    n, exp = 8, 7
    tc = C.DOUBLE
    base = np.int64(-(1 << 40))
    hi_n = (2**63 - 1) if bw >= 63 else int(base) + (1 << bw) - 1
    ints = rng.integers(int(base), hi_n, size=(n, 1024), dtype=np.int64)
    expect = ocore.decode_value(ints, 0, exp, tc)
    packed = np.stack([ofl.ffor_pack(v, bw, base) for v in ints])
    tile = layout.ref_to_tile(packed, bw, 64)
    bf = np.full(n, base, np.int64)
    blo, bhi = _u64_planes(bf.view(np.uint64), 64)
    flo, fhi = _u64_planes(np.full(n, 1, np.int64).view(np.uint64), 64)
    frlo, frhi = _u64_planes(
        np.full(n, tc.frac_arr[exp], np.float64).view(np.uint64), 64)
    hi1, lo1 = falp.falp_decode_f64(tile, blo, bhi, flo, fhi, frlo, frhi,
                                    bw=bw, fact1=True)
    hi0, lo0 = falp.falp_decode_f64(tile, blo, bhi, flo, fhi, frlo, frhi,
                                    bw=bw, fact1=False)
    got = layout.tile_to_values(_tile_out_to_vals64(hi1, lo1), 64,
                                np.float64, n)
    np.testing.assert_array_equal(got.view(np.uint64),
                                  expect.view(np.uint64))
    assert (np.asarray(hi1) == np.asarray(hi0)).all()
    assert (np.asarray(lo1) == np.asarray(lo0)).all()


def test_falp_f64_const_kernel():
    """const (bw == 0) broadcast kernel: every slot of a vector gets the
    per-vector constant bits."""
    n = 24
    import jax.numpy as jnp
    hi_c = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    lo_c = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    mk = lambda v: jnp.asarray(
        np.repeat(v.reshape(-1, 8), 16, axis=1))
    hi, lo = falp.falp_decode_f64_const(mk(hi_c), mk(lo_c))
    hi, lo = np.asarray(hi), np.asarray(lo)
    assert hi.shape == (n // 8, 64, 128)
    expect_hi = np.repeat(hi_c.reshape(-1, 8), 16, axis=1)
    for g in range(n // 8):
        assert (hi[g] == expect_hi[g][None, :]).all()
        assert (lo[g] == np.repeat(lo_c.reshape(-1, 8), 16,
                                   axis=1)[g][None, :]).all()
