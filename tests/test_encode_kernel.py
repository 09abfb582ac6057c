"""Device ALP f64 encode: unpacked softfloat + integer magic rounding
vs the oracle, elementwise and through the Pallas kernel (interpret)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alp_tpu import constants as C
from alp_tpu.kernels import layout
from alp_tpu.kernels.encode import alp_encode_f64_tiles, encode_verify_f64
from alp_tpu.ops.softfloat import U64, u64_to_np
from alp_tpu.oracle import core as ocore

tc = C.DOUBLE
rng = np.random.default_rng(11)


def _split(u):
    return U64(jnp.asarray((u >> np.uint64(32)).astype(np.uint32)),
               jnp.asarray((u & np.uint64(0xFFFFFFFF)).astype(np.uint32)))


def _const(u):
    u = int(u)
    hi, lo = jnp.uint32(u >> 32), jnp.uint32(u & 0xFFFFFFFF)
    sig = U64((hi & jnp.uint32(0xFFFFF)) | jnp.uint32(1 << 20), lo)
    return sig, jnp.int32((u >> 52) & 0x7FF)


def _oracle(vals, f, e):
    replaced = ocore.replace_specials(vals, tc)
    n = ocore.encode_value_unsafe(replaced, f, e, tc)
    dec = ocore.decode_value(n, f, e, tc)
    return n, dec.view(np.uint64) != replaced.view(np.uint64)


@pytest.mark.parametrize("e,f", [(14, 12), (18, 0), (9, 5), (0, 0),
                                 (16, 16)])
def test_encode_verify_matches_oracle(e, f):
    vals = np.concatenate([
        np.round(rng.uniform(-1e4, 1e4, 1500), 3),
        rng.uniform(-1e16, 1e16, 800),
        rng.standard_normal(500) * np.exp(rng.uniform(-250, 250, 500)),
        np.array([0.0, -0.0, np.nan, np.inf, -np.inf, 2.0**52,
                  -(2.0**52), 1e308, 0.1]),
    ])
    c1 = _const(np.float64(tc.exp_arr[e]).view(np.uint64))
    c2 = _const(np.float64(tc.frac_arr[f]).view(np.uint64))
    fact = np.uint64(np.int64(tc.fact_arr[f]).view(np.uint64))
    fr = _const(np.float64(tc.frac_arr[e]).view(np.uint64))
    factu = U64(jnp.uint32(int(fact) >> 32), jnp.uint32(int(fact) & 0xFFFFFFFF))
    n, exc, rare = jax.jit(lambda vb: encode_verify_f64(
        vb, *c1, *c2, factu, *fr))(_split(vals.view(np.uint64)))
    n_np = u64_to_np(n).view(np.int64)
    rare_np = np.asarray(rare)
    n_exp, exc_exp = _oracle(vals, f, e)
    ok = (n_np == n_exp) | rare_np
    assert ok.all(), np.nonzero(~ok)
    assert ((np.asarray(exc) == exc_exp) | rare_np).all()
    # only subnormals are rare
    assert rare_np.sum() == ((np.abs(vals) < 2.3e-308)
                             & (vals != 0) & np.isfinite(vals)).sum()


@pytest.mark.parametrize("e,f", [(14, 12), (18, 0), (0, 0)])
def test_encode_verify_skip_wide(e, f):
    """skip_wide drops region-B arithmetic: non-special values with
    |x| >= 2^52 must come back flagged rare; everything else matches
    the oracle exactly."""
    vals = np.concatenate([
        np.round(rng.uniform(-1e4, 1e4, 1000), 3),
        rng.uniform(-1e16, 1e16, 500),
        np.array([0.0, -0.0, np.nan, np.inf, 2.0**52, 2.0**60, 1e308]),
    ])
    c1 = _const(np.float64(tc.exp_arr[e]).view(np.uint64))
    c2 = _const(np.float64(tc.frac_arr[f]).view(np.uint64))
    fact = np.uint64(np.int64(tc.fact_arr[f]).view(np.uint64))
    fr = _const(np.float64(tc.frac_arr[e]).view(np.uint64))
    factu = U64(jnp.uint32(int(fact) >> 32),
                jnp.uint32(int(fact) & 0xFFFFFFFF))
    n, exc, rare = jax.jit(lambda vb: encode_verify_f64(
        vb, *c1, *c2, factu, *fr, skip_wide=True))(
            _split(vals.view(np.uint64)))
    n_np = u64_to_np(n).view(np.int64)
    rare_np = np.asarray(rare)
    n_exp, exc_exp = _oracle(vals, f, e)
    special = ~np.isfinite(vals) | (vals.view(np.uint64)
                                    == np.uint64(1 << 63))
    ok = (n_np == n_exp) | rare_np | special
    assert ok.all(), np.nonzero(~ok)
    assert ((np.asarray(exc) == exc_exp) | rare_np).all()
    assert np.asarray(exc)[special].all()
    # any non-special value whose scaled |x| >= 2^52 must be rare (or
    # exactly INT64_MIN-territory, region D, which needs no fixup)
    with np.errstate(over="ignore", invalid="ignore"):
        x = np.abs(vals * tc.exp_arr[e] * tc.frac_arr[f])
    wide = (x >= 2.0**52) & (x < 2.0**104) & ~special & (vals != 0)
    assert (rare_np | ~wide | special).all()


def test_compress_device_wide_rare_fixup():
    """A column mixing normal decimals with |x| >= 2^52 values: the
    device path must re-encode the affected vectors host-side and stay
    byte-identical to the host engine."""
    import jax as _jax
    if _jax.default_backend() == "tpu":
        pytest.skip("interpret-mode test")
    from alp_tpu import container
    from alp_tpu.device_compress import compress_device
    rng2 = np.random.default_rng(77)
    data = np.round(rng2.uniform(-100, 100, 3000), 2)
    data[100] = 2.0**53          # huge integer: wide region, encodable
    data[2500] = -(2.0**55)
    dev = compress_device(data)
    host = container.compress(data)
    assert dev.to_bytes() == host.to_bytes()


def test_encode_kernel_tiles():
    n = 16
    vals = np.round(rng.uniform(-500, 500, (n, 1024)), 2)
    vals[0, :4] = [np.nan, -np.inf, -0.0, 0.0]
    e, f = 14, 12
    bits = vals.view(np.uint64)
    vhi = jnp.asarray(layout.plane_to_tile(
        (bits >> np.uint64(32)).astype(np.uint32), 64))
    vlo = jnp.asarray(layout.plane_to_tile(
        (bits & np.uint64(0xFFFFFFFF)).astype(np.uint32), 64))

    def planes(u):
        return (jnp.asarray(layout.lane_expand(
                    (u & np.uint64(0xFFFFFFFF)).astype(np.uint32), 64)),
                jnp.asarray(layout.lane_expand(
                    (u >> np.uint64(32)).astype(np.uint32), 64)))

    exp_a = np.full(n, e)
    fac_a = np.full(n, f)
    c1lo, c1hi = planes(tc.exp_arr[exp_a].view(np.uint64))
    c2lo, c2hi = planes(tc.frac_arr[fac_a].view(np.uint64))
    flo, fhi = planes(tc.fact_arr[fac_a].view(np.uint64))
    frlo, frhi = planes(tc.frac_arr[exp_a].view(np.uint64))
    nhi, nlo, excp, rarep = alp_encode_f64_tiles(
        vhi, vlo, c1lo, c1hi, c2lo, c2hi, flo, fhi, frlo, frhi)

    G = nhi.shape[0]
    t = np.empty((G, 128, 128), np.uint32)
    t[:, 0::2, :] = np.asarray(nlo)
    t[:, 1::2, :] = np.asarray(nhi)
    got_n = layout.tile_to_values(t, 64, np.int64, n)
    t[:, 0::2, :] = np.asarray(excp)
    t[:, 1::2, :] = 0
    got_exc = layout.tile_to_values(t, 64, np.uint64, n) != 0

    n_exp, exc_exp = _oracle(vals.reshape(-1), f, e)
    assert not np.asarray(rarep).any()
    # special values (NaN/Inf/-0.0) land in the magic round's skipped
    # wide region: their n is a don't-care by contract (always flagged
    # exceptions, patched before pack/analyze) — compare the rest
    flat = vals.reshape(-1)
    special = ~np.isfinite(flat) | (flat.view(np.uint64)
                                    == np.uint64(1 << 63))
    np.testing.assert_array_equal(got_n.reshape(-1)[~special],
                                  n_exp[~special])
    assert got_exc.reshape(-1)[special].all()
    np.testing.assert_array_equal(got_exc.reshape(-1), exc_exp)


def test_analyze_planes_and_ffor_planes():
    from alp_tpu.kernels.encode import analyze_planes_f64
    from alp_tpu.kernels import falp as kfalp
    from alp_tpu.oracle import core as ocore
    from alp_tpu.oracle import fastlanes as ofl

    n = 16
    ints = rng.integers(-(1 << 30), 1 << 30, (n, 1024), dtype=np.int64)
    bits = ints.view(np.uint64)
    nhi = jnp.asarray(layout.plane_to_tile(
        (bits >> np.uint64(32)).astype(np.uint32), 64))
    nlo = jnp.asarray(layout.plane_to_tile(
        (bits & np.uint64(0xFFFFFFFF)).astype(np.uint32), 64))
    bw, base, mx = analyze_planes_f64(nhi, nlo)
    # group-major vector order == original order (vectors are consecutive)
    for v in range(n):
        obw, obase = ocore.analyze_ffor(ints[v], tc)
        assert int(bw[v]) == obw, v
        assert int(base[v]) == obase, v

    # pack with a shared bw via the planes kernel, compare vs oracle
    target_bw = int(np.asarray(bw).max())
    bases = np.asarray(base)
    blo = jnp.asarray(layout.lane_expand(
        (bases.view(np.uint64) & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        64))
    bhi = jnp.asarray(layout.lane_expand(
        (bases.view(np.uint64) >> np.uint64(32)).astype(np.uint32), 64))
    packed_tiles = kfalp.ffor_planes_f64(nhi, nlo, blo, bhi, bw=target_bw)
    ref = layout.tile_to_ref(np.asarray(packed_tiles), target_bw, 64, n)
    for v in range(n):
        expect = ofl.ffor_pack(ints[v], target_bw, np.int64(bases[v]))
        np.testing.assert_array_equal(ref[v], expect)


def test_compress_device_planes_path():
    """Device-resident input: value bit planes in, bit-identical
    CompressedColumn out — no full-column host fetch."""
    import jax.numpy as jnp
    import math
    from alp_tpu import container
    from alp_tpu.device_compress import compress_device, _u64_split
    from alp_tpu.kernels import layout
    from alp_tpu import constants as C

    rng = np.random.default_rng(17)
    data = np.round(rng.uniform(-900, 900, 3 * 1024 + 500), 2)
    vectors, n_vec = container._pad_to_vectors(data)
    n_pad = layout.pad_vectors(n_vec, 64)
    vp = np.zeros((n_pad, C.VECTOR_SIZE), np.float64)
    vp[:n_vec] = vectors
    lo32, hi32 = _u64_split(vp)
    vhi = jnp.asarray(layout.plane_to_tile(hi32, 64))
    vlo = jnp.asarray(layout.plane_to_tile(lo32, 64))

    dev = compress_device(planes=(vhi, vlo), n_values=len(data))
    host = container.compress(data)
    assert dev.to_bytes() == host.to_bytes()


def test_encode_f32_kernel_vs_ops():
    """f32 encode kernel parity with the batched ops encode (native f32
    semantics: magic rounding, cvttss2si cast, decode-verify)."""
    import jax.numpy as jnp
    from alp_tpu.kernels.encode import (alp_encode_f32_tiles,
                                        analyze_planes_f32)
    from alp_tpu.kernels import layout
    from alp_tpu.ops import alp as oalp
    from alp_tpu.ops.numerics import numerics_for
    from alp_tpu import constants as C

    rng = np.random.default_rng(3)
    n = 8
    vals = np.round(rng.uniform(-1000, 1000, (n, 1024)), 2).astype(
        np.float32)
    vals[0, 5] = np.nan
    vals[1, 7] = np.inf
    vals[2, 9] = -0.0
    vals[3, 11] = np.float32(1e30)          # impossible-to-encode
    fac = np.full(n, 2, np.int32)
    exp = np.full(n, 4, np.int32)

    nm = numerics_for(np.float32)
    expect_n, expect_exc = oalp.encode_vectors(
        nm, nm.values_from_np(vals), jnp.asarray(fac), jnp.asarray(exp))
    expect_n = np.asarray(expect_n)
    expect_exc = np.asarray(expect_exc)

    tc = C.FLOAT
    tiles = jnp.asarray(layout.plane_to_tile(vals.view(np.uint32), 32))

    def expand(v):
        return jnp.asarray(layout.lane_expand(np.asarray(v, np.uint32),
                                              32))

    n_p, exc_p = alp_encode_f32_tiles(
        tiles, expand(tc.exp_arr[exp].view(np.uint32)),
        expand(tc.frac_arr[fac].view(np.uint32)),
        expand(tc.fact_arr[fac].astype(np.int32).view(np.uint32)),
        expand(tc.frac_arr[exp].view(np.uint32)))
    got_n = layout.tile_to_values(np.asarray(n_p), 32, np.int32, n)
    got_exc = layout.tile_to_values(np.asarray(exc_p), 32, np.uint32, n)
    # ops patches exception slots with the first ok value; the kernel
    # reports raw n + exc mask — compare the mask and non-exc ints
    np.testing.assert_array_equal(got_exc.astype(bool), expect_exc)
    ok = ~expect_exc
    np.testing.assert_array_equal(got_n[ok], expect_n[ok])
    # analyze on kernel-patched planes should match ops analyze of the
    # patched ints (patch host-side here for the comparison)
    bw, base, mx = analyze_planes_f32(n_p)


def test_compress_device_f32_bit_identical():
    from alp_tpu import container
    from alp_tpu.device_compress import compress_device
    rng = np.random.default_rng(19)
    cases = [
        np.round(rng.uniform(-900, 900, 3000), 2).astype(np.float32),
        np.round(rng.uniform(0, 10, 2048), 1).astype(np.float32),
        np.array([1.5, -0.0, np.nan, np.inf, 2.25] * 300, np.float32),
        np.full(1500, np.float32(7.5)),
        # >= 2 full rowgroups: exercises the DEVICE planner (scorer +
        # vote + second-level accept scan), incl. a mixed-decimals
        # column that keeps several (e, f) candidates per rowgroup
        np.concatenate([np.round(rng.uniform(-50, 50, 52 * 1024),
                                 d).astype(np.float32)
                        for d in (1, 2, 0, 2)]),
        # subnormal samples -> rare flag -> host re-plan, still identical
        np.concatenate([np.full(103 * 1024, np.float32(1e-44)),
                        np.round(rng.uniform(0, 9, 103 * 1024),
                                 1).astype(np.float32)]),
    ]
    for data in cases:
        dev = compress_device(data)
        host = container.compress(data)
        assert dev.to_bytes() == host.to_bytes()


def test_device_compress_bench_steps_interpret():
    """The slope-timed bench steps (full device pipeline + patched pack)
    run in interpret mode and are deterministic."""
    import jax.numpy as jnp
    from alp_tpu import container
    from alp_tpu import device_compress as dcz
    from alp_tpu.kernels import layout

    rng = np.random.default_rng(12)
    data = np.round(rng.normal(40, 20, 200 * 1024), 2)
    vectors, n_vec = container._pad_to_vectors(data)
    lo32, hi32 = dcz._u64_split(vectors)
    vhi = jnp.asarray(layout.plane_to_tile(hi32, 64))
    vlo = jnp.asarray(layout.plane_to_tile(lo32, 64))
    step = dcz.make_device_compress_step(n_vec, k_max=5)
    c1 = step(jnp.uint32(0), vhi, vlo)
    c2 = step(jnp.uint32(0), vhi, vlo)
    assert int(c1) == int(c2)

    cc = dcz.compress_device(data)
    assert cc.to_bytes() == container.compress(data).to_bytes()
    from alp_tpu.kernels import encode as kencode
    from alp_tpu import constants as C
    tc = C.DOUBLE
    meta = []
    for tab, idx in ((tc.exp_arr, cc.exp), (tc.frac_arr, cc.fac),
                     (tc.fact_arr, cc.fac), (tc.frac_arr, cc.exp)):
        lo, hi = dcz._u64_split(np.ascontiguousarray(tab[idx]))
        meta += [dcz._expand(lo, n_vec), dcz._expand(hi, n_vec)]
    nhi, nlo, exc, stats = kencode.alp_encode_f64_tiles_stats(
        vhi, vlo, *meta)
    _, _, _, _, _, fill_lo, fill_hi = dcz.finalize_encode_stats(
        stats, nhi, nlo)
    stepb = dcz.make_pack_step(cc, np.asarray(fill_lo),
                               np.asarray(fill_hi))
    p1 = stepb(jnp.uint32(0), nhi, nlo, exc)
    p2 = stepb(jnp.uint32(0), nhi, nlo, exc)
    assert int(p1) == int(p2)


def test_compress_device_rd_bit_identical():
    """Device-side ALP_RD compress (round 4): RD rowgroups run the
    split/dict-lookup/pack on device (rd.hpp:109-147) and the output is
    byte-identical to the host path — pure-RD f64, mixed ALP+RD (f64 and
    f32), the device-resident planes path, and a POI-class sample."""
    import jax.numpy as jnp
    from alp_tpu import constants as C
    from alp_tpu import container
    from alp_tpu.device_compress import compress_device, _u64_split
    from alp_tpu.kernels import layout
    from alp_tpu.utils import datasets, io

    rng = np.random.default_rng(29)
    alp_part = (rng.random(102400) * 1e4).round(2)
    rd_part = rng.standard_normal(102400) * np.pi

    # pure RD with a tail vector
    pure = np.concatenate([rd_part, rd_part[:700]])
    h = container.compress(pure)
    assert (h.rg_scheme == C.SCHEME_ALP_RD).all()
    assert compress_device(pure).to_bytes() == h.to_bytes()

    # mixed f64 (exercises both scheme paths in one column)
    mixed = np.concatenate([alp_part, rd_part, alp_part[:5000]])
    hm = container.compress(mixed)
    assert set(hm.rg_scheme) == {C.SCHEME_ALP, C.SCHEME_ALP_RD}
    assert compress_device(mixed).to_bytes() == hm.to_bytes()

    # planes path (device-resident input) with RD present
    vectors, n_vec = container._pad_to_vectors(mixed)
    n_pad = layout.pad_vectors(n_vec, 64)
    vp = np.zeros((n_pad, C.VECTOR_SIZE), np.float64)
    vp[:n_vec] = vectors
    lo32, hi32 = _u64_split(vp)
    vhi = jnp.asarray(layout.plane_to_tile(hi32, 64))
    vlo = jnp.asarray(layout.plane_to_tile(lo32, 64))
    dp = compress_device(planes=(vhi, vlo), n_values=len(mixed))
    assert dp.to_bytes() == hm.to_bytes()

    # mixed f32 (ML-weights-like RD rowgroup)
    w32 = np.concatenate([
        (rng.random(102400) * 100).round(1).astype(np.float32),
        (rng.standard_normal(102400) * 0.02).astype(np.float32) * np.pi])
    h32 = container.compress(w32)
    assert (h32.rg_scheme == C.SCHEME_ALP_RD).any()
    assert compress_device(w32).to_bytes() == h32.to_bytes()

    # POI-class real sample (reference data/include/double/alp_dataset)
    col = datasets.ALP_DATASET[23]          # POI-lat
    if col.csv_path and col.csv_path.exists():
        data = np.tile(io.read_column(col), 3)
        hp = container.compress(data)
        assert (hp.rg_scheme == C.SCHEME_ALP_RD).all()
        assert compress_device(data).to_bytes() == hp.to_bytes()
