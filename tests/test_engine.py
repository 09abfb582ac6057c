"""Query engine tests: SUM/SCAN over compressed columns on device."""

import numpy as np

from alp_tpu import container, engine
from alp_tpu.utils import datasets, io


def test_sum_matches_numpy():
    col = [c for c in datasets.ALP_DATASET if c.name == "City-Temp"][0]
    data = io.read_csv(col.csv_path, np.float64)
    cc = container.compress(data)
    got = engine.query_sum(cc)
    expect = float(np.sum(data))
    assert abs(got - expect) <= abs(expect) * 1e-12 + 1e-9


def test_sum_ragged_lengths():
    # columns whose length is NOT a multiple of 1024: the pad values
    # inside the trailing partial vector must not leak into the SUM
    rng = np.random.default_rng(7)
    for n in (1500, 1, 1023, 1025, 4096 + 17, 300):
        data = np.round(rng.uniform(-3, 3, n), 2)
        cc = container.compress(data)
        got = engine.query_sum(cc)
        expect = float(np.sum(data))
        assert abs(got - expect) <= abs(expect) * 1e-12 + 1e-9, \
            f"n={n}: got {got}, expected {expect}"


def test_sum_ragged_f32():
    rng = np.random.default_rng(8)
    data = np.round(rng.uniform(0, 50, 2500), 2).astype(np.float32)
    cc = container.compress(data)
    got = engine.query_sum(cc)
    expect = float(np.sum(data.astype(np.float64)))
    assert abs(got - expect) <= abs(expect) * 1e-6


def test_sum_ragged_rd():
    # high-precision data (ALP_RD scheme) with a partial trailing vector
    rng = np.random.default_rng(9)
    data = rng.uniform(-1, 1, 1500)
    cc = container.compress(data)
    assert (cc.rg_scheme == 1).any()
    got = engine.query_sum(cc)
    expect = float(np.sum(data))
    assert abs(got - expect) <= abs(expect) * 1e-12 + 1e-9


def test_sum_with_exceptions():
    rng = np.random.default_rng(3)
    data = np.round(rng.uniform(-10, 10, 4096), 2)
    data[[5, 700, 2049]] = [np.pi, 1e300, -0.0]   # force exceptions
    cc = container.compress(data)
    assert engine.query_count_exceptions(cc) >= 2
    got = engine.query_sum(cc)
    expect = float(np.sum(data))
    assert abs(got - expect) <= abs(expect) * 1e-12


def test_sum_f32():
    rng = np.random.default_rng(4)
    data = np.round(rng.uniform(0, 100, 4096), 2).astype(np.float32)
    cc = container.compress(data)
    got = engine.query_sum(cc)
    expect = float(np.sum(data.astype(np.float64)))
    assert abs(got - expect) <= abs(expect) * 1e-6


def test_scan_returns_planes():
    data = np.round(np.linspace(0, 1, 2048), 3)
    cc = container.compress(data)
    plan, outs = engine.query_scan(cc)
    assert len(outs) == len(plan.groups)


def test_sum_rd_column():
    col = [c for c in datasets.ALP_DATASET if c.name == "POI-lat"][0]
    data = io.read_csv(col.csv_path, np.float64)
    cc = container.compress(data)
    got = engine.query_sum(cc)
    expect = float(np.sum(data))
    assert abs(got - expect) <= abs(expect) * 1e-12


def test_min_max_filter():
    rng = np.random.default_rng(21)
    data = np.round(rng.uniform(-100, 100, 5000), 2)
    cc = container.compress(data)
    assert engine.query_min(cc) == data.min()
    assert engine.query_max(cc) == data.max()
    lo, hi = -25.0, 40.0
    expect = int(((data >= lo) & (data <= hi)).sum())
    assert engine.query_filter_count(cc, lo, hi) == expect


def test_min_max_rd_and_f32():
    rng = np.random.default_rng(22)
    rd = rng.standard_normal(2048 + 100)
    cc = container.compress(rd)
    assert engine.query_min(cc) == rd.min()
    assert engine.query_max(cc) == rd.max()
    f32 = np.round(rng.uniform(0, 9, 3000), 1).astype(np.float32)
    cc = container.compress(f32)
    assert engine.query_min(cc) == float(f32.min())
    assert engine.query_max(cc) == float(f32.max())
    n = int(engine.query_filter_count(cc, 2.0, 5.0))
    assert n == int(((f32 >= 2.0) & (f32 <= 5.0)).sum())


def test_compression_query():
    rng = np.random.default_rng(23)
    data = np.round(rng.uniform(-10, 10, 4096), 2)
    cc, stats = engine.query_compression(data)
    assert stats["bits_per_value"] < 30
    out = container.decompress(cc)
    np.testing.assert_array_equal(out.view(np.uint64), data.view(np.uint64))


def test_make_sum_step_runs():
    """The throughput step (fused decode [+ fused reduction for mid
    buckets]) must execute across variants; its value is a checksum."""
    import jax.numpy as jnp
    from alp_tpu.kernels import decode as kdecode
    rng = np.random.default_rng(30)
    data = np.concatenate([
        np.round(rng.uniform(-900, 900, 2048), 2),       # mid bucket
        rng.standard_normal(1024) * 1e-3,                # high precision
    ])
    cc = container.compress(data)
    plan = kdecode.build_plan(cc)
    step, metas = engine.make_sum_step(plan)
    out = step(jnp.uint32(0), *metas)
    assert np.asarray(out).dtype == np.uint32


def test_zero_sign_semantics():
    """±0.0 compare equal in filters/aggregates (keys canonicalize
    -0.0 to +0.0), matching IEEE compare semantics."""
    data = np.array([-1.5, -0.0, 0.0, 2.5] * 256)
    cc = container.compress(data)
    # COUNT(*) WHERE 0.0 <= v: IEEE says -0.0 == 0.0, so both zeros count
    assert engine.query_filter_count(cc, 0.0, 10.0) == 768
    # bounds given as -0.0 behave identically
    assert engine.query_filter_count(cc, -0.0, 10.0) == 768
    assert engine.query_max(cc) == 2.5
    assert engine.query_min(cc) == -1.5
    # all-zero column: MIN/MAX return a zero (sign unspecified, == 0.0)
    zeros = np.array([-0.0, 0.0] * 512)
    cz = container.compress(zeros)
    assert engine.query_min(cz) == 0.0
    assert engine.query_max(cz) == 0.0


def test_sum_exact_matches_fsum():
    """query_sum is the correctly-rounded SUM: bit-identical to
    math.fsum, including catastrophic-cancellation cases where naive
    f64 accumulation loses everything."""
    import math
    col = [c for c in datasets.ALP_DATASET if c.name == "Food-prices"][0]
    data = io.read_csv(col.csv_path, np.float64)
    cc = container.compress(data)
    assert engine.query_sum(cc) == math.fsum(data)

    # adversarial: huge + tiny + cancellation (all become exceptions)
    adv = np.zeros(2048)
    adv[0] = 1e300
    adv[1] = -1e300
    adv[2] = 1.0
    adv[3] = 2.0 ** -1000
    adv[4] = 1e16
    adv[5] = 1.0
    adv[6] = -1e16
    cc = container.compress(adv)
    got = engine.query_sum(cc)
    expect = math.fsum(adv)
    assert got == expect, (got, expect)

    # subnormals
    sub = np.full(1024, 5e-324)
    cc = container.compress(sub)
    assert engine.query_sum(cc) == math.fsum(sub)

    # f32 column summed exactly as doubles
    rng = np.random.default_rng(11)
    f32 = (rng.standard_normal(3000) * 1e8).astype(np.float32)
    cc = container.compress(f32)
    assert engine.query_sum(cc) == math.fsum(f32.astype(np.float64))


def test_sum_exact_fused_wide_variants():
    """The fused exact-SUM kernels on wide-bit-width buckets (mid64 /
    midc96 single-rounding variants) stay bit-identical to math.fsum."""
    import math
    wide = np.round(np.random.default_rng(311).uniform(0, 1e10, 3000),
                    2)                                   # mid64 bw ~40
    cc = container.compress(wide)
    assert any(g.variant == "mid64" and g.bw > 32
               for g in cc.plan().groups)
    assert engine.query_sum(cc) == math.fsum(wide)

    deep = np.round(np.random.default_rng(320).uniform(-1e9, 1e9, 3000),
                    2)                                   # midc96 bw ~38
    cc = container.compress(deep)
    assert any(g.variant == "midc96" and g.bw > 32
               for g in cc.plan().groups)
    assert engine.query_sum(cc) == math.fsum(deep)


def test_sum_exact_rd_subnormals_and_specials():
    """ALP_RD buckets carry raw bit patterns: subnormal values fall
    outside the fused superaccumulator envelope (rare-row fallback) and
    patched exceptions can be NaN/Inf; both must stay exact."""
    import math
    rng = np.random.default_rng(32)
    data = rng.standard_normal(2048)                    # high precision
    data[17] = 5e-324                                   # subnormals
    data[900] = -3e-310
    cc = container.compress(data)
    assert (cc.rg_scheme == 1).any()
    assert engine.query_sum(cc) == math.fsum(data)

    data2 = rng.standard_normal(1500)
    data2[3] = np.inf
    cc2 = container.compress(data2)
    assert engine.query_sum(cc2) == np.inf


def test_sum_exact_partial_vector_exception_tail():
    """A partial last vector whose final value is itself an exception:
    the pad copies are exceptions too, and the pad subtraction must use
    the true stored value."""
    import math
    rng = np.random.default_rng(33)
    data = np.round(rng.uniform(-5, 5, 1500), 2)
    data[-1] = np.pi                                    # not encodable
    cc = container.compress(data)
    assert engine.query_sum(cc) == math.fsum(data)
    data[-1] = -0.0                                     # signed zero tail
    cc = container.compress(data)
    assert engine.query_sum(cc) == math.fsum(data)


def test_make_exact_sum_step_consistent():
    """The one-program throughput step reduces to the same window
    totals the query API consumes (carry-folded checksum runs)."""
    rng = np.random.default_rng(34)
    data = np.round(rng.uniform(-100, 100, 4096), 2)
    cc = container.compress(data)
    step, metas = engine.make_exact_sum_step(cc.plan())
    import jax.numpy as jnp
    c1 = step(jnp.uint32(0), *metas)
    c2 = step(jnp.uint32(0), *metas)
    assert int(c1) == int(c2)          # deterministic
    # and the exact API agrees with fsum on the same column
    import math
    assert engine.query_sum(cc) == math.fsum(data)


def test_sum_exact_f32_fused_paths():
    """f32 exact SUM via the fused superaccumulator: ALP buckets,
    ALP_RD buckets (patched planes kernel), subnormal fallback and
    special exceptions."""
    import math
    rng = np.random.default_rng(35)
    rd32 = rng.standard_normal(2048).astype(np.float32)
    cc = container.compress(rd32)
    assert (cc.rg_scheme == 1).any()
    assert engine.query_sum(cc) == math.fsum(rd32.astype(np.float64))

    sub32 = rd32.copy()
    sub32[11] = np.float32(1e-44)                       # subnormal
    cc = container.compress(sub32)
    assert engine.query_sum(cc) == math.fsum(sub32.astype(np.float64))

    alp32 = np.round(rng.uniform(-50, 50, 1500), 2).astype(np.float32)
    alp32[7] = np.float32(np.inf)                       # exception
    cc = container.compress(alp32)
    assert engine.query_sum(cc) == np.inf


def test_sum_exact_specials():
    inf = np.zeros(1024)
    inf[7] = np.inf
    assert engine.query_sum(container.compress(inf)) == np.inf
    both = np.zeros(1024)
    both[1], both[2] = np.inf, -np.inf
    assert np.isnan(engine.query_sum(container.compress(both)))
    nn = np.zeros(1024)
    nn[3] = np.nan
    assert np.isnan(engine.query_sum(container.compress(nn)))


def test_filter_count_fuzz_vs_numpy():
    """Fused predicate pushdown (mid/gen/const kernels + exception and
    padded-tail corrections) against numpy ground truth over random
    columns, bounds, specials, and tails."""
    import numpy as np
    from alp_tpu import container, engine
    rng = np.random.default_rng(77)
    for trial in range(6):
        n = int(rng.integers(900, 9000))
        kind = trial % 3
        if kind == 0:
            d = np.round(rng.normal(0, 10.0 ** rng.integers(0, 4), n),
                         int(rng.integers(0, 4)))
        elif kind == 1:
            d = np.full(n, float(np.round(rng.normal(0, 100), 2)))
        else:
            d = rng.standard_normal(n) * 10.0 ** rng.integers(-2, 10)
        if n > 40:
            d[7] = -0.0
            d[8] = 0.0
            d[9] = np.inf
            d[10] = -np.inf
        cc = container.compress(d)
        for _ in range(3):
            a, b = np.sort(rng.normal(0, np.abs(d[np.isfinite(d)]).max()
                                      or 1.0, 2))
            want = int(np.sum((d >= a) & (d <= b)))
            got = engine.query_filter_count(cc, float(a), float(b))
            assert got == want, (trial, a, b, got, want)
        assert engine.query_filter_count(cc, -np.inf, np.inf) == int(
            np.isfinite(d).sum() + np.isinf(d).sum())


def test_filter_count_f32_fuzz():
    """f32 fused count kernel vs numpy over random columns and bounds."""
    import numpy as np
    from alp_tpu import container, engine
    rng = np.random.default_rng(88)
    for trial in range(4):
        n = int(rng.integers(900, 7000))
        d = np.round(rng.normal(0, 50, n), int(rng.integers(0, 3))
                     ).astype(np.float32)
        if n > 20:
            d[5] = -0.0
            d[6] = np.inf
        cc = container.compress(d)
        for _ in range(3):
            a, b = np.sort(rng.normal(0, 60, 2))
            want = int(np.sum((d >= np.float32(a)) & (d <= np.float32(b))))
            got = engine.query_filter_count(cc, float(a), float(b))
            assert got == want, (trial, a, b, got, want)


def test_filter_count_rd_fused():
    """ALP_RD buckets take the fused dictionary count kernel (both
    dtypes), with exceptions and the padded tail corrected exactly."""
    col = [c for c in datasets.ALP_DATASET if c.name == "POI-lat"][0]
    data = io.read_csv(col.csv_path, np.float64)
    cc = container.compress(data)
    assert (cc.rg_scheme == 1).any()
    for a, b in ((-90.0, 0.0), (10.0, 45.0), (-np.inf, np.inf)):
        want = int(np.sum((data >= a) & (data <= b)))
        assert engine.query_filter_count(cc, a, b) == want, (a, b)

    rng = np.random.default_rng(99)
    f32 = (rng.standard_normal(3000) * np.float32(1.7)).astype(np.float32)
    cc32 = container.compress(f32)
    assert (cc32.rg_scheme == 1).any()
    for _ in range(3):
        a, b = np.sort(rng.normal(0, 2, 2))
        want = int(np.sum((f32 >= np.float32(a)) & (f32 <= np.float32(b))))
        got = engine.query_filter_count(cc32, float(a), float(b))
        assert got == want, (a, b, got, want)


def test_make_filter_step_rd():
    """The throughput COUNT step includes ALP_RD buckets (fused
    dictionary count kernel) in the one jittable program."""
    import jax.numpy as jnp
    rng = np.random.default_rng(101)
    data = rng.standard_normal(4096)               # high precision -> RD
    cc = container.compress(data)
    assert (cc.rg_scheme == 1).any()
    step, metas = engine.make_filter_step(cc.plan(), -0.5, 0.5)
    c1 = step(jnp.uint32(0), *metas)
    c2 = step(jnp.uint32(0), *metas)
    assert int(c1) == int(c2)


def test_topk():
    """query_topk == sorted ground truth for both orders, across ALP and
    RD buckets, ragged tails, and k larger than a bucket."""
    rng = np.random.default_rng(55)
    d = np.round(rng.normal(0, 100, 5000), 2)
    d[11] = -0.0
    d = np.concatenate([d, rng.standard_normal(1100)])     # RD rowgroup
    cc = container.compress(d)
    s = np.sort(d)
    for k in (1, 5, 100, 2000):
        np.testing.assert_array_equal(engine.query_topk(cc, k), s[::-1][:k])
        np.testing.assert_array_equal(
            engine.query_topk(cc, k, largest=False), s[:k])
    # k beyond the column length clamps
    one = container.compress(np.array([3.5] * 1030))
    assert len(engine.query_topk(one, 5000)) == 1030

    f32 = np.round(rng.normal(0, 5, 3000), 1).astype(np.float32)
    cc32 = container.compress(f32)
    s32 = np.sort(f32)
    np.testing.assert_array_equal(engine.query_topk(cc32, 7), s32[::-1][:7])
    np.testing.assert_array_equal(
        engine.query_topk(cc32, 7, largest=False), s32[:7])


def test_topk_hi_word_ties():
    """The two-word threshold pass must break ties on the LO key word:
    values sharing the upper 32 key bits (same sign/exponent/high
    mantissa) differ only in LO, and specials (±inf, NaN, -0.0) sort in
    the canonical total order."""
    rng = np.random.default_rng(7)
    base = 1.0 + rng.integers(0, 2 ** 20, 4000) * 2.0 ** -52
    d = base.copy()                              # dense HI-word ties
    d[100] = np.inf
    d[101] = -np.inf
    d[102] = np.nan
    d[103] = -0.0
    d[104:110] = d[200]                          # exact duplicates
    cc = container.compress(d)
    key = np.array([engine._float_key(x, np.float64) for x in d],
                   np.uint64)
    order = np.argsort(key, kind="stable")
    s = np.where(d[order] == 0.0, 0.0, d[order])   # -0.0 canonicalized
    for k in (1, 3, 17, 500):
        got = engine.query_topk(cc, k)
        np.testing.assert_array_equal(got.view(np.uint64),
                                      s[::-1][:k].view(np.uint64))
        got_s = engine.query_topk(cc, k, largest=False)
        np.testing.assert_array_equal(got_s.view(np.uint64),
                                      s[:k].view(np.uint64))


def test_histogram():
    """query_histogram == np.histogram (last bin closed) over mixed
    ALP/RD columns and both dtypes."""
    rng = np.random.default_rng(56)
    d = np.round(rng.normal(0, 50, 4444), 2)
    d = np.concatenate([d, rng.standard_normal(1024) * 30])
    cc = container.compress(d)
    edges = [-120.0, -50.0, -1.5, 0.0, 2.25, 80.0, float(d.max())]
    want, _ = np.histogram(d, bins=edges)
    np.testing.assert_array_equal(engine.query_histogram(cc, edges), want)

    f32 = np.round(rng.normal(0, 5, 2222), 1).astype(np.float32)
    cc32 = container.compress(f32)
    e32 = [-12.0, -1.0, 0.5, 4.0, 16.0]
    want32, _ = np.histogram(f32, bins=np.array(e32, np.float32))
    np.testing.assert_array_equal(engine.query_histogram(cc32, e32), want32)

    import pytest
    with pytest.raises(ValueError):
        engine.query_histogram(cc, [1.0, 1.0])


def test_histogram_scan_path_matches_fused():
    """The >64-edge one-scan path and the fused prefix-count path bin
    identically."""
    rng = np.random.default_rng(57)
    d = np.round(rng.normal(0, 30, 3000), 2)
    cc = container.compress(d)
    edges = list(np.linspace(-90, 90, 10))
    fused = engine.query_histogram(cc, edges)
    scan = engine._query_histogram_scan(cc, [float(e) for e in edges])
    np.testing.assert_array_equal(fused, scan)
    want, _ = np.histogram(d, bins=np.array(edges))
    np.testing.assert_array_equal(fused, want)


def test_mean_correctly_rounded():
    """query_mean rounds the exact rational sum/n once."""
    import math
    from fractions import Fraction
    rng = np.random.default_rng(58)
    d = np.round(rng.uniform(-10, 10, 5000), 2)
    cc = container.compress(d)
    got = engine.query_mean(cc)
    exact = sum(Fraction(x) for x in map(float, d)) / len(d)
    assert got == float(exact)
    # f32 path and NaN propagation
    f32 = np.round(rng.uniform(0, 9, 1500), 1).astype(np.float32)
    cc32 = container.compress(f32)
    exact32 = sum(Fraction(float(x)) for x in f32) / len(f32)
    assert engine.query_mean(cc32) == float(exact32)
    assert math.isnan(engine.query_mean(
        container.compress(np.array([np.nan, 1.0]))))


def test_make_sum_step_f32():
    """The throughput SUM step handles f32 plans (dtype dispatch)."""
    import jax.numpy as jnp
    from alp_tpu import container, engine
    rng = np.random.default_rng(3)
    f32 = np.round(rng.uniform(0, 9, 5000), 1).astype(np.float32)
    cc = container.compress(f32)
    step, metas = engine.make_sum_step(cc.plan())
    c1 = step(jnp.uint32(0), *metas)
    c2 = step(jnp.uint32(0), *metas)
    assert int(c1) == int(c2)


def test_topk_fused_matches_plane():
    """The one-program fused TOP-K phase (key-max scan + traced
    two-threshold count + host candidate decode) answers identically to
    the decoded-plane path across mixed ALP/RD buckets, specials, and
    both orders."""
    rng = np.random.default_rng(77)
    d = np.round(rng.normal(0, 100, 9000), 2)
    d[5] = np.inf
    d[6] = np.nan
    d[7] = -np.inf
    d[8] = -0.0
    d = np.concatenate([d, rng.standard_normal(2000)])     # RD rowgroup
    cc = container.compress(d)
    plan = cc.plan()
    for largest in (True, False):
        for k in (1, 7, 64, 128):
            fused = engine._query_topk_fused(cc, plan, k, largest)
            plane = engine._query_topk_plane(cc, plan, k, largest)
            assert fused is not None
            np.testing.assert_array_equal(
                np.asarray(fused).view(np.uint64),
                np.asarray(plane).view(np.uint64))


def test_topk_fused_f32():
    """f32 single-word fused TOP-K vs ground truth, both orders."""
    rng = np.random.default_rng(78)
    f32 = np.round(rng.normal(0, 5, 6000), 1).astype(np.float32)
    f32[3] = np.float32(np.inf)
    cc = container.compress(f32)
    s = np.sort(f32)
    for k in (1, 9, 100):
        np.testing.assert_array_equal(engine.query_topk(cc, k),
                                      s[::-1][:k])
        np.testing.assert_array_equal(
            engine.query_topk(cc, k, largest=False), s[:k])


def test_topk_fill_pathology_falls_back():
    """A vector whose patched fill IS the column max in many lane
    columns inflates the fused threshold past the true k-th value; the
    exact tie counts detect it (gt+eq < k) and query_topk falls back to
    the plane path with the right answer."""
    rng = np.random.default_rng(80)
    rest = np.round(rng.uniform(0, 10, 1024 * 9), 2)
    v0 = np.round(rng.uniform(0, 10, 1024), 2)
    v0[0] = 100.0                           # the fill (first non-exc)
    v0[5::5] = -np.nan                      # exceptions in every lane col
    d = np.concatenate([v0, rest])
    cc = container.compress(d)
    plan = cc.plan()
    from alp_tpu import constants as C
    assert (cc.rg_scheme == C.SCHEME_ALP).all()     # ALP: fills exist
    assert engine._query_topk_fused(cc, plan, 3, True) is None
    want = np.sort(rest)[::-1][:2]
    np.testing.assert_array_equal(engine.query_topk(cc, 3),
                                  [100.0, want[0], want[1]])


def test_topk_k_zero_and_clamp():
    """k == 0 returns an empty array for both dtypes (no trace-time
    top_k on empty operands); k > n clamps."""
    cc = container.compress(np.array([1.5, 2.5, 3.5] * 400))
    assert engine.query_topk(cc, 0).shape == (0,)
    cc32 = container.compress(np.array([1.5, 2.5], np.float32))
    assert engine.query_topk(cc32, 0).shape == (0,)
    assert len(engine.query_topk(cc, 10 ** 6)) == 1200


def test_query_steps_deterministic():
    """make_topk_step / make_histogram_step: one-program throughput
    steps are carry-stable (same checksum for the same carry)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(79)
    d = np.round(rng.normal(0, 50, 5000), 2)
    cc = container.compress(d)
    plan = cc.plan()
    step, metas = engine.make_topk_step(plan, 10)
    assert int(step(jnp.uint32(0), *metas)) == int(
        step(jnp.uint32(0), *metas))
    steph, metash = engine.make_histogram_step(
        plan, [-90.0, -10.0, 0.0, 40.0])
    assert int(steph(jnp.uint32(0), *metash)) == int(
        steph(jnp.uint32(0), *metash))
