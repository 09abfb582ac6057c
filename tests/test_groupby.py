"""GROUP-BY / windowed-aggregate engine tests (engine.query_groupby,
query_window, groupby_keys, make_groupby_step).

Exactness model: per-group SUM/MEAN must be bit-identical to
``math.fsum`` over the group's values (one final rounding); MIN/MAX use
the IEEE-754 total order with -0.0 canonicalized (NaN above +inf),
matching engine.query_min/query_max.  The reference engine has no
GROUP-BY (bench_end_to_end config.hpp:16-92 stops at q1 aggregates) —
this is beyond-reference breadth over the same fused scan.
"""

import math

import numpy as np
import pytest

import alp_tpu
from alp_tpu import engine


def _ref_groups(data, keys, G):
    return [data[keys == g] for g in range(G)]


def _check_sums(res, data, keys, G, dtype):
    for g, sel in enumerate(_ref_groups(data, keys, G)):
        assert res["count"][g] == sel.size
        if sel.size == 0:
            assert res["sum"][g] == 0.0
            assert np.isnan(res["mean"][g])
            assert np.isnan(res["min"][g]) and np.isnan(res["max"][g])
            continue
        if np.isnan(sel).any():
            assert np.isnan(res["sum"][g])
        elif np.isinf(sel).any():
            pi, ni = np.isposinf(sel).any(), np.isneginf(sel).any()
            want = float("nan") if (pi and ni) else (
                float("inf") if pi else float("-inf"))
            if math.isnan(want):
                assert np.isnan(res["sum"][g])
            else:
                assert res["sum"][g] == want
        else:
            want = math.fsum(float(x) for x in sel)
            if dtype == np.float32:
                from fractions import Fraction
                fr = sum((Fraction(float(x)) for x in sel), Fraction(0))
                want = float(np.float32(fr)) if fr else 0.0
            assert float(res["sum"][g]) == want, (g, res["sum"][g], want)


def test_groupby_f64_exact_vs_fsum():
    rng = np.random.default_rng(7)
    n = 6000
    data = np.round(rng.normal(20.0, 8.0, n), 3)
    data[5] = 1e297        # exception (magnitude outside ALP range)
    data[6] = -0.0
    col = alp_tpu.compress(data)
    G = 9
    keys = rng.integers(0, G, n)
    res = engine.query_groupby(col, keys, G)
    _check_sums(res, data, keys, G, np.float64)
    for g, sel in enumerate(_ref_groups(data, keys, G)):
        assert res["max"][g] == sel.max()
        assert res["min"][g] == sel.min()
        fr = math.fsum(float(x) for x in sel)
        # mean: correctly-rounded rational, so within 1 ulp of fsum/n
        assert res["mean"][g] == pytest.approx(fr / sel.size, rel=1e-15)


def test_groupby_specials_and_empty_groups():
    rng = np.random.default_rng(8)
    n = 4096
    data = np.round(rng.normal(0.0, 3.0, n), 2)
    keys = rng.integers(0, 6, n)
    data[keys == 1] = np.where(
        np.arange((keys == 1).sum()) == 0, np.nan, 1.5)
    idx2 = np.nonzero(keys == 2)[0]
    data[idx2[0]] = np.inf
    idx3 = np.nonzero(keys == 3)[0]
    data[idx3[0]] = np.inf
    data[idx3[1]] = -np.inf
    keys[keys == 5] = 0          # group 5 left empty
    col = alp_tpu.compress(data)
    res = engine.query_groupby(col, keys, 6)
    assert np.isnan(res["sum"][1]) and np.isnan(res["mean"][1])
    assert res["sum"][2] == np.inf and res["mean"][2] == np.inf
    assert np.isnan(res["sum"][3])          # +inf with -inf
    assert res["count"][5] == 0 and res["sum"][5] == 0.0
    assert np.isnan(res["min"][5]) and np.isnan(res["max"][5])
    # NaN sorts above +inf in the total order (query_min/max semantics)
    assert np.isnan(res["max"][1])
    assert res["max"][2] == np.inf
    _check_sums(res, data, keys, 6, np.float64)


def test_groupby_ragged_partial_vector():
    rng = np.random.default_rng(9)
    for n in (1, 100, 1024, 1025, 5003):
        data = np.round(rng.normal(50.0, 5.0, n), 4)
        col = alp_tpu.compress(data)
        G = 4
        keys = rng.integers(0, G, n)
        res = engine.query_groupby(col, keys, G)
        _check_sums(res, data, keys, G, np.float64)
        assert int(res["count"].sum()) == n


def test_groupby_rd_column():
    rng = np.random.default_rng(10)
    n = 4096
    data = rng.normal(48.8, 0.4, n)       # POI-like: chooses ALP_RD
    col = alp_tpu.compress(data)
    G = 5
    keys = rng.integers(0, G, n)
    res = engine.query_groupby(col, keys, G)
    _check_sums(res, data, keys, G, np.float64)
    for g, sel in enumerate(_ref_groups(data, keys, G)):
        assert res["max"][g] == sel.max()
        assert res["min"][g] == sel.min()


def test_groupby_f32():
    rng = np.random.default_rng(11)
    n = 5000
    data = np.round(rng.normal(5.0, 2.0, n), 2).astype(np.float32)
    data[17] = np.float32(-0.0)
    col = alp_tpu.compress(data)
    G = 6
    keys = rng.integers(0, G, n)
    res = engine.query_groupby(col, keys, G)
    _check_sums(res, data, keys, G, np.float32)
    for g, sel in enumerate(_ref_groups(data, keys, G)):
        assert res["max"][g] == sel.max()
        assert res["min"][g] == sel.min()


def test_groupby_many_groups():
    rng = np.random.default_rng(12)
    n = 8192
    data = np.round(rng.normal(-3.0, 40.0, n), 1)
    col = alp_tpu.compress(data)
    G = 1000
    keys = rng.integers(0, G, n)
    res = engine.query_groupby(col, keys, G, aggs=("sum", "count"))
    counts = np.bincount(keys, minlength=G)
    assert np.array_equal(res["count"], counts)
    for g in rng.choice(G, 25, replace=False):
        sel = data[keys == g]
        want = math.fsum(float(x) for x in sel) if sel.size else 0.0
        assert float(res["sum"][g]) == want


def test_groupby_sorted_path_matches_mxu():
    """The sorted-permutation cache (built on the 2nd same-keys query)
    must agree aggregate-for-aggregate with the one-hot MXU path."""
    rng = np.random.default_rng(21)
    n = 50000
    data = np.round(rng.normal(20.0, 8.0, n), 2)
    data[5] = np.nan
    data[6] = np.inf
    data[7] = -np.inf
    data[8] = -0.0
    data[9] = 1e301          # out-of-envelope exception
    col = alp_tpu.compress(data)
    G = 11
    keys = rng.integers(0, G, n)
    r1 = engine.query_groupby(col, keys, G)          # MXU (1st use)
    r2 = engine.query_groupby(col, keys, G)          # sorted (2nd use)
    assert isinstance(col._gb_sorted.get((id(keys), G)), dict)
    for a in r1:
        x, y = r1[a].astype(float), r2[a].astype(float)
        same = (x == y) | (np.isnan(x) & np.isnan(y))
        assert same.all(), (a, x, y)
    _check_sums(r2, data, keys, G, np.float64)


def test_groupby_sorted_many_groups_exact():
    """Past the MXU one-hot gate (128) the sorted path engages on the
    FIRST query and stays exact at 512 groups (the old segment-sum
    cliff)."""
    rng = np.random.default_rng(22)
    n = 70000
    data = np.round(rng.normal(0.0, 50.0, n), 1)
    col = alp_tpu.compress(data)
    G = 512
    keys = rng.integers(0, G, n)
    res = engine.query_groupby(col, keys, G)
    assert isinstance(col._gb_sorted.get((id(keys), G)), dict)
    assert np.array_equal(res["count"], np.bincount(keys, minlength=G))
    for g in rng.choice(G, 20, replace=False):
        sel = data[keys == g]
        want = math.fsum(float(x) for x in sel) if sel.size else 0.0
        assert float(res["sum"][g]) == want
        if sel.size:
            assert res["min"][g] == sel.min()
            assert res["max"][g] == sel.max()


def test_groupby_sorted_rd_and_tail():
    """Sorted path on a high-precision (ALP_RD) column with a partial
    last vector: per-group fsum exactness end to end."""
    import alp_tpu.engine as E
    old = E._GB_SORT_MIN_USES
    E._GB_SORT_MIN_USES = 1
    try:
        rng = np.random.default_rng(23)
        n = 13333
        data = rng.standard_normal(n)
        col = alp_tpu.compress(data)
        G = 6
        keys = rng.integers(0, G, n)
        res = engine.query_groupby(col, keys, G)
        assert isinstance(col._gb_sorted.get((id(keys), G)), dict)
        _check_sums(res, data, keys, G, np.float64)
    finally:
        E._GB_SORT_MIN_USES = old


def test_distinct_count_exact():
    """COUNT(DISTINCT): exact on decimals, raw doubles, f32, constants;
    -0.0 == 0.0 and all NaNs collapse to one."""
    rng = np.random.default_rng(31)

    def ref(d):
        k = engine._np_work_keys(np.ascontiguousarray(d).view(
            np.uint64 if d.dtype == np.float64 else np.uint32), True)
        kpinf = engine._float_key(float("inf"), d.dtype)
        kninf = engine._float_key(float("-inf"), d.dtype)
        nan = (k > k.dtype.type(kpinf)) | (k < k.dtype.type(kninf))
        k = np.where(nan, k.dtype.type(kpinf) + k.dtype.type(1), k)
        return len(np.unique(k))

    d = np.round(rng.normal(20, 8, 40000), 2)
    d[3] = np.nan
    d[4] = -np.nan
    d[5] = np.inf
    d[6] = -0.0
    d[7] = 0.0
    cases = [d, rng.standard_normal(15000),
             np.round(rng.normal(0, 3, 1533), 1),
             np.repeat(np.float64(3.25), 5000),
             np.round(rng.normal(20, 8, 20000), 2).astype(np.float32)]
    for i, c in enumerate(cases):
        col = alp_tpu.compress(np.ascontiguousarray(c))
        assert engine.query_distinct(col) == ref(c), i


def test_groupby_validation():
    data = np.arange(100, dtype=np.float64)
    col = alp_tpu.compress(data)
    with pytest.raises(ValueError):
        engine.query_groupby(col, np.zeros(5, np.int64), 3)
    with pytest.raises(ValueError):
        engine.query_groupby(col, np.full(100, 3), 3)
    with pytest.raises(ValueError):
        engine.query_groupby(col, np.zeros(100, np.int64), 0)


def test_window_tumbling_exact():
    rng = np.random.default_rng(13)
    n = 5555
    data = np.round(rng.normal(100.0, 30.0, n), 3)
    col = alp_tpu.compress(data)
    W = 700
    res = engine.query_window(col, W)
    nw = -(-n // W)
    assert res["sum"].shape == (nw,)
    for i in range(nw):
        sel = data[i * W:(i + 1) * W]
        assert float(res["sum"][i]) == math.fsum(float(x) for x in sel)
        assert res["count"][i] == sel.size
        assert res["max"][i] == sel.max()
        assert res["min"][i] == sel.min()


def test_groupby_keys_from_column():
    rng = np.random.default_rng(14)
    n = 3000
    kvals = rng.choice([1.5, 2.25, -3.0, 10.0], n)
    vals = np.round(rng.normal(0.0, 1.0, n), 2)
    kcol = alp_tpu.compress(kvals)
    vcol = alp_tpu.compress(vals)
    keys, uniques = engine.groupby_keys(kcol)
    assert np.array_equal(uniques[keys], kvals)
    res = engine.query_groupby(vcol, keys, len(uniques))
    for g, u in enumerate(uniques):
        sel = vals[kvals == u]
        assert float(res["sum"][g]) == math.fsum(float(x) for x in sel)


def test_make_groupby_step_runs():
    rng = np.random.default_rng(15)
    n = 4096
    data = np.round(rng.normal(0.0, 10.0, n), 2)
    col = alp_tpu.compress(data)
    keys = rng.integers(0, 8, n)
    step, metas = engine.make_groupby_step(col, keys, 8)
    import jax.numpy as jnp
    c1 = step(jnp.uint32(0), *metas)
    c2 = step(jnp.uint32(0), *metas)
    assert np.asarray(c1).shape == ()
    assert int(np.asarray(c1)) == int(np.asarray(c2))   # deterministic


def test_mxu_path_matches_scatter_path():
    """The one-hot MXU formulation and the general segment-sum path are
    two independent device implementations of the same aggregates —
    fuzz them against each other (the MXU path handles specials and
    out-of-envelope values via feature columns + host corrections; the
    scatter path computes full 64-window partials directly)."""
    rng = np.random.default_rng(77)
    for trial in range(3):
        n = int(rng.integers(500, 9000))
        data = np.round(rng.normal(0.0, 10.0 ** rng.integers(0, 4), n),
                        int(rng.integers(0, 4)))
        for _ in range(int(rng.integers(0, 4))):
            data[rng.integers(0, n)] = rng.choice(
                [np.nan, np.inf, -np.inf, 1e300, 5e-324, -0.0])
        col = alp_tpu.compress(data)
        G = int(rng.integers(1, 10))
        keys = rng.integers(0, G, n)
        mxu = engine.query_groupby(col, keys, G)
        # force the scatter path by lowering the cutoff
        old = engine._GB_MXU_MAX_GROUPS
        engine._GB_MXU_MAX_GROUPS = 0
        try:
            sca = engine.query_groupby(col, keys.copy(), G)
        finally:
            engine._GB_MXU_MAX_GROUPS = old
        for a in ("sum", "count", "min", "max", "mean"):
            ma, sa = mxu[a], sca[a]
            both_nan = (np.isnan(ma) if ma.dtype.kind == "f"
                        else np.zeros(len(ma), bool))
            if sa.dtype.kind == "f":
                both_nan &= np.isnan(sa)
            eq = (ma == sa) | both_nan
            assert eq.all(), (trial, a, ma, sa)


def test_filter_sum_exact():
    """SELECT SUM(v) WHERE lo <= v <= hi — exact over every bucket kind
    (same one-hot MXU digit pass as GROUP-BY, predicate colid)."""
    rng = np.random.default_rng(88)
    d = np.round(rng.normal(10, 30, 50000), 2)
    d[3] = np.inf
    d[9] = 8e306      # out-of-envelope exception
    d[11] = -0.0
    cc = alp_tpu.compress(d)
    for lo, hi in ((-20.0, 25.0), (0.0, 0.0), (-1e9, 1e9),
                   (100.0, np.inf), (5.0, -5.0)):
        got = engine.query_filter_sum(cc, lo, hi)
        sel = d[(d >= lo) & (d <= hi)] if lo <= hi else np.empty(0)
        want = math.fsum(sel.tolist())
        assert got == want or (np.isnan(got) and np.isnan(want)), \
            (lo, hi, got, want)


def test_filter_sum_rd_f32_ragged():
    rng = np.random.default_rng(89)
    pd = rng.normal(48.8, 0.4, 9000)                 # ALP_RD
    cr = alp_tpu.compress(pd)
    sel = pd[(pd >= 48.5) & (pd <= 49.0)]
    assert float(engine.query_filter_sum(cr, 48.5, 49.0)) == \
        math.fsum(sel.tolist())
    d32 = np.round(rng.normal(3, 4, 20001), 2).astype(np.float32)
    c32 = alp_tpu.compress(d32)
    from fractions import Fraction
    sel = d32[(d32 >= -2) & (d32 <= 5)]
    fr = sum((Fraction(float(x)) for x in sel), Fraction(0))
    want = float(np.float32(fr)) if fr else 0.0
    assert float(engine.query_filter_sum(c32, -2.0, 5.0)) == want
    # consistency with the fused COUNT on the same predicate
    assert engine.query_filter_count(c32, -2.0, 5.0) == sel.size


def test_window_sliding_exact():
    """Sliding windows (hop < window): one non-overlapping device pass,
    per-window integer-total combines, ONE rounding per window —
    bit-identical to fsum over each overlapping window."""
    rng = np.random.default_rng(90)
    n = 5555
    d = np.round(rng.normal(100, 30, n), 3)
    d[7] = 9e305               # out-of-envelope exception
    d[60] = -0.0
    cc = alp_tpu.compress(d)
    W, H = 1000, 250
    res = engine.query_window(cc, W, hop=H)
    nw = (n - W - 1) // H + 2
    assert len(res["sum"]) == nw
    for i in range(nw):
        sel = d[i * H:i * H + W]
        assert float(res["sum"][i]) == math.fsum(sel.tolist()), i
        assert res["count"][i] == sel.size
        assert res["max"][i] == sel.max()
        assert res["min"][i] == sel.min()
        assert res["mean"][i] == pytest.approx(
            math.fsum(sel.tolist()) / sel.size, rel=1e-15)
    with pytest.raises(ValueError):
        engine.query_window(cc, 1000, hop=300)   # hop must divide
    # window longer than the column: one partial window
    small = engine.query_window(cc, 10000, hop=2500)
    assert len(small["sum"]) == 1
    assert float(small["sum"][0]) == math.fsum(d.tolist())
