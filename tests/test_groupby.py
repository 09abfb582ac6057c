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
