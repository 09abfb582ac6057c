"""QUANTILE / MEDIAN engine tests (engine.query_quantile, query_median).

Exactness model: rank selection runs on IEEE-754 total-order keys via
fused count scans (engine._select_rank_keys), so the straddling values
are exact; only the final interpolation arithmetic is floating-point,
reproduced operation-for-operation from numpy's ``_lerp``.  Every case
asserts bit-equality against ``np.quantile``.  The reference engine has
no quantile query (bench_end_to_end config.hpp:16-92) — beyond-reference
breadth over the same fused machinery.
"""

import numpy as np
import pytest

import alp_tpu
from alp_tpu import engine

METHODS = ("linear", "lower", "higher", "midpoint", "nearest")
QS = (0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)


def _check_all(data, col):
    for m in METHODS:
        got = engine.query_quantile(col, np.array(QS), m)
        want = np.quantile(data, np.array(QS), method=m).astype(
            data.dtype)
        assert np.array_equal(got, want), (m, got, want)


def test_quantile_f64_matches_numpy():
    rng = np.random.default_rng(21)
    data = np.round(rng.normal(20.0, 8.0, 6000), 3)
    data[5] = 1e297          # exception magnitude
    data[6] = -0.0
    _check_all(data, alp_tpu.compress(data))


def test_quantile_duplicates_and_constant():
    data = np.repeat([1.5, 2.5, 2.5, 7.0], 500)
    _check_all(data, alp_tpu.compress(data))
    const = np.full(2048, 42.25)
    _check_all(const, alp_tpu.compress(const))


def test_quantile_ragged_and_small():
    rng = np.random.default_rng(22)
    for n in (1, 2, 3, 100, 1025):
        data = np.round(rng.normal(0.0, 50.0, n), 2)
        _check_all(data, alp_tpu.compress(data))


def test_quantile_rd_column():
    rng = np.random.default_rng(23)
    data = rng.normal(48.8, 0.4, 4096)      # POI-like: ALP_RD
    _check_all(data, alp_tpu.compress(data))


def test_quantile_f32():
    rng = np.random.default_rng(24)
    data = np.round(rng.normal(5.0, 2.0, 5000), 2).astype(np.float32)
    col = alp_tpu.compress(data)
    for m in METHODS:
        got = engine.query_quantile(col, 0.5, m)
        want = np.quantile(data, 0.5, method=m)
        assert float(got) == float(np.float32(want)), (m, got, want)


def test_quantile_infinities_no_nan():
    rng = np.random.default_rng(25)
    data = np.round(rng.normal(0.0, 3.0, 3000), 2)
    data[0] = np.inf
    data[1] = -np.inf
    col = alp_tpu.compress(data)
    for q in (0.0, 0.5, 1.0):
        assert engine.query_quantile(col, q, "lower") == np.quantile(
            data, q, method="lower")
    assert engine.query_quantile(col, 1.0) == np.inf
    assert engine.query_quantile(col, 0.0) == -np.inf


def test_quantile_nan_propagates():
    data = np.arange(100, dtype=np.float64)
    data[3] = np.nan
    col = alp_tpu.compress(data)
    assert np.isnan(engine.query_quantile(col, 0.5))
    assert np.isnan(engine.query_median(col))


def test_median_matches_numpy():
    rng = np.random.default_rng(26)
    for n in (9, 10, 4999, 5000):
        data = np.round(rng.normal(100.0, 30.0, n), 3)
        col = alp_tpu.compress(data)
        assert engine.query_median(col) == np.median(data), n


def test_quantile_validation_and_empty():
    data = np.arange(10, dtype=np.float64)
    col = alp_tpu.compress(data)
    with pytest.raises(ValueError):
        engine.query_quantile(col, 1.5)
    with pytest.raises(ValueError):
        engine.query_quantile(col, -0.1)
    with pytest.raises(ValueError):
        engine.query_quantile(col, 0.5, "cubic")
