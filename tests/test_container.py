"""Container API tests: whole-column round-trips, serialization, golden
parity with the reference unit-test metadata, device decode plans.

The golden (exceptions_count, bit_width) assertions replicate the
reference gtest groups (test/test_alp_sample.cpp:191-227) at the public
compress() surface.
"""

import numpy as np
import pytest

from alp_tpu import container
from alp_tpu import constants as C
from alp_tpu.kernels import decode as kdecode
from alp_tpu.utils import datasets, io


def _assert_bitexact(a, b):
    ut = np.uint64 if a.dtype == np.float64 else np.uint32
    np.testing.assert_array_equal(a.view(ut), b.view(ut))


def _roundtrip(data):
    cc = container.compress(data)
    out = container.decompress(
        container.CompressedColumn.from_bytes(cc.to_bytes()))
    _assert_bitexact(out, data)
    return cc


def test_specials_roundtrip():
    data = np.array([np.nan, np.inf, -np.inf, -0.0, 0.0, 1.25, -17.625]
                    * 300, np.float64)
    _roundtrip(data)


def test_tail_roundtrip():
    data = np.round(np.linspace(0, 1, 1500), 4)
    cc = _roundtrip(data)
    assert cc.n_values == 1500


def test_constant_column_f32():
    data = np.full(2048, 3.5, np.float32)
    cc = _roundtrip(data)
    assert cc.bit_width.max() == 0


def test_multi_rowgroup_mixed():
    rng = np.random.default_rng(0)
    a = np.round(rng.uniform(-100, 100, C.ROWGROUP_SIZE), 2)   # ALP
    b = rng.standard_normal(C.ROWGROUP_SIZE)                   # high precision
    data = np.concatenate([a, b])
    cc = _roundtrip(data)
    assert set(cc.rg_scheme.tolist()) == {C.SCHEME_ALP, C.SCHEME_ALP_RD}


@pytest.mark.parametrize("col", [c for c in datasets.ALP_DATASET
                                 if c.name in ("Air-Pressure", "City-Temp",
                                               "POI-lat", "Gov/26",
                                               "CMS/25")],
                         ids=lambda c: c.name)
def test_sample_roundtrip_and_golden(col):
    data = io.read_csv(col.csv_path, np.float64)
    _roundtrip(data)
    # golden metadata applies to the first vector compressed alone
    # (test_alp_sample.cpp encodes only the first 1024 values)
    if not col.suitable_for_cutting:
        cc1 = container.compress(data[:1024])
        assert int(cc1.exc_count[0]) == col.exceptions_count
        assert int(cc1.bit_width[0]) == col.bit_width


def test_device_decode_plan_matches_container():
    col = [c for c in datasets.ALP_DATASET if c.name == "City-Temp"][0]
    data = io.read_csv(col.csv_path, np.float64)
    cc = container.compress(data)
    vals = kdecode.decompress_device(cc)
    expect = container.decompress(cc)
    _assert_bitexact(vals.reshape(-1)[:cc.n_values], expect)


def test_device_decode_plan_rd():
    col = [c for c in datasets.ALP_DATASET if c.name == "POI-lat"][0]
    data = io.read_csv(col.csv_path, np.float64)
    cc = container.compress(data)
    assert (cc.rg_scheme == C.SCHEME_ALP_RD).all()
    vals = kdecode.decompress_device(cc)
    _assert_bitexact(vals.reshape(-1)[:cc.n_values], data)


def test_device_decode_plan_f32():
    colf = datasets.FLOAT_TEST_DATASET[2]
    data = io.read_csv(colf.csv_path, np.float32)
    cc = container.compress(data)
    vals = kdecode.decompress_device(cc)
    expect = container.decompress(cc)
    _assert_bitexact(vals.reshape(-1)[:cc.n_values], expect)


def test_device_decode_plan_rd_f32():
    rng = np.random.default_rng(9)
    data = rng.standard_normal(8192).astype(np.float32)  # high precision
    cc = container.compress(data)
    assert (cc.rg_scheme == C.SCHEME_ALP_RD).all()
    vals = kdecode.decompress_device(cc)
    _assert_bitexact(vals.reshape(-1)[:cc.n_values], data)


def test_issue24_regression_roundtrip():
    """GitHub issue 24 columns (reference data/issue,
    scripts/replicate_issue_24.py) round-trip bit-exactly."""
    for col in datasets.ISSUE_DATASET:
        if col.csv_path is None or not col.csv_path.exists():
            continue
        data = io.read_csv(col.csv_path, np.float64)
        _roundtrip(data)


def test_bits_per_value_mixed_scheme_overhead():
    # a mixed ALP/RD column must price each rowgroup's overhead by its
    # own scheme (reference prices only homogeneous columns; alp.cpp:14-49)
    rng = np.random.default_rng(0)
    a = np.round(rng.uniform(-100, 100, C.ROWGROUP_SIZE), 2)   # ALP
    b = rng.standard_normal(C.ROWGROUP_SIZE)                   # ALP_RD
    cc = container.compress(np.concatenate([a, b]))
    assert set(cc.rg_scheme.tolist()) == {C.SCHEME_ALP, C.SCHEME_ALP_RD}
    alp_only = container.compress(a)
    rd_only = container.compress(b)
    # the mixed column's average must equal the mean of the homogeneous
    # halves (same data, same per-rowgroup planning)
    expect = (alp_only.bits_per_value() + rd_only.bits_per_value()) / 2
    assert abs(cc.bits_per_value() - expect) < 1e-9


def test_f32_rd_device_decode_with_dictionary():
    """f32 ALP_RD via the on-device dictionary kernel: full bit-exact
    decode incl. left-part exceptions (rd_decode_dict_f32)."""
    rng = np.random.default_rng(33)
    # high-entropy f32 -> ALP_RD; a dominant scale plus rare outliers
    # across many scales forces left parts beyond the 8-entry dictionary
    n = 4096 + 333
    data = rng.standard_normal(n).astype(np.float32)
    out_idx = rng.choice(n, 60, replace=False)
    data[out_idx] = (rng.standard_normal(60) *
                     np.float32(10.0) ** rng.integers(-30, 30, 60)
                     ).astype(np.float32)
    cc = container.compress(data)
    assert (cc.rg_scheme == C.SCHEME_ALP_RD).any()
    assert sum(len(p) for p in cc.exc_positions) > 0
    dev = kdecode.decompress_device(cc).reshape(-1)[:len(data)]
    np.testing.assert_array_equal(dev.view(np.uint32),
                                  data.view(np.uint32))

def test_device_decode_plan_allneg_maghi():
    """An all-negative wide-bw column routes to mid64 with the
    allneg+maghi flags and round-trips bit-exactly end to end."""
    rng = np.random.default_rng(1)
    n = -(2**40 + rng.integers(0, 2**35, size=4096))
    data = n.astype(np.float64) / 100.0
    cc = container.compress(data)
    plan = kdecode.build_plan(cc)
    assert any(g.variant in ("mid64", "midc96") and (g.flags & 32)
               and (g.flags & 64) for g in plan.groups)
    vals = kdecode.decompress_device(cc)
    _assert_bitexact(vals.reshape(-1)[:cc.n_values], data)
