"""Golden tests: oracle vs the reference's asserted first-vector metadata.

Replicates the six gtest groups of reference test/test_alp_sample.cpp:
for every dataset, run the full encode→pack→unpack→decode pipeline on the
first 1024 CSV values and assert (a) bit-exact round-trip (with -0.0 sign
and NaN semantics) and (b) the golden exceptions_count and bit_width.
"""

import numpy as np
import pytest

from alp_tpu import constants as C
from alp_tpu.oracle import roundtrip_first_vector
from alp_tpu.oracle.pipeline import _assert_roundtrip
from alp_tpu.utils import datasets, io


def _check_column(column):
    if not column.csv_path or not column.csv_path.exists():
        pytest.skip(f"dataset file missing: {column.csv_rel_path}")
    values = io.read_first_vector(column)
    assert values.shape == (1024,), column.name
    result = roundtrip_first_vector(values)
    _assert_roundtrip(values, result.decoded)
    if result.scheme == C.SCHEME_ALP:
        assert result.exceptions_count == column.exceptions_count, column.name
        assert result.bit_width == column.bit_width, column.name


@pytest.mark.parametrize("column", datasets.ALP_DATASET,
                         ids=lambda c: c.name)
def test_alp_double(column):
    _check_column(column)


@pytest.mark.parametrize("column", datasets.GENERATED_COLUMNS,
                         ids=lambda c: c.name)
def test_alp_on_generated(column):
    _check_column(column)


@pytest.mark.parametrize("column", datasets.EDGE_CASE, ids=lambda c: c.name)
def test_alp_on_edge_case(column):
    _check_column(column)


@pytest.mark.parametrize("column", datasets.FLOAT_TEST_DATASET,
                         ids=lambda c: c.name)
def test_alp_float_test_dataset(column):
    _check_column(column)


@pytest.mark.parametrize("column", datasets.DOUBLE_TEST_DATASET,
                         ids=lambda c: c.name)
def test_alp_double_test_dataset(column):
    _check_column(column)


@pytest.mark.parametrize("column", datasets.FLOAT_EDGE_CASE,
                         ids=lambda c: c.name)
def test_alp_float_on_edge_cases(column):
    _check_column(column)
