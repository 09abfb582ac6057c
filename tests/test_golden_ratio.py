"""Full-corpus golden compression-ratio gate.

The reference hard-asserts achieved bits/value against golden strings
per dataset (publication/source_code/bench_compression_ratio/
alp.cpp:236-239, goldens include/alp_result.hpp:31-40; issue-24 goldens
benchmarks/result/compression_ratio/double/issue_24.csv).  This replays
those asserts through oracle.bench_column, which replicates the
reference benchmark's accounting exactly (including its quirks: tail
values dropped, sampling offset = rowgroup index, and the last rowgroup
of an exact-multiple multi-rowgroup column processing zero vectors —
all verified against a g++ build of the reference headers).

The issue-24 corpora ship in-image, so those asserts ALWAYS run; the
28-dataset suite asserts per dataset whenever its full binary is
mounted (ALP_DATASET_DIR_PATH convention, data/include/column.hpp:53-59)
and skips otherwise.
"""

import numpy as np
import pytest

from alp_tpu.oracle import bench_column
from alp_tpu.utils import datasets, io
from alp_tpu.utils.published import GOLDEN_FULL_RATIO, GOLDEN_ISSUE_RATIO


@pytest.mark.parametrize("name,golden", sorted(GOLDEN_ISSUE_RATIO.items()))
def test_issue24_full_file_golden_ratio(name, golden):
    col = [c for c in datasets.ISSUE_DATASET if c.name == name][0]
    data = io.read_column(col)
    _, bits = bench_column(data)
    assert f"{bits:.2f}" == golden


@pytest.mark.parametrize("name,golden", sorted(GOLDEN_FULL_RATIO.items()))
def test_full_corpus_golden_ratio(name, golden):
    col = [c for c in datasets.ALP_DATASET if c.name == name][0]
    if col.binary_path is None:
        pytest.skip("full corpus not mounted (set ALP_DATASET_DIR_PATH)")
    data = io.read_column(col, prefer_binary=True)
    _, bits = bench_column(data, validate=False)
    assert f"{bits:.2f}" == golden
