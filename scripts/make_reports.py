"""Generate the results/ artifacts: compression-ratio CSVs for the
dataset suites (ALP + competitor codecs), mirroring the reference's
benchmarks/result + publication/compression_ratio_result trees.

Run from the repo root:  python scripts/make_reports.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

from alp_tpu import container
from alp_tpu.competitors import ALL_CODECS
from alp_tpu.reports import _write_metadata
from alp_tpu.utils import datasets, io
from alp_tpu.utils.published import published

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "results")


def suite(columns, dtype, name):
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, f"compression_ratio_{name}.csv")
    rows = []
    for i, col in enumerate(columns, 1):
        try:
            data = io.read_column(col, prefer_binary=True)
        except FileNotFoundError:
            continue
        source = "full" if col.binary_path is not None else "sample"
        cc = container.compress(data)
        out = container.decompress(cc)
        ut = np.uint64 if data.dtype == np.float64 else np.uint32
        assert (out.view(ut) == data.view(ut)).all(), col.name
        comp = {n: fn(data) for n, fn in ALL_CODECS.items()}
        comp = {n: (v / data.size if v is not None else None)
                for n, v in comp.items()}   # None: codec N/A (Elf is f64-only)
        rows.append((i, col.name, cc.bits_per_value(), cc.n_rowgroups,
                     cc.n_vectors, source, comp))
        print(f"{col.name} [{source}]: alp={cc.bits_per_value():.2f} "
              + " ".join(f"{n}={v:.2f}" for n, v in comp.items()
                         if v is not None),
              flush=True)
    with open(path, "w") as f:
        # per-row `source` flags whether the measurement used the full
        # corpus (binary mounted) or the shipped 1024-value sample; the
        # *_published columns carry the reference paper's full-data
        # numbers (table_4.md) for Elf (no code counterpart) and for
        # Zstd/ALP as parity targets
        f.write("idx,column,alp_bits_per_value,rowgroups,vectors,source,"
                + ",".join(ALL_CODECS)
                + ",zstd_published,elf_published,alp_published\n")
        for i, nm, alp, nrg, nv, source, comp in rows:
            pz, pe, pa = published(nm)
            pub = ",".join("" if x is None else f"{x:.2f}"
                           for x in (pz, pe, pa))
            f.write(f"{i},{nm},{alp:.2f},{nrg},{nv},{source},"
                    + ",".join("" if comp[n] is None else f"{comp[n]:.2f}"
                               for n in ALL_CODECS)
                    + f",{pub}\n")
    _write_metadata(path + ".metadata")
    if rows:
        avg = float(np.mean([r[2] for r in rows]))
        print(f"== {name}: ALP suite average {avg:.2f} bits/value "
              f"({len(rows)} columns)")


if __name__ == "__main__":
    suite(datasets.ALP_DATASET, np.float64, "double")
    suite(datasets.FLOAT_TEST_DATASET, np.float32, "float_test")
    suite(datasets.GENERATED_COLUMNS, np.float64, "generated")
    suite(datasets.ISSUE_DATASET, np.float64, "issue")
    # data-gated float suites: light up when the corpora are mounted
    # (reference data/include/float/{hurricane_isabel,sp}.hpp env paths)
    if datasets.hurricane_dir():
        suite(datasets.HURRICANE_ISABEL, np.float32, "hurricane_isabel")
    if any(c.binary_path is not None
           for c in datasets.SP_DATASETS):
        suite(datasets.SP_DATASETS, np.float32, "sp")
