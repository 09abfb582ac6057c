"""Benchmark reporters: compression-ratio and speed CSVs + metadata.

Mirrors the reference's result formats so downstream tooling ports over:
* ratio CSV header ``idx,column,data_type,size,rowgroups_count,
  vectors_count,decompression_speed(cycles_per_value),compression_speed
  (cycles_per_value),`` (reference benchmarks/benchmark.cpp:32-36,
  benchmarks/result/compression_ratio/double/alp_dataset.csv:1) — the
  speed columns report GB/s here (cycles/value is meaningless on TPU;
  the unit is recorded in the metadata sidecar).
* speed CSV ``benchmark_number,name,iterations,...`` with a ``.metadata``
  sidecar (reference fls_bench reporter,
  benchmarks/fls_bench/fls_bench.hpp:1826-2112).
"""

from __future__ import annotations

import datetime
import platform

import numpy as np

from . import container
from . import constants as C
from .utils import io as uio


RATIO_HEADER = ("idx,column,data_type,size,rowgroups_count,vectors_count,"
                "decompression_speed(GB_per_s),compression_speed(GB_per_s),")


def ratio_report(columns, out_path, dtype=np.float64,
                 speeds: dict | None = None) -> list:
    """Compress every dataset column; write the ratio CSV. Returns rows."""
    rows = []
    for i, col in enumerate(columns, 1):
        try:
            data = uio.read_column(col, prefer_binary=True)
        except FileNotFoundError:
            continue
        data = data.astype(dtype) if data.dtype != np.dtype(dtype) else data
        cc = container.compress(data)
        out = container.decompress(cc)
        ut = np.uint64 if dtype == np.float64 else np.uint32
        assert (out.view(ut) == data.view(ut)).all(), col.name
        n_vec = cc.n_vectors
        n_rg = cc.n_rowgroups
        dec_s, enc_s = (speeds or {}).get(col.name, (0.0, 0.0))
        rows.append((i, col.name, np.dtype(dtype).name, cc.bits_per_value(),
                     n_rg, n_vec, dec_s, enc_s))
    with open(out_path, "w") as f:
        f.write(RATIO_HEADER + "\n")
        for r in rows:
            f.write(f"{r[0]},{r[1]},{r[2]},{r[3]:.2f},{r[4]},{r[5]},"
                    f"{r[6]:.2f},{r[7]:.2f},\n")
    _write_metadata(out_path + ".metadata")
    return rows


def speed_report(results, out_path, header=None) -> None:
    """results: [(name, iterations, value, unit)] -> fls_bench-style CSV.

    ``header``: custom column tuple — rows are then written verbatim
    (used by the e2e query table, table_6-style)."""
    with open(out_path, "w") as f:
        if header is not None:
            import csv as _csv
            w = _csv.writer(f, lineterminator="\n")
            w.writerow(header)
            for row in results:
                w.writerow([str(x) for x in row])
        else:
            f.write("benchmark_number,name,iterations,throughput,unit\n")
            for i, (name, iters, value, unit) in enumerate(results, 1):
                f.write(f"{i},{name},{iters},{value:.3f},{unit}\n")
    _write_metadata(out_path + ".metadata")


def _write_metadata(path) -> None:
    """Sidecar like the fls_bench .metadata (hardware + build info)."""
    try:
        import jax
        dev = jax.devices()[0]
        dev_str = f"{dev.platform}:{dev.device_kind}"
    except Exception:
        dev_str = "unknown"
    with open(path, "w") as f:
        f.write(datetime.datetime.now(datetime.timezone.utc).isoformat()
                + "\n")
        f.write(f"Device: {dev_str}\n")
        f.write(f"Host: {platform.platform()} {platform.machine()}\n")
        f.write("Units: speeds in GB/s of decoded values (TPU wall clock)\n")
