"""Headline benchmark: fused falp decode throughput on TPU.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

Metric: decoded double GB/s of the fused unFFOR+multiply (falp) decode
path on one chip, on a real dataset profile (Air-Pressure, bw=16 after ALP
encoding — reference data/include/double/alp_dataset.hpp:9).  Baseline:
the reference's CPU speed-of-light, ~0.5 cycles/value @3.5 GHz ≈ 56 GB/s
decoded doubles per core (BASELINE.md §3).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax

BASELINE_GBPS = 56.0


def main():
    import alp_tpu  # noqa: F401
    from alp_tpu import container
    from alp_tpu.utils import datasets, io
    from alp_tpu.kernels import decode as kdecode

    col = datasets.ALP_DATASET[0]  # Air-Pressure
    path = "/root/reference/data/1_rg_data_sample/neon_air_pressure.bin"
    if os.path.exists(path):
        data = np.fromfile(path, np.float64)
    else:
        data = io.read_csv(col.csv_path, np.float64)
    cc = container.compress(data)

    # Tile the compressed rowgroup out to a bench-sized column (~0.5 GiB
    # decoded) by replicating vectors; decode cost is shape-driven.
    target_vectors = 64 * 1024
    reps = max(1, target_vectors // cc.n_vectors)
    big = container.CompressedColumn(
        dtype=cc.dtype, n_values=cc.n_vectors * reps * 1024,
        n_vectors=cc.n_vectors * reps,
        rg_scheme=np.tile(cc.rg_scheme, reps),
        rd_dict=np.tile(cc.rd_dict, (reps, 1)),
        rd_dict_size=np.tile(cc.rd_dict_size, reps),
        rd_left_bw=np.tile(cc.rd_left_bw, reps),
        rd_right_bw=np.tile(cc.rd_right_bw, reps),
        fac=np.tile(cc.fac, reps), exp=np.tile(cc.exp, reps),
        bit_width=np.tile(cc.bit_width, reps), base=np.tile(cc.base, reps),
        exc_count=np.tile(cc.exc_count, reps),
        packed=cc.packed * reps, left_packed=cc.left_packed * reps,
        exc_values=cc.exc_values * reps,
        exc_positions=cc.exc_positions * reps)

    plan = kdecode.build_plan(big)
    # warmup + compile
    jax.block_until_ready(plan.run())
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = plan.run()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    gbps = plan.decoded_bytes / dt / 1e9

    print(json.dumps({
        "metric": "falp_decode_f64_throughput",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / BASELINE_GBPS, 3),
    }))


if __name__ == "__main__":
    main()
