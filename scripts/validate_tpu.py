"""Hardware validation: the golden correctness suite on the REAL chip.

CI and pytest exercise every kernel in Pallas interpret mode on CPU;
this script replays the end-to-end contracts on actual TPU hardware
(Mosaic-compiled kernels), where lowering or numerics could in
principle diverge:

* every reference dataset sample (30 doubles + edge/issue cases):
  host compress -> DEVICE fused decode (decompress_device) must be
  bit-exact vs the input, and the plan's fast-variant routing is
  reported;
* device compress (compress_device: Pallas planning scorer + fused
  encode/analyze + patch-fused pack) must produce byte-identical
  containers to the host engine;
* the engine's exact aggregates (SUM == math.fsum, MIN/MAX, fused
  filter COUNT vs numpy) on device.

Run on the TPU terminal:  python scripts/validate_tpu.py
Writes results/tpu_validation.txt (one line per check).
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import alp_tpu  # noqa: F401
    from alp_tpu import container, engine
    from alp_tpu.device_compress import compress_device
    from alp_tpu.kernels import decode as kdecode
    from alp_tpu.utils import datasets, io

    assert jax.default_backend() == "tpu", "run on the TPU terminal"
    lines = []

    def check(name, ok, extra=""):
        line = f"{'PASS' if ok else 'FAIL'} {name} {extra}".rstrip()
        lines.append(line)
        print(line, flush=True)
        return ok

    all_ok = True
    for col in datasets.ALP_DATASET:
        try:
            data = io.read_column(col)
        except FileNotFoundError:
            continue
        cc = container.compress(data)
        out = kdecode.decompress_device(cc)
        from alp_tpu import constants as C
        vec_rg = np.arange(cc.n_vectors) // C.N_VECTORS_PER_ROWGROUP
        # RD vectors are left zero by decompress_device; compare ALP ones
        plan = kdecode.build_plan(cc)
        variants = sorted({(g.bw, g.variant) for g in plan.groups})
        vectors, _ = container._pad_to_vectors(data)
        alp_vec = cc.rg_scheme[vec_rg] == C.SCHEME_ALP
        ok = np.array_equal(
            out[alp_vec].view(np.uint64),
            vectors[alp_vec].view(np.uint64))
        all_ok &= check(f"device-decode {col.name}", ok,
                        f"variants={variants}")
        # device compress covers ALP *and* ALP_RD rowgroups (round 4)
        ccd = compress_device(data)
        all_ok &= check(f"device-compress {col.name}",
                        ccd.to_bytes() == cc.to_bytes())

    rng = np.random.default_rng(3)
    d = np.round(rng.normal(40, 25, 12_000), 2)
    d[5] = -0.0
    cc = container.compress(d)
    all_ok &= check("exact SUM == math.fsum",
                    engine.query_sum(cc) == math.fsum(d))
    all_ok &= check("MIN/MAX exact",
                    engine.query_min(cc) == d.min()
                    and engine.query_max(cc) == d.max())
    want = int(np.sum((d >= 10.0) & (d <= 60.0)))
    all_ok &= check("fused filter COUNT",
                    engine.query_filter_count(cc, 10.0, 60.0) == want)
    # GROUP-BY: exact per-group fsum via the one-hot MXU matmul pass
    gk = (np.arange(d.size) * 17) % 6
    gb = engine.query_groupby(cc, gk, 6)
    all_ok &= check(
        "GROUP-BY exact (sum/count/min/max x 6 groups)",
        all(float(gb["sum"][g]) == math.fsum(d[gk == g].tolist())
            and gb["count"][g] == (gk == g).sum()
            and gb["max"][g] == d[gk == g].max()
            and gb["min"][g] == d[gk == g].min() for g in range(6)))
    # QUANTILE: exact rank selection == numpy
    all_ok &= check(
        "QUANTILE == np.quantile (0/0.25/0.5/0.9/1)",
        all(engine.query_quantile(cc, q) == np.quantile(d, q)
            for q in (0.0, 0.25, 0.5, 0.9, 1.0)))
    # filtered SUM: exact predicate aggregation
    all_ok &= check(
        "FILTER SUM exact (10 <= v <= 60)",
        engine.query_filter_sum(cc, 10.0, 60.0)
        == math.fsum(d[(d >= 10.0) & (d <= 60.0)].tolist()))

    path = os.path.join(ROOT, "results", "tpu_validation.txt")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(("ALL PASS" if all_ok else "FAILURES") + f" -> {path}")
    if not all_ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
