"""CLI: compress/inspect your own dataset (bench_your_dataset analog).

    python -m alp_tpu <file.bin|file.csv> [--f32] [--no-verify]

Mirrors the reference's benchmarks/bench_your_dataset.cpp flow: load a
raw little-endian binary or one-value-per-line CSV column, compress with
adaptive scheme selection, report the cost-model ratio and host
throughputs, and verify the bit-exact round-trip.
"""

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(prog="python -m alp_tpu",
                                 description=__doc__)
    ap.add_argument("path", help="raw .bin (little-endian) or .csv column")
    ap.add_argument("--f32", action="store_true",
                    help="treat data as float32 (default float64)")
    ap.add_argument("--no-verify", action="store_true")
    args = ap.parse_args(argv)

    from alp_tpu import container
    from alp_tpu.utils import io as uio
    from alp_tpu import constants as C

    dtype = np.float32 if args.f32 else np.float64
    if args.path.endswith(".csv"):
        data = uio.read_csv(args.path, dtype)
    else:
        data = np.fromfile(args.path, dtype)
    print(f"{len(data):,} values ({data.nbytes / 1e6:.1f} MB)")

    t0 = time.perf_counter()
    cc = container.compress(data)
    enc_dt = time.perf_counter() - t0
    schemes = {C.SCHEME_ALP: "ALP", C.SCHEME_ALP_RD: "ALP_RD"}
    used = sorted({schemes[s] for s in cc.rg_scheme})
    print(f"scheme(s): {', '.join(used)}   rowgroups: {cc.n_rowgroups}   "
          f"vectors: {cc.n_vectors}")
    print(f"bits/value (cost model): {cc.bits_per_value():.2f}  "
          f"(raw: {np.dtype(dtype).itemsize * 8})")
    blob = cc.to_bytes()
    print(f"serialized: {len(blob):,} bytes "
          f"({len(blob) / data.nbytes:.3f}x raw)")
    print(f"compress:   {data.nbytes / enc_dt / 1e9:.3f} GB/s (host)")

    t0 = time.perf_counter()
    out = container.decompress(cc)
    dec_dt = time.perf_counter() - t0
    print(f"decompress: {data.nbytes / dec_dt / 1e9:.3f} GB/s (host)")

    if not args.no_verify:
        ut = np.uint64 if dtype == np.float64 else np.uint32
        assert (out.view(ut) == data.view(ut)).all(), "round-trip mismatch!"
        print("round-trip: bit-exact OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
