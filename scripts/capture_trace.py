"""Capture a jax.profiler trace of the fused falp decode kernel.

The reference's observability layer is per-primitive cycle counters
(benchmarks/fls_bench/fls_bench.hpp:515-776); the TPU-native equivalent
is a Perfetto-compatible profiler trace (SURVEY.md §5.1).  Writes the
trace directory under results/traces/ — load it at ui.perfetto.dev or
via tensorboard's profile plugin.

Run on the TPU terminal: python scripts/capture_trace.py
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import alp_tpu  # noqa: F401
from alp_tpu.kernels import falp as kf

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "results", "traces")


def main():
    G = 1024                      # 64 MiB decoded per launch
    bw = 16
    zero = jnp.zeros((G, 128), jnp.uint32)
    packed = jax.jit(lambda: jax.random.bits(
        jax.random.PRNGKey(0), (G, 2 * bw, 128), dtype=jnp.uint32))()
    frac_u = int(np.float64(1e-9).view(np.uint64))
    fsig = (frac_u & ((1 << 52) - 1)) | (1 << 52)
    cc = fsig                     # fac = 0
    s_c = 95 - (cc.bit_length() - 1)
    cc <<= s_c
    mk = lambda v: jnp.full((G, 128), np.uint32(v & 0xFFFFFFFF), jnp.uint32)
    c2, c1, c0 = mk(cc >> 64), mk(cc >> 32), mk(cc)
    fb2 = mk(((frac_u >> 52) & 0x7FF) + 74 - s_c)

    def run():
        hi, lo = kf.falp_decode_f64_mid(packed, zero, c2, c1, c0, fb2,
                                        bw=bw, c0zero=True, nonneg=True,
                                        cheap_msb=True)
        return (hi[0, 0, 0] ^ lo[0, 0, 0]).block_until_ready()

    run()                         # compile outside the trace
    os.makedirs(OUT, exist_ok=True)
    with jax.profiler.trace(OUT):
        for _ in range(8):
            run()
    produced = glob.glob(os.path.join(OUT, "**", "*"), recursive=True)
    print(f"trace captured: {len(produced)} files under {OUT}")


if __name__ == "__main__":
    main()
