"""Per-primitive TPU speed sweep -> results/speed_tpu.csv (reference
publication/source_code/bench_speed analog) and an end-to-end SUM query
bench (bench_end_to_end q1 analog).

Run on the TPU terminal: python scripts/bench_speed.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import alp_tpu  # noqa: F401
from alp_tpu import container, engine
from alp_tpu.benchlib import loop_bench
from alp_tpu.kernels import falp as kf
from alp_tpu.reports import speed_report

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
G = 4096   # 32k double vectors = 256 MiB decoded per launch
ITERS = 30


def devbits(shape, seed=0):
    return jax.jit(lambda: jax.random.bits(
        jax.random.PRNGKey(seed), shape, dtype=jnp.uint32))()


def main():
    zero = jnp.zeros((G, 128), jnp.uint32)
    onem = jnp.ones((G, 128), jnp.uint32)
    one = np.full((G, 128), np.float64(1e-9).view(np.uint64))
    frlo = jax.device_put(jnp.asarray(
        (one & np.uint64(0xFFFFFFFF)).astype(np.uint32)))
    frhi = jax.device_put(jnp.asarray(
        (one >> np.uint64(32)).astype(np.uint32)))
    out_gb = G * 64 * 128 * 8 / 1e9
    results = []

    for bw in (8, 16, 24, 32, 42, 52, 64):
        packed = devbits((G, 2 * bw, 128), seed=bw)

        def step_falp(carry, packed, frlo, frhi, bw=bw):
            hi, lo = kf.falp_decode_f64(packed, zero + carry, zero, onem,
                                        zero, frlo, frhi, bw=bw)
            return hi[0, 0, 0] ^ lo[0, 0, 0]

        dt = loop_bench(step_falp, (packed, frlo, frhi), ITERS)
        results.append((f"falp_f64_bw{bw}", ITERS, out_gb / dt, "GB/s"))
        print(results[-1], flush=True)

    for bw in (16, 52):
        packed = devbits((G, 2 * bw, 128), seed=bw)

        def step_unffor(carry, packed, bw=bw):
            hi, lo = kf.unffor_tile(packed, zero + carry, zero, bw=bw,
                                    element_bits=64)
            return hi[0, 0, 0] ^ lo[0, 0, 0]

        dt = loop_bench(step_unffor, (packed,), ITERS)
        results.append((f"unffor_f64_bw{bw}", ITERS, out_gb / dt, "GB/s"))
        print(results[-1], flush=True)

    left = jax.jit(lambda: jax.random.bits(
        jax.random.PRNGKey(7), (G, 64, 128),
        dtype=jnp.uint32) >> jnp.uint32(16))()
    packed52 = devbits((G, 104, 128), seed=52)

    def step_rd(carry, packed52, left):
        hi, lo = kf.rd_decode_f64(packed52, left ^ carry, rbw=52)
        return hi[0, 0, 0] ^ lo[0, 0, 0]

    dt = loop_bench(step_rd, (packed52, left), ITERS)
    results.append(("rd_decode_f64_rbw52", ITERS, out_gb / dt, "GB/s"))
    print(results[-1], flush=True)

    # float kernels (4 vectors/group; 256 MiB decoded)
    Gf = 4 * G
    out_gb_f = Gf * 32 * 128 * 4 / 1e9
    zf = jnp.zeros((Gf, 128), jnp.uint32)
    onef = jnp.ones((Gf, 128), jnp.uint32)
    fr32 = jax.device_put(jnp.asarray(
        np.full((Gf, 128), np.float32(0.01).view(np.uint32))))
    for bw in (10, 20):
        packedf = devbits((Gf, bw, 128), seed=100 + bw)

        def step_f32(carry, packedf, fr32, bw=bw):
            out = kf.falp_decode_f32(packedf, zf + carry, onef, fr32, bw=bw)
            return out[0, 0, 0]

        dt = loop_bench(step_f32, (packedf, fr32), ITERS)
        results.append((f"falp_f32_bw{bw}", ITERS, out_gb_f / dt, "GB/s"))
        print(results[-1], flush=True)

    # end-to-end SUM query over a real compressed column (q1 analog):
    # plan staged once, fused decode + reduction timed as one program
    from alp_tpu.kernels import decode as kdecode
    data = np.fromfile(
        "/root/reference/data/1_rg_data_sample/city_temperature_f_tw.bin",
        np.float64)
    big = np.tile(data, 64)                       # 64 MiB
    cc = container.compress(big)
    plan = kdecode.build_plan(cc)
    step, metas = engine.make_sum_step(plan)
    dt = loop_bench(step, metas, 20)
    results.append(("e2e_sum_query_64MiB", 20, big.nbytes / dt / 1e9,
                    "GB/s"))
    print(results[-1], flush=True)

    speed_report(results, os.path.join(ROOT, "results", "speed_tpu.csv"))


if __name__ == "__main__":
    main()
