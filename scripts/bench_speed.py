"""Per-primitive TPU speed sweep -> results/speed_tpu.csv (reference
publication/source_code/bench_speed analog) and an end-to-end SUM query
bench (bench_end_to_end q1 analog).

Run on the TPU terminal: python scripts/bench_speed.py
"""

import os
import sys

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

    # production routing (kernels/decode.py build_plan): synthetic
    # fact=1 profiles route to the mid single-rounding kernel for
    # bw <= 32 (c0zero+nonneg, cheap_msb when max |n| < 2^24), and to
    # the generic two-rounding softfloat kernel above that
    from alp_tpu import constants as C

    def mid_planes(fac, exp):
        frac_u = int(np.float64(C.DOUBLE.frac_arr[exp]).view(np.uint64))
        fsig = (frac_u & ((1 << 52) - 1)) | (1 << 52)
        cc = (5 ** fac) * fsig
        s_c = 95 - (cc.bit_length() - 1)
        cc <<= s_c
        fb = (frac_u >> 52) & 0x7FF
        mk = lambda v: jnp.full((G, 128), np.uint32(v & 0xFFFFFFFF),
                                jnp.uint32)
        return (mk(cc >> 64), mk(cc >> 32), mk(cc),
                mk(fb + 74 + fac - s_c))

    def mid64_planes(fac, exp):
        frac_u = int(np.float64(C.DOUBLE.frac_arr[exp]).view(np.uint64))
        fsig = (frac_u & ((1 << 52) - 1)) | (1 << 52)
        cc = (5 ** fac) * fsig
        assert cc.bit_length() <= 64
        s_c = 63 - (cc.bit_length() - 1)
        cc <<= s_c
        fb = (frac_u >> 52) & 0x7FF
        mk = lambda v: jnp.full((G, 128), np.uint32(v & 0xFFFFFFFF),
                                jnp.uint32)
        return mk(cc >> 32), mk(cc), mk(fb + 74 + fac - s_c)

    def c96_planes(fac, exp):
        frac_u = int(np.float64(C.DOUBLE.frac_arr[exp]).view(np.uint64))
        fsig = (frac_u & ((1 << 52) - 1)) | (1 << 52)
        cc = (5 ** fac) * fsig
        assert 64 < cc.bit_length() <= 80
        s_c = 95 - (cc.bit_length() - 1)
        cc <<= s_c
        fb = (frac_u >> 52) & 0x7FF
        mk = lambda v: jnp.full((G, 128), np.uint32(v & 0xFFFFFFFF),
                                jnp.uint32)
        return mk(cc >> 64), mk(cc >> 32), mk(cc), mk(fb + 106 + fac - s_c)

    c2p, c1p, c0p, fb2p = mid_planes(0, 9)
    c1p64, c0p64, fb2p64 = mid64_planes(0, 9)
    for bw in (8, 16, 24, 32, 42, 52, 64):
        packed = devbits((G, 2 * bw, 128), seed=bw)
        if bw <= 31:   # bw 32 cannot prove n in int32 -> mid64 instead
            def step_falp(carry, packed, bw=bw):
                # alo_zero: base 0 -> max |n| = 2^bw - 1 < 2^16 provable
                # for bw <= 16 (the plan emits the same flag)
                hi, lo = kf.falp_decode_f64_mid(
                    packed, zero + carry, c2p, c1p, c0p, fb2p, bw=bw,
                    c0zero=True, nonneg=True, cheap_msb=bw <= 24,
                    alo_zero=bw <= 16)
                return hi[0, 0, 0] ^ lo[0, 0, 0]
            dt = loop_bench(step_falp, (packed,), ITERS)
        elif bw <= 52:
            # production routing (build_plan): fac = 0 profiles at bw
            # 33..52 prove |n * 5^0| < 2^53 with a 64-bit constant ->
            # the mid64 single-rounding kernel (nonneg: base 0)
            def step_falp(carry, packed, bw=bw):
                # alo_zero provable for bw <= 48 (max |n| < 2^48)
                hi, lo = kf.falp_decode_f64_mid64(
                    packed, zero + carry, zero, c1p64, c0p64, fb2p64,
                    bw=bw, nonneg=True, alo_zero=bw <= 48)
                return hi[0, 0, 0] ^ lo[0, 0, 0]
            dt = loop_bench(step_falp, (packed,), ITERS)
        else:
            # bw > 52 cannot prove the odd-part bound: generic
            # two-rounding softfloat, with the fac-0 FACT multiply
            # statically skipped (fact1), as build_plan routes it
            def step_falp(carry, packed, frlo, frhi, bw=bw):
                hi, lo = kf.falp_decode_f64(packed, zero + carry, zero,
                                            onem, zero, frlo, frhi, bw=bw,
                                            fact1=True)
                return hi[0, 0, 0] ^ lo[0, 0, 0]
            dt = loop_bench(step_falp, (packed, frlo, frhi), ITERS)
        results.append((f"falp_f64_bw{bw}", ITERS, out_gb / dt, "GB/s"))
        print(results[-1], flush=True)

    # midc96 row: the 64x96 single-rounding variant on the CMS/1-style
    # profile (fac 5, bw 41) that routes here in production
    packed41 = devbits((G, 82, 128), seed=41)
    c2q, c1q, c0q, fb2q = c96_planes(5, 14)

    def step_c96(carry, packed):
        hi, lo = kf.falp_decode_f64_midc96(
            packed, zero + carry, zero, c2q, c1q, c0q, fb2q, bw=41,
            nonneg=True, alo_zero=True)
        return hi[0, 0, 0] ^ lo[0, 0, 0]

    dt = loop_bench(step_c96, (packed41,), ITERS)
    results.append(("falp_f64_midc96_bw41", ITERS, out_gb / dt, "GB/s"))
    print(results[-1], flush=True)

    # generic-kernel reference rows (the softfloat two-rounding path the
    # plan uses when the FFOR bounds cannot prove a fast domain)
    for bw in (11, 16, 42, 52):
        packed = devbits((G, 2 * bw, 128), seed=bw)

        def step_gen(carry, packed, frlo, frhi, bw=bw):
            hi, lo = kf.falp_decode_f64(packed, zero + carry, zero, onem,
                                        zero, frlo, frhi, bw=bw)
            return hi[0, 0, 0] ^ lo[0, 0, 0]

        dt = loop_bench(step_gen, (packed, frlo, frhi), ITERS)
        results.append((f"falp_f64_generic_bw{bw}", ITERS, out_gb / dt,
                        "GB/s"))
        print(results[-1], flush=True)

    # const (bw 0) broadcast row: gov-style constant columns decode as a
    # pure output-bandwidth write
    hi_c = devbits((G, 128), seed=100)
    lo_c = devbits((G, 128), seed=101)

    def step_const(carry, hi_p, lo_p):
        hi, lo = kf.falp_decode_f64_const(hi_p ^ carry, lo_p)
        # ADD, don't XOR: the const decode is affine in carry, so an
        # XOR checksum gives a period-2 loop state XLA can hoist (the
        # old 656 GB/s reading exceeded HBM write bandwidth)
        return carry + hi[0, 0, 0] + lo[0, 0, 0]

    dt = loop_bench(step_const, (hi_c, lo_c), ITERS)
    results.append(("falp_f64_const_bw0", ITERS, out_gb / dt, "GB/s"))
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

    # encode WITHOUT sampling (bench_alp_encode_without_sampling analog):
    # fixed per-vector (e, f), exact encode+verify kernel only — isolates
    # the (e, f) search cost the full pipeline adds
    from alp_tpu.kernels import encode as kenc
    Ge = 2048                                      # 128 MiB of doubles
    in_gb_e = Ge * 64 * 128 * 8 / 1e9
    # f64 bit planes widened from random f32 values on device (pure u32
    # ops: exact f32->f64 bit widening, no emulated-f64 dependency)
    def make_planes():
        v = jax.random.uniform(jax.random.PRNGKey(3), (Ge, 64, 128),
                               jnp.float32, 1.0, 100.0)
        b = v.view(jnp.uint32)
        sign = b >> 31
        e32 = (b >> 23) & jnp.uint32(0xFF)
        frac = b & jnp.uint32(0x7FFFFF)
        hi = ((sign << 31) | ((e32 + jnp.uint32(1023 - 127)) << 20)
              | (frac >> 3))
        lo = frac << 29
        return hi, lo

    vhi, vlo = jax.jit(make_planes)()

    def const_plane(x64):
        u = np.full((Ge, 128), x64, np.uint64)
        return (jnp.asarray((u & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
                jnp.asarray((u >> np.uint64(32)).astype(np.uint32)))

    tc = C.DOUBLE
    e_, f_ = 14, 12
    c1lo, c1hi = const_plane(np.float64(tc.exp_arr[e_]).view(np.uint64))
    c2lo, c2hi = const_plane(np.float64(tc.frac_arr[f_]).view(np.uint64))
    flo_, fhi_ = const_plane(np.uint64(tc.fact_arr[f_]))
    frlo_, frhi_ = const_plane(np.float64(tc.frac_arr[e_]).view(np.uint64))

    def step_enc(carry, vhi, vlo):
        nh, nl, exc, rare = kenc.alp_encode_f64_tiles(
            vhi, vlo ^ carry, c1lo, c1hi, c2lo, c2hi, flo_, fhi_,
            frlo_, frhi_)
        return nh[0, 0, 0] ^ nl[0, 0, 0] ^ exc[0, 0, 0]

    dt = loop_bench(step_enc, (vhi, vlo), 15)
    results.append(("encode_f64_without_sampling", 15, in_gb_e / dt,
                    "GB/s"))
    print(results[-1], flush=True)

    def step_encpipe(carry, vhi, vlo):
        nh, nl, exc, rare = kenc.alp_encode_f64_tiles(
            vhi, vlo ^ carry, c1lo, c1hi, c2lo, c2hi, flo_, fhi_,
            frlo_, frhi_)
        bw_, base_, _mx = kenc.analyze_planes_f64(nh, nl)
        packed = kf.ffor_planes_f64(
            nh, nl, jnp.zeros((Ge, 128), jnp.uint32),
            jnp.zeros((Ge, 128), jnp.uint32), bw=48)
        return (nh[0, 0, 0] ^ packed[0, 0, 0]
                ^ bw_[0].astype(jnp.uint32))

    dt = loop_bench(step_encpipe, (vhi, vlo), 15)
    results.append(("encode_f64_pipeline_device", 15, in_gb_e / dt,
                    "GB/s"))
    print(results[-1], flush=True)

    # f32 encode kernel (all-native f32/i32; 128 MiB in)
    from alp_tpu.kernels.encode import alp_encode_f32_tiles
    Gf32 = 8192
    in_gb_f32 = Gf32 * 32 * 128 * 4 / 1e9
    vt32 = jax.jit(lambda: jax.random.bits(
        jax.random.PRNGKey(5), (Gf32, 32, 128),
        dtype=jnp.uint32) >> jnp.uint32(2))()
    tcf = C.FLOAT
    mkf = lambda v: jnp.full((Gf32, 128), np.uint32(v), jnp.uint32)
    ec1 = mkf(np.float32(tcf.exp_arr[4]).view(np.uint32))
    ec2 = mkf(np.float32(tcf.frac_arr[2]).view(np.uint32))
    efa = mkf(np.int64(tcf.fact_arr[2]) & 0xFFFFFFFF)
    efr = mkf(np.float32(tcf.frac_arr[4]).view(np.uint32))

    def step_e32(carry, vt32):
        n_, e_ = alp_encode_f32_tiles(vt32 ^ carry, ec1, ec2, efa, efr)
        return n_[0, 0, 0] ^ e_[0, 0, 0]

    dt = loop_bench(step_e32, (vt32,), 20)
    results.append(("encode_f32_kernel", 20, in_gb_f32 / dt, "GB/s"))
    print(results[-1], flush=True)

    # f32 device encode pipeline: encode+verify -> patch/count ->
    # analyze -> FFOR pack (the f32 twin of encode_f64_pipeline_device)
    from alp_tpu.kernels.encode import alp_encode_f32_tiles_stats
    from alp_tpu.device_compress import (finalize_encode_stats32,
                                         patch_planes32)

    def step_e32pipe(carry, vt32):
        n_, e_, st = alp_encode_f32_tiles_stats(vt32 ^ carry, ec1, ec2,
                                                efa, efr)
        bw_, base_, _mx, n_exc, fill_ = finalize_encode_stats32(st, n_)
        n_ = patch_planes32(n_, e_, fill_)
        packed = kf.ffor_tile(n_, jnp.zeros((Gf32, 128), jnp.uint32),
                              jnp.zeros((Gf32, 128), jnp.uint32),
                              bw=30, element_bits=32)
        return (packed[0, 0, 0] ^ bw_[0].astype(jnp.uint32)
                ^ n_exc.sum(dtype=jnp.int32).astype(jnp.uint32))

    dt = loop_bench(step_e32pipe, (vt32,), 15)
    results.append(("encode_f32_pipeline_device", 15, in_gb_f32 / dt,
                    "GB/s"))
    print(results[-1], flush=True)

    # fused decode+SUM (mid variant): reduction inside the kernel, no
    # decoded-plane writes (q1 full-fusion analog)
    packed16 = devbits((G, 32, 128), seed=16)

    def step_fsum(carry, packed16):
        part = kf.falp_decode_f64_variant_sum(
            packed16, (zero + carry, c2p, c1p, c0p, fb2p), variant="mid",
            bw=16, flags=1 | 2 | 4)
        return jax.lax.bitcast_convert_type(part[0, 0], jnp.uint32)

    dt = loop_bench(step_fsum, (packed16,), ITERS)
    results.append(("falp_sum_fused_f64_bw16", ITERS, out_gb / dt, "GB/s"))
    print(results[-1], flush=True)

    # fused decode + EXACT SUM (superaccumulator epilogue): the
    # correct-answer SUM partials produced inside the kernel — same
    # shape as above but every digit accounted exactly
    def step_xsum(carry, packed16):
        rows = kf.falp_decode_f64_variant_exact_sum(
            packed16, (zero + carry, c2p, c1p, c0p, fb2p), variant="mid",
            bw=16, flags=1 | 2 | 4)
        return rows[0, 0, 0].astype(jnp.uint32)

    dt = loop_bench(step_xsum, (packed16,), ITERS)
    results.append(("falp_sum_exact_fused_f64_bw16", ITERS, out_gb / dt,
                    "GB/s"))
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

    # fused f32 decode + EXACT-SUM partials (superaccumulator epilogue)
    packedf20 = devbits((Gf, 20, 128), seed=120)

    def step_xsum32(carry, packedf20, fr32):
        rows = kf.falp_decode_f32_exact_sum(packedf20, zf + carry, onef,
                                            fr32, bw=20)
        return rows[0, 0, 0].astype(jnp.uint32)

    dt = loop_bench(step_xsum32, (packedf20, fr32), ITERS)
    results.append(("falp_sum_exact_fused_f32_bw20", ITERS, out_gb_f / dt,
                    "GB/s"))
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

    stepx, metasx = engine.make_exact_sum_step(plan)
    dt = loop_bench(stepx, metasx, 20)
    results.append(("e2e_exact_sum_query_64MiB", 20,
                    big.nbytes / dt / 1e9, "GB/s"))
    print(results[-1], flush=True)

    speed_report(results, os.path.join(ROOT, "results", "speed_tpu.csv"))


if __name__ == "__main__":
    main()
