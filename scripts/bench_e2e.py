"""End-to-end query benchmark -> results/e2e_queries.csv (table-6 analog).

The reference's headline e2e result is SCAN/SUM/COMPRESSION queries over
ALP and competitor-compressed columns at 1/8/16 TBB threads (reference
publication/source_code/bench_end_to_end/, tables/table_6.md: ALP 59.3x
faster than Chimp at 1 thread).  The TPU analog:

* ALP queries run on one TPU chip (fused falp decode + on-device
  reduction, plan staged once — the steady-state query shape);
* competitor schemes decode with the native single-core C++ codecs
  (native/competitors.cpp) — the same codec class the reference times;
* the COMPRESSION query compresses raw input inside the pipeline (host
  engine and, when a TPU is present, the device encode path);
* a functional mesh-scaling block runs the container round trip over
  1/2/4/8 virtual devices (real chips being single in this environment;
  the driver validates the same path via dryrun_multichip).

Run on the TPU terminal: python scripts/bench_e2e.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SAMPLE = "/root/reference/data/1_rg_data_sample/city_temperature_f_tw.bin"
REPS = 512          # ~400 MiB of doubles for competitor/host numbers
TPU_REPS = 2048     # ~1.6 GiB decoded for the device query rows (the
                    # warm wall-clock rows amortise the ~35 ms/dispatch
                    # tunnel RPC constant; slope rows are unaffected)


def main():
    import jax
    import alp_tpu  # noqa: F401
    from alp_tpu import container, engine, native
    from alp_tpu.benchlib import loop_bench
    from alp_tpu.kernels import decode as kdecode
    from alp_tpu.reports import speed_report

    rows = []
    base = np.fromfile(SAMPLE, np.float64)
    data = np.tile(base, REPS)                     # ~400 MiB
    on_tpu = jax.default_backend() == "tpu"

    # ---- ALP queries on device (plan staged once, q1 shape) -----------
    cc = container.compress(np.tile(base, TPU_REPS))
    plan = kdecode.build_plan(cc)
    step, metas = engine.make_sum_step(plan)
    dt = loop_bench(step, metas, 20)
    gbps = plan.decoded_bytes / dt / 1e9
    # SUM-shaped throughput: fused decode + checksum-grade reduction
    # (make_sum_step docstring); engine.query_sum is the exact-answer API
    rows.append(("SUM-shaped scan (checksum reduce)", "ALP", "1 chip",
                 round(gbps, 2), 1.0))
    print(rows[-1], flush=True)

    # EXACT SUM (bit-identical to math.fsum): fused decode +
    # superaccumulator window partials (engine.make_exact_sum_step);
    # decoded planes never leave VMEM — the correct-answer SUM at
    # fused-scan speed
    stepx, metasx = engine.make_exact_sum_step(plan)
    dtx = loop_bench(stepx, metasx, 20)
    rows.append(("SUM exact (== math.fsum; fused)", "ALP", "1 chip",
                 round(plan.decoded_bytes / dtx / 1e9, 2), ""))
    print(rows[-1], flush=True)

    # predicate pushdown: fused decode + total-order-key range COUNT —
    # no decoded planes are written (engine.make_filter_step)
    stepf, metasf = engine.make_filter_step(plan, -15.0, 25.0)
    dtf = loop_bench(stepf, metasf, 20)
    gbps_f = plan.decoded_bytes / dtf / 1e9
    rows.append(("FILTER COUNT (predicate pushdown)", "ALP", "1 chip",
                 round(gbps_f, 2), ""))
    print(rows[-1], flush=True)

    # the same filter WITHOUT pushdown: decode planes to HBM, then key
    # compare + count in XLA — quantifies what fusing the predicate into
    # the kernel saves (the 8 B/value plane write)
    import jax.numpy as _jnp
    from alp_tpu import constants as _C
    klo = np.uint64(engine._float_key(-15.0, np.float64))
    khi = np.uint64(engine._float_key(25.0, np.float64))
    groups = plan.groups
    arg_tuples = [kdecode.group_arrays(g) for g in groups]
    counts_n = [len(a) for a in arg_tuples]

    def step_unfused(carry, *metas):
        total = _jnp.zeros((), _jnp.int32)
        acc = carry
        i = 0
        for g, n in zip(groups, counts_n):
            args = list(metas[i:i + n])
            i += n
            args[1] = args[1] ^ carry
            hi, lo = kdecode.group_decode(g, np.float64)(*args)
            key = engine._key_from_limbs(hi, lo)
            inr = (key >= klo) & (key <= khi)
            total = total + inr.astype(_jnp.int32).sum(dtype=_jnp.int32)
            acc = acc ^ hi[0, 0, 0]
        return acc ^ total.astype(_jnp.uint32)

    metas_u = [a for t in arg_tuples for a in t]
    dtu = loop_bench(step_unfused, tuple(metas_u), 20)
    rows.append(("FILTER COUNT (plane decode; no pushdown)", "ALP",
                 "1 chip", round(plan.decoded_bytes / dtu / 1e9, 2), ""))
    print(rows[-1], flush=True)

    # ORDER-BY LIMIT k and GROUP-BY-bin histogram, two measurements
    # each: the slope-timed ONE-program fused pipeline (tunnel RPC
    # constant cancelled — the same loop_bench convention as the
    # SUM/FILTER rows above) and the warm wall-clock of the full query
    # API (one device dispatch + host assembly; through this
    # environment's tunnel every dispatch pays a fixed ~35 ms RPC that
    # dominates single-query wall-clock — docs/DEVNOTES.md)
    edges6 = [-40.0, -15.0, 0.0, 10.0, 25.0, 45.0]
    stept, metast = engine.make_topk_step(plan, 10)
    dtt = loop_bench(stept, metast, 20)
    rows.append(("TOP-K (k=10; fused pipeline)", "ALP", "1 chip",
                 round(plan.decoded_bytes / dtt / 1e9, 2), ""))
    print(rows[-1], flush=True)
    steph, metash = engine.make_histogram_step(plan, edges6)
    dth = loop_bench(steph, metash, 20)
    rows.append(("HISTOGRAM (6 bins; fused pipeline)", "ALP", "1 chip",
                 round(plan.decoded_bytes / dth / 1e9, 2), ""))
    print(rows[-1], flush=True)

    # GROUP-BY (16 groups): the sorted-permutation path — fused decode
    # + per-vector superaccumulator partials + prefix/gather grouped
    # sums + segmented-scan extremes, ONE program per query over the
    # group-sorted re-encoding (engine._sorted_gb_build; the
    # exact-answer API is engine.query_groupby).  Beyond-reference
    # engine breadth — the reference's e2e set stops at q1 aggregates.
    gb_rng = np.random.default_rng(3)
    gb_keys = gb_rng.integers(0, 16, cc.n_values)
    engine.query_groupby(cc, gb_keys, 16)          # first touch (MXU)
    engine.query_groupby(cc, gb_keys, 16)          # builds sorted cache
    entg = cc._gb_sorted[(id(gb_keys), 16)]
    progg, flatg = entg["prog"]
    import jax.numpy as jnp

    def stepg(carry, *args):
        args = list(args)
        args[1] = args[1] ^ carry      # loop data dependence
        tot = progg(*args)[0]
        return carry ^ tot.sum(dtype=jnp.int64).astype(jnp.uint32)

    dtg = loop_bench(stepg, flatg, 10)
    rows.append(("GROUP-BY SUM+MIN/MAX (16 groups; sorted path, one "
                 "program)", "ALP", "1 chip",
                 round(plan.decoded_bytes / dtg / 1e9, 2), ""))
    print(rows[-1], flush=True)
    cc.plan()                                      # stage once
    gb_keys16 = gb_keys
    gb_keys512 = gb_rng.integers(0, 512, cc.n_values)
    for label, q in (
            ("TOP-K (k=10; warm wall-clock incl tunnel RPC)",
             lambda: engine.query_topk(cc, 10)),
            ("HISTOGRAM (6 bins; warm wall-clock incl tunnel RPC)",
             lambda: engine.query_histogram(cc, edges6)),
            ("GROUP-BY (16 groups; warm wall-clock incl tunnel RPC)",
             lambda: engine.query_groupby(cc, gb_keys16, 16)),
            ("GROUP-BY (512 groups; warm wall-clock incl tunnel RPC)",
             lambda: engine.query_groupby(cc, gb_keys512, 512)),
            ("MEDIAN (exact rank-select; warm wall-clock incl RPC)",
             lambda: engine.query_median(cc)),
            ("DISTINCT COUNT (one-dispatch sort; warm incl RPC)",
             lambda: engine.query_distinct(cc)),
            ("WINDOW tumbling 1M SUM (warm wall-clock incl RPC)",
             lambda: engine.query_window(cc, 1 << 20,
                                         aggs=("sum", "count"))),
            ("WINDOW sliding 1M/256K SUM (warm wall-clock incl RPC)",
             lambda: engine.query_window(cc, 1 << 20,
                                         aggs=("sum", "count"),
                                         hop=1 << 18))):
        q()
        t0 = time.perf_counter()
        q()
        dtq = time.perf_counter() - t0
        rows.append((label, "ALP", "1 chip",
                     round(plan.decoded_bytes / dtq / 1e9, 2), ""))
        print(rows[-1], flush=True)

    # cold path: compressed column in RAM -> first answered query.
    # build_plan pays staging (payload walk, eligibility proofs, plane
    # construction, per-bucket transfers); a plan snapshot
    # (alp_tpu.plan_store) replaces all of it with ONE device transfer
    # + device-side slices.  Timed cold per run (fresh plan objects;
    # kernels themselves are compile-cached, as in steady state).
    from alp_tpu import plan_store
    from alp_tpu.kernels import falp as kfalp
    import jax as _jax
    blob = plan_store.snapshot(plan)
    red16 = _jax.jit(lambda r: r.astype(_jnp.int64).sum(axis=(0, 2)))

    def cold_sum(p):
        # first exact-SUM answer from a fresh plan, via the module-level
        # jitted kernels (compile-cached across plans, as in production)
        t = np.zeros(16, np.int64)
        for g in p.groups:
            args = kdecode.group_arrays(g)
            if g.scheme == _C.SCHEME_ALP_RD or g.variant == "const":
                out = kdecode.group_decode(g, np.float64)(*args)
                r = kfalp.exact_sum_planes_f64(out[0], out[1])
            else:
                r = kfalp.falp_decode_f64_variant_exact_sum(
                    args[0], tuple(args[1:]), variant=g.variant,
                    bw=g.bw, flags=g.flags)
            t = t + np.asarray(red16(r))
        return t

    # the raw-transfer bound: answering the query requires at least one
    # host->device transfer of the snapshot payload — time that alone
    # and print the implied decoded-GB/s ceiling next to the achieved
    pay = np.frombuffer(blob, np.uint32,
                        offset=len(blob) % 4)     # ~payload-sized words
    jax.block_until_ready(_jnp.asarray(pay))
    t0 = time.perf_counter()
    jax.block_until_ready(_jnp.asarray(pay))
    dt_x = time.perf_counter() - t0
    bound = plan.decoded_bytes / dt_x / 1e9
    print(f"[cold] snapshot {len(blob)/1e6:.1f} MB; raw-transfer bound "
          f"= {bound:.2f} decoded-GB/s ({pay.nbytes/dt_x/1e9:.2f} GB/s "
          "wire)", flush=True)

    for label, mk in (
            ("COLD first SUM (build_plan)",
             lambda: kdecode.build_plan(cc)),
            ("COLD first SUM (plan snapshot)",
             lambda: plan_store.restore(blob))):
        cold_sum(mk())                         # warm the jit caches only
        t0 = time.perf_counter()
        cold_sum(mk())
        dtc = time.perf_counter() - t0
        gc = plan.decoded_bytes / dtc / 1e9
        rows.append((label, "ALP", "1 chip", round(gc, 2), ""))
        print(rows[-1], f"({100 * gc / bound:.0f}% of transfer bound)",
              flush=True)

    # correctness companions (never timed through the tunnel):
    import math
    small = container.compress(base)
    s = engine.query_sum(small)
    assert s == math.fsum(base), (s, math.fsum(base))
    assert engine.query_min(small) == base.min()
    assert engine.query_max(small) == base.max()
    assert engine.query_topk(small, 3)[0] == base.max()
    assert engine.query_histogram(small, [-40.0, 0.0, 45.0]).sum() == int(
        ((base >= -40.0) & (base <= 45.0)).sum())
    sk = np.arange(base.size) % 3
    gb = engine.query_groupby(small, sk, 3, aggs=("sum", "count"))
    assert all(float(gb["sum"][g]) == math.fsum(base[sk == g].tolist())
               for g in range(3))
    assert engine.query_median(small) == np.median(base)
    assert engine.query_quantile(small, 0.9) == np.quantile(base, 0.9)

    # ---- UNCOMPRESSED scan on device (table-6 "Uncompressed" row):
    # the same SUM-shaped aggregate over raw f64 bit planes resident in
    # HBM — 8 B/value of memory traffic with no decode (the reference's
    # uncompressed column scans 2.24x slower than ALP from RAM,
    # publication/tables/table_6.md:9)
    if on_tpu:
        import jax.numpy as _j
        from alp_tpu.kernels import falp as _kf
        Gu = plan.decoded_bytes // (64 * 128 * 8)
        uh = jax.jit(lambda: jax.random.bits(
            jax.random.PRNGKey(7), (Gu, 64, 128), dtype=_j.uint32))()
        ul = jax.jit(lambda: jax.random.bits(
            jax.random.PRNGKey(8), (Gu, 64, 128), dtype=_j.uint32))()

        def step_unc(carry, uh, ul):
            r = _kf.exact_sum_planes_f64(uh ^ carry, ul)
            return r[0, 0, 0].astype(_j.uint32) ^ r.sum(
                dtype=_j.int32).astype(_j.uint32)

        dtu2 = loop_bench(step_unc, (uh, ul), 20)
        g_unc = Gu * 64 * 128 * 8 / dtu2 / 1e9
        rows.append(("SUM exact scan", "Uncompressed (HBM planes)",
                     "1 chip", round(g_unc, 2), round(gbps / g_unc, 2)))
        print(rows[-1], flush=True)

    # ---- competitor decode speed: native C++ codecs over independent
    # rowgroup chunks, OpenMP threads {1, 8, 16} (the reference's TBB
    # morsel thread pool, bench_end_to_end config.hpp threads_pool) ----
    import multiprocessing
    alp_gbps = gbps
    n_cores = multiprocessing.cpu_count()
    CH = 102400                       # rowgroup-sized morsels
    scratch = np.zeros(len(data), np.uint64)      # pre-touched output
    from alp_tpu.competitors import pde_codec as pde
    pde_patches = []
    for name in ("gorillas", "chimp", "chimp128", "patas", "pde"):
        streams, ns = [], []
        for off in range(0, len(data), CH):
            chunk = data[off:off + CH]
            if name == "pde":
                s_, e_, p_ = pde.pde_encode(chunk)
                streams.append(native.pde_chunk_stream(s_, e_))
                pde_patches.append((off, e_, p_))
            else:
                s_, _ = native.competitor_encode(name, chunk)
                streams.append(s_)
            ns.append(len(chunk))
        ns = np.array(ns, np.int64)
        for threads in (1, 8, 16):
            native.competitor_decode_chunked(name, streams, ns, scratch,
                                             threads)
            best = float("inf")
            for _ in range(3):    # best-of-3: host timings share cores
                t0 = time.perf_counter()
                native.competitor_decode_chunked(name, streams, ns,
                                                 scratch, threads)
                best = min(best, time.perf_counter() - t0)
            out = scratch.view(np.float64)
            if name == "pde":
                out = out.copy()
                for off, e_, p_ in pde_patches:
                    out[off:off + len(e_)][e_ == 23] = p_
            assert (out.view(np.uint64) == data.view(np.uint64)).all()
            g = data.nbytes / best / 1e9
            rows.append(("SUM-scan decode", name,
                         f"{threads} thr ({n_cores}-core host)",
                         round(g, 2), round(alp_gbps / g, 1)))
            print(rows[-1], flush=True)

    # ---- Zstd decompression (table-6 "Zstd" row): real libzstd level 3
    # over rowgroup chunks (reference zstd.cpp:64); ctypes releases the
    # GIL, so the thread sweep runs a pool over chunks ------------------
    from alp_tpu.competitors import zstd_codec
    if zstd_codec.HAVE_ZSTD:
        import concurrent.futures as cf
        lib = zstd_codec._load()
        import ctypes as ct
        blobs, sizes = [], []
        for off in range(0, len(data), CH):
            raw = data[off:off + CH].tobytes()
            blobs.append(zstd_codec._compress_chunk(lib, raw))
            sizes.append(len(raw))
        bufs = [ct.create_string_buffer(s) for s in sizes]

        def dec(i):
            n = lib.ZSTD_decompress(bufs[i], sizes[i], blobs[i],
                                    len(blobs[i]))
            assert not lib.ZSTD_isError(n) and n == sizes[i]

        for threads in (1, 8, 16):
            for i in range(len(blobs)):
                dec(i)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                if threads == 1:
                    for i in range(len(blobs)):
                        dec(i)
                else:
                    with cf.ThreadPoolExecutor(threads) as ex:
                        list(ex.map(dec, range(len(blobs))))
                best = min(best, time.perf_counter() - t0)
            g = data.nbytes / best / 1e9
            rows.append(("DECOMPRESSION",
                         f"zstd level3 (v{zstd_codec.zstd_version()})",
                         f"{threads} thr ({n_cores}-core host)",
                         round(g, 2), round(alp_gbps / g, 1)))
            print(rows[-1], flush=True)

    # ---- COMPRESSION query (steady state: best of 3 full runs — the
    # host shares its cores with the terminal process) ------------------
    import multiprocessing
    engine.query_compression(data)
    best = float("inf")
    for _ in range(5):
        _, stats = engine.query_compression(data)
        best = min(best, stats["seconds"])
    alp_host_comp = data.nbytes / best / 1e9
    rows.append(("COMPRESSION", "ALP host engine (OpenMP)",
                 f"{multiprocessing.cpu_count()} cores",
                 round(alp_host_comp, 2), ""))
    print(rows[-1], flush=True)
    from alp_tpu import container as _ct
    cch = _ct.compress(data)
    _ct.decompress(cch)                    # page-warm
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        outh = _ct.decompress(cch)
        best = min(best, time.perf_counter() - t0)
    assert np.array_equal(outh.view(np.uint64), data.view(np.uint64))
    rows.append(("DECOMPRESSION", "ALP host engine (OpenMP)",
                 f"{multiprocessing.cpu_count()} cores",
                 round(data.nbytes / best / 1e9, 2), ""))
    print(rows[-1], flush=True)

    # f32 host engine (native float instantiation)
    data32 = np.tile(base, REPS // 2).astype(np.float32)   # ~100 MiB
    from alp_tpu import container as _ct
    cc32 = _ct.compress(data32)
    _ct.decompress(cc32)                     # page-warm both paths
    best_c = best_d = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        _ct.compress(data32)
        best_c = min(best_c, time.perf_counter() - t0)
        t0 = time.perf_counter()
        out32 = _ct.decompress(cc32)
        best_d = min(best_d, time.perf_counter() - t0)
    assert np.array_equal(out32.view(np.uint32), data32.view(np.uint32))
    rows.append(("COMPRESSION", "ALP host engine f32",
                 f"{multiprocessing.cpu_count()} cores",
                 round(data32.nbytes / best_c / 1e9, 2), ""))
    print(rows[-1], flush=True)
    rows.append(("DECOMPRESSION", "ALP host engine f32",
                 f"{multiprocessing.cpu_count()} cores",
                 round(data32.nbytes / best_d / 1e9, 2), ""))
    print(rows[-1], flush=True)
    if on_tpu:
        # device e2e compression on DEVICE-RESIDENT data: synthesize
        # exactly-decodable decimals on device via the fused decode
        # kernel (values = n * 10^2 * 10^-4), then slope-time the full
        # device pipeline — rowgroup planning (top-k vote), second-level
        # (e, f), exact encode+verify, exception patch, FFOR analysis —
        # as ONE program, plus the bucketed FFOR pack as a second
        # program with the column's real bucket structure.  The sum of
        # the two marginal times is the per-column device compression
        # cost (steady state, like the reference's 30k-iteration encode
        # benches, benchmarks/benchmark.cpp:41-148).
        import jax.numpy as jnp
        from alp_tpu import constants as C
        from alp_tpu.kernels import falp as kfalp
        from alp_tpu.kernels import encode as kencode
        from alp_tpu import device_compress as dcz
        Gd = 1000                        # 8000 vectors = 80 rowgroups
        bwd, facd, expd = 14, 2, 4
        packedd = jax.jit(lambda: jax.random.bits(
            jax.random.PRNGKey(11), (Gd, 2 * bwd, 128),
            dtype=jnp.uint32))()
        frac_u = int(np.float64(C.DOUBLE.frac_arr[expd]).view(np.uint64))
        fsig = (frac_u & ((1 << 52) - 1)) | (1 << 52)
        ccon = (5 ** facd) * fsig
        s_c = 95 - (ccon.bit_length() - 1)
        ccon <<= s_c
        mk = lambda v: jnp.full((Gd, 128), np.uint32(v & 0xFFFFFFFF),
                                jnp.uint32)
        zd = jnp.zeros((Gd, 128), jnp.uint32)
        vhi, vlo = kfalp.falp_decode_f64_mid(
            packedd, zd, mk(ccon >> 64), mk(ccon >> 32), mk(ccon),
            mk(((frac_u >> 52) & 0x7FF) + 74 + facd - s_c), bw=bwd,
            c0zero=True, nonneg=True, cheap_msb=True)
        vhi.block_until_ready()
        n_vec = Gd * 8
        gb_dev = n_vec * 1024 * 8 / 1e9
        ccd = dcz.compress_device(planes=(vhi, vlo))   # real bucket plan
        assert abs(ccd.bits_per_value() - bwd) < 2.0
        # the synthetic decimal column plans a single (e, f) candidate
        # per rowgroup (k = 1, like most real decimal columns — City,
        # Food, Btc all plan k = 1), so the step statically omits the
        # second-level scorer exactly as production does for k == 1
        assert len(np.unique(np.stack([ccd.fac, ccd.exp]), axis=1).T) == 1
        step_a = dcz.make_device_compress_step(n_vec, k_max=1)
        dt_a = loop_bench(step_a, (vhi, vlo), 10)
        # pack stage operates on the real raw encode planes + exc mask
        # (patching is fused into the pack kernel)
        tc = C.DOUBLE
        meta = []
        for tab, idx in ((tc.exp_arr, ccd.exp), (tc.frac_arr, ccd.fac),
                         (tc.fact_arr, ccd.fac), (tc.frac_arr, ccd.exp)):
            lo, hi = dcz._u64_split(np.ascontiguousarray(tab[idx]))
            meta += [dcz._expand(lo, n_vec), dcz._expand(hi, n_vec)]
        nhi, nlo, exc, stats = kencode.alp_encode_f64_tiles_stats(
            vhi, vlo, *meta)
        _, _, _, _, _, fill_lo, fill_hi = dcz.finalize_encode_stats(
            stats, nhi, nlo)
        step_b = dcz.make_pack_step(ccd, np.asarray(fill_lo),
                                    np.asarray(fill_hi))
        dt_b = loop_bench(step_b, (nhi, nlo, exc), 10)
        gbps_dev = gb_dev / (dt_a + dt_b)
        rows.append(("COMPRESSION", "ALP device e2e (plan+encode+pack; "
                     "device-resident)", "1 chip", round(gbps_dev, 2), ""))
        print(rows[-1], f"(plan+encode {gb_dev/dt_a:.1f}, "
              f"pack {gb_dev/dt_b:.1f} GB/s)", flush=True)

    # ---- competitor COMPRESSION speed (the table-6 COMP column):
    # native chunked encoders over the same rowgroup chunks under the
    # same OpenMP thread sweep, plus ZSTD_compress (reference
    # publication/tables/table_6.md COMP1: Patas 3.54x, Zstd 9.60x,
    # PDE 129x slower than ALP compression); ALP's comparison rate is
    # the device e2e compression (flagship path), host engine when no
    # chip is attached.  Uncompressed COMP = a plain memcpy (reference
    # row: 0.01, i.e. 100x FASTER than ALP encode).
    alp_comp = gbps_dev if on_tpu else alp_host_comp
    unc = np.empty_like(data)
    np.copyto(unc, data)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.copyto(unc, data)
        best = min(best, time.perf_counter() - t0)
    g = data.nbytes / best / 1e9
    rows.append(("COMPRESSION", "uncompressed (memcpy)",
                 f"1 thr ({n_cores}-core host)", round(g, 2),
                 round(alp_comp / g, 2)))
    print(rows[-1], flush=True)
    for name in ("gorillas", "chimp", "chimp128", "patas", "pde"):
        # validate once per codec: the chunked encode round-trips
        flat, cap_off, ow, ns_v = native.competitor_encode_chunked(
            name, data, CH, 8)
        streams_v = [flat[cap_off[c]:cap_off[c] + ow[c]].copy()
                     for c in range(len(ns_v))]
        outv = np.zeros(len(data), np.uint64)
        native.competitor_decode_chunked(name, streams_v, ns_v, outv, 8)
        ov = outv.view(np.float64).copy()
        if name == "pde":
            for c in range(len(ns_v)):
                nc, off = int(ns_v[c]), c * CH
                expv = streams_v[c][(nc + 1) // 2:].view(np.uint8)[:nc]
                sel = expv == 23
                ov[off:off + nc][sel] = data[off:off + nc][sel]
        assert np.array_equal(ov.view(np.uint64), data.view(np.uint64))
        for threads in (1, 8, 16):
            native.competitor_encode_chunked(name, data, CH, threads)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                native.competitor_encode_chunked(name, data, CH,
                                                 threads)
                best = min(best, time.perf_counter() - t0)
            g = data.nbytes / best / 1e9
            rows.append(("COMPRESSION", name,
                         f"{threads} thr ({n_cores}-core host)",
                         round(g, 2), round(alp_comp / g, 1)))
            print(rows[-1], flush=True)
    if zstd_codec.HAVE_ZSTD:
        import concurrent.futures as cf
        libz = zstd_codec._load()
        raws = [data[off:off + CH].tobytes()
                for off in range(0, len(data), CH)]

        def enc_z(i):
            zstd_codec._compress_chunk(libz, raws[i])

        for threads in (1, 8, 16):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                if threads == 1:
                    for i in range(len(raws)):
                        enc_z(i)
                else:
                    with cf.ThreadPoolExecutor(threads) as ex:
                        list(ex.map(enc_z, range(len(raws))))
                best = min(best, time.perf_counter() - t0)
            g = data.nbytes / best / 1e9
            rows.append(("COMPRESSION",
                         f"zstd level3 (v{zstd_codec.zstd_version()})",
                         f"{threads} thr ({n_cores}-core host)",
                         round(g, 2), round(alp_comp / g, 1)))
            print(rows[-1], flush=True)

    if on_tpu:
        # ---- mesh path on the REAL chip: the shard_map-wrapped falp
        # kernel over a 1-device TPU mesh vs the bare kernel.  Equal
        # rates are the per-shard evidence behind the "mesh is purely a
        # throughput knob" claim (parallel/container_par.py): each
        # device shard runs the identical Pallas launch on its 1/N of
        # the tile groups, no collectives on the data path.
        import jax.numpy as jnp
        from alp_tpu.parallel import make_mesh
        from alp_tpu.parallel.sharded import sharded_falp_decode_f64
        from alp_tpu.kernels import falp as kfalp
        Gm, bwm = 4096, 16                        # 256 MiB decoded
        packedm = jax.jit(lambda: jax.random.bits(
            jax.random.PRNGKey(3), (Gm, 2 * bwm, 128),
            dtype=jnp.uint32))()
        zm = jnp.zeros((Gm, 128), jnp.uint32)
        onem = jnp.ones((Gm, 128), jnp.uint32)
        frm = np.full((Gm, 128), np.float64(1e-4).view(np.uint64))
        frlo_m = jnp.asarray((frm & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        frhi_m = jnp.asarray((frm >> np.uint64(32)).astype(np.uint32))
        out_gb_m = Gm * 64 * 128 * 8 / 1e9
        mesh1 = make_mesh(1)
        shf = sharded_falp_decode_f64(mesh1, bwm)

        def step_mesh(carry, packedm, frlo_m, frhi_m):
            hi, lo = shf(packedm, zm + carry, zm, onem, zm,
                         frlo_m, frhi_m)
            return hi[0, 0, 0] ^ lo[0, 0, 0]

        def step_bare(carry, packedm, frlo_m, frhi_m):
            hi, lo = kfalp.falp_decode_f64(
                packedm, zm + carry, zm, onem, zm, frlo_m, frhi_m,
                bw=bwm)
            return hi[0, 0, 0] ^ lo[0, 0, 0]

        mesh_rows = []
        for label, stp in (("falp f64 bw16 (bare kernel)", step_bare),
                           ("falp f64 bw16 (shard_map, mesh=1 real "
                            "chip)", step_mesh)):
            dt = loop_bench(stp, (packedm, frlo_m, frhi_m), 20)
            mesh_rows.append(("DECODE", label, "1 chip",
                              round(out_gb_m / dt, 2), ""))
            print(mesh_rows[-1], flush=True)
        speed_report(mesh_rows,
                     os.path.join(ROOT, "results",
                                  "e2e_mesh_real_chip.csv"),
                     header=("query", "scheme", "parallelism", "gbps",
                             "alp_speedup"))

    # ---- functional mesh scaling (virtual devices on CPU are a
    # correctness demonstration, not a perf claim); separate CSV so a
    # CPU run never clobbers the TPU query table --------------------------
    if not on_tpu and len(jax.devices()) >= 8:
        from alp_tpu.parallel import make_mesh
        mesh_rows = []
        d = np.tile(base, 32)
        blob = container.compress(d).to_bytes()
        for nd in (1, 2, 4, 8):
            mesh = make_mesh(nd)
            t0 = time.perf_counter()
            cc2 = container.compress(d, mesh=mesh)
            t1 = time.perf_counter()
            assert cc2.to_bytes() == blob
            mesh_rows.append(("COMPRESSION", "ALP sharded (byte-identical)",
                              f"{nd} dev",
                              round(d.nbytes / (t1 - t0) / 1e9, 4),
                              "functional check (virtual CPU mesh; "
                              "perf claims are single-chip only)"))
            print(mesh_rows[-1], flush=True)
        speed_report(mesh_rows,
                     os.path.join(ROOT, "results", "e2e_mesh_scaling.csv"),
                     header=("query", "scheme", "parallelism", "gbps",
                             "status"))
        return

    speed_report(rows, os.path.join(ROOT, "results", "e2e_queries.csv"),
                 header=("query", "scheme", "parallelism", "gbps",
                         "alp_speedup"))


if __name__ == "__main__":
    main()
