"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Checks mesh-size invariance: the sharded encode step must produce
identical results on 1, 2, 4, and 8 devices (rowgroup data parallelism
is value-semantics-preserving), and the collective bits/value metric
must agree with the host computation.
"""

import numpy as np
import pytest
import jax

from alp_tpu import constants as C
from alp_tpu.ops.numerics import numerics_for
from alp_tpu.parallel import make_mesh, sharded_encode_decode_step


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    n_vec = 16
    values = np.round(rng.uniform(-50, 50, size=(n_vec, C.VECTOR_SIZE)), 2)
    nm = numerics_for(np.float64)
    combos = np.zeros((n_vec, C.MAX_K_COMBINATIONS, 2), np.int32)
    combos[:, 0] = (14, 12)
    combos[:, 1] = (14, 13)
    k_count = np.full(n_vec, 2, np.int32)
    return nm.values_from_np(values), combos, k_count


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_mesh_size_invariance(problem, n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough virtual devices")
    vals, combos, k_count = problem
    step = sharded_encode_decode_step(make_mesh(n_dev), np.float64)
    out = step(vals, combos, k_count)
    assert bool(out["ok"])
    if n_dev == 1:
        test_mesh_size_invariance._ref = {
            k: np.asarray(v) for k, v in out.items()}
    else:
        ref = test_mesh_size_invariance._ref
        for k in ("encoded", "fac", "exp", "bit_width", "base", "exc_count"):
            np.testing.assert_array_equal(np.asarray(out[k]), ref[k])
        assert abs(float(out["global_bits_per_value"])
                   - float(ref["global_bits_per_value"])) < 1e-5


def test_sharded_falp_decode_matches_single():
    """The Pallas falp kernel under shard_map: identical output on 1-
    and 4-device meshes (rowgroup-bucket data parallelism)."""
    from alp_tpu.kernels import layout, falp as kfalp
    from alp_tpu.oracle import fastlanes as ofl
    from alp_tpu.parallel.sharded import sharded_falp_decode_f64
    import jax.numpy as jnp

    tc = __import__("alp_tpu").constants.DOUBLE
    rng = np.random.default_rng(1)
    bw, fac, exp = 13, 5, 9
    n = 64  # 8 groups -> divisible by 4 devices
    base = np.int64(3)
    ints = rng.integers(0, 1 << 12, (n, 1024), dtype=np.int64) + base
    packed = np.stack([ofl.ffor_pack(v, bw, base) for v in ints])
    tiles = jnp.asarray(layout.ref_to_tile(packed, bw, 64))

    def planes(u):
        return (jnp.asarray(layout.lane_expand(
                    (u & np.uint64(0xFFFFFFFF)).astype(np.uint32), 64)),
                jnp.asarray(layout.lane_expand(
                    (u >> np.uint64(32)).astype(np.uint32), 64)))

    with np.errstate(over="ignore"):
        bf = np.full(n, base, np.int64) * tc.fact_arr[fac]
    blo, bhi = planes(bf.view(np.uint64))
    flo, fhi = planes(np.full(n, tc.fact_arr[fac], np.int64).view(np.uint64))
    frlo, frhi = planes(np.full(n, tc.frac_arr[exp]).view(np.uint64))
    args = (tiles, blo, bhi, flo, fhi, frlo, frhi)

    single = kfalp.falp_decode_f64(*args, bw=bw)
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    fn = sharded_falp_decode_f64(make_mesh(4), bw)
    hi, lo = fn(*args)
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(single[0]))
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(single[1]))


def test_container_sharded_compress_bit_identical():
    """compress(mesh=...) must produce byte-identical blobs to the host
    path, at every mesh size (ordered gather preserves vector order)."""
    from alp_tpu import container
    rng = np.random.default_rng(11)
    data = np.round(rng.uniform(-500, 500, 5 * 1024 + 311), 2)
    host = container.compress(data)
    for nd in (1, 2, 8):
        mesh = make_mesh(nd)
        cc = container.compress(data, mesh=mesh)
        assert cc.to_bytes() == host.to_bytes(), f"mesh size {nd}"


def test_container_sharded_decompress_bit_exact():
    from alp_tpu import container
    rng = np.random.default_rng(12)
    data = np.round(rng.uniform(-500, 500, 8 * 1024 + 77), 2)
    data[[3, 4000]] = [np.pi, 1e300]          # exceptions
    cc = container.compress(data)
    for nd in (2, 8):
        out = container.decompress(cc, mesh=make_mesh(nd))
        np.testing.assert_array_equal(out.view(np.uint64),
                                      data.view(np.uint64))


def test_container_sharded_rd_decompress():
    from alp_tpu import container
    rng = np.random.default_rng(13)
    data = rng.standard_normal(4096)          # high precision -> ALP_RD
    cc = container.compress(data)
    assert (cc.rg_scheme == C.SCHEME_ALP_RD).any()
    out = container.decompress(cc, mesh=make_mesh(8))
    np.testing.assert_array_equal(out.view(np.uint64),
                                  data.view(np.uint64))


def test_container_sharded_mixed_rd_compress_bit_identical():
    """Mixed ALP + ALP_RD column: compress(mesh=...) shards BOTH scheme
    paths (no host fallback) and must stay byte-identical to the host
    path; decompress(mesh=...) round-trips bit-exactly."""
    from alp_tpu import container
    rng = np.random.default_rng(21)
    alp_rg = np.round(rng.uniform(-500, 500, C.ROWGROUP_SIZE), 2)
    rd_rg = rng.standard_normal(C.ROWGROUP_SIZE // 2 + 311)
    data = np.concatenate([alp_rg, rd_rg])
    host = container.compress(data)
    assert (host.rg_scheme == C.SCHEME_ALP).any()
    assert (host.rg_scheme == C.SCHEME_ALP_RD).any()
    for nd in (2, 8):
        cc = container.compress(data, mesh=make_mesh(nd))
        assert cc.to_bytes() == host.to_bytes(), f"mesh size {nd}"
    out = container.decompress(cc, mesh=make_mesh(8))
    np.testing.assert_array_equal(out.view(np.uint64),
                                  data.view(np.uint64))


def test_container_sharded_decompress_mid64():
    """A mid64-routed column (bw > 32) through the mesh decode path."""
    from alp_tpu import container
    from alp_tpu.kernels import decode as kdecode
    data = np.fromfile(
        "/root/reference/data/1_rg_data_sample/nyc29_tw.bin", np.float64)
    cc = container.compress(data)
    plan = kdecode.build_plan(cc)
    assert any(g.variant == "mid64" for g in plan.groups)
    out = container.decompress(cc, mesh=make_mesh(8))
    np.testing.assert_array_equal(out.view(np.uint64),
                                  data.view(np.uint64))


def test_sharded_filter_count_matches_single_device():
    """Mesh-sharded fused COUNT (per-shard kernels + one ICI psum) over
    8 virtual devices equals the single-device engine count."""
    import jax.numpy as jnp
    from alp_tpu import container, engine
    from alp_tpu.parallel import make_mesh
    from alp_tpu.parallel.sharded import sharded_filter_count_f64

    rng = np.random.default_rng(17)
    d = np.round(rng.normal(40, 20, 64 * 1024), 2)   # 64 vectors = 8 groups
    cc = container.compress(d)
    plan = cc.plan()
    [g] = [g for g in plan.groups if g.variant != "const"]
    lo, hi = 20.0, 60.0
    klo = np.uint64(engine._float_key(lo, np.float64))
    khi = np.uint64(engine._float_key(hi, np.float64))
    args = engine.kdecode.group_arrays(g)
    G = args[1].shape[0]
    bk = [jnp.full((G, 128), np.uint32(int(k) >> 32), jnp.uint32)
          for k in (klo, khi)]
    bk += [jnp.full((G, 128), np.uint32(int(k) & 0xFFFFFFFF), jnp.uint32)
           for k in (klo, khi)]
    bounds = (bk[0], bk[2], bk[1], bk[3])
    mesh = make_mesh(8)
    if G % 8:
        import pytest
        pytest.skip("bucket groups not divisible by mesh")
    fn = sharded_filter_count_f64(mesh, g.bw, g.variant, g.flags)
    got = int(fn(args[0], *args[1:], *bounds))
    # single-device reference: same kernel unsharded + corrections path
    want = engine.query_filter_count(cc, lo, hi)
    # the sharded call covers this bucket only (no const groups or
    # corrections): compare against the unsharded kernel count instead
    from alp_tpu.kernels import falp as kfalp
    if g.variant == "gen":
        cnt = kfalp.falp_decode_f64_count(args[0], *args[1:], *bounds,
                                          bw=g.bw, fact1=bool(g.flags & 16))
    else:
        cnt = kfalp.falp_decode_f64_variant_count(
            args[0], tuple(args[1:]), bounds, variant=g.variant,
            bw=g.bw, flags=g.flags)
    assert got == int(np.asarray(cnt).sum())
    assert want >= 0   # engine count sanity on the same column


def test_sharded_exact_sum_matches_single_device():
    """Mesh-sharded exact-SUM window partials (one ICI psum) equal the
    unsharded kernel's totals — the distributed correctly-rounded SUM."""
    import jax.numpy as jnp
    from alp_tpu import container, engine
    from alp_tpu.parallel import make_mesh
    from alp_tpu.parallel.sharded import sharded_exact_sum_f64
    from alp_tpu.kernels import falp as kfalp
    rng = np.random.default_rng(59)
    d = np.round(rng.normal(40, 20, 64 * 1024), 2)   # 8 tile groups
    cc = container.compress(d)
    [g] = [g for g in cc.plan().groups if g.variant != "const"]
    args = engine.kdecode.group_arrays(g)
    if args[1].shape[0] % 8:
        import pytest
        pytest.skip("bucket groups not divisible by mesh")
    fn = sharded_exact_sum_f64(make_mesh(8), g.bw, g.variant, g.flags)
    got = np.asarray(fn(args[0], *args[1:]))
    want = np.asarray(kfalp.falp_decode_f64_variant_exact_sum(
        args[0], tuple(args[1:]), variant=g.variant, bw=g.bw,
        flags=g.flags).astype(jnp.int64).sum(axis=(0, 2)))
    np.testing.assert_array_equal(got, want)


def test_sharded_groupby_matches_single_device():
    """Mesh-sharded GROUP-BY digit partials (one ICI psum) equal the
    single-device segment sums — the distributed exact per-group SUM."""
    import jax.numpy as jnp
    from alp_tpu import container, engine
    from alp_tpu.kernels import decode as kdecode
    from alp_tpu.parallel import make_mesh
    from alp_tpu.parallel.sharded import sharded_groupby_sum_f64
    rng = np.random.default_rng(61)
    d = np.round(rng.normal(40, 20, 64 * 1024), 2)   # 8 tile groups
    cc = container.compress(d)
    plan = cc.plan()
    cand = [(i, g) for i, g in enumerate(plan.groups)
            if g.variant != "const"
            and kdecode.group_arrays(g)[1].shape[0] % 8 == 0]
    if not cand:
        import pytest
        pytest.skip("no bucket with tile groups divisible by mesh")
    gi, g = max(cand, key=lambda t: t[1].n_vectors)
    args = kdecode.group_arrays(g)
    G = 4
    keys = rng.integers(0, G, cc.n_values)
    kp = engine._groupby_key_planes(cc, plan, keys.astype(np.int32),
                                    G)[gi]
    fn = sharded_groupby_sum_f64(make_mesh(8),
                                 kdecode.group_decode(g, np.float64),
                                 G, len(args))
    got = np.asarray(fn(*args, kp))
    hi, lo = kdecode.group_decode(g, np.float64)(*args)
    bits = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(
        jnp.uint64)
    want, _, _, _, _, _, _ = engine._groupby_chunk_f64(
        bits.reshape(-1), kp.reshape(-1), ng=G + 1)
    np.testing.assert_array_equal(got, np.asarray(want).reshape(-1, 3))
