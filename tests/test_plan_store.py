"""Plan snapshot/restore: the load -> first-query cold path artifact."""

import numpy as np

from alp_tpu import constants as C
from alp_tpu import container, engine, plan_store


def _assert_plans_equal(pa, pb, dtype):
    assert pa.n_vectors == pb.n_vectors
    assert pa.decoded_bytes == pb.decoded_bytes
    assert len(pa.groups) == len(pb.groups)
    outs_a = pa.run(patch=True)
    outs_b = pb.run(patch=True)
    for ga, gb, oa, ob in zip(pa.groups, pb.groups, outs_a, outs_b):
        assert (ga.bw, ga.variant, ga.flags, ga.scheme) == \
               (gb.bw, gb.variant, gb.flags, gb.scheme)
        np.testing.assert_array_equal(np.asarray(ga.vec_indices),
                                      np.asarray(gb.vec_indices))
        if dtype == np.float64:
            np.testing.assert_array_equal(np.asarray(oa[0]),
                                          np.asarray(ob[0]))
            np.testing.assert_array_equal(np.asarray(oa[1]),
                                          np.asarray(ob[1]))
        else:
            np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))


def test_snapshot_restore_f64_mixed():
    # mixed ALP + ALP_RD column with exceptions and a ragged tail
    rng = np.random.default_rng(41)
    dec = np.round(rng.uniform(-50, 50, 110 * 1024), 2)   # 2 rowgroups
    dec[5] = np.pi                                        # exception
    rd = rng.standard_normal(102_400)                     # RD rowgroup
    data = np.concatenate([dec, rd])[: 210 * 1024 + 100]
    col = container.compress(data)
    assert (col.rg_scheme == C.SCHEME_ALP_RD).any()
    blob = plan_store.snapshot(col.plan())
    plan_b = plan_store.restore(blob)
    _assert_plans_equal(col.plan(), plan_b, np.float64)


def test_snapshot_restore_const_bucket():
    data = np.full(2048 + 7, 2.5)                         # bw 0 bucket
    col = container.compress(data)
    assert any(g.variant == "const" for g in col.plan().groups)
    plan_b = plan_store.restore(plan_store.snapshot(col.plan()))
    _assert_plans_equal(col.plan(), plan_b, np.float64)


def test_snapshot_restore_f32():
    rng = np.random.default_rng(42)
    alp = np.round(rng.uniform(0, 90, 4096), 2).astype(np.float32)
    alp[9] = np.float32(np.inf)
    col = container.compress(alp)
    plan_b = plan_store.restore(plan_store.snapshot(col.plan()))
    _assert_plans_equal(col.plan(), plan_b, np.float32)


def test_restored_plan_serves_queries():
    """A restored plan is a drop-in for the cached one: the one-program
    query steps produce identical checksums, and file round-trip works."""
    import tempfile
    import os
    import jax.numpy as jnp
    rng = np.random.default_rng(43)
    data = np.round(rng.uniform(-100, 100, 8192), 2)
    col = container.compress(data)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "col.alpp")
        n = plan_store.save_plan(col, path)
        assert n > 0
        plan_b = plan_store.load_plan(path)
    step_a, metas_a = engine.make_filter_step(col.plan(), -10.0, 60.0)
    step_b, metas_b = engine.make_filter_step(plan_b, -10.0, 60.0)
    assert int(step_a(jnp.uint32(0), *metas_a)) == \
           int(step_b(jnp.uint32(0), *metas_b))
    step_a, metas_a = engine.make_exact_sum_step(col.plan())
    step_b, metas_b = engine.make_exact_sum_step(plan_b)
    assert int(step_a(jnp.uint32(0), *metas_a)) == \
           int(step_b(jnp.uint32(0), *metas_b))


def test_snapshot_rejects_garbage():
    import pytest
    with pytest.raises(ValueError):
        plan_store.restore(b"NOPE" + b"\0" * 32)
