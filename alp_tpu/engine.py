"""Vectorized query engine over compressed columns (end-to-end analog).

The reference's end-to-end benchmark runs Tectorwise-style queries whose
pipelines call the fused falp decode per 1024-vector inside the scan
(reference publication/source_code/bench_end_to_end/src/benchmarks/alp/
queries/q1.cpp:64-88, TBB morsels over 128x1024-value blocks; SCAN/SUM
query set in include/benchmarks/alp/config.hpp:16-92).  The TPU
equivalent keeps decompressed data on device: the decode plan's output
planes feed jnp reductions directly, so SCAN+SUM never materialise
host-side — the pipeline-fusion property the reference demonstrates
against per-column materialisation.

Padding note: decode plans pad each bucket to whole 128-lane groups; the
pad vectors decode the FOR base (bw contributes 0), so aggregates mask
the trailing pad lanes of the last group before reducing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C
from .kernels import decode as kdecode


def _lane_mask(n_vectors: int, per_group: int, lanes_per_vec: int):
    """[128] bool mask of valid lanes in the LAST group of a bucket."""
    used = n_vectors % per_group
    if used == 0:
        used = per_group
    return jnp.arange(128) < used * lanes_per_vec


def query_sum(col) -> float:
    """SUM(column) with on-device fused decode (exceptions patched)."""
    plan = kdecode.build_plan(col)
    outs = plan.run(patch=True)
    total = jnp.zeros((), jnp.float64)
    for g, out in zip(plan.groups, outs):
        if col.dtype == np.float64:
            hi, lo = out
            u64 = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(
                jnp.uint64)
            vals = jax.lax.bitcast_convert_type(u64, jnp.float64)
            mask = _lane_mask(g.n_vectors, 8, 16)
        else:
            vals = jax.lax.bitcast_convert_type(out, jnp.float32)
            mask = _lane_mask(g.n_vectors, 4, 32)
        s = vals[:-1].astype(jnp.float64).sum() if vals.shape[0] > 1 \
            else jnp.zeros((), jnp.float64)
        s = s + jnp.where(mask[None, :], vals[-1], 0).astype(
            jnp.float64).sum()
        total = total + s
    return float(total)


def make_sum_step(plan):
    """Staged SUM query: returns (step, args) where ``step(carry, *args)``
    runs fused decode + on-device reduction for every bucket in ONE
    jittable program (benchlib.loop_bench-compatible).  This is the
    steady-state query shape — plan built once, queries repeated — the
    reference's q1 pipeline analog."""
    from .kernels import falp as kfalp
    groups = plan.groups

    def step(carry, *metas):
        total = jnp.zeros((), jnp.float32)
        acc = carry
        i = 0
        for g in groups:
            if g.scheme == C.SCHEME_ALP_RD:
                right, left = metas[i], metas[i + 1]
                dicts = metas[i + 2:i + 10]
                hi, lo = kfalp.rd_decode_dict_f64(
                    right, left ^ carry, dicts, rbw=g.bw, lbw=g.meta[1])
                i += 10
            else:
                tiles, blo, bhi, flo, fhi, frlo, frhi = metas[i:i + 7]
                hi, lo = kfalp.falp_decode_f64(
                    tiles, blo ^ carry, bhi, flo, fhi, frlo, frhi, bw=g.bw)
                i += 7
            u64 = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(
                jnp.uint64)
            vals = jax.lax.bitcast_convert_type(u64, jnp.float64)
            total = total + vals.astype(jnp.float32).sum()
            acc = acc ^ hi[0, 0, 0]
        return acc ^ total.view(jnp.uint32).astype(jnp.uint32)

    metas = []
    for g in groups:
        if g.scheme == C.SCHEME_ALP_RD:
            metas += [g.tiles, g.meta[0], *g.meta[2:10]]
        else:
            metas += [g.tiles, *g.meta]
    return step, tuple(metas)


def query_scan(col):
    """SCAN: full decompression on device; returns the decode plan's
    patched planes (device arrays) for downstream operators."""
    plan = kdecode.build_plan(col)
    return plan, plan.run(patch=True)


def query_count_exceptions(col) -> int:
    """Aggregate over metadata only (no decompression)."""
    return int(np.asarray(col.exc_count, np.int64).sum())
