"""shard_map pipelines: rowgroup data parallelism over a device mesh.

Design (SURVEY.md §2.4, §5.8): vectors are the parallel unit — encode,
pack, decode are independent per vector once per-rowgroup planning
(sampling, (e, f) candidates, RD dictionaries) is done.  Sharding lays
``[n_vectors, 1024]`` arrays out over a 1-D ``rg`` mesh axis; per-vector
metadata shards identically, planning metadata is replicated (it is tiny
— the broadcast the reference never needed).  Collectives (psum/pmean
over ICI) aggregate global metrics such as bits/value.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from .. import constants as C
from ..ops import alp as oalp
from ..ops.numerics import numerics_for


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("rg",))


def sharded_encode_decode_step(mesh: Mesh, dtype):
    """Build the jitted full step: per-shard ALP encode -> FFOR analysis ->
    decode -> verification mask, plus a psum'd global size metric.

    Inputs (sharded over ``rg``): values [n, 1024] in ops representation,
    combos [n, 5, 2] int32, k_count [n] int32.  n must divide by mesh size.
    Returns dict with per-vector fac/exp/bit_width/base/exc_count (sharded)
    and the replicated global average bits/value.
    """
    nm = numerics_for(dtype)

    def step(values, combos, k_count):
        fac, exp = oalp.choose_factor_exponent(nm, values, combos, k_count)
        patched, exc = oalp.encode_vectors(nm, values, fac, exp)
        bw, base = oalp.analyze_ffor(nm, patched)
        exc_count = exc.sum(axis=1).astype(jnp.int32)
        # global metric over ICI: average bits/value (cost model §2.2)
        tc = nm.tc
        bits = (bw.astype(jnp.float32)
                + exc_count.astype(jnp.float32)
                * (tc.exception_size + C.EXCEPTION_POSITION_SIZE)
                / C.VECTOR_SIZE)
        global_bits = jax.lax.pmean(bits.mean(), axis_name="rg")
        decoded = oalp.decode_vectors(nm, patched, fac, exp)
        roundtrip_ok = nm.eq(decoded, values) | exc
        return {"encoded": patched, "fac": fac, "exp": exp,
                "bit_width": bw, "base": base, "exc_count": exc_count,
                "exc_mask": exc, "ok": roundtrip_ok.all(),
                "global_bits_per_value": global_bits}

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P("rg"), P("rg"), P("rg")),
        out_specs={"encoded": P("rg"), "fac": P("rg"), "exp": P("rg"),
                   "bit_width": P("rg"), "base": P("rg"),
                   "exc_count": P("rg"), "exc_mask": P("rg"),
                   "ok": P(), "global_bits_per_value": P()},
        check_rep=False)
    return jax.jit(sharded)


def sharded_falp_decode_f64(mesh: Mesh, bw: int):
    """Mesh-sharded fused falp decode: tile groups split over the ``rg``
    axis, one Pallas launch per device shard (SPMD — this is how a
    decode plan's buckets scale across chips: embarrassing rowgroup
    parallelism, no collectives on the data path)."""
    from ..kernels import falp as kfalp

    def local(packed, bf_lo, bf_hi, flo, fhi, frlo, frhi):
        return kfalp.falp_decode_f64(packed, bf_lo, bf_hi, flo, fhi,
                                     frlo, frhi, bw=bw)

    specs = (P("rg"),) * 7
    return jax.jit(shard_map(
        local, mesh=mesh, in_specs=specs,
        out_specs=(P("rg"), P("rg")), check_rep=False))


def sharded_decode(mesh: Mesh, dtype):
    """Jitted sharded unfused decode: [n,1024] ints + fac/exp -> values."""
    nm = numerics_for(dtype)

    def step(encoded, fac, exp):
        return oalp.decode_vectors(nm, encoded, fac, exp)

    return jax.jit(shard_map(
        step, mesh=mesh, in_specs=(P("rg"), P("rg"), P("rg")),
        out_specs=P("rg"), check_rep=False))


def sharded_filter_count_f64(mesh: Mesh, bw: int, variant: str = "gen",
                             flags: int = 0):
    """Mesh-sharded predicate-pushdown COUNT: each device runs the fused
    decode+COUNT kernel on its shard of tile groups and the partial
    counts combine with ONE scalar ``psum`` over ICI — the distributed
    aggregation shape of the reference's TBB morsel SUM (q1), with
    chips as the workers.  Returns a jitted callable over the bucket's
    packed tiles + metadata planes + 4 bound-key planes (all sharded
    over ``rg``) yielding the replicated global count."""
    from ..kernels import falp as kfalp

    def local(packed, *metas_and_bounds):
        metas = metas_and_bounds[:-4]
        bounds = metas_and_bounds[-4:]
        if variant == "gen":
            cnt = kfalp.falp_decode_f64_count(
                packed, *metas, *bounds, bw=bw, fact1=bool(flags & 16))
        else:
            cnt = kfalp.falp_decode_f64_variant_count(
                packed, tuple(metas), tuple(bounds), variant=variant,
                bw=bw, flags=flags)
        return jax.lax.psum(cnt.sum(dtype=jnp.int64), "rg")

    n_meta = {"gen": 6, "mid": 5, "small": 5, "mid64": 5,
              "midc96": 6}[variant]
    specs = (P("rg"),) * (1 + n_meta + 4)
    return jax.jit(shard_map(local, mesh=mesh, in_specs=specs,
                             out_specs=P(), check_rep=False))


def sharded_exact_sum_f64(mesh: Mesh, bw: int, variant: str = "gen",
                          flags: int = 0):
    """Mesh-sharded EXACT SUM partials: each device runs the fused
    decode + superaccumulator kernel
    (kernels.falp.falp_decode_f64_variant_exact_sum) on its shard of
    tile groups and the [16] i64 window totals combine with ONE
    ``psum`` over ICI.  Integer window partials are exactly additive,
    so the distributed sum stays bit-identical to the single-device
    result — a correctly-rounded SUM that scales with chips.  Returns
    a jitted callable over the bucket's packed tiles + metadata planes
    (sharded over ``rg``) yielding the replicated [16] i64 totals
    (engine's window combine applies host-side)."""
    from ..kernels import falp as kfalp

    def local(packed, *metas):
        rows = kfalp.falp_decode_f64_variant_exact_sum(
            packed, tuple(metas), variant=variant, bw=bw, flags=flags)
        return jax.lax.psum(
            rows.astype(jnp.int64).sum(axis=(0, 2)), "rg")

    n_meta = {"gen": 6, "mid": 5, "small": 5, "mid64": 5,
              "midc96": 6}[variant]
    specs = (P("rg"),) * (1 + n_meta)
    return jax.jit(shard_map(local, mesh=mesh, in_specs=specs,
                             out_specs=P(), check_rep=False))


def sharded_groupby_sum_f64(mesh: Mesh, decode_fn, num_groups: int,
                            n_decode_args: int):
    """Mesh-sharded GROUP-BY SUM partials: each device decodes its shard
    of tile groups to (hi, lo) bit planes with ``decode_fn`` (any f64
    bucket decode — ``kernels.decode.group_decode(g, float64)`` covers
    every variant and scheme and is shard_map-safe), decomposes values
    into the exact superaccumulator digits of
    ``engine._groupby_chunk_f64``, segment-sums them locally on
    ``key * 64 + window``, and combines the
    ``[(num_groups + 1) * 64, 3]`` i64 digit partials with ONE ``psum``
    over ICI.  Integer adds are exactly associative, so the distributed
    per-group sums stay bit-identical to the single-device result —
    the GROUP-BY analog of :func:`sharded_exact_sum_f64`.

    The jitted callable takes the bucket's decode args (sharded over
    ``rg``) followed by ONE ``[G, 64, 128]`` int32 key plane (sharded;
    trash key = ``num_groups`` on pad slots — engine._groupby_key_planes
    layout) and returns the replicated partials; the engine's bignum
    window combine and exception corrections apply host-side.
    """
    ng = num_groups + 1

    def local(*args):
        keyp = args[-1]
        hi, lo = decode_fn(*args[:-1])
        bits = (hi.astype(jnp.uint64) << jnp.uint64(32)
                ) | lo.astype(jnp.uint64)
        b, k = bits.reshape(-1), keyp.reshape(-1)
        e = ((b >> jnp.uint64(52)) & jnp.uint64(0x7FF)).astype(jnp.int32)
        m = b & jnp.uint64((1 << 52) - 1)
        sign = (b >> jnp.uint64(63)) != 0
        mp = jnp.where(e > 0, m | jnp.uint64(1 << 52), m)
        mp = jnp.where(e == 2047, jnp.uint64(0), mp)
        e_eff = jnp.maximum(e, 1)
        j = (e_eff >> 5).astype(jnp.int32)
        sh = (e_eff & 31).astype(jnp.uint64)
        m32 = jnp.uint64(0xFFFFFFFF)
        d0 = (mp << sh) & m32
        d1 = ((mp >> jnp.uint64(1)) >> (jnp.uint64(31) - sh)) & m32
        d2 = (mp >> jnp.uint64(33)) >> (jnp.uint64(31) - sh)
        digs = jnp.stack([d0, d1, d2], axis=-1).astype(jnp.int64)
        digs = jnp.where(sign[:, None], -digs, digs)
        part = jax.ops.segment_sum(digs, k * 64 + j,
                                   num_segments=ng * 64)
        return jax.lax.psum(part, "rg")

    specs = (P("rg"),) * (n_decode_args + 1)
    return jax.jit(shard_map(local, mesh=mesh, in_specs=specs,
                             out_specs=P(), check_rep=False))
