"""Device-integrated column compression (f64): the encode hot path on TPU.

The reference's encode hot loop — encode+verify, exception patching,
FFOR analysis, bit-packing (include/alp/encoder.hpp:307-418 and
fastlanes ffor) — runs here as device kernels over value bit planes,
with only the tiny per-rowgroup planning and final assembly on host:

1. host planning: sampling + top-k (e, f) per rowgroup and per-vector
   second-level choice on the 32-sample stride (native/oracle, exact);
2. device: exact softfloat encode+verify (kernels.encode), in-value-order
   exception patching, FFOR analysis (min/max -> bw, base);
3. device: per-bit-width bucketed FFOR pack (kernels.falp.ffor_planes);
4. host: fetch packed words + exception indices (compressed-size bytes,
   not decoded-size) and assemble the same CompressedColumn the host
   path produces — bit-identical output (tests assert equality).

Input can be a numpy array (staged to device once) or value bit planes
already on device in tile order ([G, 64, 128] u32 hi/lo — the decode
plan output format, closing the device-resident round trip).

ALP_RD rowgroups and "rare" flagged vectors (subnormal inputs, outside
the device encode envelope) fall back to the host path; both are rare
and correctness-neutral (kernels/encode.py docstring).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C
from .constants import constants_for
from .kernels import encode as kencode
from .kernels import falp as kfalp
from .kernels import layout


def _expand(per_vec: np.ndarray, n_pad: int) -> jnp.ndarray:
    full = np.zeros(n_pad, per_vec.dtype)
    full[:len(per_vec)] = per_vec
    return jnp.asarray(layout.lane_expand(full, 64))


def _u64_split(arr: np.ndarray):
    u = arr.view(np.uint64)
    return ((u & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (u >> np.uint64(32)).astype(np.uint32))


@jax.jit
def _to_vector_major(plane):
    """[G, 64, 128] tile plane -> [G*8, 64, 16] vector-major rows."""
    G = plane.shape[0]
    t = plane.reshape(G, 64, 8, 16).transpose(0, 2, 1, 3)
    return t.reshape(G * 8, 64, 16)


@jax.jit
def _to_tile_major(rows):
    """Inverse of :func:`_to_vector_major` (rows count divisible by 8)."""
    n = rows.shape[0]
    t = rows.reshape(n // 8, 8, 64, 16).transpose(0, 2, 1, 3)
    return t.reshape(n // 8, 64, 128)


@jax.jit
def _patch_and_count(nhi, nlo, exc):
    """Patch exception slots with the vector's first non-exception value
    (value order, encoder.hpp:382-399) and count exceptions per vector.

    Planes are [G, 64, 128] tile order; returns patched (hi, lo) planes
    plus per-vector exception counts [G*8] (group-major vector order).
    """
    ok = _to_vector_major(exc) == 0                    # [n, 64, 16]
    okf = ok.reshape(ok.shape[0], 1024)                # value order
    first_ok = jnp.argmax(okf, axis=1)
    any_ok = okf.any(axis=1)
    n_exc = (1024 - okf.sum(axis=1)).astype(jnp.int32)

    def pick(plane):
        rows = _to_vector_major(plane).reshape(-1, 1024)
        val = jnp.take_along_axis(rows, first_ok[:, None], axis=1)[:, 0]
        return jnp.where(any_ok, val, jnp.uint32(0))

    fill_hi = pick(nhi)
    fill_lo = pick(nlo)

    def patch(plane, fill):
        rows = _to_vector_major(plane).reshape(-1, 1024)
        patched = jnp.where(okf, rows, fill[:, None])
        return _to_tile_major(patched.reshape(-1, 64, 16))

    return patch(nhi, fill_hi), patch(nlo, fill_lo), n_exc


@jax.jit
def _gather_regroup(plane, rows_idx):
    """Select vector rows by index from a tile plane and retile."""
    rows = _to_vector_major(plane)[rows_idx]
    return _to_tile_major(rows)


def _gather_flat(vhi, vlo, flat_idx: np.ndarray) -> np.ndarray:
    """Gather f64 values at flat value indices from device tile planes
    (one small device gather + fetch; the device-resident path ships
    only samples/exceptions to the host, never the column)."""
    v = flat_idx // C.VECTOR_SIZE
    pos = flat_idx % C.VECTOR_SIZE
    g = (v // 8).astype(np.int32)
    slot = (pos // 16).astype(np.int32)
    lane = ((v % 8) * 16 + pos % 16).astype(np.int32)
    gi, si, li = (jnp.asarray(x) for x in (g, slot, lane))
    hi = np.asarray(vhi[gi, si, li]).astype(np.uint64)
    lo = np.asarray(vlo[gi, si, li]).astype(np.uint64)
    return ((hi << np.uint64(32)) | lo).view(np.float64)


@jax.jit
def _gather_values_u64(vhi, vlo, flat_idx):
    """In-graph gather of flat value indices from tile-order planes:
    value k of vector n lives at [n//8, k//16, (n%8)*16 + k%16]."""
    n = flat_idx // C.VECTOR_SIZE
    k = flat_idx % C.VECTOR_SIZE
    g = n // 8
    s = k // 16
    c = (n % 8) * 16 + k % 16
    hi = vhi[g, s, c].astype(jnp.uint64)
    lo = vlo[g, s, c].astype(jnp.uint64)
    return (hi << jnp.uint64(32)) | lo


@jax.jit
def _first_level_device(vhi, vlo, flat_idx):
    """Device rowgroup planning: sample gather + exact top-k vote.

    flat_idx: [R, V, S] flat value indices of each full rowgroup's
    first-level sample.  Returns (combos [R, 5, 2], k_count [R],
    is_rd [R]) — oracle-identical (ops.alp.first_level_combos).
    """
    from .ops import alp as oalp
    from .ops.numerics import numerics_for
    chunks = _gather_values_u64(vhi, vlo, flat_idx)
    return oalp.first_level_combos(numerics_for(np.float64), chunks)


@jax.jit
def _second_level_device(vhi, vlo, sample_idx, combos, k_count):
    """Device second-level (e, f) choice on the 32-value stride of every
    vector (choose_factor_exponent_from_samples, in-graph gather)."""
    from .ops import alp as oalp
    from .ops.numerics import numerics_for
    samples = _gather_values_u64(vhi, vlo, sample_idx)
    return oalp.choose_factor_exponent_from_samples(
        numerics_for(np.float64), samples, combos, k_count)


def compress_device(data=None, *, planes=None, n_values=None):
    """Compress float64 data with the encode hot path on the TPU.

    Either ``data`` (1-D numpy float64, staged to device once) or
    ``planes=(vhi, vlo)`` — value bit planes already on device in tile
    order ([G, 64, 128] u32 hi/lo, the decode-plan output format) with
    ``n_values``; a trailing partial vector must be pre-padded with its
    last value (container._pad_to_vectors convention).  The planes path
    fetches only rowgroup samples (~0.25%), the 32-value second-level
    strides (~3%), exception values and the packed output — the column
    itself never crosses to the host.

    Returns a :class:`container.CompressedColumn` bit-identical to
    :func:`container.compress`.
    """
    from . import container as ct
    from .oracle import core as ocore

    tc = constants_for(np.float64)
    if planes is not None:
        vhi, vlo = planes
        if n_values is None:
            n_values = vhi.shape[0] * 8 * C.VECTOR_SIZE
        n_vec = max(1, math.ceil(n_values / C.VECTOR_SIZE))
        fetch = lambda idx: _gather_flat(vhi, vlo, np.asarray(idx))
    else:
        data = np.ascontiguousarray(data)
        if data.dtype == np.float32:
            return _compress_device_f32(data)
        if data.dtype != np.float64:
            raise NotImplementedError(f"device compress: {data.dtype}")
        n_values = len(data)
        vectors, n_vec = ct._pad_to_vectors(data)
        n_pad_stage = layout.pad_vectors(n_vec, 64)
        vp = np.zeros((n_pad_stage, C.VECTOR_SIZE), np.float64)
        vp[:n_vec] = vectors
        lo32, hi32 = _u64_split(vp)
        vhi = jnp.asarray(layout.plane_to_tile(hi32, 64))
        vlo = jnp.asarray(layout.plane_to_tile(lo32, 64))
        flat_host = vp.reshape(-1)
        fetch = lambda idx: flat_host[np.asarray(idx)]

    n_rg = max(1, math.ceil(n_vec / C.N_VECTORS_PER_ROWGROUP))
    n_pad_v = layout.pad_vectors(n_vec, 64)

    # ------- rowgroup planning -----------------------------------------
    # FULL rowgroups plan entirely ON DEVICE: strided sample gather +
    # exact-softfloat top-k vote (ops.alp.first_level_combos) in one jit;
    # only the tiny [R, 5, 2] combo table crosses to the host.  The tail
    # rowgroup (if any) keeps the host oracle (its sampling rules are
    # length-dependent, sampler.hpp:15-52).
    rg_scheme = np.zeros(n_rg, np.uint8)
    combos = np.zeros((n_vec, C.MAX_K_COMBINATIONS, 2), np.int32)
    k_count = np.zeros(n_vec, np.int32)
    n_full = n_vec // C.N_VECTORS_PER_ROWGROUP
    if n_full:
        pos = ocore.first_level_sample(
            np.arange(C.ROWGROUP_SIZE, dtype=np.float64), 0).astype(
                np.int64)
        V = len(pos) // C.SAMPLES_PER_VECTOR
        flat = (np.arange(n_full, dtype=np.int64)[:, None]
                * C.ROWGROUP_SIZE + pos[None, :]).reshape(
                    n_full, V, C.SAMPLES_PER_VECTOR)
        cmb, kc, isrd = _first_level_device(vhi, vlo, jnp.asarray(flat))
        cmb, kc, isrd = (np.asarray(x) for x in (cmb, kc, isrd))
        for rg in range(n_full):
            lo_v = rg * C.N_VECTORS_PER_ROWGROUP
            hi_v = lo_v + C.N_VECTORS_PER_ROWGROUP
            if isrd[rg]:
                rg_scheme[rg] = C.SCHEME_ALP_RD
            else:
                rg_scheme[rg] = C.SCHEME_ALP
                combos[lo_v:hi_v] = cmb[rg]
                k_count[lo_v:hi_v] = kc[rg]
    for rg in range(n_full, n_rg):
        lo_v = rg * C.N_VECTORS_PER_ROWGROUP
        hi_v = min(n_vec, lo_v + C.N_VECTORS_PER_ROWGROUP)
        rg_len = (hi_v - lo_v) * C.VECTOR_SIZE
        pos = ocore.first_level_sample(
            np.arange(rg_len, dtype=np.float64), 0).astype(np.int64)
        sample = fetch(lo_v * C.VECTOR_SIZE + pos)
        stt = ocore.AlpState(scheme=C.SCHEME_ALP)
        stt.sampled_values_n = len(sample)
        stt.k_combinations = C.MAX_K_COMBINATIONS
        stt.best_k_combinations = []
        ocore.find_top_k_combinations_fast(sample, stt, tc)
        if stt.scheme == C.SCHEME_ALP_RD:
            rg_scheme[rg] = C.SCHEME_ALP_RD
        else:
            rg_scheme[rg] = C.SCHEME_ALP
            ks = len(stt.best_k_combinations)
            for i, (e, f) in enumerate(stt.best_k_combinations):
                combos[lo_v:hi_v, i] = (e, f)
            k_count[lo_v:hi_v] = ks

    if (rg_scheme == C.SCHEME_ALP_RD).any():
        # mixed/RD columns: the host path is authoritative for RD
        # rowgroups (dictionary-bound, not encode-bound); fetch once
        full = fetch(np.arange(n_vec * C.VECTOR_SIZE,
                               dtype=np.int64))[:n_values]
        return ct.compress(np.asarray(full, np.float64))

    # second-level (e, f) choice on the 32-sample stride, ON DEVICE
    # (exact softfloat; encoder.hpp:241-305 semantics via ops.alp) —
    # only the [n_vec] fac/exp vectors cross to the host
    stride = C.VECTOR_SIZE // C.SAMPLES_PER_VECTOR
    sample_idx = (np.arange(n_vec, dtype=np.int64)[:, None] * C.VECTOR_SIZE
                  + np.arange(C.SAMPLES_PER_VECTOR,
                              dtype=np.int64)[None, :] * stride)
    fac_d, exp_d = _second_level_device(
        vhi, vlo, jnp.asarray(sample_idx), jnp.asarray(combos),
        jnp.asarray(k_count))
    fac_v, exp_v = np.asarray(fac_d), np.asarray(exp_d)

    # ------- device encode + patch + analyze ---------------------------
    c1 = tc.exp_arr[exp_v]               # 10^e
    c2 = tc.frac_arr[fac_v]              # 10^-f
    fact = tc.fact_arr[fac_v]
    frac = tc.frac_arr[exp_v]
    c1lo, c1hi = _u64_split(np.ascontiguousarray(c1))
    c2lo, c2hi = _u64_split(np.ascontiguousarray(c2))
    flo, fhi = _u64_split(np.ascontiguousarray(fact))
    frlo, frhi = _u64_split(np.ascontiguousarray(frac))
    meta = [_expand(x, n_pad_v) for x in (c1lo, c1hi, c2lo, c2hi,
                                          flo, fhi, frlo, frhi)]
    nhi, nlo, exc, rare = kencode.alp_encode_f64_tiles(vhi, vlo, *meta)
    nhi, nlo, n_exc = _patch_and_count(nhi, nlo, exc)
    bw_d, base_d, max_d = kencode.analyze_planes_f64(nhi, nlo)
    bw_all = np.asarray(bw_d)[:n_vec].astype(np.uint8)
    base_all = np.asarray(base_d)[:n_vec].astype(np.int64)
    enc_max = (np.asarray(max_d)[:n_vec].view(np.uint64)
               - base_all.view(np.uint64))
    n_exc_np = np.asarray(n_exc)[:n_vec].astype(np.uint16)
    rare_count = int(np.asarray(jnp.sum(rare)))

    # ------- device FFOR pack, bucketed by bit width -------------------
    packed = [None] * n_vec
    base_lo = (base_all.view(np.uint64) & np.uint64(0xFFFFFFFF)).astype(
        np.uint32)
    base_hi = (base_all.view(np.uint64) >> np.uint64(32)).astype(np.uint32)
    for bw in np.unique(bw_all):
        sel = np.nonzero(bw_all == bw)[0]
        if bw == 0:
            for v in sel:
                packed[v] = np.zeros(0, np.uint64)
            continue
        n_sel_pad = layout.pad_vectors(len(sel), 64)
        rows_idx = np.zeros(n_sel_pad, np.int64)
        rows_idx[:len(sel)] = sel
        ridx = jnp.asarray(rows_idx)
        sel_hi = _gather_regroup(nhi, ridx)
        sel_lo = _gather_regroup(nlo, ridx)
        blo = _expand(base_lo[sel], n_sel_pad)
        bhi = _expand(base_hi[sel], n_sel_pad)
        tiles = kfalp.ffor_planes_f64(sel_hi, sel_lo, blo, bhi, bw=int(bw))
        words = layout.tile_to_ref(np.asarray(tiles), int(bw), 64, len(sel))
        for r, v in enumerate(sel):
            packed[v] = words[r]

    # ------- exceptions: positions/values, host side -------------------
    exc_positions = [np.empty(0, np.uint16)] * n_vec
    exc_values = [np.empty(0, np.float64)] * n_vec
    exc_vec = np.nonzero(n_exc_np)[0]
    if exc_vec.size:
        exc_rows = np.asarray(
            _to_vector_major(exc).reshape(-1, 1024)[jnp.asarray(exc_vec)])
        flat_pos, counts = [], []
        for r, v in enumerate(exc_vec):
            pos = np.nonzero(exc_rows[r])[0].astype(np.uint16)
            exc_positions[v] = pos
            flat_pos.append(v * C.VECTOR_SIZE + pos.astype(np.int64))
            counts.append(len(pos))
        vals = fetch(np.concatenate(flat_pos))
        off = 0
        for v, cnt in zip(exc_vec, counts):
            exc_values[v] = vals[off:off + cnt]
            off += cnt

    col = ct.CompressedColumn(
        dtype=np.dtype(np.float64), n_values=n_values, n_vectors=n_vec,
        rg_scheme=rg_scheme,
        rd_dict=np.zeros((n_rg, C.MAX_RD_DICTIONARY_SIZE), np.uint16),
        rd_dict_size=np.zeros(n_rg, np.uint8),
        rd_left_bw=np.zeros(n_rg, np.uint8),
        rd_right_bw=np.zeros(n_rg, np.uint8),
        fac=fac_v.astype(np.uint8), exp=exp_v.astype(np.uint8),
        bit_width=bw_all, base=base_all,
        exc_count=n_exc_np, packed=packed,
        left_packed=[np.empty(0, np.uint16)] * n_vec,
        exc_values=exc_values, exc_positions=exc_positions,
        enc_max=enc_max)

    if rare_count:
        # subnormal inputs outside the device envelope: re-encode those
        # vectors host-side with the already-chosen (e, f) (the choice
        # ran on exact host f64); bit-identical fallback
        rare_rows = np.asarray(_to_vector_major(rare).reshape(-1, 1024))
        bad = np.nonzero(rare_rows[:n_vec].any(axis=1))[0]
        if bad.size:
            rows = fetch((bad[:, None] * C.VECTOR_SIZE
                          + np.arange(C.VECTOR_SIZE)[None, :]).ravel()
                         ).reshape(len(bad), C.VECTOR_SIZE)
            _host_fixup(col, dict(zip(bad, rows)), bad, fac_v, exp_v, tc)
    return col


def make_device_compress_step(n_vec: int):
    """(step, static prep) for benchlib.loop_bench: the FULL device-side
    compression pipeline — first-level rowgroup planning (top-k vote),
    second-level (e, f) choice, exact encode+verify, exception patching,
    FFOR analysis — as ONE jittable program over device-resident value
    planes.  ``n_vec`` must be whole rowgroups (the bench shape).

    Returns (step, make_args) where ``make_args(vhi, vlo)`` builds the
    operand tuple.  The companion :func:`make_pack_step` times the
    bucketed FFOR pack; their slope times sum to the device e2e
    compression cost (the reference's encode benches are the same
    steady-state shape, benchmarks/benchmark.cpp:41-148).
    """
    from .ops import alp as oalp
    from .ops.numerics import numerics_for
    from .oracle import core as ocore

    assert n_vec % C.N_VECTORS_PER_ROWGROUP == 0
    assert n_vec % 8 == 0
    tc = constants_for(np.float64)
    nm = numerics_for(np.float64)
    n_rg = n_vec // C.N_VECTORS_PER_ROWGROUP
    pos = ocore.first_level_sample(
        np.arange(C.ROWGROUP_SIZE, dtype=np.float64), 0).astype(np.int64)
    V = len(pos) // C.SAMPLES_PER_VECTOR
    flat_first = jnp.asarray(
        (np.arange(n_rg, dtype=np.int64)[:, None] * C.ROWGROUP_SIZE
         + pos[None, :]).reshape(n_rg, V, C.SAMPLES_PER_VECTOR))
    stride = C.VECTOR_SIZE // C.SAMPLES_PER_VECTOR
    sample_idx = jnp.asarray(
        np.arange(n_vec, dtype=np.int64)[:, None] * C.VECTOR_SIZE
        + np.arange(C.SAMPLES_PER_VECTOR, dtype=np.int64)[None, :]
        * stride)
    tabs = {}
    for name, tab in (("c1", tc.exp_arr), ("c2", tc.frac_arr),
                      ("fact", tc.fact_arr), ("frac", tc.frac_arr)):
        lo, hi = _u64_split(np.ascontiguousarray(tab))
        tabs[name] = (jnp.asarray(lo), jnp.asarray(hi))
    G = n_vec // 8

    def expand(per_vec_u32):
        return jnp.repeat(per_vec_u32.reshape(G, 8), 16, axis=1,
                          total_repeat_length=128)

    def step(carry, vhi, vlo):
        vlo = vlo ^ carry          # data dependence; cost-independent
        chunks = _gather_values_u64(vhi, vlo, flat_first)
        combos, k_count, _ = oalp.first_level_combos(nm, chunks)
        combos = jnp.repeat(combos, C.N_VECTORS_PER_ROWGROUP, axis=0,
                            total_repeat_length=n_vec)
        k_count = jnp.repeat(k_count, C.N_VECTORS_PER_ROWGROUP,
                             total_repeat_length=n_vec)
        samples = _gather_values_u64(vhi, vlo, sample_idx)
        fac, exp = oalp.choose_factor_exponent_from_samples(
            nm, samples, combos, k_count)
        meta = []
        for name, idx in (("c1", exp), ("c2", fac), ("fact", fac),
                          ("frac", exp)):
            lo, hi = tabs[name]
            meta += [expand(lo[idx]), expand(hi[idx])]
        nhi, nlo, exc, _ = kencode.alp_encode_f64_tiles(vhi, vlo, *meta)
        nhi, nlo, n_exc = _patch_and_count(nhi, nlo, exc)
        bw, base, _ = kencode.analyze_planes_f64(nhi, nlo)
        acc = (nhi[0, 0, 0] ^ nlo[0, 0, 0]
               ^ bw.sum().astype(jnp.uint32)
               ^ n_exc.sum().astype(jnp.uint32)
               ^ base[0].astype(jnp.uint32) ^ fac[0].astype(jnp.uint32))
        return carry ^ acc

    return step


def make_pack_step(col, nhi, nlo):
    """loop_bench step for the bucketed FFOR pack stage: the patched
    encode planes of ``col`` (from the device pipeline) packed per bit
    width with the column's real bucket structure (static gathers, as in
    compress_device)."""
    n_vec = col.n_vectors
    bw_all = col.bit_width[:n_vec]
    base_all = col.base[:n_vec].astype(np.int64)
    base_lo = (base_all.view(np.uint64) & np.uint64(0xFFFFFFFF)).astype(
        np.uint32)
    base_hi = (base_all.view(np.uint64) >> np.uint64(32)).astype(np.uint32)
    buckets = []
    for bw in np.unique(bw_all):
        if bw == 0:
            continue
        sel = np.nonzero(bw_all == bw)[0]
        n_sel_pad = layout.pad_vectors(len(sel), 64)
        ridx = np.zeros(n_sel_pad, np.int64)
        ridx[:len(sel)] = sel
        buckets.append((int(bw), jnp.asarray(ridx),
                        _expand(base_lo[sel], n_sel_pad),
                        _expand(base_hi[sel], n_sel_pad)))

    def step(carry, nhi, nlo):
        nlo = nlo ^ carry
        acc = carry
        for bw, ridx, blo, bhi in buckets:
            sel_hi = _gather_regroup(nhi, ridx)
            sel_lo = _gather_regroup(nlo, ridx)
            tiles = kfalp.ffor_planes_f64(sel_hi, sel_lo, blo, bhi, bw=bw)
            acc = acc ^ tiles[0, 0, 0]
        return acc

    return step


def _host_fixup(col, rows_by_vec, bad_vectors, fac_v, exp_v, tc):
    """Re-encode specific vectors with the host oracle (exact), in place."""
    from .oracle import core as ocore
    from .oracle import fastlanes as ofl
    for v in bad_vectors:
        enc = ocore.encode_vector(rows_by_vec[v], int(fac_v[v]),
                                  int(exp_v[v]), tc)
        bw, base = ocore.analyze_ffor(enc.encoded, tc)
        col.bit_width[v] = bw
        col.base[v] = base
        if col.enc_max is not None:
            col.enc_max[v] = (
                np.int64(enc.encoded.max()).view(np.uint64)
                - np.int64(base).view(np.uint64))
        col.exc_count[v] = len(enc.exc_positions)
        col.exc_positions[v] = enc.exc_positions
        col.exc_values[v] = enc.exc_values
        col.packed[v] = ofl.ffor_pack(enc.encoded, int(bw), base)


# ---------------------------------------------------------------------------
# float32 path: all-native kernels (kernels.encode.alp_encode_f32_tiles)
# ---------------------------------------------------------------------------

@jax.jit
def _to_vector_major32(plane):
    """[G, 32, 128] f32 tile plane -> [G*4, 32, 32] vector-major rows."""
    G = plane.shape[0]
    t = plane.reshape(G, 32, 4, 32).transpose(0, 2, 1, 3)
    return t.reshape(G * 4, 32, 32)


@jax.jit
def _to_tile_major32(rows):
    n = rows.shape[0]
    t = rows.reshape(n // 4, 4, 32, 32).transpose(0, 2, 1, 3)
    return t.reshape(n // 4, 32, 128)


@jax.jit
def _patch_and_count32(n_plane, exc):
    ok = _to_vector_major32(exc) == 0
    okf = ok.reshape(ok.shape[0], 1024)
    first_ok = jnp.argmax(okf, axis=1)
    any_ok = okf.any(axis=1)
    n_exc = (1024 - okf.sum(axis=1)).astype(jnp.int32)
    rows = _to_vector_major32(n_plane).reshape(-1, 1024)
    fill = jnp.take_along_axis(rows, first_ok[:, None], axis=1)[:, 0]
    fill = jnp.where(any_ok, fill, jnp.uint32(0))
    patched = jnp.where(okf, rows, fill[:, None])
    return _to_tile_major32(patched.reshape(-1, 32, 32)), n_exc


def _compress_device_f32(data: np.ndarray):
    """float32 device compress: encode/patch/analyze/pack as native-f32
    kernels; bit-identical to the host path (same structure as the f64
    pipeline, minus the softfloat machinery and rare-value fixup — the
    f32 kernel has no envelope)."""
    from . import container as ct
    from .oracle import core as ocore

    tc = constants_for(np.float32)
    data = np.ascontiguousarray(data, np.float32)
    n_values = len(data)
    vectors, n_vec = ct._pad_to_vectors(data)
    n_pad_v = layout.pad_vectors(n_vec, 32)
    vp = np.zeros((n_pad_v, C.VECTOR_SIZE), np.float32)
    vp[:n_vec] = vectors
    vtiles = jnp.asarray(layout.plane_to_tile(vp.view(np.uint32), 32))
    flat = vp.reshape(-1)

    n_rg = max(1, math.ceil(n_vec / C.N_VECTORS_PER_ROWGROUP))
    rg_scheme = np.zeros(n_rg, np.uint8)
    combos = np.zeros((n_vec, C.MAX_K_COMBINATIONS, 2), np.int32)
    k_count = np.zeros(n_vec, np.int32)
    for rg in range(n_rg):
        lo_v = rg * C.N_VECTORS_PER_ROWGROUP
        hi_v = min(n_vec, lo_v + C.N_VECTORS_PER_ROWGROUP)
        stt = ocore.encoder_init(
            flat[lo_v * C.VECTOR_SIZE: hi_v * C.VECTOR_SIZE], 0, tc)
        if stt.scheme == C.SCHEME_ALP_RD:
            rg_scheme[rg] = C.SCHEME_ALP_RD
        else:
            rg_scheme[rg] = C.SCHEME_ALP
            ks = len(stt.best_k_combinations)
            for i, (e, f) in enumerate(stt.best_k_combinations):
                combos[lo_v:hi_v, i] = (e, f)
            k_count[lo_v:hi_v] = ks
    if (rg_scheme == C.SCHEME_ALP_RD).any():
        return ct.compress(data)

    from .ops import alp as oalp
    from .ops.numerics import numerics_for
    nm = numerics_for(np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        fac_v, exp_v = (np.asarray(x) for x in oalp.choose_factor_exponent(
            nm, nm.values_from_np(vectors), combos, k_count))

    def expand32(x):
        full = np.zeros(n_pad_v, np.uint32)
        full[:n_vec] = x
        return jnp.asarray(layout.lane_expand(full, 32))

    n_p, exc_p = kencode.alp_encode_f32_tiles(
        vtiles,
        expand32(tc.exp_arr[exp_v].view(np.uint32)),
        expand32(tc.frac_arr[fac_v].view(np.uint32)),
        expand32(tc.fact_arr[fac_v].astype(np.int32).view(np.uint32)),
        expand32(tc.frac_arr[exp_v].view(np.uint32)))
    n_p, n_exc = _patch_and_count32(n_p, exc_p)
    bw_d, base_d, max_d = kencode.analyze_planes_f32(n_p)
    bw_all = np.asarray(bw_d)[:n_vec].astype(np.uint8)
    base_all = np.asarray(base_d)[:n_vec].astype(np.int32)
    enc_max = (np.asarray(max_d)[:n_vec].view(np.uint32)
               - base_all.view(np.uint32)).astype(np.uint64)
    n_exc_np = np.asarray(n_exc)[:n_vec].astype(np.uint16)

    packed = [None] * n_vec
    for bw in np.unique(bw_all):
        sel = np.nonzero(bw_all == bw)[0]
        if bw == 0:
            for v in sel:
                packed[v] = np.zeros(0, np.uint32)
            continue
        n_sel_pad = layout.pad_vectors(len(sel), 32)
        ridx = np.zeros(n_sel_pad, np.int64)
        ridx[:len(sel)] = sel
        rows = _to_vector_major32(n_p)[jnp.asarray(ridx)]
        sel_tiles = _to_tile_major32(rows)
        blo = jnp.asarray(layout.lane_expand(np.concatenate(
            [base_all[sel].view(np.uint32),
             np.zeros(n_sel_pad - len(sel), np.uint32)]), 32))
        bhi = jnp.zeros_like(blo)
        tiles = kfalp.ffor_tile(sel_tiles, blo, bhi, bw=int(bw),
                                element_bits=32)
        words = layout.tile_to_ref(np.asarray(tiles), int(bw), 32,
                                   len(sel))
        for r, v in enumerate(sel):
            packed[v] = words[r]

    exc_positions = [np.empty(0, np.uint16)] * n_vec
    exc_values = [np.empty(0, np.float32)] * n_vec
    exc_vec = np.nonzero(n_exc_np)[0]
    if exc_vec.size:
        exc_rows = np.asarray(
            _to_vector_major32(exc_p).reshape(-1, 1024)[
                jnp.asarray(exc_vec)])
        for r, v in enumerate(exc_vec):
            pos = np.nonzero(exc_rows[r])[0].astype(np.uint16)
            exc_positions[v] = pos
            exc_values[v] = vectors[v][pos]

    return ct.CompressedColumn(
        dtype=np.dtype(np.float32), n_values=n_values, n_vectors=n_vec,
        rg_scheme=rg_scheme,
        rd_dict=np.zeros((n_rg, C.MAX_RD_DICTIONARY_SIZE), np.uint16),
        rd_dict_size=np.zeros(n_rg, np.uint8),
        rd_left_bw=np.zeros(n_rg, np.uint8),
        rd_right_bw=np.zeros(n_rg, np.uint8),
        fac=fac_v.astype(np.uint8), exp=exp_v.astype(np.uint8),
        bit_width=bw_all, base=base_all,
        exc_count=n_exc_np, packed=packed,
        left_packed=[np.empty(0, np.uint16)] * n_vec,
        exc_values=exc_values, exc_positions=exc_positions,
        enc_max=enc_max)
