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

import functools
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


@jax.jit
def _gather_regroup3(nhi, nlo, exc, rows_idx):
    """One fused vector-major transform + gather + retile of the three
    encode planes for ALL pack buckets at once (rows_idx is the
    concatenation of every bucket's padded vector ids): per-bucket
    callers then take static slices on the group axis.  Replaces one
    full-plane transpose+gather PER BUCKET with one total — the pack
    stage's cost is gather-dominated (ffor itself runs ~10x faster)."""
    return (_gather_regroup(nhi, rows_idx), _gather_regroup(nlo, rows_idx),
            _gather_regroup(exc, rows_idx))


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


def _stride_samples_u32(plane):
    """The 32-value sample stride of EVERY vector as a strided slice of
    the tile planes (positions j*32 of vector v live at slot 2j, lane
    (v%8)*16): [G, 64, 128] -> [G*8, 32] u32, no gather (XLA gathers of
    scattered elements measured ~30x slower than this slice)."""
    s = plane[:, 0::2, 0::16]                      # [G, 32, 8]
    return s.transpose(0, 2, 1).reshape(-1, 32)


def _gather_values_u32(vhi, vlo, flat_idx):
    """In-graph gather of flat value indices from tile-order planes:
    value k of vector n lives at [n//8, k//16, (n%8)*16 + k%16].
    flat_idx must be int32 (i64 index math is emulated on TPU)."""
    n = flat_idx // C.VECTOR_SIZE
    k = flat_idx % C.VECTOR_SIZE
    g = n // 8
    s = k // 16
    c = (n % 8) * 16 + k % 16
    return vhi[g, s, c], vlo[g, s, c]


@jax.jit
def _gather_values_u64(vhi, vlo, flat_idx):
    hi, lo = _gather_values_u32(vhi, vlo, flat_idx)
    return (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(
        jnp.uint64)


@jax.jit
def _first_level_device(vhi, vlo, vec_ids):
    """Device rowgroup planning: strided sample slice + Pallas-scored
    top-k vote (kernels.score + ops.alp.first_level_vote —
    oracle-identical).

    vec_ids: [R, V] int32 sampled vector ids of each full rowgroup
    (the 32-value stride within a vector is a static slice of the tile
    planes).  Returns (combos [R, 5, 2], k_count [R], is_rd [R],
    rare [R]); ``rare`` rowgroups contain subnormal samples outside the
    scorer's envelope and must be re-planned exactly by the caller.
    """
    from .kernels import score as kscore
    from .ops import alp as oalp
    tc = constants_for(np.float64)
    R, V = vec_ids.shape
    hi = _stride_samples_u32(vhi)[vec_ids]         # [R, V, 32] row gather
    lo = _stride_samples_u32(vlo)[vec_ids]
    est, ne, rare = kscore.first_level_scores_f64(hi, lo, tc=tc)
    combos, kc, isrd = oalp.first_level_vote(est, ne, C.SAMPLES_PER_VECTOR,
                                             tc)
    return combos, kc, isrd, rare


@functools.partial(jax.jit, static_argnames=("n_vec",))
def _second_level_device(vhi, vlo, combos, k_count, *, n_vec: int):
    """Device second-level (e, f) choice on the 32-value stride of every
    vector (strided sample slice + Pallas scorer + the exact
    accept/early-exit scan).  Returns (fac, exp, rare); ``rare``
    vectors must be re-chosen exactly."""
    from .kernels import score as kscore
    from .ops import alp as oalp
    tc = constants_for(np.float64)
    shi = _stride_samples_u32(vhi)[:n_vec]
    slo = _stride_samples_u32(vlo)[:n_vec]
    est, rare = kscore.second_level_scores_f64(shi, slo, combos, k_count,
                                               tc=tc)
    fac, exp = oalp.accept_scan(est, combos, k_count)
    return fac, exp, rare


@functools.partial(jax.jit, static_argnames=("rbw",))
def _rd_encode_planes_f64(vhi, vlo, ridx, dict8, dict_size, *, rbw):
    """Device ALP_RD encode of selected vectors (rd.hpp:109-147): gather
    vector rows from the tile planes, split bits at ``rbw``, 8-wide
    dictionary lookup with entry-validity guard, and retile the right
    parts for the packer.

    ridx [n_pad] vector ids (n_pad % 8 == 0); dict8 [n_pad, 8] u16 per
    vector (its rowgroup's dictionary); dict_size [n_pad] i32.  ``rbw``
    is static per bucket and >= 33 (the f64 cut is 1..16), so the left
    part lives entirely in the hi word and the lo word passes through.
    Returns (right_hi [G,64,128], right_lo [G,64,128], left_idx
    [n_pad,1024] u16, exc_mask [n_pad,1024] bool, left_raw [n_pad,1024]
    u16).
    """
    rows_hi = _to_vector_major(vhi).reshape(-1, 1024)[ridx]
    rows_lo = _to_vector_major(vlo).reshape(-1, 1024)[ridx]
    left = rows_hi >> jnp.uint32(rbw - 32)
    right_hi = rows_hi & jnp.uint32((1 << (rbw - 32)) - 1)
    k = jnp.arange(dict8.shape[1], dtype=jnp.int32)
    valid = k[None, :] < dict_size[:, None]
    matches = (left[:, :, None] == dict8[:, None, :].astype(jnp.uint32)) \
        & valid[:, None, :]
    in_dict = matches.any(axis=2)
    idx = jnp.where(in_dict, jnp.argmax(matches, axis=2),
                    dict_size[:, None]).astype(jnp.uint16)
    thi = _to_tile_major(right_hi.reshape(-1, 64, 16))
    tlo = _to_tile_major(rows_lo.reshape(-1, 64, 16))
    return thi, tlo, idx, ~in_dict, left.astype(jnp.uint16)


@functools.partial(jax.jit, static_argnames=("rbw",))
def _rd_encode_planes_f32(vtiles, ridx, dict8, dict_size, *, rbw):
    """f32 twin of :func:`_rd_encode_planes_f64` (rbw = 32 - cut is in
    [16, 31]: single-word split).  Returns (right_tiles [G,32,128],
    left_idx, exc_mask, left_raw)."""
    rows = _to_vector_major32(vtiles).reshape(-1, 1024)[ridx]
    left = rows >> jnp.uint32(rbw)
    right = rows & jnp.uint32((1 << rbw) - 1)
    k = jnp.arange(dict8.shape[1], dtype=jnp.int32)
    valid = k[None, :] < dict_size[:, None]
    matches = (left[:, :, None] == dict8[:, None, :].astype(jnp.uint32)) \
        & valid[:, None, :]
    in_dict = matches.any(axis=2)
    idx = jnp.where(in_dict, jnp.argmax(matches, axis=2),
                    dict_size[:, None]).astype(jnp.uint16)
    rt = _to_tile_major32(right.reshape(-1, 32, 32))
    return rt, idx, ~in_dict, left.astype(jnp.uint16)


def _build_rd_states(rg_scheme, n_vec, n_values, fetch, tc):
    """Host dictionary build for RD rowgroups from FETCHED samples only
    (rd.hpp:180-185: rd_encoder::init samples <=256 values per rowgroup
    — planning, not throughput; the column itself stays on device)."""
    from .oracle import core as ocore
    from .oracle import rd as ord_
    rd_states = {}
    for rg in np.nonzero(rg_scheme == C.SCHEME_ALP_RD)[0]:
        lo_v = rg * C.N_VECTORS_PER_ROWGROUP
        hi_v = min(n_vec, lo_v + C.N_VECTORS_PER_ROWGROUP)
        rg_len = (hi_v - lo_v) * C.VECTOR_SIZE
        pos = ocore.first_level_sample(
            np.arange(rg_len, dtype=np.float64), 0).astype(np.int64)
        sample = np.asarray(fetch(lo_v * C.VECTOR_SIZE + pos), tc.pt)
        stt = ocore.AlpState(scheme=C.SCHEME_ALP_RD)
        stt.sampled_values_n = len(sample)
        ord_.find_best_dictionary(sample, stt, tc)
        rd_states[int(rg)] = stt
    return rd_states


@jax.jit
def finalize_encode_stats(stats, nhi, nlo):
    """Per-vector analyze + patch quantities from the fused encode
    statistics (kernels.encode._encode_stats_kernel layout): cross-lane
    reductions on the tiny [G, 8, 128] stats plane replace the separate
    patch + analyze passes over the full value planes.

    Returns (bit_width [n] i32, base [n] i64, enc_max [n] u64 (= max -
    base), n_exc [n] i32, rare [n] bool, fill_lo [n] u32, fill_hi [n]
    u32) with n = G*8 vectors in group-major order.  The fill value is
    the vector's first non-exception encoded int in VALUE order
    (encoder.hpp:382-399); all-exception vectors use 0 (bw 0, base 0),
    matching the host path.
    """
    G = stats.shape[0]
    s = stats.reshape(G, 8, 8, 16)         # [G, stat, vec, lane]
    n_exc = s[:, 0].sum(-1).reshape(-1).astype(jnp.int32)
    first_k = s[:, 1].min(-1).reshape(-1)
    mh = s[:, 2].max(-1)
    ml = jnp.where(s[:, 2] == mh[..., None], s[:, 3],
                   jnp.int32(-(2**31))).max(-1)
    nh = s[:, 4].min(-1)
    nl = jnp.where(s[:, 4] == nh[..., None], s[:, 5],
                   jnp.int32(2**31 - 1)).min(-1)
    rare = (s[:, 6].sum(-1) > 0).reshape(-1)

    def to_i64(h, l):
        lu = (l.astype(jnp.uint32) ^ jnp.uint32(0x80000000)).astype(
            jnp.uint64)
        return ((h.astype(jnp.int64) << jnp.int64(32)).astype(jnp.uint64)
                | lu).astype(jnp.int64)

    any_ok = (first_k < 2047).reshape(G, 8)
    mx = jnp.where(any_ok, to_i64(mh, ml), jnp.int64(0)).reshape(-1)
    mn = jnp.where(any_ok, to_i64(nh, nl), jnp.int64(0)).reshape(-1)
    umax = (mx.astype(jnp.uint64) - mn.astype(jnp.uint64))
    from .ops.alp import bit_width_of
    bw = bit_width_of(umax).astype(jnp.int32)
    # fill = n at the first non-exception value index (value order k:
    # slot = k//16, lane = (vec%8)*16 + k%16)
    k = jnp.where(first_k < 2047, first_k, 0)
    vec = jnp.arange(G * 8, dtype=jnp.int32)
    g = vec // 8
    slot = k // 16
    lane = (vec % 8) * 16 + k % 16
    fok = (first_k < 2047)
    fill_hi = jnp.where(fok, nhi[g, slot, lane], jnp.uint32(0))
    fill_lo = jnp.where(fok, nlo[g, slot, lane], jnp.uint32(0))
    return bw, mn, umax, n_exc, rare, fill_lo, fill_hi


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
    # Pallas-scored top-k vote (kernels.score; oracle-identical) in one
    # jit; only the tiny [R, 5, 2] combo table crosses to the host.
    # The tail rowgroup (length-dependent sampling rules,
    # sampler.hpp:15-52) and any rowgroup whose sample contains
    # subnormals (outside the scorer's envelope) take the host oracle.
    if n_vec * C.VECTOR_SIZE >= 2**31:
        raise NotImplementedError(
            "device compress: columns over 2^31 values per call "
            "(int32 in-graph gather indices); split into chunks")
    rg_scheme = np.zeros(n_rg, np.uint8)
    combos = np.zeros((n_vec, C.MAX_K_COMBINATIONS, 2), np.int32)
    k_count = np.zeros(n_vec, np.int32)
    n_full = n_vec // C.N_VECTORS_PER_ROWGROUP
    host_rgs = list(range(n_full, n_rg))
    if n_full:
        pos = ocore.first_level_sample(
            np.arange(C.ROWGROUP_SIZE, dtype=np.float64), 0).astype(
                np.int32)
        svec = np.unique(pos // C.VECTOR_SIZE)        # sampled vector ids
        vec_ids = (np.arange(n_full, dtype=np.int32)[:, None]
                   * C.N_VECTORS_PER_ROWGROUP + svec[None, :])
        cmb, kc, isrd, rare_rg = _first_level_device(
            vhi, vlo, jnp.asarray(vec_ids))
        cmb, kc, isrd, rare_rg = (np.asarray(x)
                                  for x in (cmb, kc, isrd, rare_rg))
        for rg in range(n_full):
            if rare_rg[rg]:
                host_rgs.append(rg)
                continue
            lo_v = rg * C.N_VECTORS_PER_ROWGROUP
            hi_v = lo_v + C.N_VECTORS_PER_ROWGROUP
            if isrd[rg]:
                rg_scheme[rg] = C.SCHEME_ALP_RD
            else:
                rg_scheme[rg] = C.SCHEME_ALP
                combos[lo_v:hi_v] = cmb[rg]
                k_count[lo_v:hi_v] = kc[rg]
    for rg in host_rgs:
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

    # RD rowgroups: dictionaries built host-side from FETCHED samples
    # (planning); the per-vector split/lookup/pack runs on device below
    rd_states = _build_rd_states(rg_scheme, n_vec, n_values, fetch, tc)
    vec_rg_all = np.arange(n_vec) // C.N_VECTORS_PER_ROWGROUP
    is_rd_vec = rg_scheme[vec_rg_all] == C.SCHEME_ALP_RD
    rd_vec = np.nonzero(is_rd_vec)[0]
    alp_any = not is_rd_vec.all()

    # second-level (e, f) choice on the 32-sample stride, ON DEVICE
    # (Pallas scorer + exact accept scan, encoder.hpp:241-305) — only
    # the [n_vec] fac/exp vectors cross to the host.  Vectors whose
    # stride contains subnormals are re-chosen exactly host-side.
    stride = C.VECTOR_SIZE // C.SAMPLES_PER_VECTOR
    sample_idx = (np.arange(n_vec, dtype=np.int64)[:, None] * C.VECTOR_SIZE
                  + np.arange(C.SAMPLES_PER_VECTOR,
                              dtype=np.int64)[None, :] * stride)
    # vectors whose rowgroup kept a single candidate skip the scorer
    # entirely (the reference encode also skips find_best_* for k == 1,
    # encoder.hpp:404-406)
    fac_v = combos[:, 0, 1].astype(np.int32).copy()
    exp_v = combos[:, 0, 0].astype(np.int32).copy()
    multi = np.nonzero(k_count > 1)[0]
    rare_vec = np.empty(0, np.int64)
    if multi.size:
        fac_d, exp_d, rare_d = _second_level_device(
            vhi, vlo, jnp.asarray(combos), jnp.asarray(k_count),
            n_vec=n_vec)
        fac_m, exp_m = np.asarray(fac_d), np.asarray(exp_d)
        fac_v[multi] = fac_m[multi]
        exp_v[multi] = exp_m[multi]
        rare_vec = np.intersect1d(np.nonzero(np.asarray(rare_d))[0],
                                  multi)
    if rare_vec.size:
        strides = fetch(sample_idx[rare_vec].ravel()
                        ).reshape(len(rare_vec), C.SAMPLES_PER_VECTOR)
        for r, v in enumerate(rare_vec):
            cand = [tuple(combos[v, i]) for i in range(k_count[v])]
            cand = [(int(e), int(f)) for e, f in cand]
            f_, e_ = ocore.find_best_exponent_factor_from_combinations(
                cand, len(cand), strides[r], tc)
            fac_v[v], exp_v[v] = f_, e_

    # ------- device encode + patch + analyze ---------------------------
    if alp_any:
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
        nhi, nlo, exc, stats = kencode.alp_encode_f64_tiles_stats(
            vhi, vlo, *meta)
        (bw_d, base_d, umax_d, n_exc, rare_v,
         fill_lo_d, fill_hi_d) = finalize_encode_stats(stats, nhi, nlo)
        bw_all = np.asarray(bw_d)[:n_vec].astype(np.uint8)
        base_all = np.asarray(base_d)[:n_vec].astype(np.int64)
        enc_max = np.asarray(umax_d)[:n_vec].view(np.uint64).copy()
        n_exc_np = np.asarray(n_exc)[:n_vec].astype(np.uint16)
        fill_lo_all = np.asarray(fill_lo_d)
        fill_hi_all = np.asarray(fill_hi_d)
        rare_vecs = np.nonzero(np.asarray(rare_v)[:n_vec])[0]
    else:
        # all-RD column: the ALP encode would be pure waste
        bw_all = np.zeros(n_vec, np.uint8)
        base_all = np.zeros(n_vec, np.int64)
        enc_max = np.zeros(n_vec, np.uint64)
        n_exc_np = np.zeros(n_vec, np.uint16)
        fill_lo_all = np.zeros(n_pad_v, np.uint32)
        fill_hi_all = np.zeros(n_pad_v, np.uint32)
        rare_vecs = np.empty(0, np.int64)
    if rd_vec.size:
        # RD vectors carry no ALP metadata (host-path convention) and
        # must not enter the ALP pack/exception/rare paths
        bw_all[rd_vec] = 0
        base_all[rd_vec] = 0
        enc_max[rd_vec] = 0
        n_exc_np[rd_vec] = 0
        rare_vecs = np.setdiff1d(rare_vecs, rd_vec)

    # ------- device FFOR pack, bucketed by bit width -------------------
    # ONE combined gather/retile of the encode planes for all buckets
    # (static per-bucket slices after) — the gather is the pack stage's
    # dominant cost, the ffor kernel itself runs ~10x faster
    packed = [None] * n_vec
    base_lo = (base_all.view(np.uint64) & np.uint64(0xFFFFFFFF)).astype(
        np.uint32)
    base_hi = (base_all.view(np.uint64) >> np.uint64(32)).astype(np.uint32)
    bucket_list = []
    idx_parts = []
    off_v = 0
    for bw in np.unique(bw_all):
        sel = np.nonzero(bw_all == bw)[0]
        if bw == 0:
            for v in sel:
                packed[v] = np.zeros(0, np.uint64)
            continue
        n_sel_pad = layout.pad_vectors(len(sel), 64)
        ridx = np.zeros(n_sel_pad, np.int64)
        ridx[:len(sel)] = sel
        idx_parts.append(ridx)
        bucket_list.append((int(bw), sel, off_v, n_sel_pad))
        off_v += n_sel_pad
    if bucket_list:
        for bw, sel, off, n_sel_pad in bucket_list:
            ridx = np.zeros(n_sel_pad, np.int64)
            ridx[:len(sel)] = sel
            ridx = jnp.asarray(ridx)
            sel_hi = _gather_regroup(nhi, ridx)
            sel_lo = _gather_regroup(nlo, ridx)
            sel_exc = _gather_regroup(exc, ridx)
            blo = _expand(base_lo[sel], n_sel_pad)
            bhi = _expand(base_hi[sel], n_sel_pad)
            filo = _expand(fill_lo_all[sel], n_sel_pad)
            fihi = _expand(fill_hi_all[sel], n_sel_pad)
            tiles = kfalp.ffor_planes_patch_f64(
                sel_hi, sel_lo, sel_exc, filo, fihi, blo, bhi, bw=bw)
            words = layout.tile_to_ref(np.asarray(tiles), bw, 64,
                                       len(sel))
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

    # ------- ALP_RD rowgroups: device split/lookup + pack ---------------
    # (rd.hpp:109-147 on the tile planes; rowgroups bucketed by right bit
    # width so the split shift is static; right parts FFOR-packed by the
    # same Pallas planes packer as ALP at base 0, left indexes packed by
    # the jit u16 FFOR; only exception lefts + masks cross to the host)
    left_packed = [np.empty(0, np.uint16)] * n_vec
    if rd_vec.size:
        from .ops import fastlanes as jfl
        empty_u16 = np.empty(0, np.uint16)
        for v in rd_vec:
            exc_values[v] = empty_u16       # RD exc values are u16 lefts
        rd_rg_of = rd_vec // C.N_VECTORS_PER_ROWGROUP
        rbw_v = np.array([rd_states[int(r)].right_bit_width
                          for r in rd_rg_of], np.int32)
        lbw_v = np.array([rd_states[int(r)].left_bit_width
                          for r in rd_rg_of], np.int32)
        for rbw in np.unique(rbw_v):
            bsel = np.nonzero(rbw_v == rbw)[0]
            sel = rd_vec[bsel]
            n_sel_pad = layout.pad_vectors(len(sel), 64)
            ridx = np.zeros(n_sel_pad, np.int64)
            ridx[:len(sel)] = sel
            dict8 = np.zeros((n_sel_pad, C.MAX_RD_DICTIONARY_SIZE),
                             np.uint16)
            dsz = np.zeros(n_sel_pad, np.int32)
            for j, v in enumerate(sel):
                stt = rd_states[int(v // C.N_VECTORS_PER_ROWGROUP)]
                dict8[j, :stt.actual_dictionary_size] = stt.left_parts_dict
                dsz[j] = stt.actual_dictionary_size
            thi, tlo, lidx, excm_d, lraw_d = _rd_encode_planes_f64(
                vhi, vlo, jnp.asarray(ridx), jnp.asarray(dict8),
                jnp.asarray(dsz), rbw=int(rbw))
            zb = _expand(np.zeros(len(sel), np.uint32), n_sel_pad)
            tiles = kfalp.ffor_planes_f64(thi, tlo, zb, zb, bw=int(rbw))
            words = layout.tile_to_ref(np.asarray(tiles), int(rbw), 64,
                                       len(sel))
            for r, v in enumerate(sel):
                packed[v] = words[r]
            for lbw in np.unique(lbw_v[bsel]):
                s2 = np.nonzero(lbw_v[bsel] == lbw)[0]
                pk_l = np.asarray(jfl.ffor_pack(
                    lidx[jnp.asarray(s2)],
                    jnp.zeros(len(s2), jnp.uint16), bw=int(lbw)),
                    np.uint16)
                for r, j in enumerate(s2):
                    left_packed[sel[j]] = pk_l[r]
            excm = np.asarray(excm_d)[:len(sel)]
            has_exc = np.nonzero(excm.any(axis=1))[0]
            lraw = (np.asarray(lraw_d[jnp.asarray(has_exc)])
                    if has_exc.size else None)
            for r2, r in enumerate(has_exc):
                v = sel[r]
                pos = np.nonzero(excm[r])[0].astype(np.uint16)
                exc_positions[v] = pos
                exc_values[v] = lraw[r2][pos]
                n_exc_np[v] = len(pos)

    rd_dict = np.zeros((n_rg, C.MAX_RD_DICTIONARY_SIZE), np.uint16)
    rd_dict_size = np.zeros(n_rg, np.uint8)
    rd_left_bw = np.zeros(n_rg, np.uint8)
    rd_right_bw = np.zeros(n_rg, np.uint8)
    for rg, stt in rd_states.items():
        rd_dict[rg, :stt.actual_dictionary_size] = stt.left_parts_dict
        rd_dict_size[rg] = stt.actual_dictionary_size
        rd_left_bw[rg] = stt.left_bit_width
        rd_right_bw[rg] = stt.right_bit_width

    col = ct.CompressedColumn(
        dtype=np.dtype(np.float64), n_values=n_values, n_vectors=n_vec,
        rg_scheme=rg_scheme,
        rd_dict=rd_dict, rd_dict_size=rd_dict_size,
        rd_left_bw=rd_left_bw, rd_right_bw=rd_right_bw,
        fac=fac_v.astype(np.uint8), exp=exp_v.astype(np.uint8),
        bit_width=bw_all, base=base_all,
        exc_count=n_exc_np, packed=packed,
        left_packed=left_packed,
        exc_values=exc_values, exc_positions=exc_positions,
        enc_max=enc_max)

    if rare_vecs.size:
        # subnormal inputs outside the device envelope: re-encode those
        # vectors host-side with the already-chosen (e, f) (the choice
        # ran on exact host f64); bit-identical fallback
        bad = rare_vecs
        rows = fetch((bad[:, None] * C.VECTOR_SIZE
                      + np.arange(C.VECTOR_SIZE)[None, :]).ravel()
                     ).reshape(len(bad), C.VECTOR_SIZE)
        _host_fixup(col, dict(zip(bad, rows)), bad, fac_v, exp_v, tc)
    return col


def make_device_compress_step(n_vec: int, k_max: int = 5):
    """loop_bench step for the FULL device-side
    compression pipeline — first-level rowgroup planning (top-k vote),
    second-level (e, f) choice, exact encode+verify, exception patching,
    FFOR analysis — as ONE jittable program over device-resident value
    planes.  ``n_vec`` must be whole rowgroups (the bench shape).

    Returns the step callable for ``loop_bench(step, (vhi, vlo), n)``.
    The companion :func:`make_pack_step` times the
    bucketed FFOR pack; their slope times sum to the device e2e
    compression cost (the reference's encode benches are the same
    steady-state shape, benchmarks/benchmark.cpp:41-148).
    """
    from .ops import alp as oalp
    from .oracle import core as ocore

    assert n_vec % C.N_VECTORS_PER_ROWGROUP == 0
    assert n_vec % 8 == 0
    from .kernels import score as kscore
    tc = constants_for(np.float64)
    n_rg = n_vec // C.N_VECTORS_PER_ROWGROUP
    pos = ocore.first_level_sample(
        np.arange(C.ROWGROUP_SIZE, dtype=np.float64), 0).astype(np.int32)
    svec = np.unique(pos // C.VECTOR_SIZE)
    vec_ids_first = jnp.asarray(
        np.arange(n_rg, dtype=np.int32)[:, None]
        * C.N_VECTORS_PER_ROWGROUP + svec[None, :])
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
        shi_all = _stride_samples_u32(vhi)
        slo_all = _stride_samples_u32(vlo)
        est1, ne1, _rare1 = kscore.first_level_scores_f64(
            shi_all[vec_ids_first], slo_all[vec_ids_first], tc=tc)
        combos, k_count, _ = oalp.first_level_vote(
            est1, ne1, C.SAMPLES_PER_VECTOR, tc)
        combos = jnp.repeat(combos, C.N_VECTORS_PER_ROWGROUP, axis=0,
                            total_repeat_length=n_vec)
        k_count = jnp.repeat(k_count, C.N_VECTORS_PER_ROWGROUP,
                             total_repeat_length=n_vec)
        if k_max > 1:
            est2, _rare2 = kscore.second_level_scores_f64(
                shi_all[:n_vec], slo_all[:n_vec], combos, k_count, tc=tc)
            fac, exp = oalp.accept_scan(est2, combos, k_count)
        else:
            # single-candidate rowgroups skip the scorer (exact: the
            # reference skips find_best_* for k == 1, encoder.hpp:404)
            fac, exp = combos[:, 0, 1], combos[:, 0, 0]
        meta = []
        for name, idx in (("c1", exp), ("c2", fac), ("fact", fac),
                          ("frac", exp)):
            lo, hi = tabs[name]
            meta += [expand(lo[idx]), expand(hi[idx])]
        nhi, nlo, exc, stats = kencode.alp_encode_f64_tiles_stats(
            vhi, vlo, *meta)
        bw, base, umax, n_exc, rare, fill_lo, fill_hi = \
            finalize_encode_stats(stats, nhi, nlo)
        acc = (nhi[0, 0, 0] ^ nlo[0, 0, 0] ^ exc[0, 0, 0]
               ^ bw.sum().astype(jnp.uint32)
               ^ n_exc.sum().astype(jnp.uint32)
               ^ fill_lo[0] ^ fill_hi[0]
               ^ umax[0].astype(jnp.uint32)
               ^ base[0].astype(jnp.uint32) ^ fac[0].astype(jnp.uint32))
        return carry ^ acc

    return step


def make_pack_step(col, fill_lo_all, fill_hi_all):
    """loop_bench step for the bucketed FFOR pack stage: the raw encode
    planes + exception mask of ``col`` packed per bit width with the
    column's real bucket structure and patching fused into the pack
    (static gathers, as in compress_device)."""
    n_vec = col.n_vectors
    bw_all = col.bit_width[:n_vec]
    base_all = col.base[:n_vec].astype(np.int64)
    base_lo = (base_all.view(np.uint64) & np.uint64(0xFFFFFFFF)).astype(
        np.uint32)
    base_hi = (base_all.view(np.uint64) >> np.uint64(32)).astype(np.uint32)
    bws = [int(b) for b in np.unique(bw_all) if b]
    if len(bws) <= 4:
        # Few buckets (the common case): pack the FULL planes once per
        # bucket bit width and let the consumer slice each bucket's
        # rows.  The encode planes never move: the per-bucket gather
        # costs a full HBM round trip of the planes (measured ~122 GB/s
        # alone vs ~286 GB/s for the ffor kernel itself), so for B <= 4
        # recomputing the pack over all rows beats gathering — every
        # bucket's own rows come out bit-identical either way.  The
        # fill/base metadata stays per-vector in COLUMN order here.
        n_pad = layout.pad_vectors(n_vec, 64)
        blo = _expand(base_lo, n_pad)
        bhi = _expand(base_hi, n_pad)
        filo = _expand(fill_lo_all[:n_vec], n_pad)
        fihi = _expand(fill_hi_all[:n_vec], n_pad)

        def step(carry, nhi, nlo, exc):
            nlo = nlo ^ carry
            acc = carry
            for bw in bws:
                tiles = kfalp.ffor_planes_patch_f64(
                    nhi, nlo, exc, filo, fihi, blo, bhi, bw=bw)
                acc = acc ^ tiles[0, 0, 0]
            return acc

        return step

    buckets = []
    for bw in bws:
        sel = np.nonzero(bw_all == bw)[0]
        n_sel_pad = layout.pad_vectors(len(sel), 64)
        ridx = np.zeros(n_sel_pad, np.int64)
        ridx[:len(sel)] = sel
        buckets.append((int(bw), jnp.asarray(ridx),
                        _expand(base_lo[sel], n_sel_pad),
                        _expand(base_hi[sel], n_sel_pad),
                        _expand(fill_lo_all[sel], n_sel_pad),
                        _expand(fill_hi_all[sel], n_sel_pad)))

    def step(carry, nhi, nlo, exc):
        nlo = nlo ^ carry
        acc = carry
        for bw, ridx, blo, bhi, filo, fihi in buckets:
            sel_hi = _gather_regroup(nhi, ridx)
            sel_lo = _gather_regroup(nlo, ridx)
            sel_exc = _gather_regroup(exc, ridx)
            tiles = kfalp.ffor_planes_patch_f64(
                sel_hi, sel_lo, sel_exc, filo, fihi, blo, bhi, bw=bw)
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

def _stride_samples_f32(plane):
    """The 32-value sample stride of EVERY f32 vector as a strided slice
    of the tile planes (position j*32 of vector v lives at slot j, lane
    (v%4)*32): [G, 32, 128] -> [G*4, 32] u32 (the f32 twin of
    :func:`_stride_samples_u32`)."""
    s = plane[:, :, 0::32]                         # [G, 32, 4]
    return s.transpose(0, 2, 1).reshape(-1, 32)


@jax.jit
def _first_level_device_f32(vtiles, vec_ids):
    """f32 device rowgroup planning: strided sample slice + native-f32
    Pallas scorer + the shared oracle-identical top-k vote.  Returns
    (combos [R, 5, 2], k_count [R], is_rd [R], rare [R])."""
    from .kernels import score as kscore
    from .ops import alp as oalp
    tc = constants_for(np.float32)
    sb = _stride_samples_f32(vtiles)[vec_ids]      # [R, V, 32]
    est, ne, rare = kscore.first_level_scores_f32(sb, tc=tc)
    combos, kc, isrd = oalp.first_level_vote(est, ne,
                                             C.SAMPLES_PER_VECTOR, tc)
    return combos, kc, isrd, rare


@functools.partial(jax.jit, static_argnames=("n_vec",))
def _second_level_device_f32(vtiles, combos, k_count, *, n_vec: int):
    """f32 device second-level (e, f) choice on every vector's 32-value
    stride (native-f32 scorer + the exact accept/early-exit scan)."""
    from .kernels import score as kscore
    from .ops import alp as oalp
    tc = constants_for(np.float32)
    sb = _stride_samples_f32(vtiles)[:n_vec]
    est, rare = kscore.second_level_scores_f32(sb, combos, k_count,
                                               tc=tc)
    fac, exp = oalp.accept_scan(est, combos, k_count)
    return fac, exp, rare


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


@jax.jit
def finalize_encode_stats32(stats, n_p):
    """Per-vector analyze + patch quantities from the fused f32 encode
    statistics (kernels.encode._encode_f32_stats_kernel layout):
    returns (bit_width [n] i32, base [n] i32, enc_max [n] u32 delta,
    n_exc [n] i32, fill [n] u32) with n = G*4 vectors in group-major
    order.  fill is the vector's first non-exception encoded int in
    VALUE order (all-exception vectors use 0 / bw 0 / base 0, matching
    the host path)."""
    from .ops.alp import bit_width_of
    G = stats.shape[0]
    s = stats.reshape(G, 8, 4, 32)         # [G, stat, vec, lane]
    n_exc = s[:, 0].sum(-1).reshape(-1).astype(jnp.int32)
    first_k = s[:, 1].min(-1).reshape(-1)
    mx = s[:, 2].max(-1).reshape(-1)
    mn = s[:, 3].min(-1).reshape(-1)
    any_ok = first_k < 2047
    mx = jnp.where(any_ok, mx, 0)
    mn = jnp.where(any_ok, mn, 0)
    umax = mx.astype(jnp.uint32) - mn.astype(jnp.uint32)
    bw = bit_width_of(umax).astype(jnp.int32)
    k = jnp.where(any_ok, first_k, 0)
    vec = jnp.arange(G * 4, dtype=jnp.int32)
    g = vec // 4
    slot = k // 32
    lane = (vec % 4) * 32 + k % 32
    fill = jnp.where(any_ok, n_p[g, slot, lane], jnp.uint32(0))
    return bw, mn, umax, n_exc, fill


@jax.jit
def patch_planes32(n_p, exc_p, fill):
    """Elementwise exception patch on f32 tile planes (no transpose
    roundtrip): exception slots read the per-vector fill value."""
    G = n_p.shape[0]
    fillp = jnp.repeat(fill.reshape(G, 4), 32, axis=1,
                       total_repeat_length=128)
    return jnp.where(exc_p == 0, n_p, fillp[:, None, :])


def _compress_device_f32(data: np.ndarray):
    """float32 device compress: planning (native-f32 Pallas scorer +
    shared top-k vote / accept scan) and encode/patch/analyze/pack all
    as device kernels; bit-identical to the host path (same structure
    as the f64 pipeline, minus the softfloat machinery — subnormal
    SAMPLES re-plan host-side, but the encode kernel itself has no
    envelope)."""
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

    # FULL rowgroups plan entirely ON DEVICE (native-f32 scorer + shared
    # top-k vote, mirror of the f64 path); the tail rowgroup and any
    # rowgroup whose sample contains subnormals take the host oracle.
    n_full = n_vec // C.N_VECTORS_PER_ROWGROUP
    host_rgs = list(range(n_full, n_rg))
    if n_full:
        pos = ocore.first_level_sample(
            np.arange(C.ROWGROUP_SIZE, dtype=np.float64), 0).astype(
                np.int32)
        svec = np.unique(pos // C.VECTOR_SIZE)
        vec_ids = (np.arange(n_full, dtype=np.int32)[:, None]
                   * C.N_VECTORS_PER_ROWGROUP + svec[None, :])
        cmb, kc, isrd, rare_rg = _first_level_device_f32(
            vtiles, jnp.asarray(vec_ids))
        cmb, kc, isrd, rare_rg = (np.asarray(x)
                                  for x in (cmb, kc, isrd, rare_rg))
        for rg in range(n_full):
            if rare_rg[rg]:
                host_rgs.append(rg)
                continue
            lo_v = rg * C.N_VECTORS_PER_ROWGROUP
            hi_v = lo_v + C.N_VECTORS_PER_ROWGROUP
            if isrd[rg]:
                rg_scheme[rg] = C.SCHEME_ALP_RD
            else:
                rg_scheme[rg] = C.SCHEME_ALP
                combos[lo_v:hi_v] = cmb[rg]
                k_count[lo_v:hi_v] = kc[rg]
    for rg in host_rgs:
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
    # RD rowgroups: dictionaries from the host flat copy (f32 path takes
    # numpy input); per-vector split/lookup/pack on device below
    from .oracle import rd as ord_
    rd_states = {}
    for rg in np.nonzero(rg_scheme == C.SCHEME_ALP_RD)[0]:
        lo_v = rg * C.N_VECTORS_PER_ROWGROUP
        hi_v = min(n_vec, lo_v + C.N_VECTORS_PER_ROWGROUP)
        rd_states[int(rg)] = ord_.rd_encoder_init(
            flat[lo_v * C.VECTOR_SIZE: hi_v * C.VECTOR_SIZE], 0, tc)
    vec_rg_all = np.arange(n_vec) // C.N_VECTORS_PER_ROWGROUP
    is_rd_vec = rg_scheme[vec_rg_all] == C.SCHEME_ALP_RD
    rd_vec = np.nonzero(is_rd_vec)[0]

    # second-level (e, f) choice on the 32-sample stride, ON DEVICE;
    # single-candidate vectors skip the scorer (k == 1, encoder.hpp:404)
    # and vectors whose stride contains subnormals re-choose exactly
    # host-side
    fac_v = combos[:, 0, 1].astype(np.int32).copy()
    exp_v = combos[:, 0, 0].astype(np.int32).copy()
    multi = np.nonzero(k_count > 1)[0]
    rare_vec = np.empty(0, np.int64)
    if multi.size:
        fac_d, exp_d, rare_d = _second_level_device_f32(
            vtiles, jnp.asarray(combos), jnp.asarray(k_count),
            n_vec=n_vec)
        fac_m, exp_m = np.asarray(fac_d), np.asarray(exp_d)
        fac_v[multi] = fac_m[multi]
        exp_v[multi] = exp_m[multi]
        rare_vec = np.intersect1d(np.nonzero(np.asarray(rare_d))[0],
                                  multi)
    if rare_vec.size:
        from .ops import alp as oalp
        from .ops.numerics import numerics_for
        nm = numerics_for(np.float32)
        with jax.default_device(jax.devices("cpu")[0]):
            fac_h, exp_h = (np.asarray(x)
                            for x in oalp.choose_factor_exponent(
                nm, nm.values_from_np(vectors[rare_vec]),
                combos[rare_vec], k_count[rare_vec]))
        fac_v[rare_vec] = fac_h
        exp_v[rare_vec] = exp_h

    def expand32(x):
        full = np.zeros(n_pad_v, np.uint32)
        full[:n_vec] = x
        return jnp.asarray(layout.lane_expand(full, 32))

    n_p, exc_p, stats = kencode.alp_encode_f32_tiles_stats(
        vtiles,
        expand32(tc.exp_arr[exp_v].view(np.uint32)),
        expand32(tc.frac_arr[fac_v].view(np.uint32)),
        expand32(tc.fact_arr[fac_v].astype(np.int32).view(np.uint32)),
        expand32(tc.frac_arr[exp_v].view(np.uint32)))
    bw_d, base_d, umax_d, n_exc, fill_d = finalize_encode_stats32(
        stats, n_p)
    n_p = patch_planes32(n_p, exc_p, fill_d)
    bw_all = np.asarray(bw_d)[:n_vec].astype(np.uint8)
    base_all = np.asarray(base_d)[:n_vec].astype(np.int32)
    enc_max = np.asarray(umax_d)[:n_vec].astype(np.uint64)
    n_exc_np = np.asarray(n_exc)[:n_vec].astype(np.uint16)
    if rd_vec.size:
        # RD vectors carry no ALP metadata (host-path convention)
        bw_all[rd_vec] = 0
        base_all[rd_vec] = 0
        enc_max[rd_vec] = 0
        n_exc_np[rd_vec] = 0

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

    # ------- ALP_RD rowgroups: device split/lookup + pack ---------------
    left_packed = [np.empty(0, np.uint16)] * n_vec
    if rd_vec.size:
        from .ops import fastlanes as jfl
        empty_u16 = np.empty(0, np.uint16)
        for v in rd_vec:
            exc_values[v] = empty_u16
        rd_rg_of = rd_vec // C.N_VECTORS_PER_ROWGROUP
        rbw_v = np.array([rd_states[int(r)].right_bit_width
                          for r in rd_rg_of], np.int32)
        lbw_v = np.array([rd_states[int(r)].left_bit_width
                          for r in rd_rg_of], np.int32)
        for rbw in np.unique(rbw_v):
            bsel = np.nonzero(rbw_v == rbw)[0]
            sel = rd_vec[bsel]
            n_sel_pad = layout.pad_vectors(len(sel), 32)
            ridx = np.zeros(n_sel_pad, np.int64)
            ridx[:len(sel)] = sel
            dict8 = np.zeros((n_sel_pad, C.MAX_RD_DICTIONARY_SIZE),
                             np.uint16)
            dsz = np.zeros(n_sel_pad, np.int32)
            for j, v in enumerate(sel):
                stt = rd_states[int(v // C.N_VECTORS_PER_ROWGROUP)]
                dict8[j, :stt.actual_dictionary_size] = stt.left_parts_dict
                dsz[j] = stt.actual_dictionary_size
            rt, lidx, excm_d, lraw_d = _rd_encode_planes_f32(
                vtiles, jnp.asarray(ridx), jnp.asarray(dict8),
                jnp.asarray(dsz), rbw=int(rbw))
            zb = jnp.asarray(layout.lane_expand(
                np.zeros(n_sel_pad, np.uint32), 32))
            tiles = kfalp.ffor_tile(rt, zb, zb, bw=int(rbw),
                                    element_bits=32)
            words = layout.tile_to_ref(np.asarray(tiles), int(rbw), 32,
                                       len(sel))
            for r, v in enumerate(sel):
                packed[v] = words[r]
            for lbw in np.unique(lbw_v[bsel]):
                s2 = np.nonzero(lbw_v[bsel] == lbw)[0]
                pk_l = np.asarray(jfl.ffor_pack(
                    lidx[jnp.asarray(s2)],
                    jnp.zeros(len(s2), jnp.uint16), bw=int(lbw)),
                    np.uint16)
                for r, j in enumerate(s2):
                    left_packed[sel[j]] = pk_l[r]
            excm = np.asarray(excm_d)[:len(sel)]
            has_exc = np.nonzero(excm.any(axis=1))[0]
            lraw = (np.asarray(lraw_d[jnp.asarray(has_exc)])
                    if has_exc.size else None)
            for r2, r in enumerate(has_exc):
                v = sel[r]
                pos = np.nonzero(excm[r])[0].astype(np.uint16)
                exc_positions[v] = pos
                exc_values[v] = lraw[r2][pos]
                n_exc_np[v] = len(pos)

    rd_dict = np.zeros((n_rg, C.MAX_RD_DICTIONARY_SIZE), np.uint16)
    rd_dict_size = np.zeros(n_rg, np.uint8)
    rd_left_bw = np.zeros(n_rg, np.uint8)
    rd_right_bw = np.zeros(n_rg, np.uint8)
    for rg, stt in rd_states.items():
        rd_dict[rg, :stt.actual_dictionary_size] = stt.left_parts_dict
        rd_dict_size[rg] = stt.actual_dictionary_size
        rd_left_bw[rg] = stt.left_bit_width
        rd_right_bw[rg] = stt.right_bit_width

    return ct.CompressedColumn(
        dtype=np.dtype(np.float32), n_values=n_values, n_vectors=n_vec,
        rg_scheme=rg_scheme,
        rd_dict=rd_dict, rd_dict_size=rd_dict_size,
        rd_left_bw=rd_left_bw, rd_right_bw=rd_right_bw,
        fac=fac_v.astype(np.uint8), exp=exp_v.astype(np.uint8),
        bit_width=bw_all, base=base_all,
        exc_count=n_exc_np, packed=packed,
        left_packed=left_packed,
        exc_values=exc_values, exc_positions=exc_positions,
        enc_max=enc_max)
