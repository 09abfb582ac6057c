"""Container-level multi-chip compress/decompress over a device mesh.

SURVEY.md §7 stage 7: rowgroup/vector data parallelism via shard_map —
per-rowgroup planning metadata ((e, f) candidates) is computed on host
from samples and *broadcast* (replicated) to every device; the bulk
per-vector work (second-level choice, encode+verify, FFOR analysis,
bit-packing / fused decode) runs sharded over the ``rg`` mesh axis; the
compressed payloads are *gathered host-side in original vector order*.
The reference's analog is TBB thread parallelism over whole-vector
primitive calls (bench_end_to_end config.hpp:26,80) — here the unit is
the same (vectors are independent once planned) but the workers are
chips and the broadcast/gather ride ICI/PCIe instead of shared memory.

Output is bit-identical to the single-host :func:`container.compress` /
:func:`container.decompress` (the multichip dryrun asserts blob
equality), so a mesh is purely a throughput knob.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import constants as C
from ..constants import constants_for
from ..ops import fastlanes as jfl
from ..ops.numerics import numerics_for
from .sharded import sharded_encode_decode_step


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def compress_sharded(data: np.ndarray, mesh: Mesh):
    """Whole-column ALP compress with the per-vector stages sharded.

    Planning (sampling + top-k (e, f)) runs host-side per rowgroup and is
    replicated; encode/analyze run under shard_map over ``rg``; packing
    runs on the sharded encoded array per bit-width bucket; packed words
    are gathered to host in original vector order.  float64, ALP-scheme
    rowgroups (columns with ALP_RD rowgroups fall back to the host path —
    RD's right/left split shards the same way but is dictionary-bound,
    not encode-bound).
    """
    from .. import container as ct

    data = np.ascontiguousarray(data)
    tc = constants_for(data.dtype)
    nm = numerics_for(data.dtype)
    vectors, n_vec = ct._pad_to_vectors(data)
    n_rg = max(1, math.ceil(n_vec / C.N_VECTORS_PER_ROWGROUP))

    # --- host planning, replicated (the "broadcast": metadata is tiny) --
    flat = vectors.reshape(-1)
    rg_scheme = np.zeros(n_rg, np.uint8)
    combos = np.zeros((n_vec, C.MAX_K_COMBINATIONS, 2), np.int32)
    k_count = np.zeros(n_vec, np.int32)
    try:
        from .. import native as nat
        nat.build()
    except Exception:
        nat = None
    from ..oracle import core as ocore
    if nat is not None and data.dtype == np.float64:
        schemes, combos_rg, k_rg = nat.init_f64_multi(flat, n_rg)
        for rg in range(n_rg):
            lo_v = rg * C.N_VECTORS_PER_ROWGROUP
            hi_v = min(n_vec, lo_v + C.N_VECTORS_PER_ROWGROUP)
            if schemes[rg] == C.SCHEME_ALP_RD:
                rg_scheme[rg] = C.SCHEME_ALP_RD
            else:
                rg_scheme[rg] = C.SCHEME_ALP
                ks = max(int(k_rg[rg]), 1)
                combos[lo_v:hi_v, :ks] = combos_rg[rg, :ks][None, :, :]
                k_count[lo_v:hi_v] = ks
    else:
        for rg in range(n_rg):
            lo_v = rg * C.N_VECTORS_PER_ROWGROUP
            hi_v = min(n_vec, lo_v + C.N_VECTORS_PER_ROWGROUP)
            rg_data = flat[lo_v * C.VECTOR_SIZE: hi_v * C.VECTOR_SIZE]
            stt = ocore.encoder_init(rg_data, 0, tc)
            if stt.scheme == C.SCHEME_ALP_RD:
                rg_scheme[rg] = C.SCHEME_ALP_RD
            else:
                rg_scheme[rg] = C.SCHEME_ALP
                ks = len(stt.best_k_combinations)
                cb = np.array(stt.best_k_combinations or [(0, 0)], np.int32)
                combos[lo_v:hi_v, :ks] = cb[None, :ks, :]
                k_count[lo_v:hi_v] = ks

    if (rg_scheme == C.SCHEME_ALP_RD).any():
        return ct.compress(data)

    # --- sharded per-vector encode + analysis (shard_map over rg) -------
    n_dev = mesh.devices.size
    n_pad = _pad_to(n_vec, n_dev)
    vals = np.zeros((n_pad, C.VECTOR_SIZE), data.dtype)
    vals[:n_vec] = vectors
    cb_pad = np.zeros((n_pad, C.MAX_K_COMBINATIONS, 2), np.int32)
    cb_pad[:n_vec] = combos
    kc_pad = np.ones(n_pad, np.int32)
    kc_pad[:n_vec] = k_count

    step = sharded_encode_decode_step(mesh, data.dtype)
    out = step(nm.values_from_np(vals), jnp.asarray(cb_pad),
               jnp.asarray(kc_pad))
    # ordered host gather of the sharded per-vector results
    fac = np.asarray(out["fac"])[:n_vec].astype(np.uint8)
    exp = np.asarray(out["exp"])[:n_vec].astype(np.uint8)
    bws = np.asarray(out["bit_width"])[:n_vec]
    bases = np.asarray(out["base"])[:n_vec].astype(tc.st)
    exc_mask = np.asarray(out["exc_mask"])[:n_vec]
    encoded_sh = out["encoded"]           # stays device-sharded for pack

    # --- sharded FFOR pack per bit-width bucket -------------------------
    sh = NamedSharding(mesh, P("rg"))
    packed = [None] * n_vec
    for bw in np.unique(bws):
        sel = np.nonzero(bws == bw)[0]
        nb_pad = _pad_to(len(sel), n_dev)
        sel_pad = np.zeros(nb_pad, np.int64)
        sel_pad[:len(sel)] = sel
        # gather bucket rows from the sharded array, reshard evenly, pack
        rows = jnp.take(encoded_sh, jnp.asarray(sel_pad), axis=0)
        rows = jax.device_put(rows, sh)
        b = jax.device_put(jnp.asarray(np.concatenate(
            [bases[sel], np.zeros(nb_pad - len(sel), tc.st)])), sh)
        pk = np.asarray(jax.jit(
            lambda r, bb, bw=int(bw): jfl.ffor_pack(r, bb, bw=bw))(rows, b),
            tc.ut)
        for r, v in enumerate(sel):
            packed[v] = pk[r]

    exc_positions = []
    exc_values = []
    exc_count = np.zeros(n_vec, np.uint16)
    for v in range(n_vec):
        pos = np.nonzero(exc_mask[v])[0].astype(np.uint16)
        exc_positions.append(pos)
        exc_values.append(vectors[v][pos])
        exc_count[v] = len(pos)

    return ct.CompressedColumn(
        dtype=np.dtype(data.dtype), n_values=len(data), n_vectors=n_vec,
        rg_scheme=rg_scheme,
        rd_dict=np.zeros((n_rg, C.MAX_RD_DICTIONARY_SIZE), np.uint16),
        rd_dict_size=np.zeros(n_rg, np.uint8),
        rd_left_bw=np.zeros(n_rg, np.uint8),
        rd_right_bw=np.zeros(n_rg, np.uint8),
        fac=fac, exp=exp, bit_width=bws.astype(np.uint8), base=bases,
        exc_count=exc_count, packed=packed,
        left_packed=[np.empty(0, np.uint16)] * n_vec,
        exc_values=exc_values, exc_positions=exc_positions)


def decompress_sharded(col, mesh: Mesh) -> np.ndarray:
    """Full fused decode with every bucket's tile groups sharded over the
    mesh (SPMD Pallas launches, no data-path collectives), exceptions
    patched on the gathered planes; bit-exact vs container.decompress."""
    from ..kernels import decode as kdecode
    from ..kernels import layout
    from jax.experimental.shard_map import shard_map

    tc = constants_for(col.dtype)
    if col.dtype != np.float64:
        from .. import container as ct
        return ct.decompress(col)
    plan = kdecode.build_plan(col)
    n_dev = mesh.devices.size
    result = np.zeros((col.n_vectors, C.VECTOR_SIZE), col.dtype)

    for g in plan.groups:
        G = g.tiles.shape[0]
        Gp = _pad_to(G, n_dev)
        pad = Gp - G

        def padded(a):
            if pad:
                a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            return jax.device_put(a, NamedSharding(mesh, P("rg")))

        args = tuple(padded(a) for a in kdecode.group_arrays(g))
        local = kdecode.group_decode(g, np.float64)
        nargs = len(args)
        fn = jax.jit(shard_map(
            local, mesh=mesh, in_specs=(P("rg"),) * nargs,
            out_specs=(P("rg"), P("rg")), check_rep=False))
        hi, lo = fn(*args)
        # ordered host gather of the decoded planes
        hi_np = np.asarray(hi)[:G]
        lo_np = np.asarray(lo)[:G]
        t = np.empty((G, 128, 128), np.uint32)
        t[:, 0::2, :] = lo_np
        t[:, 1::2, :] = hi_np
        vals = layout.tile_to_values(t, 64, np.float64,
                                     layout.pad_vectors(g.n_vectors, 64))
        vals = vals[:g.n_vectors]
        # exception patch on host rows (decoder.hpp:141-149)
        for r, v in enumerate(g.vec_indices):
            row = vals[r]
            pos = col.exc_positions[v]
            if len(pos) and g.scheme != C.SCHEME_ALP_RD:
                row[pos] = col.exc_values[v]
            elif len(pos):
                rbw = int(col.rd_right_bw[v // C.N_VECTORS_PER_ROWGROUP])
                bits = row.view(np.uint64)
                right = bits[pos] & np.uint64((1 << rbw) - 1)
                bits[pos] = (col.exc_values[v].astype(np.uint64)
                             << np.uint64(rbw)) | right
            result[v] = row
    return result.reshape(-1)[:col.n_values]
