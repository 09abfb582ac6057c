"""Device decode plans: fused falp decode of whole compressed columns.

The reference dispatches per-vector to one of 65/33 bit-width-specialised
falp kernels inside its scan loop (reference src/falp.cpp dispatch;
publication/.../queries/q1.cpp:64-88).  The TPU equivalent hoists that
dispatch out of the hot path: vectors are *bucketed by bit width* once at
plan-build time (host), each bucket is staged as 128-lane tiles in device
memory, and decode runs one Pallas kernel launch per distinct bit width —
typically 1-3 per column.

``build_plan`` -> ``run_plan`` is the speed-of-light path bench.py times;
``decompress_device`` adds value reassembly + exception patching for a
full bit-exact column decode on device.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..constants import constants_for
from . import layout
from . import falp as kfalp


def _u64_planes(arr_u64: np.ndarray):
    lo = (arr_u64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (arr_u64 >> np.uint64(32)).astype(np.uint32)
    return lo, hi


@dataclasses.dataclass
class _Group:
    bw: int
    n_vectors: int                 # before group padding
    vec_indices: np.ndarray        # original vector ids [n_vectors]
    tiles: jax.Array               # [G, limbs, 128] u32
    meta: tuple                    # lane-expanded metadata planes (device)
    scheme: int = C.SCHEME_ALP     # ALP (falp) or ALP_RD (right+left glue)
    variant: str = "gen"           # f64 falp kernel: "gen"/"mid"/"small"
    flags: int = 0                 # statics: mid 1 c0zero/2 nonneg/4 cheap_msb/
                                   # 8 nozero/16 alo_zero(<2^16); wide 2 nonneg/
                                   # 8 nozero/32 allneg/64 maghi/128 alo_zero(<2^48)
    # exception scatter indices into the output planes (device arrays);
    # empty for RD groups (exceptions folded into the left parts)
    exc_g: jax.Array | None = None
    exc_slot: jax.Array | None = None
    exc_lane: jax.Array | None = None
    exc_hi: jax.Array | None = None   # value bits (hi/lo for f64; lo=f32)
    exc_lo: jax.Array | None = None


@dataclasses.dataclass
class DecodePlan:
    dtype: np.dtype
    n_vectors: int
    groups: list
    decoded_bytes: int             # per run_plan() call

    def run(self, patch: bool = False):
        """Launch the fused decode kernel per bucket; returns the raw
        tile-order output planes (device arrays, unblocked).

        ``patch=True`` additionally scatters the exception values into
        the planes (decoder::patch_exceptions, decoder.hpp:141-149) —
        the full bit-exact decode, still entirely on device.
        """
        outs = []
        for g in self.groups:
            out = group_decode(g, self.dtype)(*group_arrays(g))
            if patch and g.exc_g is not None and g.exc_g.shape[0]:
                idx = (g.exc_g, g.exc_slot, g.exc_lane)
                if self.dtype == np.float64:
                    out = (out[0].at[idx].set(g.exc_hi),
                           out[1].at[idx].set(g.exc_lo))
                else:
                    out = out.at[idx].set(g.exc_lo)
            outs.append(out)
        return outs


def group_arrays(g) -> tuple:
    """Canonical device-array argument tuple for a group's decode kernel
    (tiles first when the variant consumes packed tiles, then the array
    metadata planes).  Single source of truth for DecodePlan.run, the
    mesh decode path, and the benches."""
    if g.scheme == C.SCHEME_ALP_RD:
        return (g.tiles, g.meta[0]) + tuple(g.meta[2:10])
    if g.variant == "const":
        return tuple(g.meta)
    return (g.tiles,) + tuple(g.meta)


def _msb64(x: np.ndarray) -> np.ndarray:
    """floor(log2(x)) for positive int64/uint64 arrays, exact."""
    v = x.astype(np.uint64).copy()
    e = np.zeros(v.shape, np.int64)
    for sh in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(sh))
        e[m] += sh
        v[m] >>= np.uint64(sh)
    return e


def group_decode(g, dtype):
    """Kernel dispatch for a group: returns a callable over
    ``group_arrays(g)`` producing (hi, lo) planes for f64 / one plane
    for f32.  Closes over only static configuration (safe to use inside
    jit/shard_map).  Mirrors the reference's per-bit-width kernel
    dispatch switch (src/falp.cpp), hoisted out of the hot path."""
    bw, fl, variant = g.bw, g.flags, g.variant
    if g.scheme == C.SCHEME_ALP_RD:
        lbw = g.meta[1]
        if np.dtype(dtype) == np.float64:
            return lambda t, l, *d: kfalp.rd_decode_dict_f64(
                t, l, d, rbw=bw, lbw=lbw)
        return lambda t, l, *d: kfalp.rd_decode_dict_f32(
            t, l, d, rbw=bw, lbw=lbw)
    if variant == "const":
        return kfalp.falp_decode_f64_const
    if variant == "small":
        return lambda t, b, fa, fsh, fsl, fb: kfalp.falp_decode_f64_small(
            t, b, fa, fsh, fsl, fb, bw=bw)
    ks = (fl >> 9) & 0x7F
    kst = ks - 1 if ks else None
    if variant == "mid":
        return lambda t, b, c2, c1, c0, fb2: kfalp.falp_decode_f64_mid(
            t, b, c2, c1, c0, fb2, bw=bw, c0zero=bool(fl & 1),
            nonneg=bool(fl & 2), cheap_msb=bool(fl & 4),
            nozero=bool(fl & 8), alo_zero=bool(fl & 16), k_static=kst)
    if variant == "mid64":
        return lambda t, bl, bh, c1, c0, fb2: kfalp.falp_decode_f64_mid64(
            t, bl, bh, c1, c0, fb2, bw=bw, nonneg=bool(fl & 2),
            nozero=bool(fl & 8), allneg=bool(fl & 32), maghi=bool(fl & 64),
            alo_zero=bool(fl & 128), k_static=kst)
    if variant == "midc96":
        return (lambda t, bl, bh, c2, c1, c0, fb2:
                kfalp.falp_decode_f64_midc96(
                    t, bl, bh, c2, c1, c0, fb2, bw=bw,
                    nonneg=bool(fl & 2), nozero=bool(fl & 8),
                    allneg=bool(fl & 32), maghi=bool(fl & 64),
                    alo_zero=bool(fl & 128), k_static=kst))
    if np.dtype(dtype) == np.float64:
        return (lambda t, bl, bh, flo, fhi, frl, frh:
                kfalp.falp_decode_f64(t, bl, bh, flo, fhi, frl, frh,
                                      bw=bw, fact1=bool(fl & 16)))
    return lambda t, b, fa, fr: kfalp.falp_decode_f32(t, b, fa, fr, bw=bw)


def _stage_rd_exceptions(grp, col, sel, packed, rbw: int, eb: int):
    """Exception scatter for the dictionary-on-device RD path: full value
    bits = (raw left part << rbw) | right bits, with the right bits
    extracted from the packed words (vectorised over all exceptions)."""
    _, group, _ = layout.geometry(eb)
    rows, poss, lefts = [], [], []
    for r, v in enumerate(sel):
        pos = col.exc_positions[v]
        if len(pos):
            rows.append(np.full(len(pos), r, np.int64))
            poss.append(pos.astype(np.int64))
            lefts.append(col.exc_values[v].astype(np.uint64))
    if not rows:
        grp.exc_g = jnp.zeros(0, jnp.int32)
        return
    rows = np.concatenate(rows)
    poss = np.concatenate(poss)
    lefts = np.concatenate(lefts)
    L = 1024 // eb
    lane = poss % L
    slot = poss // L
    off = slot * rbw
    w0 = off // eb
    s0 = (off % eb).astype(np.uint64)
    words = packed.view(np.uint64) if eb == 64 else packed
    wa = words[rows, w0 * L + lane]
    right = wa >> s0
    need2 = (off % eb) + rbw > eb
    sh2 = np.where(need2, eb - (off % eb), 0).astype(np.uint64)
    wb = words[rows, np.where(need2, w0 + 1, w0) * L + lane]
    right = right | np.where(need2, wb << sh2, np.uint64(0))
    right &= np.uint64((1 << rbw) - 1)
    full = (lefts << np.uint64(rbw)) | right
    grp.exc_g = jnp.asarray((rows // group).astype(np.int32))
    grp.exc_slot = jnp.asarray(slot.astype(np.int32))
    grp.exc_lane = jnp.asarray(((rows % group) * L + lane).astype(np.int32))
    grp.exc_hi = jnp.asarray((full >> np.uint64(32)).astype(np.uint32))
    grp.exc_lo = jnp.asarray((full & np.uint64(0xFFFFFFFF)).astype(np.uint32))


def _true_max_encoded(col, vec_ids, bws, bases):
    """Actual max encoded int of specific vectors, from the packed words
    (host unFFOR of just those vectors; used to refine plan bounds)."""
    out = np.empty(len(vec_ids), np.int64)
    try:
        from .. import native as nat
        nat.build()
    except Exception:
        nat = None
    from ..oracle import fastlanes as ofl
    for bw in np.unique(bws):
        sel = np.nonzero(bws == bw)[0]
        if bw == 0:
            out[sel] = bases[sel]
            continue
        pk = np.stack([col.packed[vec_ids[i]] for i in sel])
        if nat is not None:
            u = nat.unffor(pk, int(bw), 0, np.uint64)
        else:
            u = np.stack([ofl.unffor_unpack(r, int(bw), np.uint64(0),
                                            np.uint64) for r in pk])
        out[sel] = bases[sel] + u.max(axis=1).astype(np.int64)
    return out


def _c_planes(facs, exps, frac_arr, *, top: int, fb_off: int,
              low16_zero: bool = False):
    """Per-vector limbs of the plan-time constant ``5^fac * fsig(FRAC)``
    top-aligned to bit ``top`` plus the combined biased-exponent term
    ``f_biased + fb_off + fac - shift`` — vectorised over the handful of
    unique (fac, exp) pairs (the per-vector Python bignum loop was
    O(n_vectors) in the cold plan-build path).  Returns (c2, c1, c0,
    fb2) u32 arrays; c2 is zero when ``top`` is 63."""
    pairs, inv = np.unique(np.stack([facs, exps]), axis=1,
                           return_inverse=True)
    P = pairs.shape[1]
    c2u = np.empty(P, np.uint32)
    c1u = np.empty(P, np.uint32)
    c0u = np.empty(P, np.uint32)
    fbu = np.empty(P, np.uint32)
    for k in range(P):
        frac_u = int(np.float64(frac_arr[pairs[1, k]]).view(np.uint64))
        fsig = (frac_u & ((1 << 52) - 1)) | (1 << 52)
        f_biased = (frac_u >> 52) & 0x7FF
        cc = (5 ** int(pairs[0, k])) * fsig
        s_c = top - (cc.bit_length() - 1)
        cc <<= s_c
        if low16_zero:
            assert cc & 0xFFFF == 0, "i64c96 c0 contract"
        c0u[k] = cc & 0xFFFFFFFF
        c1u[k] = (cc >> 32) & 0xFFFFFFFF
        c2u[k] = cc >> 64
        fbu[k] = f_biased + fb_off + int(pairs[0, k]) - s_c
    return c2u[inv], c1u[inv], c0u[inv], fbu[inv]


def build_plan(col) -> DecodePlan:
    """Stage an ALP-scheme compressed column (container.CompressedColumn)
    as device tiles bucketed by bit width."""
    tc = constants_for(col.dtype)
    eb = tc.exact_type_bit_size
    _, group, _ = layout.geometry(eb)
    vec_rg = np.arange(col.n_vectors) // C.N_VECTORS_PER_ROWGROUP
    alp_idx = np.nonzero(col.rg_scheme[vec_rg] == C.SCHEME_ALP)[0]
    groups = []

    # Fast-variant eligibility (f64), from the per-vector FFOR bounds.
    # With FACT = 10^fac = 2^fac * 5^fac, only the ODD part n * 5^fac
    # decides whether double(m) is exact (the 2^fac is pure exponent):
    #   small: |n * 5^fac| < 2^32  -> one 32x53 product, single rounding
    #   mid:   |n * 5^fac| < 2^53 (and n * 10^fac can't wrap int64)
    #          -> one 32x96 product against the plan-time constant
    #             5^fac * fsig(FRAC), single rounding
    # both need n itself in int32; everything else takes the generic
    # two-rounding softfloat kernel (reference src/falp.cpp semantics).
    bws_v = col.bit_width[alp_idx].astype(np.int64)
    var_v = np.full(len(alp_idx), "gen", dtype=object)
    flags_v = np.zeros(len(alp_idx), np.int32)  # bit0 c0zero, 1 nonneg,
    if col.dtype == np.float64 and alp_idx.size:  # 2 cheap_msb
        base_v = col.base[alp_idx].astype(np.int64)
        fact_v = tc.fact_arr[col.fac[alp_idx]]
        five_v = np.power(np.int64(5), col.fac[alp_idx].astype(np.int64))
        # per-(fac, exp) 96-bit constant properties, vectorised over the
        # handful of unique pairs (mid64/midc96 need the constant's bit
        # length; mid needs whether its low limb is zero)
        pairs, pair_inv = np.unique(
            np.stack([col.fac[alp_idx], col.exp[alp_idx]]), axis=1,
            return_inverse=True)
        cb = np.empty(pairs.shape[1], np.int64)
        c0z = np.empty(pairs.shape[1], bool)
        for k in range(pairs.shape[1]):
            frac_u = int(np.float64(
                tc.frac_arr[pairs[1, k]]).view(np.uint64))
            fsig = (frac_u & ((1 << 52) - 1)) | (1 << 52)
            cc = (5 ** int(pairs[0, k])) * fsig
            cb[k] = cc.bit_length()
            c0z[k] = cb[k] <= 96 and (
                (cc << (96 - int(cb[k]))) & 0xFFFFFFFF) == 0
        cbits_v = cb[pair_inv]
        c0zero_v = c0z[pair_inv]

        # max FFOR delta u (n = base + u, u >= 0): exact when the column
        # carries enc_max (format v2 acceleration metadata, written by
        # every compress path); else the conservative 2^bw - 1 bound,
        # refined for borderline vectors by unpacking them host-side.
        # bw only gives max(n) <= base + 2^bw - 1, but the true max can
        # be half that (bw covers [2^(bw-1), 2^bw)) — e.g. bitcoin
        # (bw 30, fac 10) sits right at the |n * 5^fac| < 2^53 edge.
        cons_umax = np.where(
            bws_v >= 64, np.uint64(2**64 - 1),
            (np.uint64(1) << np.minimum(bws_v, 63).astype(np.uint64))
            - np.uint64(1))
        if col.enc_max is not None:
            umax_v = col.enc_max[alp_idx]
        else:
            umax_v = cons_umax

        def eligibility(umax):
            """(mid, small, mid64, c96) masks from a max-delta bound.

            max_n/maxn are garbage-safe for bw >= 53 (the cand gates
            mask them before use)."""
            max_n = (base_v.view(np.uint64) + umax).view(np.int64)
            maxn = np.maximum(np.maximum(np.abs(base_v),
                                         np.abs(max_n)), 1)
            cand = ((bws_v <= 32) & (base_v >= -(2**31))
                    & (max_n <= 2**31 - 1))
            mid = (cand & (five_v <= (2**53 - 1) // maxn)
                   & (fact_v <= (2**63 - 1) // maxn)
                   & (cbits_v <= 96))   # 96-bit plan constant must fit
            small = cand & (five_v <= (2**32 - 1) // maxn)
            cand64 = ((bws_v > 32) & (bws_v <= 52)
                      & (base_v > -(2**53)) & (max_n < 2**53))
            wide_ok = (cand64 & (five_v <= (2**53 - 1) // maxn)
                       & (fact_v <= (2**63 - 1) // maxn))
            return (mid, small, wide_ok & (cbits_v <= 64),
                    wide_ok & (cbits_v > 64) & (cbits_v <= 80))

        if col.enc_max is None:
            mid_v, small_v, mid64_v, c96_v = eligibility(umax_v)
            best = eligibility(cons_umax >> np.uint64(1))
            border = np.nonzero(
                (best[0] | best[1] | best[2] | best[3])
                & ~(mid_v | small_v | mid64_v | c96_v))[0]
            if border.size:
                true_max = _true_max_encoded(col, alp_idx[border],
                                             bws_v[border], base_v[border])
                umax_v = umax_v.copy()
                umax_v[border] = (true_max.view(np.uint64)
                                  - base_v[border].view(np.uint64))
        mid_v, small_v, mid64_v, c96_v = eligibility(umax_v)
        max_n = (base_v.view(np.uint64) + umax_v).view(np.int64)
        maxn = np.maximum(np.maximum(np.abs(base_v), np.abs(max_n)), 1)
        var_v[c96_v] = "midc96"
        var_v[mid64_v] = "mid64"
        var_v[mid_v] = "mid"
        var_v[small_v] = "small"
        # bw == 0: every slot decodes to the per-vector constant — route
        # to the broadcast kernel regardless of other eligibility
        var_v[bws_v == 0] = "const"
        # static work-pruning flags for the wide variants: FOR bounds
        # prove the whole bucket's n-sign structure (n = base + u, u >= 0)
        wide = mid64_v | c96_v
        flags_v[wide & (base_v >= 0)] |= 2            # nonneg
        flags_v[wide & (base_v > 0)] |= 8             # nozero
        # allneg: max n < 0, so |n| = (-base) - u (one subtract,
        # constant sign); maghi: min |n| >= 2^32 kills the normalize
        # two-case select
        allneg_v = wide & (max_n < 0)
        flags_v[allneg_v] |= 32
        min_abs = np.where(allneg_v, -max_n,
                           np.where(base_v >= 0, base_v, 0))
        flags_v[wide & (min_abs >= 2**32)] |= 64      # maghi
        # alo_zero: max |n| < 2^48 -> the normalize shift is >= 16, so
        # the normalized magnitude's low 16-bit digit is zero and the
        # M.lo partial products halve (softfloat alo_zero contract)
        flags_v[wide & (maxn < 2**48)] |= 128
        # banded magnitudes: min |n| and max |n| in the same octave ->
        # the normalize shift is one compile-time constant for the
        # whole bucket (common when n = value * 10^f spans < 1 decade);
        # (k + 1) rides flags bits 9..15 and becomes part of the bucket
        # key, so equal-k vectors group together automatically
        msb_lo = _msb64(np.maximum(min_abs, 1))
        msb_hi = _msb64(maxn)
        banded = wide & (min_abs >= 1) & (msb_lo == msb_hi)
        flags_v[banded] |= ((63 - msb_hi[banded]) + 1).astype(
            np.int32) << 9
        # generic buckets where every vector has fac == 0 skip the FACT
        # multiply (FACT = 1)
        gen_sel = var_v == "gen"
        flags_v[gen_sel & (col.fac[alp_idx] == 0)] |= 16
        # static work-pruning flags, uniform per bucket (mid kernel);
        # bit 16 here is the 32-bit alo_zero twin (|n| < 2^16), bits
        # 9..15 the banded-magnitude static shift (k = 31 - msb here)
        min_abs_m = np.where(max_n[mid_v] < 0, -max_n[mid_v],
                             np.where(base_v[mid_v] >= 0,
                                      base_v[mid_v], 0))
        msb_m = _msb64(np.maximum(maxn[mid_v], 1))
        banded_m = ((min_abs_m >= 1)
                    & (_msb64(np.maximum(min_abs_m, 1)) == msb_m))
        flags_v[mid_v] = (c0zero_v[mid_v].astype(np.int32)
                          | np.where(base_v[mid_v] >= 0, 2, 0)
                          | np.where(maxn[mid_v] < 2**24, 4, 0)
                          | np.where(base_v[mid_v] > 0, 8, 0)
                          | np.where(maxn[mid_v] < 2**16, 16, 0)
                          | np.where(banded_m,
                                     ((31 - msb_m) + 1) << 9, 0)
                          ).astype(np.int32)

    for bw, vr, fl in sorted({(int(b), str(v), int(f))
                              for b, v, f in zip(bws_v, var_v, flags_v)}):
        sel = alp_idx[(bws_v == bw) & (var_v == vr) & (flags_v == fl)]
        n = len(sel)
        n_pad = layout.pad_vectors(n, eb)
        row = int(bw) * (1024 // eb)
        packed = np.zeros((n_pad, row), tc.ut)
        if n and row:
            # one C-level concatenate of the (usually zero-copy) views
            packed[:n] = np.concatenate(
                [col.packed[v] for v in sel]).reshape(n, row)
        # bytes ship verbatim; the tile transpose runs on device
        tiles = layout.ref_to_tile_device(packed, int(bw), eb)

        def expand(per_vec):
            full = np.zeros(n_pad, per_vec.dtype)
            full[:n] = per_vec
            return jnp.asarray(layout.lane_expand(full, eb))

        if col.dtype == np.float64 and vr == "const":
            # exact host decode of the per-vector constant: both
            # roundings (int64 -> double convert, FRAC multiply) are
            # native f64 ops here, bit-identical to the device generic
            # path on bw-0 vectors (reference src/falp.cpp bw-0 kernels)
            with np.errstate(over="ignore"):
                bf = (col.base[sel].astype(np.int64)
                      * tc.fact_arr[col.fac[sel]])
            vals = bf.astype(np.float64) * tc.frac_arr[col.exp[sel]]
            bits = vals.view(np.uint64)
            meta = (expand((bits >> np.uint64(32)).astype(np.uint32)),
                    expand((bits & np.uint64(0xFFFFFFFF)).astype(
                        np.uint32)))
        elif col.dtype == np.float64 and vr == "midc96":
            # allneg buckets stage -base: the kernel computes the
            # magnitude directly as |n| = (-base) - u (see falp.py)
            base_i = col.base[sel].astype(np.int64)
            base_u = (-base_i if fl & 32 else base_i).view(np.uint64)
            blo = (base_u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            bhi = (base_u >> np.uint64(32)).astype(np.uint32)
            c2, c1, c0, fb2 = _c_planes(col.fac[sel], col.exp[sel],
                                        tc.frac_arr, top=95, fb_off=106,
                                        low16_zero=True)
            meta = tuple(expand(x) for x in (blo, bhi, c2, c1, c0, fb2))
        elif col.dtype == np.float64 and vr == "small":
            base32 = col.base[sel].astype(np.int64).astype(
                np.int32).view(np.uint32)
            fives = np.power(np.int64(5), col.fac[sel].astype(np.int64))
            factu = (fives.view(np.uint64)
                     & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            frac_u = tc.frac_arr[col.exp[sel]].view(np.uint64)
            fsig_hi = (((frac_u >> np.uint64(32)) & np.uint64(0xFFFFF))
                       | np.uint64(1 << 20)).astype(np.uint32)
            fsig_lo = (frac_u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            # fac's power of two folds into the exponent: 10^f = 2^f * 5^f
            fbias = (((frac_u >> np.uint64(52)) & np.uint64(0x7FF))
                     + col.fac[sel].astype(np.uint64)).astype(np.uint32)
            meta = tuple(expand(x) for x in (base32, factu, fsig_hi,
                                             fsig_lo, fbias))
        elif col.dtype == np.float64 and vr == "mid64":
            # allneg buckets stage -base (magnitude path, see falp.py)
            base_i = col.base[sel].astype(np.int64)
            base_u = (-base_i if fl & 32 else base_i).view(np.uint64)
            blo = (base_u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            bhi = (base_u >> np.uint64(32)).astype(np.uint32)
            _, c1, c0, fb2 = _c_planes(col.fac[sel], col.exp[sel],
                                       tc.frac_arr, top=63, fb_off=74)
            meta = tuple(expand(x) for x in (blo, bhi, c1, c0, fb2))
        elif col.dtype == np.float64 and vr == "mid":
            base32 = col.base[sel].astype(np.int64).astype(
                np.int32).view(np.uint32)
            # exact python-int 96-bit constant C' = (5^fac * fsig) << sC
            c2, c1, c0, fb2 = _c_planes(col.fac[sel], col.exp[sel],
                                        tc.frac_arr, top=95, fb_off=74)
            meta = tuple(expand(x) for x in (base32, c2, c1, c0, fb2))
        elif col.dtype == np.float64:
            # fold the FOR base into the decode multiply: bf = base * FACT
            # (wrapping int64), per vector
            with np.errstate(over="ignore"):
                bf = (col.base[sel].astype(np.int64)
                      * tc.fact_arr[col.fac[sel]])
            blo, bhi = _u64_planes(bf.view(np.uint64))
            fact_u = tc.fact_arr[col.fac[sel]].view(np.uint64)
            flo, fhi = _u64_planes(fact_u)
            frac_u = tc.frac_arr[col.exp[sel]].view(np.uint64)
            frlo, frhi = _u64_planes(frac_u)
            meta = tuple(expand(x) for x in (blo, bhi, flo, fhi, frlo, frhi))
        else:
            meta = (expand(col.base[sel].view(np.uint32)),
                    expand(tc.fact_arr[col.fac[sel]].view(np.uint32)),
                    expand(tc.frac_arr[col.exp[sel]].view(np.uint32)))
        # exception scatter indices (decoder::patch_exceptions analog)
        L = 1024 // eb
        rows, poss, vbits = [], [], []
        for r, v in enumerate(sel):
            pos = col.exc_positions[v]
            if len(pos):
                rows.append(np.full(len(pos), r, np.int32))
                poss.append(pos.astype(np.int32))
                vbits.append(col.exc_values[v])
        grp = _Group(int(bw), n, sel, tiles, meta, variant=vr, flags=fl)
        if rows:
            rows = np.concatenate(rows)
            poss = np.concatenate(poss)
            vb = np.concatenate(vbits).view(tc.ut)
            grp.exc_g = jnp.asarray(rows // group)
            grp.exc_slot = jnp.asarray(poss // L)
            grp.exc_lane = jnp.asarray((rows % group) * L + poss % L)
            if col.dtype == np.float64:
                grp.exc_hi = jnp.asarray((vb >> np.uint64(32)).astype(np.uint32))
                grp.exc_lo = jnp.asarray((vb & np.uint64(0xFFFFFFFF)).astype(np.uint32))
            else:
                grp.exc_lo = jnp.asarray(vb.astype(np.uint32))
        else:
            grp.exc_g = jnp.zeros(0, jnp.int32)
        groups.append(grp)

    # ALP_RD vectors, bucketed by right bit width.  Left parts are
    # dictionary-resolved and exception-patched at plan build (host): the
    # device kernel then only unFFORs the right parts and ORs the left
    # bits in (rd.hpp:152-178 semantics with patching folded in).
    from ..ops import fastlanes as jfl
    rd_idx = np.nonzero(col.rg_scheme[vec_rg] == C.SCHEME_ALP_RD)[0]
    if rd_idx.size:
        rbws = col.rd_right_bw[vec_rg[rd_idx]]
        lbws = col.rd_left_bw[vec_rg[rd_idx]]
        for rbw, lbw in {(int(r), int(l)) for r, l in zip(rbws, lbws)}:
            sel = rd_idx[(rbws == rbw) & (lbws == lbw)]
            n = len(sel)
            n_pad = layout.pad_vectors(n, eb)
            row = int(rbw) * (1024 // eb)
            packed = np.zeros((n_pad, row), tc.ut)
            if n and row:
                packed[:n] = np.concatenate(
                    [col.packed[v] for v in sel]).reshape(n, row)
            # batched left-index unpack (host cpu; u16 FastLanes geometry)
            left_packed = np.stack([col.left_packed[v] for v in sel])
            with jax.default_device(jax.devices("cpu")[0]):
                idx = np.asarray(jfl.unffor_unpack(
                    left_packed, np.zeros(n, np.uint16), bw=lbw,
                    signed=False))
            rgs = vec_rg[sel]
            tiles = layout.ref_to_tile_device(packed, int(rbw), eb)
            if col.dtype == np.float64:
                # device-side dictionary: repack indexes at lbw bits in
                # u64-lane geometry + 8 lane-expanded dict planes; the
                # exception scatter carries full value bits (left part
                # OR right bits extracted from the packed words).
                idx64 = np.zeros((n_pad, C.VECTOR_SIZE), np.int64)
                idx64[:n] = idx
                with jax.default_device(jax.devices("cpu")[0]):
                    lp = np.asarray(jfl.ffor_pack(
                        idx64, np.zeros(n_pad, np.int64), bw=lbw))
                left_tiles = layout.ref_to_tile_device(
                    lp.view(np.uint64), lbw, eb)
                dict_rows = col.rd_dict[rgs]            # [n, 8] u16
                planes = []
                for k in range(C.MAX_RD_DICTIONARY_SIZE):
                    full = np.zeros(n_pad, np.uint32)
                    full[:n] = dict_rows[:, k].astype(np.uint32)
                    planes.append(jnp.asarray(layout.lane_expand(full, eb)))
                grp = _Group(int(rbw), n, sel, tiles,
                             (left_tiles, int(lbw), *planes),
                             scheme=C.SCHEME_ALP_RD)
                _stage_rd_exceptions(grp, col, sel, packed, int(rbw), eb)
                groups.append(grp)
            else:
                # device-side dictionary, float geometry: indexes packed
                # at lbw bits in u32-lane layout + 8 lane-expanded dict
                # planes; exceptions patched by the output scatter
                idx32 = np.zeros((n_pad, C.VECTOR_SIZE), np.int32)
                idx32[:n] = idx
                with jax.default_device(jax.devices("cpu")[0]):
                    lp = np.asarray(jfl.ffor_pack(
                        idx32, np.zeros(n_pad, np.int32), bw=lbw))
                left_tiles = layout.ref_to_tile_device(
                    lp.view(np.uint32), lbw, eb)
                dict_rows = col.rd_dict[rgs]
                planes = []
                for k in range(C.MAX_RD_DICTIONARY_SIZE):
                    full = np.zeros(n_pad, np.uint32)
                    full[:n] = dict_rows[:, k].astype(np.uint32)
                    planes.append(jnp.asarray(layout.lane_expand(full, eb)))
                grp = _Group(int(rbw), n, sel, tiles,
                             (left_tiles, int(lbw), *planes),
                             scheme=C.SCHEME_ALP_RD)
                _stage_rd_exceptions(grp, col, sel, packed, int(rbw), eb)
                groups.append(grp)

    return DecodePlan(np.dtype(col.dtype), col.n_vectors, groups,
                      decoded_bytes=sum(g.n_vectors for g in groups)
                      * C.VECTOR_SIZE * tc.pt.itemsize)


@jax.jit
def _planes_to_values_f64(hi, lo):
    """[G, 64, 128] u32 bit planes -> [G*8, 1024] u64 values ON DEVICE
    (value k = v*16 + lane of vector n lives at [n//8, v, (n%8)*16 +
    lane]) — the fetch then lands in final value order, no host
    interleave/transpose pass."""
    u = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)
    G = u.shape[0]
    t = u.reshape(G, 64, 8, 16).transpose(0, 2, 1, 3)
    return t.reshape(G * 8, C.VECTOR_SIZE)


@jax.jit
def _planes_to_values_f32(plane):
    """[G, 32, 128] u32 f32 bit planes -> [G*4, 1024] u32 values."""
    G = plane.shape[0]
    t = plane.reshape(G, 32, 4, 32).transpose(0, 2, 1, 3)
    return t.reshape(G * 4, C.VECTOR_SIZE)


def decompress_device(col) -> np.ndarray:
    """Full fused decode of the ALP-scheme vectors of a column on device,
    with on-device value reassembly + exception patching; returns
    [n, 1024] values for ALP vectors (RD vectors are left zero —
    container.decompress handles mixed columns)."""
    plan = build_plan(col)
    outs = plan.run(patch=True)
    result = np.zeros((col.n_vectors, C.VECTOR_SIZE), col.dtype)
    for g, out in zip(plan.groups, outs):
        if col.dtype == np.float64:
            vals = np.asarray(_planes_to_values_f64(*out)).view(
                np.float64)
        else:
            vals = np.asarray(_planes_to_values_f32(out)).view(np.float32)
        result[g.vec_indices] = vals[:g.n_vectors]
    return result
