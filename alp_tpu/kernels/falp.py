"""Pallas TPU kernels: FFOR pack/unpack and the fused falp decode.

The reference ships 65 + 33 bit-width-specialised generated C++ kernels for
the fused unFFOR + integer->double multiply decode (reference src/falp.cpp,
include/alp/falp.hpp:10-131) and ~120 per-width FFOR/unFFOR kernels
(src/fastlanes_generated_{ffor,unffor}.cpp).  Here each kernel is *traced*
per static ``bw`` instead of generated: the slot loop unrolls into static
u32 shifts/ors, and the jit cache plays the role of the reference's
dispatch switch (src/fastlanes_generated_unffor.cpp:23010-23212).

All kernels operate on the 128-lane tile layout (kernels.layout): groups of
8 double-vectors (4 float-vectors) interleaved so the VPU's 128 lanes are
full.  Doubles are processed as uint32 limb pairs with exact softfloat
arithmetic (ops.softfloat) — Mosaic has no 64-bit types, and XLA's f64
emulation is not correctly rounded; softfloat is, and it traces inside
Pallas because it is pure 32-bit jnp.

Per-vector metadata (base / FACT[fac] / FRAC[exp] bits) arrives lane-
expanded as ``[G, 128]`` u32 planes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import softfloat as sf
from ..ops.softfloat import U64

_U32 = jnp.uint32

# Groups per grid step.  8 groups = 64 double vectors per block; worst-case
# VMEM (bw=64): in 8*128*128*4 = 512 KiB + out 2*8*64*128*4 = 512 KiB.
# Float tiles are 4x smaller, so the f32 kernels use larger blocks to
# amortise per-step overhead (measured optimum ~16 groups).
_BLOCK_GROUPS = 8
_BLOCK_GROUPS_F32 = 16


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _unpack_slot(limbs, v: int, bw: int, n_limbs: int):
    """Bits [v*bw, (v+1)*bw) of each lane's little-endian u32 limb stream.

    ``limbs[j]`` is a [..., 128] u32 array (limb j of every lane).  Returns
    a U64 (hi, lo) masked to ``bw`` bits.  All shifts are static: this is
    the TPU analog of one line of a generated unffor kernel.
    """
    off = v * bw
    j0, s = off // 32, off % 32
    zero = jnp.zeros_like(limbs[0])

    def limb(j):
        return limbs[j] if j < n_limbs else zero

    if s == 0:
        lo = limb(j0)
        hi = limb(j0 + 1)
    else:
        lo = (limb(j0) >> _U32(s)) | (limb(j0 + 1) << _U32(32 - s))
        hi = (limb(j0 + 1) >> _U32(s)) | (limb(j0 + 2) << _U32(32 - s))
    if bw < 32:
        return U64(zero, lo & _U32((1 << bw) - 1))
    if bw == 32:
        return U64(zero, lo)
    if bw < 64:
        return U64(hi & _U32((1 << (bw - 32)) - 1), lo)
    return U64(hi, lo)


def _u64_add(a: U64, b: U64) -> U64:
    lo = a.lo + b.lo
    carry = (lo < b.lo).astype(_U32)
    return U64(a.hi + b.hi + carry, lo)


# ---------------------------------------------------------------------------
# Fused falp decode, doubles (reference src/falp.cpp:100-120 per-slot body)
# ---------------------------------------------------------------------------

def _unpack_all(packed_ref, bw: int, slots: int, lpb: int) -> U64:
    """Unpack every slot -> U64 of [gb, slots, 128] (hi zero for 32-bit)."""
    n_limbs = lpb * bw
    limbs = [packed_ref[:, j, :] for j in range(n_limbs)]
    vals = [_unpack_slot(limbs, v, bw, n_limbs) for v in range(slots)]
    return U64(jnp.stack([u.hi for u in vals], axis=1),
               jnp.stack([u.lo for u in vals], axis=1))


def _falp_f64_kernel(packed_ref, bf_lo, bf_hi, fact_lo, fact_hi,
                     frac_lo, frac_hi, out_hi, out_lo, *, bw: int,
                     fact1: bool):
    # One softfloat graph over [gb, 64, 128]: unpack is 64 small static-shift
    # expressions; the FACT multiply / i64->f64 / FRAC multiply are single
    # whole-block vector ops (VPU-shaped, fast to trace and compile).
    #
    # (u + base) * FACT distributes over the wrapping product:
    # m = u * FACT + base * FACT, and base*FACT is per-vector constant, so
    # the bf planes carry it precomputed — one add64 replaces the base add
    # AND, for bw <= 32, u.hi == 0 halves the 64-bit multiply.
    # FRAC = 10^-e is always normal and positive: _gen_value_f64 splits its
    # bits into significand (implicit bit restored) + biased exponent once
    # per block.
    r = _gen_value_f64(packed_ref, bf_lo, bf_hi, fact_lo, fact_hi,
                       frac_lo, frac_hi, bw=bw, fact1=fact1)
    out_hi[:] = r.hi
    out_lo[:] = r.lo


@functools.partial(jax.jit, static_argnames=("bw", "fact1"))
def falp_decode_f64(packed, bf_lo, bf_hi, fact_lo, fact_hi,
                    frac_lo, frac_hi, *, bw: int, fact1: bool = False):
    """Fused unFFOR + *FACT + i64->f64 + *FRAC on [G, 2*bw, 128] tiles.

    ``bf`` planes carry the per-vector constant ``base * FACT[fac]``
    (wrapping int64 product, precomputed at plan build) — the FOR base
    folds into the decode multiply by distributivity.  ``fact1`` is a
    static bucket flag: every vector has fac == 0 (FACT = 1), so the
    64-bit FACT multiply is skipped entirely.

    Returns (hi, lo) u32 planes of f64 bit patterns, [G, 64, 128] each, in
    tile value order.  Exceptions are patched by the caller (scatter), as
    the reference does after its falp call (decoder.hpp:141-149).
    """
    G = packed.shape[0]
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    if pad:
        packed, bf_lo, bf_hi, fact_lo, fact_hi, frac_lo, frac_hi = (
            jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            for a in (packed, bf_lo, bf_hi, fact_lo, fact_hi,
                      frac_lo, frac_hi))
    Gp = G + pad
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_falp_f64_kernel, bw=bw, fact1=fact1),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(2 * bw, 1), 128), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)] + [meta_spec] * 6,
        out_specs=[pl.BlockSpec((gb, 64, 128), lambda i: (i, i * 0, i * 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((Gp, 64, 128), jnp.uint32)] * 2,
        interpret=_interpret(),
    )(packed if bw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      bf_lo, bf_hi, fact_lo, fact_hi, frac_lo, frac_hi)
    return out[0][:G], out[1][:G]


def _falp_f64_small_kernel(packed_ref, base, fact, fsig_hi, fsig_lo,
                           fbias, out_hi, out_lo, *, bw: int):
    # Small-magnitude fast path: every m = (u + base) * FACT of the block
    # provably fits a 32-bit magnitude (plan-build bounds check), so the
    # int64->double convert is exact and one 32x53 product with a single
    # rounding replaces the generic softfloat pipeline.
    b = base[:][:, None, :]
    fa = fact[:][:, None, :]
    fh = fsig_hi[:][:, None, :]
    fl = fsig_lo[:][:, None, :]
    fb = fbias[:][:, None, :]
    if bw == 0:
        n = jnp.broadcast_to(b, out_hi.shape)
    else:
        n = _unpack_all(packed_ref, bw, 64, 2).lo + b
    r = sf.i32fact_to_f64_times_normal(n, fa, fh, fl, fb)
    out_hi[:] = r.hi
    out_lo[:] = r.lo


def _falp_f64_mid_kernel(packed_ref, base, c2, c1, c0, fb2,
                         out_hi, out_lo, *, bw: int, c0zero: bool,
                         nonneg: bool, cheap_msb: bool, nozero: bool,
                         alo_zero: bool, k_static):
    # Mid-magnitude fast path: |n| <= 2^31 and |n * 5^fac| < 2^53, so
    # double(m) is exact and one 32x96 product with a single rounding
    # replaces the generic convert-then-multiply softfloat pipeline.
    b = base[:][:, None, :]
    if bw == 0:
        n = jnp.broadcast_to(b, out_hi.shape)
    else:
        n = _unpack_all(packed_ref, bw, 64, 2).lo + b
    r = sf.i32c96_to_f64(n, c2[:][:, None, :], c1[:][:, None, :],
                         c0[:][:, None, :], fb2[:][:, None, :],
                         c0zero=c0zero, nonneg=nonneg, cheap_msb=cheap_msb,
                         nozero=nozero, alo_zero=alo_zero,
                         k_static=k_static)
    out_hi[:] = r.hi
    out_lo[:] = r.lo


@functools.partial(jax.jit, static_argnames=("bw", "c0zero", "nonneg",
                                             "cheap_msb", "nozero",
                                             "alo_zero", "k_static",
                                             "block_groups"))
def falp_decode_f64_mid(packed, base, c2, c1, c0, fb2, *, bw: int,
                        c0zero: bool = False, nonneg: bool = False,
                        cheap_msb: bool = False, nozero: bool = False,
                        alo_zero: bool = False,
                        k_static: int | None = None,
                        block_groups: int | None = None):
    """Fused falp decode, mid-magnitude variant (bw <= 32, odd part of
    m = n * FACT below 2^53: double(m) exact, single rounding).

    Metadata planes (per-vector, lane-expanded u32): ``base`` (int32 FOR
    base), ``c2``/``c1``/``c0`` (the 96-bit plan-time constant
    5^fac * fsig(FRAC) top-aligned to bit 95), ``fb2`` (combined biased
    exponent term).  Static bucket flags prune work the plan proved
    impossible: ``c0zero`` (low constant limb zero for every vector —
    fac <= 4), ``nonneg`` (no negative encodings), ``cheap_msb``
    (|n| < 2^24), ``nozero`` (no zero encodings — FOR base > 0).
    See softfloat.i32c96_to_f64.
    """
    G = packed.shape[0]
    gb = min(block_groups or _BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    if pad:
        packed, base, c2, c1, c0, fb2 = (
            jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            for a in (packed, base, c2, c1, c0, fb2))
    Gp = G + pad
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_falp_f64_mid_kernel, bw=bw, c0zero=c0zero,
                          nonneg=nonneg, cheap_msb=cheap_msb,
                          nozero=nozero, alo_zero=alo_zero,
                          k_static=k_static),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(2 * bw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)] + [meta_spec] * 5,
        out_specs=[pl.BlockSpec((gb, 64, 128), lambda i: (i, i * 0, i * 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((Gp, 64, 128), jnp.uint32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(packed if bw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      base, c2, c1, c0, fb2)
    return out[0][:G], out[1][:G]


def _wide_n_or_mag(packed_ref, base, bw: int, shape, allneg: bool):
    """n = u + base, or |n| = (-base) - u when the bucket is all-negative
    (the staged base planes then carry -base): one subtract replaces the
    add + absolute-value block."""
    if bw == 0:
        return U64(jnp.broadcast_to(base.hi, shape),
                   jnp.broadcast_to(base.lo, shape))
    u = _unpack_all(packed_ref, bw, 64, 2)
    if allneg:
        return _u64_sub(base, u)
    return _u64_add(u, base)


def _falp_f64_mid64_kernel(packed_ref, base_lo, base_hi, c1, c0, fb2,
                           out_hi, out_lo, *, bw: int, nonneg: bool,
                           nozero: bool, allneg: bool, maghi: bool,
                           alo_zero: bool, k_static):
    # mid64 fast path (bw 33..52): |n * 5^fac| < 2^53 and the constant
    # 5^fac * fsig fits 64 bits, so double(m) is exact and one 64x64
    # product with a single rounding replaces the generic pipeline.
    base = U64(base_hi[:][:, None, :], base_lo[:][:, None, :])
    n = _wide_n_or_mag(packed_ref, base, bw, out_hi.shape, allneg)
    cc1 = c1[:][:, None, :]
    cc0 = c0[:][:, None, :]
    fb = fb2[:][:, None, :]
    if allneg:
        r = sf.u64mag_c64_to_f64(n, 1, cc1, cc0, fb, maghi=maghi,
                                 nozero=True, alo_zero=alo_zero,
                                 k_static=k_static)
    elif nonneg:
        r = sf.u64mag_c64_to_f64(n, 0, cc1, cc0, fb, maghi=maghi,
                                 nozero=nozero, alo_zero=alo_zero,
                                 k_static=k_static)
    else:
        r = sf.i64c64_to_f64(n, cc1, cc0, fb, nozero=nozero,
                             alo_zero=alo_zero, k_static=k_static)
    out_hi[:] = r.hi
    out_lo[:] = r.lo


@functools.partial(jax.jit, static_argnames=("bw", "nonneg", "nozero",
                                             "allneg", "maghi",
                                             "alo_zero", "k_static"))
def falp_decode_f64_mid64(packed, base_lo, base_hi, c1, c0, fb2, *,
                          bw: int, nonneg: bool = False,
                          nozero: bool = False, allneg: bool = False,
                          maghi: bool = False, alo_zero: bool = False,
                          k_static: int | None = None):
    """Fused falp decode, mid64 variant (bit widths beyond int32 whose
    odd part still fits 2^53 with a 64-bit plan-time constant).

    Metadata planes: ``base_lo``/``base_hi`` (int64 FOR base limbs;
    ``-base`` limbs when ``allneg``), ``c1``/``c0`` (5^fac * fsig
    top-aligned to bit 63), ``fb2`` (combined biased exponent term).
    Static bucket flags from the plan's FOR-bound proofs: ``nonneg``
    (base >= 0: no negative encoding), ``nozero`` (base > 0),
    ``allneg`` (base + 2^bw - 1 < 0: every encoding negative — the
    magnitude comes from one subtract against -base, sign is constant),
    ``maghi`` (min |n| >= 2^32: one-case normalize).
    See softfloat.i64c64_to_f64 / u64mag_c64_to_f64.
    """
    G = packed.shape[0]
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    if pad:
        packed, base_lo, base_hi, c1, c0, fb2 = (
            jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            for a in (packed, base_lo, base_hi, c1, c0, fb2))
    Gp = G + pad
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_falp_f64_mid64_kernel, bw=bw, nonneg=nonneg,
                          nozero=nozero, allneg=allneg, maghi=maghi,
                          alo_zero=alo_zero, k_static=k_static),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(2 * bw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)] + [meta_spec] * 5,
        out_specs=[pl.BlockSpec((gb, 64, 128), lambda i: (i, i * 0, i * 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((Gp, 64, 128), jnp.uint32)] * 2,
        interpret=_interpret(),
    )(packed if bw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      base_lo, base_hi, c1, c0, fb2)
    return out[0][:G], out[1][:G]


def _falp_f64_midc96_kernel(packed_ref, base_lo, base_hi, c2, c1, c0,
                            fb2, out_hi, out_lo, *, bw: int, nonneg: bool,
                            nozero: bool, allneg: bool, maghi: bool,
                            alo_zero: bool, k_static):
    # mid64c96 fast path: like mid64 but the plan-time constant
    # 5^fac * fsig needs 65..96 bits (fac 5..9), so the single-rounding
    # product is 64x96 (softfloat.i64c96_to_f64).
    base = U64(base_hi[:][:, None, :], base_lo[:][:, None, :])
    n = _wide_n_or_mag(packed_ref, base, bw, out_hi.shape, allneg)
    cc2 = c2[:][:, None, :]
    cc1 = c1[:][:, None, :]
    cc0 = c0[:][:, None, :]
    fb = fb2[:][:, None, :]
    if allneg:
        r = sf.u64mag_c96_to_f64(n, 1, cc2, cc1, cc0, fb, maghi=maghi,
                                 nozero=True, alo_zero=alo_zero,
                                 k_static=k_static)
    elif nonneg:
        r = sf.u64mag_c96_to_f64(n, 0, cc2, cc1, cc0, fb, maghi=maghi,
                                 nozero=nozero, alo_zero=alo_zero,
                                 k_static=k_static)
    else:
        r = sf.i64c96_to_f64(n, cc2, cc1, cc0, fb, nozero=nozero,
                             alo_zero=alo_zero, k_static=k_static)
    out_hi[:] = r.hi
    out_lo[:] = r.lo


@functools.partial(jax.jit, static_argnames=("bw", "nonneg", "nozero",
                                             "allneg", "maghi",
                                             "alo_zero", "k_static"))
def falp_decode_f64_midc96(packed, base_lo, base_hi, c2, c1, c0, fb2, *,
                           bw: int, nonneg: bool = False,
                           nozero: bool = False, allneg: bool = False,
                           maghi: bool = False, alo_zero: bool = False,
                           k_static: int | None = None):
    """Fused falp decode, mid64c96 variant: bit widths beyond int32 whose
    odd part fits 2^53 but whose constant 5^fac * fsig needs more than
    64 bits (fac 5..9 — e.g. CMS/1 at fac 5 / bw 41, Medicare/1 at
    fac 5 / bw 38; reference src/falp.cpp high-bw kernels).

    Metadata planes: int64 base limbs, ``c2``/``c1``/``c0`` (the 96-bit
    constant top-aligned to bit 95; c0's low 16 bits provably zero) and
    ``fb2`` = f_biased + 106 + fac - shiftC.  See softfloat.i64c96_to_f64.
    """
    G = packed.shape[0]
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    if pad:
        packed, base_lo, base_hi, c2, c1, c0, fb2 = (
            jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            for a in (packed, base_lo, base_hi, c2, c1, c0, fb2))
    Gp = G + pad
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_falp_f64_midc96_kernel, bw=bw, nonneg=nonneg,
                          nozero=nozero, allneg=allneg, maghi=maghi,
                          alo_zero=alo_zero, k_static=k_static),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(2 * bw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)] + [meta_spec] * 6,
        out_specs=[pl.BlockSpec((gb, 64, 128), lambda i: (i, i * 0, i * 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((Gp, 64, 128), jnp.uint32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(packed if bw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      base_lo, base_hi, c2, c1, c0, fb2)
    return out[0][:G], out[1][:G]


def _falp_f64_const_kernel(hi_plane, lo_plane, out_hi, out_lo):
    out_hi[:] = jnp.broadcast_to(hi_plane[:][:, None, :], out_hi.shape)
    out_lo[:] = jnp.broadcast_to(lo_plane[:][:, None, :], out_lo.shape)


@jax.jit
def falp_decode_f64_const(hi_plane, lo_plane):
    """Fused falp decode, constant variant (bw == 0): every slot of a
    vector decodes to the same double ``RN(RN(double(base * FACT))
    * FRAC)``, which the plan builder computes exactly on the host
    (both roundings are native f64 ops there), so the kernel is a pure
    broadcast write — output-bandwidth-bound instead of softfloat-bound
    (the reference runs its full per-value decode even at bw 0,
    src/falp.cpp bw-0 kernels).  A Pallas kernel rather than XLA
    ``repeat`` so the planes are genuinely materialised: repeat fuses
    into downstream consumers (or dead-code-eliminates entirely under a
    reduce), which mismeasures and changes decode-plan semantics.

    ``hi_plane``/``lo_plane``: [G, 128] lane-expanded f64 bit limbs of
    the per-vector constant.  Returns [G, 64, 128] (hi, lo) planes.
    """
    G = hi_plane.shape[0]
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    if pad:
        hi_plane, lo_plane = (jnp.pad(a, ((0, pad), (0, 0)))
                              for a in (hi_plane, lo_plane))
    Gp = G + pad
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _falp_f64_const_kernel,
        grid=(Gp // gb,),
        in_specs=[meta_spec] * 2,
        out_specs=[pl.BlockSpec((gb, 64, 128), lambda i: (i, i * 0, i * 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((Gp, 64, 128), jnp.uint32)] * 2,
        interpret=_interpret(),
    )(hi_plane, lo_plane)
    return out[0][:G], out[1][:G]


def _f64_bits_to_f32(hi, lo):
    """Truncating f64-bits -> f32 value (checksum-grade convert for the
    fused SUM reduction; ~8 integer ops, no rounding of the mantissa)."""
    sign = hi & _U32(0x80000000)
    e = ((hi >> 20) & _U32(0x7FF)).astype(jnp.int32)
    e32 = jnp.minimum(jnp.maximum(e - jnp.int32(896), jnp.int32(0)),
                      jnp.int32(254)).astype(_U32)
    m = ((hi & _U32(0xFFFFF)) << 3) | (lo >> 29)
    return (sign | (e32 << 23) | m).view(jnp.float32)


# Exact-SUM epilogue: fixed-point superaccumulator windows.  A decoded
# f64 is m' * 2^(e_eff - 1075) with m' the 53-bit mantissa (implicit bit
# restored) and e_eff = max(biased exponent, 1); the integer m' << e_eff
# is accumulated exactly and the host rounds ONCE (engine.query_sum).
# ALP-decoded doubles always satisfy 10^-18 <= |v| < 2^63 when nonzero
# (FRAC = 10^-e <= 1 bounds the magnitude by the int64 range; the
# smallest nonzero |m * FRAC| is 1 * 10^-18), so e_eff lives in
# [963, 1085] and the 32-bit window index j = e_eff >> 5 in [30, 33] —
# a STATIC 4-window envelope, 6 accumulator windows after digit spill.
# Out-of-envelope nonzero mantissas (possible only for raw ALP_RD bit
# patterns, e.g. subnormals) are counted in a 'rare' row and the caller
# falls back to the general path for that bucket.
_SUM_W0 = 30          # first value window (e_eff 960)
_SUM_JMAX = 33        # last value window (e_eff 1087)
_SUM_NWIN = _SUM_JMAX - _SUM_W0 + 3   # accumulator windows incl. spill
_SUM_ROWS = 16        # 2 * 6 digit-half rows + nan/pinf/ninf/rare


def _exact_sum_rows(r: U64, out_ref, off: int = 0):
    """Write the 16 exact-SUM rows for a block of decoded f64 bits:
    rows [0, 6): signed i32 sums of the LOW 16-bit digit halves per
    accumulator window; rows [6, 12): the HIGH halves; rows 12-14:
    nan / +inf / -inf counts; row 15: out-of-envelope count.  Per-lane
    half-sums are exact in i32 (<= 64 slots * (2^16 - 1) < 2^23)."""
    hi, lo = r.hi, r.lo
    e = (hi >> _U32(20)) & _U32(0x7FF)
    sign = (hi >> _U32(31)) != 0
    is_special = e == _U32(2047)
    mant_nz = ((hi & _U32(0xFFFFF)) | lo) != 0
    mh = jnp.where(e != 0, (hi & _U32(0xFFFFF)) | _U32(1 << 20),
                   hi & _U32(0xFFFFF))
    mh = jnp.where(is_special, _U32(0), mh)
    ml = jnp.where(is_special, _U32(0), lo)
    # unsigned max has no Mosaic lowering; e < 2048 is i32-safe
    e_eff = jnp.maximum(e.astype(jnp.int32),
                        jnp.int32(1)).astype(_U32)
    j = (e_eff >> _U32(5)).astype(jnp.int32)
    sh = e_eff & _U32(31)
    # c = (mh:ml) << sh, three u32 digits (sh == 0 safe via >>1 >>31-sh)
    d0 = ml << sh
    d1 = ((ml >> _U32(1)) >> (_U32(31) - sh)) | (mh << sh)
    d2 = (mh >> _U32(1)) >> (_U32(31) - sh)

    def halves(d):
        dl = (d & _U32(0xFFFF)).astype(jnp.int32)
        dh = (d >> _U32(16)).astype(jnp.int32)
        return (jnp.where(sign, -dl, dl), jnp.where(sign, -dh, dh))

    digs = [halves(d) for d in (d0, d1, d2)]
    eq = {k: j == jnp.int32(k) for k in range(_SUM_W0, _SUM_JMAX + 1)}
    zero = jnp.zeros_like(digs[0][0])
    for w in range(_SUM_W0, _SUM_W0 + _SUM_NWIN):
        accl = acch = None
        for p in range(3):
            k = w - p
            if _SUM_W0 <= k <= _SUM_JMAX:
                tl = jnp.where(eq[k], digs[p][0], zero)
                th = jnp.where(eq[k], digs[p][1], zero)
                accl = tl if accl is None else accl + tl
                acch = th if acch is None else acch + th
        out_ref[:, off + w - _SUM_W0, :] = accl.sum(axis=1,
                                                    dtype=jnp.int32)
        out_ref[:, off + w - _SUM_W0 + _SUM_NWIN, :] = acch.sum(
            axis=1, dtype=jnp.int32)

    def count(mask):
        return mask.astype(jnp.int32).sum(axis=1, dtype=jnp.int32)

    out_ref[:, off + 12, :] = count(is_special & mant_nz)
    out_ref[:, off + 13, :] = count(is_special & ~mant_nz & ~sign)
    out_ref[:, off + 14, :] = count(is_special & ~mant_nz & sign)
    rare = (((j < jnp.int32(_SUM_W0)) | (j > jnp.int32(_SUM_JMAX)))
            & ((mh | ml) != 0))
    out_ref[:, off + 15, :] = count(rare)


def _exact_sum_planes_kernel(hi_ref, lo_ref, out_ref):
    _exact_sum_rows(U64(hi_ref[:], lo_ref[:]), out_ref)


@jax.jit
def exact_sum_planes_f64(hi, lo):
    """Exact-SUM partials over decoded f64 bit planes [G, 64, 128]:
    returns [G, 16, 128] i32 superaccumulator rows (_exact_sum_rows
    layout).  Used for buckets whose decode is not fused with the
    epilogue (ALP_RD, const) — the planes stay in VMEM per block."""
    G = hi.shape[0]
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    if pad:
        hi, lo = (jnp.pad(a, ((0, pad), (0, 0), (0, 0)))
                  for a in (hi, lo))
    Gp = G + pad
    out = pl.pallas_call(
        _exact_sum_planes_kernel,
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, 64, 128), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((gb, _SUM_ROWS, 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, _SUM_ROWS, 128), jnp.int32),
        interpret=_interpret(),
    )(hi, lo)
    return out[:G]


# f32 twin of the superaccumulator epilogue.  ALP-decoded floats
# satisfy 10^-10 <= |v| < 2^31 when nonzero (FRAC = 10^-e <= 1, e <= 10
# for floats; wrapped i32 product bounds the magnitude), so e_eff lives
# in [93, 157] and j = e_eff >> 5 in [2, 4]; mp < 2^24 means c = mp <<
# sh < 2^55 needs only TWO u32 digits -> 4 accumulator windows.
_SUM32_W0 = 2
_SUM32_JMAX = 4
_SUM32_NWIN = _SUM32_JMAX - _SUM32_W0 + 2     # digit spill is 1 window


def _exact_sum_rows_f32(bits, out_ref):
    """f32 exact-SUM rows: rows [0, 4): signed i32 sums of LOW 16-bit
    digit halves per window; rows [4, 8): HIGH halves; rows 8-11 zero;
    rows 12-14: nan/+inf/-inf counts; row 15: out-of-envelope count.
    Value = m' * 2^(e_eff - 150)."""
    e = (bits >> _U32(23)) & _U32(0xFF)
    sign = (bits >> _U32(31)) != 0
    is_special = e == _U32(255)
    mant_nz = (bits & _U32((1 << 23) - 1)) != 0
    mp = jnp.where(e != 0, (bits & _U32((1 << 23) - 1)) | _U32(1 << 23),
                   bits & _U32((1 << 23) - 1))
    mp = jnp.where(is_special, _U32(0), mp)
    # unsigned max has no Mosaic lowering; e < 256 is i32-safe
    e_eff = jnp.maximum(e.astype(jnp.int32),
                        jnp.int32(1)).astype(_U32)
    j = (e_eff >> _U32(5)).astype(jnp.int32)
    sh = e_eff & _U32(31)
    d0 = mp << sh
    d1 = (mp >> _U32(1)) >> (_U32(31) - sh)

    def halves(d):
        dl = (d & _U32(0xFFFF)).astype(jnp.int32)
        dh = (d >> _U32(16)).astype(jnp.int32)
        return (jnp.where(sign, -dl, dl), jnp.where(sign, -dh, dh))

    digs = [halves(d) for d in (d0, d1)]
    eq = {k: j == jnp.int32(k)
          for k in range(_SUM32_W0, _SUM32_JMAX + 1)}
    zero = jnp.zeros_like(digs[0][0])
    zrow = jnp.zeros((out_ref.shape[0], out_ref.shape[2]), jnp.int32)
    for w in range(_SUM32_W0, _SUM32_W0 + _SUM32_NWIN):
        accl = acch = None
        for p in range(2):
            k = w - p
            if _SUM32_W0 <= k <= _SUM32_JMAX:
                tl = jnp.where(eq[k], digs[p][0], zero)
                th = jnp.where(eq[k], digs[p][1], zero)
                accl = tl if accl is None else accl + tl
                acch = th if acch is None else acch + th
        out_ref[:, w - _SUM32_W0, :] = accl.sum(axis=1, dtype=jnp.int32)
        out_ref[:, w - _SUM32_W0 + _SUM32_NWIN, :] = acch.sum(
            axis=1, dtype=jnp.int32)
    for row in range(2 * _SUM32_NWIN, 12):
        out_ref[:, row, :] = zrow

    def count(mask):
        return mask.astype(jnp.int32).sum(axis=1, dtype=jnp.int32)

    out_ref[:, 12, :] = count(is_special & mant_nz)
    out_ref[:, 13, :] = count(is_special & ~mant_nz & ~sign)
    out_ref[:, 14, :] = count(is_special & ~mant_nz & sign)
    rare = (((j < jnp.int32(_SUM32_W0)) | (j > jnp.int32(_SUM32_JMAX)))
            & (mp != 0))
    out_ref[:, 15, :] = count(rare)


def _exact_sum_planes_f32_kernel(bits_ref, out_ref):
    _exact_sum_rows_f32(bits_ref[:], out_ref)


@jax.jit
def exact_sum_planes_f32(bits):
    """Exact-SUM partials over decoded f32 bit planes [G, 32, 128] ->
    [G, 16, 128] i32 rows (_exact_sum_rows_f32 layout)."""
    G = bits.shape[0]
    gb = min(_BLOCK_GROUPS_F32, max(G, 1))
    pad = (-G) % gb
    if pad:
        bits = jnp.pad(bits, ((0, pad), (0, 0), (0, 0)))
    Gp = G + pad
    out = pl.pallas_call(
        _exact_sum_planes_f32_kernel,
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, 32, 128), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((gb, _SUM_ROWS, 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, _SUM_ROWS, 128), jnp.int32),
        interpret=_interpret(),
    )(bits)
    return out[:G]


def _falp_f32_exact_sum_kernel(packed_ref, base, fact, frac, out_ref, *,
                               bw: int):
    bits = _f32_decode_bits(packed_ref, base, fact, frac,
                            (out_ref.shape[0], 32, 128), bw=bw)
    _exact_sum_rows_f32(bits, out_ref)


@functools.partial(jax.jit, static_argnames=("bw",))
def falp_decode_f32_exact_sum(packed, base, fact, frac_bits, *, bw: int):
    """Fused f32 decode + EXACT-SUM partials: [G, 16, 128] i32 rows out
    (the f32 twin of falp_decode_f64_variant_exact_sum)."""
    G = base.shape[0]
    gb = min(_BLOCK_GROUPS_F32, max(G, 1))
    pad = (-G) % gb
    arrs = (packed, base, fact, frac_bits.view(jnp.float32))
    if pad:
        arrs = tuple(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                     for a in arrs)
    Gp = G + pad
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_falp_f32_exact_sum_kernel, bw=bw),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(bw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)] + [meta_spec] * 3,
        out_specs=pl.BlockSpec((gb, _SUM_ROWS, 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, _SUM_ROWS, 128), jnp.int32),
        interpret=_interpret(),
    )((arrs[0] if bw else jnp.zeros((Gp, 1, 128), jnp.uint32)),
      *arrs[1:])
    return out[:G]


def _falp_f64_variant_exact_sum_kernel(packed_ref, *refs, variant: str,
                                       bw: int, fl: int, n_meta: int):
    metas = refs[:n_meta]
    out_ref = refs[-1]
    shape = (out_ref.shape[0], 64, 128)
    if variant == "gen":
        r = _gen_value_f64(packed_ref, *metas, bw=bw,
                           fact1=bool(fl & 16))
    else:
        r = _variant_value_f64(variant, packed_ref, metas, shape, bw=bw,
                               fl=fl)
    _exact_sum_rows(r, out_ref)


@functools.partial(jax.jit, static_argnames=("variant", "bw", "flags"))
def falp_decode_f64_variant_exact_sum(packed, metas, *, variant: str,
                                      bw: int, flags: int = 0):
    """Fused decode + EXACT-SUM partials for any f64 ALP variant
    (gen/small/mid/mid64/midc96): the variant's exact value computation
    plus the superaccumulator epilogue; [G, 16, 128] i32 rows out, no
    decoded-plane traffic.  engine.query_sum combines the windows with
    bignum arithmetic and rounds once — bit-identical to math.fsum."""
    G = metas[0].shape[0]
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    arrs = (packed,) + tuple(metas)
    if pad:
        arrs = tuple(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                     for a in arrs)
    Gp = G + pad
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_falp_f64_variant_exact_sum_kernel,
                          variant=variant, bw=bw, fl=flags,
                          n_meta=len(metas)),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(2 * bw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)]
        + [meta_spec] * len(metas),
        out_specs=pl.BlockSpec((gb, _SUM_ROWS, 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, _SUM_ROWS, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )((arrs[0] if bw else jnp.zeros((Gp, 1, 128), jnp.uint32)),
      *arrs[1:])
    return out[:G]


def _key_in_range_count(r: U64, klo_hi, klo_lo, khi_hi, khi_lo):
    """Per-lane count of decoded doubles whose IEEE-754 total-order key
    lies in [klo, khi] (engine semantics: -0.0 canonicalised to +0.0,
    exact integer compares — never emulated-f64).  Bounds arrive as
    [gb, 1, 128] u32 key limbs; returns [gb, 128] i32 counts."""
    negz = (r.hi == _U32(0x80000000)) & (r.lo == 0)
    hi = jnp.where(negz, _U32(0), r.hi)
    lo = jnp.where(negz, _U32(0), r.lo)
    sign = (hi >> _U32(31)) != 0
    khi_v = jnp.where(sign, ~hi, hi | _U32(0x80000000))
    klo_v = jnp.where(sign, ~lo, lo)

    def bias(x):
        return (x ^ _U32(0x80000000)).astype(jnp.int32)

    ah, al = bias(khi_v), bias(klo_v)

    def uge(bh, bl):                      # key >= (bh, bl)
        return (ah > bh) | ((ah == bh) & (al >= bl))

    def ule(bh, bl):                      # key <= (bh, bl)
        return (ah < bh) | ((ah == bh) & (al <= bl))

    in_range = uge(bias(klo_hi), bias(klo_lo)) & ule(bias(khi_hi),
                                                     bias(khi_lo))
    return in_range.astype(jnp.int32).sum(axis=1, dtype=jnp.int32)


def _variant_value_f64(variant, packed_ref, metas, shape, *, bw: int,
                       fl: int):
    """Decoded f64 bits (U64 planes) for a fast-variant bucket — the
    value computation of the corresponding plane kernel, shared by the
    fused-count epilogue (one source of truth per variant's math)."""
    if variant == "small":
        b, fa, fh, fl_, fb = (m[:][:, None, :] for m in metas)
        if bw == 0:
            n = jnp.broadcast_to(b, shape)
        else:
            n = _unpack_all(packed_ref, bw, 64, 2).lo + b
        return sf.i32fact_to_f64_times_normal(n, fa, fh, fl_, fb)
    if variant == "mid":
        b, c2, c1, c0, fb2 = (m[:][:, None, :] for m in metas)
        if bw == 0:
            n = jnp.broadcast_to(b, shape)
        else:
            n = _unpack_all(packed_ref, bw, 64, 2).lo + b
        ks = (fl >> 9) & 0x7F
        return sf.i32c96_to_f64(n, c2, c1, c0, fb2,
                                c0zero=bool(fl & 1), nonneg=bool(fl & 2),
                                cheap_msb=bool(fl & 4),
                                nozero=bool(fl & 8),
                                alo_zero=bool(fl & 16),
                                k_static=ks - 1 if ks else None)
    if variant == "mid64":
        base_lo, base_hi, c1, c0, fb2 = metas
        base = U64(base_hi[:][:, None, :], base_lo[:][:, None, :])
        n = _wide_n_or_mag(packed_ref, base, bw, shape, bool(fl & 32))
        cc1 = c1[:][:, None, :]
        cc0 = c0[:][:, None, :]
        fb = fb2[:][:, None, :]
        ks = (fl >> 9) & 0x7F
        kst = ks - 1 if ks else None
        if fl & 32:
            return sf.u64mag_c64_to_f64(n, 1, cc1, cc0, fb,
                                        maghi=bool(fl & 64), nozero=True,
                                        alo_zero=bool(fl & 128),
                                        k_static=kst)
        if fl & 2:
            return sf.u64mag_c64_to_f64(n, 0, cc1, cc0, fb,
                                        maghi=bool(fl & 64),
                                        nozero=bool(fl & 8),
                                        alo_zero=bool(fl & 128),
                                        k_static=kst)
        return sf.i64c64_to_f64(n, cc1, cc0, fb, nozero=bool(fl & 8),
                                alo_zero=bool(fl & 128), k_static=kst)
    if variant == "midc96":
        base_lo, base_hi, c2, c1, c0, fb2 = metas
        base = U64(base_hi[:][:, None, :], base_lo[:][:, None, :])
        n = _wide_n_or_mag(packed_ref, base, bw, shape, bool(fl & 32))
        cc2 = c2[:][:, None, :]
        cc1 = c1[:][:, None, :]
        cc0 = c0[:][:, None, :]
        fb = fb2[:][:, None, :]
        ks = (fl >> 9) & 0x7F
        kst = ks - 1 if ks else None
        if fl & 32:
            return sf.u64mag_c96_to_f64(n, 1, cc2, cc1, cc0, fb,
                                        maghi=bool(fl & 64), nozero=True,
                                        alo_zero=bool(fl & 128),
                                        k_static=kst)
        if fl & 2:
            return sf.u64mag_c96_to_f64(n, 0, cc2, cc1, cc0, fb,
                                        maghi=bool(fl & 64),
                                        nozero=bool(fl & 8),
                                        alo_zero=bool(fl & 128),
                                        k_static=kst)
        return sf.i64c96_to_f64(n, cc2, cc1, cc0, fb, nozero=bool(fl & 8),
                                alo_zero=bool(fl & 128), k_static=kst)
    raise ValueError(variant)


def _falp_f64_variant_count_kernel(packed_ref, *refs, variant: str,
                                   bw: int, fl: int, n_meta: int):
    metas = refs[:n_meta]
    klo_hi, klo_lo, khi_hi, khi_lo = refs[n_meta:n_meta + 4]
    out_cnt = refs[-1]
    shape = (out_cnt.shape[0], 64, 128)
    r = _variant_value_f64(variant, packed_ref, metas, shape, bw=bw,
                           fl=fl)
    out_cnt[:] = _key_in_range_count(
        r, klo_hi[:][:, None, :], klo_lo[:][:, None, :],
        khi_hi[:][:, None, :], khi_lo[:][:, None, :])


@functools.partial(jax.jit, static_argnames=("variant", "bw", "flags"))
def falp_decode_f64_variant_count(packed, metas, bounds, *, variant: str,
                                  bw: int, flags: int = 0):
    """Fused decode + predicate COUNT for any fast variant
    (small/mid/mid64/midc96): the variant's exact value computation plus
    the total-order-key range epilogue; [G, 128] i32 counts out."""
    G = metas[0].shape[0]
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    arrs = (packed,) + tuple(metas) + tuple(bounds)
    if pad:
        arrs = tuple(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                     for a in arrs)
    Gp = G + pad
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    n_meta = len(metas)
    out = pl.pallas_call(
        functools.partial(_falp_f64_variant_count_kernel, variant=variant,
                          bw=bw, fl=flags, n_meta=n_meta),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(2 * bw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)]
        + [meta_spec] * (n_meta + 4),
        out_specs=pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, 128), jnp.int32),
        interpret=_interpret(),
    )((arrs[0] if bw else jnp.zeros((Gp, 1, 128), jnp.uint32)),
      *arrs[1:])
    return out[:G]


def _falp_f64_variant_sum_kernel(packed_ref, *refs, variant: str,
                                 bw: int, fl: int, n_meta: int):
    metas = refs[:n_meta]
    out_sum = refs[-1]
    shape = (out_sum.shape[0], 64, 128)
    r = _variant_value_f64(variant, packed_ref, metas, shape, bw=bw,
                           fl=fl)
    out_sum[:] = _f64_bits_to_f32(r.hi, r.lo).sum(axis=1)


@functools.partial(jax.jit, static_argnames=("variant", "bw", "flags"))
def falp_decode_f64_variant_sum(packed, metas, *, variant: str, bw: int,
                                flags: int = 0):
    """Fused decode + per-lane partial SUM for any fast variant — a
    [G, 128] f32 checksum-grade reduction, no decoded-plane traffic
    (the q1 full-fusion shape; engine.query_sum is the exact API)."""
    G = metas[0].shape[0]
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    arrs = (packed,) + tuple(metas)
    if pad:
        arrs = tuple(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                     for a in arrs)
    Gp = G + pad
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_falp_f64_variant_sum_kernel, variant=variant,
                          bw=bw, fl=flags, n_meta=len(metas)),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(2 * bw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)]
        + [meta_spec] * len(metas),
        out_specs=pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, 128), jnp.float32),
        interpret=_interpret(),
    )((arrs[0] if bw else jnp.zeros((Gp, 1, 128), jnp.uint32)),
      *arrs[1:])
    return out[:G]


def _any_variant_value_f64(variant, packed_ref, metas, shape, *, bw: int,
                           fl: int) -> U64:
    """Decoded f64 bits for ANY ALP variant including the generic one —
    the dispatch shared by every fused epilogue (exact-sum / count /
    key-max / prefix-counts) so each epilogue is written once."""
    if variant == "gen":
        return _gen_value_f64(packed_ref, *metas, bw=bw,
                              fact1=bool(fl & 16))
    return _variant_value_f64(variant, packed_ref, metas, shape, bw=bw,
                              fl=fl)


def _key_words_f64(r: U64, invert: bool):
    """Biased-signed i32 words (hi, lo) of the IEEE-754 total-order key
    of decoded f64 bits (-0.0 canonicalised, engine._key_from_limbs
    semantics).  ``invert`` complements the key first: smallest-k /
    reversed-order consumers run on the complement so every comparison
    stays a native signed-i32 max/compare."""
    negz = (r.hi == _U32(0x80000000)) & (r.lo == 0)
    hi = jnp.where(negz, _U32(0), r.hi)
    lo = jnp.where(negz, _U32(0), r.lo)
    sign = (hi >> _U32(31)) != 0
    kh = jnp.where(sign, ~hi, hi | _U32(0x80000000))
    kl = jnp.where(sign, ~lo, lo)
    if invert:
        kh = ~kh
        kl = ~kl
    return _bias_i32(kh), _bias_i32(kl)


def _bias_i32(x):
    """Monotone signed reinterpretation of a u32 key word (the form the
    native i32 vector max / compare consume)."""
    return (x ^ _U32(0x80000000)).astype(jnp.int32)


_I32_MIN = -(2 ** 31)


def _keymax_rows(ah, al, out_h, out_l):
    """Per-lane lexicographic max of (hi, lo) biased key words over the
    slot axis: [gb, S, 128] -> two [gb, 128] i32 rows (the max hi word
    and the max lo word among slots achieving it)."""
    mh = jnp.max(ah, axis=1)
    ml = jnp.max(jnp.where(ah == mh[:, None, :], al,
                           jnp.int32(_I32_MIN)), axis=1)
    out_h[:] = mh
    out_l[:] = ml


def _prefix_count_rows(ah, al, th_ref, tl_ref, out_ref, n_thr: int):
    """Multi-threshold prefix-count epilogue: for each of ``n_thr``
    thresholds (u32 working-order key words in [E_pad, 128] planes,
    lane-replicated), the per-lane count of values whose key is <= the
    threshold — every threshold in ONE fused scan (the histogram /
    TOP-K verify shape), ~5 VPU ops per value per threshold."""
    th = _bias_i32(th_ref[:])
    tl = _bias_i32(tl_ref[:])
    zero = jnp.zeros((out_ref.shape[0], 128), jnp.int32)
    for e in range(out_ref.shape[1]):
        if e < n_thr:
            bh = th[e, :][None, None, :]
            bl = tl[e, :][None, None, :]
            le = (ah < bh) | ((ah == bh) & (al <= bl))
            out_ref[:, e, :] = le.astype(jnp.int32).sum(axis=1,
                                                        dtype=jnp.int32)
        else:
            out_ref[:, e, :] = zero


def _falp_f64_variant_keymax_kernel(packed_ref, *refs, variant: str,
                                    bw: int, fl: int, n_meta: int,
                                    invert: bool):
    metas = refs[:n_meta]
    out_h, out_l = refs[-2], refs[-1]
    shape = (out_h.shape[0], 64, 128)
    r = _any_variant_value_f64(variant, packed_ref, metas, shape, bw=bw,
                               fl=fl)
    ah, al = _key_words_f64(r, invert)
    _keymax_rows(ah, al, out_h, out_l)


@functools.partial(jax.jit, static_argnames=("variant", "bw", "flags",
                                             "invert"))
def falp_decode_f64_variant_keymax(packed, metas, *, variant: str,
                                   bw: int, flags: int = 0,
                                   invert: bool = False):
    """Fused decode + per-lane-column KEY MAX for any f64 ALP variant
    (gen/small/mid/mid64/midc96): two [G, 128] i32 planes (biased hi /
    lo total-order key words of each lane column's lexicographic max) —
    the TOP-K threshold pass (engine.query_topk), no decoded-plane
    traffic.  ``invert`` reverses the order for smallest-k."""
    G = metas[0].shape[0]
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    arrs = (packed,) + tuple(metas)
    if pad:
        arrs = tuple(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                     for a in arrs)
    Gp = G + pad
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_falp_f64_variant_keymax_kernel, variant=variant,
                          bw=bw, fl=flags, n_meta=len(metas),
                          invert=invert),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(2 * bw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)]
        + [meta_spec] * len(metas),
        out_specs=[pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((Gp, 128), jnp.int32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )((arrs[0] if bw else jnp.zeros((Gp, 1, 128), jnp.uint32)),
      *arrs[1:])
    return out[0][:G], out[1][:G]


def _falp_f64_variant_prefix_kernel(packed_ref, *refs, variant: str,
                                    bw: int, fl: int, n_meta: int,
                                    invert: bool, n_thr: int):
    metas = refs[:n_meta]
    th_ref, tl_ref = refs[n_meta:n_meta + 2]
    out_ref = refs[-1]
    shape = (out_ref.shape[0], 64, 128)
    r = _any_variant_value_f64(variant, packed_ref, metas, shape, bw=bw,
                               fl=fl)
    ah, al = _key_words_f64(r, invert)
    _prefix_count_rows(ah, al, th_ref, tl_ref, out_ref, n_thr)


@functools.partial(jax.jit, static_argnames=("variant", "bw", "flags",
                                             "invert", "n_thr"))
def falp_decode_f64_variant_prefix_counts(packed, metas, thr_hi, thr_lo,
                                          *, variant: str, bw: int,
                                          flags: int = 0,
                                          invert: bool = False,
                                          n_thr: int):
    """Fused decode + MULTI-THRESHOLD prefix COUNT for any f64 ALP
    variant: counts of ``key <= thr_e`` for every threshold in ONE fused
    scan (one kernel launch per bucket per query — the histogram and
    TOP-K tie-count shape).  ``thr_hi``/``thr_lo``: [E_pad, 128] u32
    working-order key words (lane-replicated; E_pad a multiple of 8,
    rows >= n_thr ignored).  Returns [G, E_pad, 128] i32 counts."""
    G = metas[0].shape[0]
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    arrs = (packed,) + tuple(metas)
    if pad:
        arrs = tuple(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                     for a in arrs)
    Gp = G + pad
    E_pad = thr_hi.shape[0]
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    thr_spec = pl.BlockSpec((E_pad, 128), lambda i: (i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_falp_f64_variant_prefix_kernel, variant=variant,
                          bw=bw, fl=flags, n_meta=len(metas),
                          invert=invert, n_thr=n_thr),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(2 * bw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)]
        + [meta_spec] * len(metas) + [thr_spec] * 2,
        out_specs=pl.BlockSpec((gb, E_pad, 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, E_pad, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )((arrs[0] if bw else jnp.zeros((Gp, 1, 128), jnp.uint32)),
      *arrs[1:], thr_hi, thr_lo)
    return out[:G]


def _gen_value_f64(packed_ref, bf_lo, bf_hi, fact_lo, fact_hi, frac_lo,
                   frac_hi, *, bw: int, fact1: bool) -> U64:
    """Decoded f64 bits of the GENERIC variant (two-rounding softfloat,
    reference src/falp.cpp semantics) — the ONE value computation shared
    by the plane, fused-count and fused-exact-sum kernels."""
    basefact = U64(bf_hi[:][:, None, :], bf_lo[:][:, None, :])
    fact = U64(fact_hi[:][:, None, :], fact_lo[:][:, None, :])
    fr_hi = frac_hi[:][:, None, :]
    fsig = U64((fr_hi & _U32(0xFFFFF)) | _U32(1 << 20),
               frac_lo[:][:, None, :])
    f_biased = (fr_hi >> _U32(20)) & _U32(0x7FF)
    if bw == 0:
        shape = (bf_lo.shape[0], 64, 128)
        m = U64(jnp.broadcast_to(basefact.hi, shape),
                jnp.broadcast_to(basefact.lo, shape))
    else:
        u = _unpack_all(packed_ref, bw, 64, 2)
        if fact1:
            prod = u
        elif bw <= 32:
            p = sf.umul32_wide(u.lo, fact.lo)
            prod = U64(p.hi + u.lo * fact.hi, p.lo)
        else:
            prod = sf.mul64_low(u, fact)
        m = _u64_add(prod, basefact)
    return sf.i64_to_f64_times_normal(m, fsig, f_biased)


def _falp_f64_gen_count_kernel(packed_ref, bf_lo, bf_hi, fact_lo,
                               fact_hi, frac_lo, frac_hi, klo_hi, klo_lo,
                               khi_hi, khi_lo, out_cnt, *, bw: int,
                               fact1: bool):
    r = _gen_value_f64(packed_ref, bf_lo, bf_hi, fact_lo, fact_hi,
                       frac_lo, frac_hi, bw=bw, fact1=fact1)
    out_cnt[:] = _key_in_range_count(
        r, klo_hi[:][:, None, :], klo_lo[:][:, None, :],
        khi_hi[:][:, None, :], khi_lo[:][:, None, :])


@functools.partial(jax.jit, static_argnames=("bw", "fact1"))
def falp_decode_f64_count(packed, bf_lo, bf_hi, fact_lo, fact_hi,
                          frac_lo, frac_hi, klo_hi, klo_lo, khi_hi,
                          khi_lo, *, bw: int, fact1: bool = False):
    """Fused generic-variant decode + predicate COUNT (any bit width)."""
    G = bf_lo.shape[0]
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    if pad:
        (packed, bf_lo, bf_hi, fact_lo, fact_hi, frac_lo, frac_hi,
         klo_hi, klo_lo, khi_hi, khi_lo) = (
            jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            for a in (packed, bf_lo, bf_hi, fact_lo, fact_hi, frac_lo,
                      frac_hi, klo_hi, klo_lo, khi_hi, khi_lo))
    Gp = G + pad
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_falp_f64_gen_count_kernel, bw=bw, fact1=fact1),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(2 * bw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)] + [meta_spec] * 10,
        out_specs=pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, 128), jnp.int32),
        interpret=_interpret(),
    )(packed if bw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      bf_lo, bf_hi, fact_lo, fact_hi, frac_lo, frac_hi,
      klo_hi, klo_lo, khi_hi, khi_lo)
    return out[:G]


@functools.partial(jax.jit, static_argnames=("bw",))
def falp_decode_f64_small(packed, base, fact, fsig_hi, fsig_lo, fbias, *,
                          bw: int):
    """Fused falp decode, small-magnitude variant (bw <= 32, |m| < 2^32).

    Metadata planes are per-vector lane-expanded u32: ``base`` (int32
    FOR base), ``fact`` (FACT_ARR[fac], < 2^32 whenever any m != 0),
    ``fsig_hi``/``fsig_lo`` (53-bit FRAC significand, implicit bit set)
    and ``fbias`` (FRAC biased exponent).  Bit-exact vs the reference
    two-step decode on its domain (see softfloat.i32fact_to_f64_times_
    normal); the plan builder routes only vectors whose FFOR bounds
    prove the domain.
    """
    G = packed.shape[0]
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    if pad:
        packed, base, fact, fsig_hi, fsig_lo, fbias = (
            jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            for a in (packed, base, fact, fsig_hi, fsig_lo, fbias))
    Gp = G + pad
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_falp_f64_small_kernel, bw=bw),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(2 * bw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)] + [meta_spec] * 5,
        out_specs=[pl.BlockSpec((gb, 64, 128), lambda i: (i, i * 0, i * 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((Gp, 64, 128), jnp.uint32)] * 2,
        interpret=_interpret(),
    )(packed if bw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      base, fact, fsig_hi, fsig_lo, fbias)
    return out[0][:G], out[1][:G]


# ---------------------------------------------------------------------------
# Fused falp decode, floats — all-native i32/f32 (src/falp.cpp:33762 analog)
# ---------------------------------------------------------------------------

def _f32_key(bits):
    """IEEE-754 total-order u32 key of f32 bit patterns, -0.0
    canonicalised (the f32 twin of _key_in_range_count's key)."""
    b = jnp.where(bits == _U32(1 << 31), _U32(0), bits)
    sign = (b >> _U32(31)) != 0
    return jnp.where(sign, ~b, b | _U32(1 << 31))


def _f32_decode_bits(packed_ref, base, fact, frac, shape, *, bw: int):
    """The f32 fused decode value computation (wrapping i32 multiply,
    correctly-rounded i32->f32 convert, IEEE f32 multiply) — the ONE
    source shared by the plane and fused-count kernels."""
    b = base[:][:, None, :].astype(jnp.int32)
    fa = fact[:][:, None, :].astype(jnp.int32)
    fr = frac[:][:, None, :]
    if bw == 0:
        ints = jnp.broadcast_to(b, shape)
    else:
        ints = _unpack_all(packed_ref, bw, 32, 1).lo.astype(jnp.int32) + b
    return ((ints * fa).astype(jnp.float32) * fr).view(_U32)


def _falp_f32_count_kernel(packed_ref, base, fact, frac, klo, khi,
                           out_cnt, *, bw: int):
    bits = _f32_decode_bits(packed_ref, base, fact, frac,
                            (out_cnt.shape[0], 32, 128), bw=bw)
    key = _f32_key(bits)

    def bias(x):
        return (x ^ _U32(0x80000000)).astype(jnp.int32)

    in_range = ((bias(key) >= bias(klo[:][:, None, :]))
                & (bias(key) <= bias(khi[:][:, None, :])))
    out_cnt[:] = in_range.astype(jnp.int32).sum(axis=1, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("bw",))
def falp_decode_f32_count(packed, base, fact, frac_bits, klo, khi, *,
                          bw: int):
    """Fused f32 decode + predicate COUNT: [G, 128] i32 counts out
    (bounds as lane-expanded u32 total-order keys)."""
    G = base.shape[0]
    gb = min(_BLOCK_GROUPS_F32, max(G, 1))
    pad = (-G) % gb
    arrs = (packed, base, fact, frac_bits.view(jnp.float32), klo, khi)
    if pad:
        arrs = tuple(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                     for a in arrs)
    Gp = G + pad
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_falp_f32_count_kernel, bw=bw),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(bw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)] + [meta_spec] * 5,
        out_specs=pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, 128), jnp.int32),
        interpret=_interpret(),
    )((arrs[0] if bw else jnp.zeros((Gp, 1, 128), jnp.uint32)),
      *arrs[1:])
    return out[:G]


def _falp_f32_kernel(packed_ref, base, fact, frac, out, *, bw: int):
    out[:] = _f32_decode_bits(packed_ref, base, fact, frac, out.shape,
                              bw=bw)


@functools.partial(jax.jit, static_argnames=("bw",))
def falp_decode_f32(packed, base, fact, frac_bits, *, bw: int):
    """Float fused decode on [G, bw, 128] tiles -> [G, 32, 128] f32 bits.

    Entirely native TPU arithmetic: wrapping i32 multiply, correctly-rounded
    i32->f32 convert, IEEE f32 multiply.
    """
    G = packed.shape[0]
    gb = min(_BLOCK_GROUPS_F32, max(G, 1))
    pad = (-G) % gb
    if pad:
        packed, base, fact, frac_bits = (
            jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            for a in (packed, base, fact, frac_bits))
    Gp = G + pad
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_falp_f32_kernel, bw=bw),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(bw, 1), 128), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
                  meta_spec, meta_spec,
                  pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((gb, 32, 128), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, 32, 128), jnp.uint32),
        interpret=_interpret(),
    )(packed if bw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      base, fact, frac_bits.view(jnp.float32))
    return out[:G]


# ---------------------------------------------------------------------------
# Fused ALP_RD decode (reference include/alp/rd.hpp:152-178)
# ---------------------------------------------------------------------------

def _rd_f64_kernel(right_ref, left_ref, out_hi, out_lo, *, rbw: int):
    # left_ref holds dictionary-resolved raw left parts (<=16 bits) per
    # slot; cut <= 16 means rbw >= 48, so the left part lands entirely in
    # the high limb: glue = (left << (rbw - 32)) | right.hi.
    right = _unpack_all(right_ref, rbw, 64, 2) if rbw else None
    left = left_ref[:]
    if rbw == 0:
        out_hi[:] = left << _U32(32)  # degenerate, never happens (rbw>=48)
        out_lo[:] = jnp.zeros_like(left)
        return
    out_hi[:] = right.hi | (left << _U32(rbw - 32))
    out_lo[:] = right.lo


@functools.partial(jax.jit, static_argnames=("rbw",))
def rd_decode_f64(right_packed, left_resolved, *, rbw: int):
    """Fused ALP_RD double decode: unFFOR the right parts and OR in the
    (already dictionary-resolved, exception-patched) left parts.

    right_packed: [G, 2*rbw, 128] u32 tiles; left_resolved: [G, 64, 128]
    u32 raw left bit patterns in tile value order.  Returns (hi, lo) f64
    bit planes [G, 64, 128].
    """
    G = right_packed.shape[0]
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    if pad:
        right_packed, left_resolved = (
            jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            for a in (right_packed, left_resolved))
    Gp = G + pad
    out = pl.pallas_call(
        functools.partial(_rd_f64_kernel, rbw=rbw),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(2 * rbw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((gb, 64, 128), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((gb, 64, 128), lambda i: (i, i * 0, i * 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((Gp, 64, 128), jnp.uint32)] * 2,
        interpret=_interpret(),
    )(right_packed if rbw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      left_resolved)
    return out[0][:G], out[1][:G]


def _rd_dict_lookup(idx, planes, lbw: int):
    """3-level binary select tree resolving packed dictionary indexes
    against 8 lane-expanded [gb, 1, 128] dict planes (rd.hpp:152-178 with
    the dictionary resolved on device).  lbw <= 3 by format (dict <= 8)."""
    if lbw == 0:
        return planes[0]
    b0 = (idx & _U32(1)) == 1
    s01 = jnp.where(b0, planes[1], planes[0])
    if lbw == 1:
        return s01
    b1 = (idx & _U32(2)) != 0
    s23 = jnp.where(b0, planes[3], planes[2])
    s0123 = jnp.where(b1, s23, s01)
    if lbw == 2:
        return s0123
    s45 = jnp.where(b0, planes[5], planes[4])
    s67 = jnp.where(b0, planes[7], planes[6])
    s4567 = jnp.where(b1, s67, s45)
    return jnp.where((idx & _U32(4)) != 0, s4567, s0123)


def _rd_dict_value_f64(right_ref, left_ref, dict_refs, *, rbw: int,
                       lbw: int) -> U64:
    """Decoded f64 bits for the dictionary-on-device RD path — the ONE
    value computation shared by the plane kernel and the fused-count
    epilogue.  Exception positions decode garbage (their index wrapped
    at pack time, as in the reference) and are patched / corrected by
    the caller."""
    right = _unpack_all(right_ref, rbw, 64, 2)
    idx = _unpack_all(left_ref, lbw, 64, 2).lo if lbw else None
    planes = [d[:][:, None, :] for d in dict_refs]
    left = _rd_dict_lookup(idx, planes, lbw)
    return U64(right.hi | (left << _U32(rbw - 32)), right.lo)


def _rd_dict_f64_kernel(right_ref, left_ref, d0, d1, d2, d3, d4, d5, d6,
                        d7, out_hi, out_lo, *, rbw: int, lbw: int):
    # left_ref: dictionary INDEXES packed at lbw bits in u64-lane geometry;
    # the 8-entry rowgroup dictionary arrives as per-lane planes.
    r = _rd_dict_value_f64(right_ref, left_ref,
                           (d0, d1, d2, d3, d4, d5, d6, d7),
                           rbw=rbw, lbw=lbw)
    out_hi[:] = r.hi
    out_lo[:] = r.lo


@functools.partial(jax.jit, static_argnames=("rbw", "lbw"))
def rd_decode_dict_f64(right_packed, left_packed, dict_planes, *,
                       rbw: int, lbw: int):
    """Fused ALP_RD double decode with on-device dictionary lookup.

    right_packed: [G, 2*rbw, 128]; left_packed: [G, 2*lbw, 128] (indexes
    at lbw bits, u64-lane geometry); dict_planes: 8 x [G, 128] u32 (the
    rowgroup dictionary lane-expanded, padded with entry 0).
    """
    G = right_packed.shape[0]
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    arrs = (right_packed, left_packed) + tuple(dict_planes)
    if pad:
        arrs = tuple(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                     for a in arrs)
    Gp = G + pad
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_rd_dict_f64_kernel, rbw=rbw, lbw=lbw),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(2 * rbw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((gb, max(2 * lbw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)] + [meta_spec] * 8,
        out_specs=[pl.BlockSpec((gb, 64, 128), lambda i: (i, i * 0, i * 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((Gp, 64, 128), jnp.uint32)] * 2,
        interpret=_interpret(),
    )(arrs[0] if rbw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      arrs[1] if lbw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      *arrs[2:])
    return out[0][:G], out[1][:G]


def _rd_dict_value_f32(right_ref, left_ref, dict_refs, shape, *, rbw: int,
                       lbw: int):
    """f32 twin of :func:`_rd_dict_value_f64`: indexes packed at lbw bits
    in u32-lane geometry; returns [gb, 32, 128] f32 bit patterns."""
    right = _unpack_all(right_ref, rbw, 32, 1).lo if rbw else None
    idx = _unpack_all(left_ref, lbw, 32, 1).lo if lbw else None
    planes = [d[:][:, None, :] for d in dict_refs]
    left = _rd_dict_lookup(idx, planes, lbw)
    if rbw == 0:
        return jnp.broadcast_to(left, shape)
    return right | (left << _U32(rbw))


def _rd_dict_f32_kernel(right_ref, left_ref, d0, d1, d2, d3, d4, d5, d6,
                        d7, out, *, rbw: int, lbw: int):
    # float variant of _rd_dict_f64_kernel; exception positions decode
    # garbage and are patched by the caller's output scatter.
    out[:] = _rd_dict_value_f32(right_ref, left_ref,
                                (d0, d1, d2, d3, d4, d5, d6, d7),
                                out.shape, rbw=rbw, lbw=lbw)


@functools.partial(jax.jit, static_argnames=("rbw", "lbw"))
def rd_decode_dict_f32(right_packed, left_packed, dict_planes, *,
                       rbw: int, lbw: int):
    """Fused ALP_RD float decode with on-device dictionary lookup.

    right_packed: [G, rbw, 128]; left_packed: [G, lbw, 128] (indexes at
    lbw bits, u32-lane geometry); dict_planes: 8 x [G, 128] u32 planes.
    Returns [G, 32, 128] f32 bit planes.
    """
    G = right_packed.shape[0]
    gb = min(_BLOCK_GROUPS_F32, max(G, 1))
    pad = (-G) % gb
    arrs = (right_packed, left_packed) + tuple(dict_planes)
    if pad:
        arrs = tuple(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                     for a in arrs)
    Gp = G + pad
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_rd_dict_f32_kernel, rbw=rbw, lbw=lbw),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(rbw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((gb, max(lbw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)] + [meta_spec] * 8,
        out_specs=pl.BlockSpec((gb, 32, 128), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, 32, 128), jnp.uint32),
        interpret=_interpret(),
    )(arrs[0] if rbw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      arrs[1] if lbw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      *arrs[2:])
    return out[:G]


def _rd_dict_f64_count_kernel(right_ref, left_ref, d0, d1, d2, d3, d4, d5,
                              d6, d7, klo_hi, klo_lo, khi_hi, khi_lo,
                              out_cnt, *, rbw: int, lbw: int):
    r = _rd_dict_value_f64(right_ref, left_ref,
                           (d0, d1, d2, d3, d4, d5, d6, d7),
                           rbw=rbw, lbw=lbw)
    out_cnt[:] = _key_in_range_count(
        r, klo_hi[:][:, None, :], klo_lo[:][:, None, :],
        khi_hi[:][:, None, :], khi_lo[:][:, None, :])


@functools.partial(jax.jit, static_argnames=("rbw", "lbw"))
def rd_decode_dict_f64_count(right_packed, left_packed, dict_planes,
                             bounds, *, rbw: int, lbw: int):
    """Fused ALP_RD f64 decode + predicate COUNT: the dictionary-on-
    device value computation plus the total-order-key range epilogue;
    [G, 128] i32 counts out.  Exception slots count the GARBAGE decoded
    value (wrapped index) — the engine corrects them exactly host-side,
    as for the ALP variants."""
    G = right_packed.shape[0]
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    arrs = (right_packed, left_packed) + tuple(dict_planes) + tuple(bounds)
    if pad:
        arrs = tuple(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                     for a in arrs)
    Gp = G + pad
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_rd_dict_f64_count_kernel, rbw=rbw, lbw=lbw),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(2 * rbw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((gb, max(2 * lbw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)] + [meta_spec] * 12,
        out_specs=pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, 128), jnp.int32),
        interpret=_interpret(),
    )(arrs[0] if rbw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      arrs[1] if lbw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      *arrs[2:])
    return out[:G]


def _rd_dict_f64_keymax_kernel(right_ref, left_ref, d0, d1, d2, d3, d4,
                               d5, d6, d7, out_h, out_l, *, rbw: int,
                               lbw: int, invert: bool):
    r = _rd_dict_value_f64(right_ref, left_ref,
                           (d0, d1, d2, d3, d4, d5, d6, d7),
                           rbw=rbw, lbw=lbw)
    ah, al = _key_words_f64(r, invert)
    _keymax_rows(ah, al, out_h, out_l)


@functools.partial(jax.jit, static_argnames=("rbw", "lbw", "invert"))
def rd_decode_dict_f64_keymax(right_packed, left_packed, dict_planes, *,
                              rbw: int, lbw: int, invert: bool = False):
    """Fused ALP_RD f64 decode + per-lane-column KEY MAX (the TOP-K
    threshold pass; exception slots contribute their GARBAGE decoded
    value — the engine's candidate decode drops exception positions and
    its exact tie counts are corrected host-side)."""
    G = right_packed.shape[0]
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    arrs = (right_packed, left_packed) + tuple(dict_planes)
    if pad:
        arrs = tuple(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                     for a in arrs)
    Gp = G + pad
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_rd_dict_f64_keymax_kernel, rbw=rbw, lbw=lbw,
                          invert=invert),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(2 * rbw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((gb, max(2 * lbw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)] + [meta_spec] * 8,
        out_specs=[pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((Gp, 128), jnp.int32)] * 2,
        interpret=_interpret(),
    )(arrs[0] if rbw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      arrs[1] if lbw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      *arrs[2:])
    return out[0][:G], out[1][:G]


def _rd_dict_f64_prefix_kernel(right_ref, left_ref, d0, d1, d2, d3, d4,
                               d5, d6, d7, th_ref, tl_ref, out_ref, *,
                               rbw: int, lbw: int, invert: bool,
                               n_thr: int):
    r = _rd_dict_value_f64(right_ref, left_ref,
                           (d0, d1, d2, d3, d4, d5, d6, d7),
                           rbw=rbw, lbw=lbw)
    ah, al = _key_words_f64(r, invert)
    _prefix_count_rows(ah, al, th_ref, tl_ref, out_ref, n_thr)


@functools.partial(jax.jit, static_argnames=("rbw", "lbw", "invert",
                                             "n_thr"))
def rd_decode_dict_f64_prefix_counts(right_packed, left_packed,
                                     dict_planes, thr_hi, thr_lo, *,
                                     rbw: int, lbw: int,
                                     invert: bool = False, n_thr: int):
    """Fused ALP_RD f64 decode + multi-threshold prefix COUNT
    ([G, E_pad, 128] i32; falp_decode_f64_variant_prefix_counts
    semantics with the on-device dictionary)."""
    G = right_packed.shape[0]
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    arrs = (right_packed, left_packed) + tuple(dict_planes)
    if pad:
        arrs = tuple(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                     for a in arrs)
    Gp = G + pad
    E_pad = thr_hi.shape[0]
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    thr_spec = pl.BlockSpec((E_pad, 128), lambda i: (i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_rd_dict_f64_prefix_kernel, rbw=rbw, lbw=lbw,
                          invert=invert, n_thr=n_thr),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(2 * rbw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((gb, max(2 * lbw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)]
        + [meta_spec] * 8 + [thr_spec] * 2,
        out_specs=pl.BlockSpec((gb, E_pad, 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, E_pad, 128), jnp.int32),
        interpret=_interpret(),
    )(arrs[0] if rbw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      arrs[1] if lbw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      *arrs[2:], thr_hi, thr_lo)
    return out[:G]


def _f32_key_biased(bits, invert: bool):
    """Biased-signed i32 total-order key of f32 bit patterns (-0.0
    canonicalised; complemented first when ``invert``)."""
    key = _f32_key(bits)
    if invert:
        key = ~key
    return _bias_i32(key)


def _keymax_rows_f32(ak, out_ref):
    out_ref[:] = jnp.max(ak, axis=1)


def _prefix_count_rows_f32(ak, t_ref, out_ref, n_thr: int):
    t = _bias_i32(t_ref[:])
    zero = jnp.zeros((out_ref.shape[0], 128), jnp.int32)
    for e in range(out_ref.shape[1]):
        if e < n_thr:
            le = ak <= t[e, :][None, None, :]
            out_ref[:, e, :] = le.astype(jnp.int32).sum(axis=1,
                                                        dtype=jnp.int32)
        else:
            out_ref[:, e, :] = zero


def _falp_f32_keymax_kernel(packed_ref, base, fact, frac, out_ref, *,
                            bw: int, invert: bool):
    bits = _f32_decode_bits(packed_ref, base, fact, frac,
                            (out_ref.shape[0], 32, 128), bw=bw)
    _keymax_rows_f32(_f32_key_biased(bits, invert), out_ref)


@functools.partial(jax.jit, static_argnames=("bw", "invert"))
def falp_decode_f32_keymax(packed, base, fact, frac_bits, *, bw: int,
                           invert: bool = False):
    """Fused f32 decode + per-lane-column KEY MAX: one [G, 128] i32
    plane (biased total-order key of each lane column's max)."""
    G = base.shape[0]
    gb = min(_BLOCK_GROUPS_F32, max(G, 1))
    pad = (-G) % gb
    arrs = (packed, base, fact, frac_bits.view(jnp.float32))
    if pad:
        arrs = tuple(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                     for a in arrs)
    Gp = G + pad
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_falp_f32_keymax_kernel, bw=bw, invert=invert),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(bw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)] + [meta_spec] * 3,
        out_specs=pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, 128), jnp.int32),
        interpret=_interpret(),
    )((arrs[0] if bw else jnp.zeros((Gp, 1, 128), jnp.uint32)),
      *arrs[1:])
    return out[:G]


def _falp_f32_prefix_kernel(packed_ref, base, fact, frac, t_ref, out_ref,
                            *, bw: int, invert: bool, n_thr: int):
    bits = _f32_decode_bits(packed_ref, base, fact, frac,
                            (out_ref.shape[0], 32, 128), bw=bw)
    _prefix_count_rows_f32(_f32_key_biased(bits, invert), t_ref, out_ref,
                           n_thr)


@functools.partial(jax.jit, static_argnames=("bw", "invert", "n_thr"))
def falp_decode_f32_prefix_counts(packed, base, fact, frac_bits, thr, *,
                                  bw: int, invert: bool = False,
                                  n_thr: int):
    """Fused f32 decode + multi-threshold prefix COUNT ([G, E_pad, 128]
    i32 counts of ``key <= thr_e``; ``thr``: [E_pad, 128] u32 keys)."""
    G = base.shape[0]
    gb = min(_BLOCK_GROUPS_F32, max(G, 1))
    pad = (-G) % gb
    arrs = (packed, base, fact, frac_bits.view(jnp.float32))
    if pad:
        arrs = tuple(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                     for a in arrs)
    Gp = G + pad
    E_pad = thr.shape[0]
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    thr_spec = pl.BlockSpec((E_pad, 128), lambda i: (i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_falp_f32_prefix_kernel, bw=bw, invert=invert,
                          n_thr=n_thr),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(bw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)]
        + [meta_spec] * 3 + [thr_spec],
        out_specs=pl.BlockSpec((gb, E_pad, 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, E_pad, 128), jnp.int32),
        interpret=_interpret(),
    )((arrs[0] if bw else jnp.zeros((Gp, 1, 128), jnp.uint32)),
      *arrs[1:], thr)
    return out[:G]


def _rd_dict_f32_keymax_kernel(right_ref, left_ref, d0, d1, d2, d3, d4,
                               d5, d6, d7, out_ref, *, rbw: int, lbw: int,
                               invert: bool):
    bits = _rd_dict_value_f32(right_ref, left_ref,
                              (d0, d1, d2, d3, d4, d5, d6, d7),
                              (out_ref.shape[0], 32, 128), rbw=rbw,
                              lbw=lbw)
    _keymax_rows_f32(_f32_key_biased(bits, invert), out_ref)


@functools.partial(jax.jit, static_argnames=("rbw", "lbw", "invert"))
def rd_decode_dict_f32_keymax(right_packed, left_packed, dict_planes, *,
                              rbw: int, lbw: int, invert: bool = False):
    """Fused ALP_RD f32 decode + per-lane-column KEY MAX ([G, 128] i32)."""
    G = right_packed.shape[0]
    gb = min(_BLOCK_GROUPS_F32, max(G, 1))
    pad = (-G) % gb
    arrs = (right_packed, left_packed) + tuple(dict_planes)
    if pad:
        arrs = tuple(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                     for a in arrs)
    Gp = G + pad
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_rd_dict_f32_keymax_kernel, rbw=rbw, lbw=lbw,
                          invert=invert),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(rbw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((gb, max(lbw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)] + [meta_spec] * 8,
        out_specs=pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, 128), jnp.int32),
        interpret=_interpret(),
    )(arrs[0] if rbw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      arrs[1] if lbw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      *arrs[2:])
    return out[:G]


def _rd_dict_f32_prefix_kernel(right_ref, left_ref, d0, d1, d2, d3, d4,
                               d5, d6, d7, t_ref, out_ref, *, rbw: int,
                               lbw: int, invert: bool, n_thr: int):
    bits = _rd_dict_value_f32(right_ref, left_ref,
                              (d0, d1, d2, d3, d4, d5, d6, d7),
                              (out_ref.shape[0], 32, 128), rbw=rbw,
                              lbw=lbw)
    _prefix_count_rows_f32(_f32_key_biased(bits, invert), t_ref, out_ref,
                           n_thr)


@functools.partial(jax.jit, static_argnames=("rbw", "lbw", "invert",
                                             "n_thr"))
def rd_decode_dict_f32_prefix_counts(right_packed, left_packed,
                                     dict_planes, thr, *, rbw: int,
                                     lbw: int, invert: bool = False,
                                     n_thr: int):
    """Fused ALP_RD f32 decode + multi-threshold prefix COUNT."""
    G = right_packed.shape[0]
    gb = min(_BLOCK_GROUPS_F32, max(G, 1))
    pad = (-G) % gb
    arrs = (right_packed, left_packed) + tuple(dict_planes)
    if pad:
        arrs = tuple(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                     for a in arrs)
    Gp = G + pad
    E_pad = thr.shape[0]
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    thr_spec = pl.BlockSpec((E_pad, 128), lambda i: (i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_rd_dict_f32_prefix_kernel, rbw=rbw, lbw=lbw,
                          invert=invert, n_thr=n_thr),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(rbw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((gb, max(lbw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)]
        + [meta_spec] * 8 + [thr_spec],
        out_specs=pl.BlockSpec((gb, E_pad, 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, E_pad, 128), jnp.int32),
        interpret=_interpret(),
    )(arrs[0] if rbw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      arrs[1] if lbw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      *arrs[2:], thr)
    return out[:G]


# ---------------------------------------------------------------------------
# RANK-PASS epilogue: one fused scan returning BOTH multi-threshold prefix
# counts AND per-rank bracketed key extremes.  This is the body of the
# single-dispatch quantile/median bisection (engine._select_rank_keys_device):
# each while_loop iteration narrows every rank's bracket with the probe
# counts, then SNAPS it to [min key in bracket, max key in bracket] — on
# decimal-quantized data (everything ALP classic compresses) the snap
# collapses the bracket to the actual value lattice, converging in ~3-6
# passes instead of log_B(2^64).  The reference has no rank selection at
# all (its e2e query set stops at SCAN/SUM aggregates,
# publication/source_code/bench_end_to_end/include/benchmarks/alp/
# config.hpp:16-92); this is the repo's own "queries at TPU speed" breadth.
#
# Soundness of the snap under unpatched exception slots (the kernels see
# FILL values where exceptions live, and GARBAGE for RD): extra or wrong
# keys in the kernel multiset only ever WIDEN the computed [min, max]
# envelope union (the engine lexicographically combines it with the
# column's true exception keys), so the true r-th key always stays inside
# the snapped bracket; garbage can only weaken the snap, never break it.
# ---------------------------------------------------------------------------

_I32_MAX = 2 ** 31 - 1


def _bracket_minmax_rows(ah, al, br_ref, out_ref, n_rank: int):
    """Per-rank bracketed key extremes: for rank r with bracket key
    words in ``br_ref`` rows [4r..4r+3] = (lo_hi, lo_lo, hi_hi, hi_lo)
    (u32 working-order, lane-replicated), emit per-lane rows
    [4r..4r+3] = (min_hi, min_lo, max_hi, max_lo) biased-i32 of the
    lexicographic min/max key among slots inside [lo, hi]; empty lanes
    carry (+I32_MAX, +I32_MAX) / (I32_MIN, I32_MIN) sentinels."""
    br = _bias_i32(br_ref[:])
    imin = jnp.int32(_I32_MIN)
    imax = jnp.int32(_I32_MAX)
    zero = jnp.zeros((out_ref.shape[0], 128), jnp.int32)
    for r in range(out_ref.shape[1] // 4):
        if r < n_rank:
            lh = br[4 * r, :][None, None, :]
            ll = br[4 * r + 1, :][None, None, :]
            hh = br[4 * r + 2, :][None, None, :]
            hl = br[4 * r + 3, :][None, None, :]
            ge = (ah > lh) | ((ah == lh) & (al >= ll))
            le = (ah < hh) | ((ah == hh) & (al <= hl))
            inb = ge & le
            mnh = jnp.min(jnp.where(inb, ah, imax), axis=1)
            mnl = jnp.min(jnp.where(inb & (ah == mnh[:, None, :]), al,
                                    imax), axis=1)
            mxh = jnp.max(jnp.where(inb, ah, imin), axis=1)
            mxl = jnp.max(jnp.where(inb & (ah == mxh[:, None, :]), al,
                                    imin), axis=1)
            out_ref[:, 4 * r, :] = mnh
            out_ref[:, 4 * r + 1, :] = mnl
            out_ref[:, 4 * r + 2, :] = mxh
            out_ref[:, 4 * r + 3, :] = mxl
        else:
            out_ref[:, 4 * r, :] = zero
            out_ref[:, 4 * r + 1, :] = zero
            out_ref[:, 4 * r + 2, :] = zero
            out_ref[:, 4 * r + 3, :] = zero


def _key_extremes_planes_kernel(hi_ref, lo_ref, out_ref):
    """Per-lane-column key extremes over decoded f64 bit planes: rows
    0-3 = (min_hi, min_lo, max_hi, max_lo) biased-i32 total-order key
    words of each lane column's lexicographic extreme; rows 4-7 zero
    (8-row block for layout friendliness)."""
    r = U64(hi_ref[:], lo_ref[:])
    ah, al = _key_words_f64(r, False)
    imin = jnp.int32(_I32_MIN)
    imax = jnp.int32(_I32_MAX)
    mnh = jnp.min(ah, axis=1)
    mnl = jnp.min(jnp.where(ah == mnh[:, None, :], al, imax), axis=1)
    mxh = jnp.max(ah, axis=1)
    mxl = jnp.max(jnp.where(ah == mxh[:, None, :], al, imin), axis=1)
    out_ref[:, 0, :] = mnh
    out_ref[:, 1, :] = mnl
    out_ref[:, 2, :] = mxh
    out_ref[:, 3, :] = mxl
    zero = jnp.zeros_like(mnh)
    for k in range(4, 8):
        out_ref[:, k, :] = zero


@jax.jit
def key_extremes_planes_f64(hi, lo):
    """[G, 64, 128] decoded f64 bit planes -> [G, 8, 128] i32 biased
    key-word extremes per lane column (rows 0-3 = min hi/lo, max hi/lo;
    the grouped-aggregate per-vector reduction input)."""
    G = hi.shape[0]
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    if pad:
        hi, lo = (jnp.pad(a, ((0, pad), (0, 0), (0, 0)))
                  for a in (hi, lo))
    Gp = G + pad
    out = pl.pallas_call(
        _key_extremes_planes_kernel,
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, 64, 128), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((gb, 8, 128), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, 8, 128), jnp.int32),
        interpret=_interpret(),
    )(hi, lo)
    return out[:G]


def _sum_extremes_planes_kernel(hi_ref, lo_ref, out_ref):
    """Fused grouped-aggregate epilogue over decoded planes: rows
    [0, 16) = the exact-SUM superaccumulator rows (_exact_sum_rows),
    rows [16, 24) = the per-lane key extremes (min hi/lo, max hi/lo,
    4 zero rows) — ONE read of the planes instead of two."""
    r = U64(hi_ref[:], lo_ref[:])
    _exact_sum_rows(r, out_ref, off=0)
    ah, al = _key_words_f64(r, False)
    imin = jnp.int32(_I32_MIN)
    imax = jnp.int32(_I32_MAX)
    mnh = jnp.min(ah, axis=1)
    mnl = jnp.min(jnp.where(ah == mnh[:, None, :], al, imax), axis=1)
    mxh = jnp.max(ah, axis=1)
    mxl = jnp.max(jnp.where(ah == mxh[:, None, :], al, imin), axis=1)
    out_ref[:, 16, :] = mnh
    out_ref[:, 17, :] = mnl
    out_ref[:, 18, :] = mxh
    out_ref[:, 19, :] = mxl
    zero = jnp.zeros_like(mnh)
    for k in range(20, 24):
        out_ref[:, k, :] = zero


@jax.jit
def sum_extremes_planes_f64(hi, lo):
    """[G, 64, 128] decoded f64 bit planes -> [G, 24, 128] i32: the 16
    exact-SUM rows plus the 8 key-extreme rows in one fused scan (the
    sorted GROUP-BY per-vector partials input)."""
    G = hi.shape[0]
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    if pad:
        hi, lo = (jnp.pad(a, ((0, pad), (0, 0), (0, 0)))
                  for a in (hi, lo))
    Gp = G + pad
    out = pl.pallas_call(
        _sum_extremes_planes_kernel,
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, 64, 128), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((gb, 24, 128), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, 24, 128), jnp.int32),
        interpret=_interpret(),
    )(hi, lo)
    return out[:G]


def _falp_f64_variant_rank_kernel(packed_ref, *refs, variant: str,
                                  bw: int, fl: int, n_meta: int,
                                  n_thr: int, n_rank: int):
    metas = refs[:n_meta]
    th_ref, tl_ref, br_ref = refs[n_meta:n_meta + 3]
    out_cnt, out_mm = refs[-2], refs[-1]
    shape = (out_cnt.shape[0], 64, 128)
    r = _any_variant_value_f64(variant, packed_ref, metas, shape, bw=bw,
                               fl=fl)
    ah, al = _key_words_f64(r, False)
    _prefix_count_rows(ah, al, th_ref, tl_ref, out_cnt, n_thr)
    _bracket_minmax_rows(ah, al, br_ref, out_mm, n_rank)


@functools.partial(jax.jit, static_argnames=("variant", "bw", "flags",
                                             "n_thr", "n_rank"))
def falp_decode_f64_variant_rankpass(packed, metas, thr_hi, thr_lo, br,
                                     *, variant: str, bw: int,
                                     flags: int = 0, n_thr: int,
                                     n_rank: int):
    """Fused decode + prefix counts + per-rank bracketed key extremes
    for any f64 ALP variant in ONE scan (the quantile bisection body).
    ``br``: [BR_pad, 128] u32 working-order bracket words (4 rows per
    rank).  Returns (counts [G, E_pad, 128] i32,
    mm [G, BR_pad, 128] i32)."""
    G = metas[0].shape[0]
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    arrs = (packed,) + tuple(metas)
    if pad:
        arrs = tuple(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                     for a in arrs)
    Gp = G + pad
    E_pad = thr_hi.shape[0]
    M_pad = br.shape[0]
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    thr_spec = pl.BlockSpec((E_pad, 128), lambda i: (i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    br_spec = pl.BlockSpec((M_pad, 128), lambda i: (i * 0, i * 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_falp_f64_variant_rank_kernel, variant=variant,
                          bw=bw, fl=flags, n_meta=len(metas),
                          n_thr=n_thr, n_rank=n_rank),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(2 * bw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)]
        + [meta_spec] * len(metas) + [thr_spec] * 2 + [br_spec],
        out_specs=[pl.BlockSpec((gb, E_pad, 128),
                                lambda i: (i, i * 0, i * 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((gb, M_pad, 128),
                                lambda i: (i, i * 0, i * 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((Gp, E_pad, 128), jnp.int32),
                   jax.ShapeDtypeStruct((Gp, M_pad, 128), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )((arrs[0] if bw else jnp.zeros((Gp, 1, 128), jnp.uint32)),
      *arrs[1:], thr_hi, thr_lo, br)
    return out[0][:G], out[1][:G]


def _rd_dict_f64_rank_kernel(right_ref, left_ref, d0, d1, d2, d3, d4,
                             d5, d6, d7, th_ref, tl_ref, br_ref,
                             out_cnt, out_mm, *, rbw: int, lbw: int,
                             n_thr: int, n_rank: int):
    r = _rd_dict_value_f64(right_ref, left_ref,
                           (d0, d1, d2, d3, d4, d5, d6, d7),
                           rbw=rbw, lbw=lbw)
    ah, al = _key_words_f64(r, False)
    _prefix_count_rows(ah, al, th_ref, tl_ref, out_cnt, n_thr)
    _bracket_minmax_rows(ah, al, br_ref, out_mm, n_rank)


@functools.partial(jax.jit, static_argnames=("rbw", "lbw", "n_thr",
                                             "n_rank"))
def rd_decode_dict_f64_rankpass(right_packed, left_packed, dict_planes,
                                thr_hi, thr_lo, br, *, rbw: int,
                                lbw: int, n_thr: int, n_rank: int):
    """ALP_RD f64 twin of :func:`falp_decode_f64_variant_rankpass`."""
    G = right_packed.shape[0]
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    arrs = (right_packed, left_packed) + tuple(dict_planes)
    if pad:
        arrs = tuple(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                     for a in arrs)
    Gp = G + pad
    E_pad = thr_hi.shape[0]
    M_pad = br.shape[0]
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    thr_spec = pl.BlockSpec((E_pad, 128), lambda i: (i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    br_spec = pl.BlockSpec((M_pad, 128), lambda i: (i * 0, i * 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_rd_dict_f64_rank_kernel, rbw=rbw, lbw=lbw,
                          n_thr=n_thr, n_rank=n_rank),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(2 * rbw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((gb, max(2 * lbw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)]
        + [meta_spec] * 8 + [thr_spec] * 2 + [br_spec],
        out_specs=[pl.BlockSpec((gb, E_pad, 128),
                                lambda i: (i, i * 0, i * 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((gb, M_pad, 128),
                                lambda i: (i, i * 0, i * 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((Gp, E_pad, 128), jnp.int32),
                   jax.ShapeDtypeStruct((Gp, M_pad, 128), jnp.int32)],
        interpret=_interpret(),
    )(arrs[0] if rbw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      arrs[1] if lbw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      *arrs[2:], thr_hi, thr_lo, br)
    return out[0][:G], out[1][:G]


def _bracket_minmax_rows_f32(ak, br_ref, out_ref, n_rank: int):
    """f32 twin of :func:`_bracket_minmax_rows`: single-word keys, rows
    [2r..2r+1] of ``br_ref`` = (lo, hi), output rows (min, max)."""
    br = _bias_i32(br_ref[:])
    imin = jnp.int32(_I32_MIN)
    imax = jnp.int32(_I32_MAX)
    zero = jnp.zeros((out_ref.shape[0], 128), jnp.int32)
    for r in range(out_ref.shape[1] // 2):
        if r < n_rank:
            lo_ = br[2 * r, :][None, None, :]
            hi_ = br[2 * r + 1, :][None, None, :]
            inb = (ak >= lo_) & (ak <= hi_)
            out_ref[:, 2 * r, :] = jnp.min(
                jnp.where(inb, ak, imax), axis=1)
            out_ref[:, 2 * r + 1, :] = jnp.max(
                jnp.where(inb, ak, imin), axis=1)
        else:
            out_ref[:, 2 * r, :] = zero
            out_ref[:, 2 * r + 1, :] = zero


def _falp_f32_rank_kernel(packed_ref, base, fact, frac, t_ref, br_ref,
                          out_cnt, out_mm, *, bw: int, n_thr: int,
                          n_rank: int):
    bits = _f32_decode_bits(packed_ref, base, fact, frac,
                            (out_cnt.shape[0], 32, 128), bw=bw)
    ak = _f32_key_biased(bits, False)
    _prefix_count_rows_f32(ak, t_ref, out_cnt, n_thr)
    _bracket_minmax_rows_f32(ak, br_ref, out_mm, n_rank)


@functools.partial(jax.jit, static_argnames=("bw", "n_thr", "n_rank"))
def falp_decode_f32_rankpass(packed, base, fact, frac_bits, thr, br, *,
                             bw: int, n_thr: int, n_rank: int):
    """f32 ALP rank pass: prefix counts + per-rank bracketed extremes
    ([G, E_pad, 128], [G, BR_pad, 128] with 2 rows per rank)."""
    G = base.shape[0]
    gb = min(_BLOCK_GROUPS_F32, max(G, 1))
    pad = (-G) % gb
    arrs = (packed, base, fact, frac_bits.view(jnp.float32))
    if pad:
        arrs = tuple(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                     for a in arrs)
    Gp = G + pad
    E_pad = thr.shape[0]
    M_pad = br.shape[0]
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    thr_spec = pl.BlockSpec((E_pad, 128), lambda i: (i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    br_spec = pl.BlockSpec((M_pad, 128), lambda i: (i * 0, i * 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_falp_f32_rank_kernel, bw=bw, n_thr=n_thr,
                          n_rank=n_rank),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(bw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)]
        + [meta_spec] * 3 + [thr_spec, br_spec],
        out_specs=[pl.BlockSpec((gb, E_pad, 128),
                                lambda i: (i, i * 0, i * 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((gb, M_pad, 128),
                                lambda i: (i, i * 0, i * 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((Gp, E_pad, 128), jnp.int32),
                   jax.ShapeDtypeStruct((Gp, M_pad, 128), jnp.int32)],
        interpret=_interpret(),
    )((arrs[0] if bw else jnp.zeros((Gp, 1, 128), jnp.uint32)),
      *arrs[1:], thr, br)
    return out[0][:G], out[1][:G]


def _rd_dict_f32_rank_kernel(right_ref, left_ref, d0, d1, d2, d3, d4,
                             d5, d6, d7, t_ref, br_ref, out_cnt, out_mm,
                             *, rbw: int, lbw: int, n_thr: int,
                             n_rank: int):
    bits = _rd_dict_value_f32(right_ref, left_ref,
                              (d0, d1, d2, d3, d4, d5, d6, d7),
                              (out_cnt.shape[0], 32, 128), rbw=rbw,
                              lbw=lbw)
    ak = _f32_key_biased(bits, False)
    _prefix_count_rows_f32(ak, t_ref, out_cnt, n_thr)
    _bracket_minmax_rows_f32(ak, br_ref, out_mm, n_rank)


@functools.partial(jax.jit, static_argnames=("rbw", "lbw", "n_thr",
                                             "n_rank"))
def rd_decode_dict_f32_rankpass(right_packed, left_packed, dict_planes,
                                thr, br, *, rbw: int, lbw: int,
                                n_thr: int, n_rank: int):
    """ALP_RD f32 twin of :func:`falp_decode_f32_rankpass`."""
    G = right_packed.shape[0]
    gb = min(_BLOCK_GROUPS_F32, max(G, 1))
    pad = (-G) % gb
    arrs = (right_packed, left_packed) + tuple(dict_planes)
    if pad:
        arrs = tuple(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                     for a in arrs)
    Gp = G + pad
    E_pad = thr.shape[0]
    M_pad = br.shape[0]
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    thr_spec = pl.BlockSpec((E_pad, 128), lambda i: (i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    br_spec = pl.BlockSpec((M_pad, 128), lambda i: (i * 0, i * 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_rd_dict_f32_rank_kernel, rbw=rbw, lbw=lbw,
                          n_thr=n_thr, n_rank=n_rank),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(rbw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((gb, max(lbw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)]
        + [meta_spec] * 8 + [thr_spec, br_spec],
        out_specs=[pl.BlockSpec((gb, E_pad, 128),
                                lambda i: (i, i * 0, i * 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((gb, M_pad, 128),
                                lambda i: (i, i * 0, i * 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((Gp, E_pad, 128), jnp.int32),
                   jax.ShapeDtypeStruct((Gp, M_pad, 128), jnp.int32)],
        interpret=_interpret(),
    )(arrs[0] if rbw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      arrs[1] if lbw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      *arrs[2:], thr, br)
    return out[0][:G], out[1][:G]


def _rd_dict_f32_count_kernel(right_ref, left_ref, d0, d1, d2, d3, d4, d5,
                              d6, d7, klo, khi, out_cnt, *, rbw: int,
                              lbw: int):
    bits = _rd_dict_value_f32(right_ref, left_ref,
                              (d0, d1, d2, d3, d4, d5, d6, d7),
                              (out_cnt.shape[0], 32, 128), rbw=rbw,
                              lbw=lbw)
    key = _f32_key(bits)

    def bias(x):
        return (x ^ _U32(0x80000000)).astype(jnp.int32)

    in_range = ((bias(key) >= bias(klo[:][:, None, :]))
                & (bias(key) <= bias(khi[:][:, None, :])))
    out_cnt[:] = in_range.astype(jnp.int32).sum(axis=1, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("rbw", "lbw"))
def rd_decode_dict_f32_count(right_packed, left_packed, dict_planes, klo,
                             khi, *, rbw: int, lbw: int):
    """Fused ALP_RD f32 decode + predicate COUNT ([G, 128] i32 counts;
    bounds as lane-expanded u32 total-order keys)."""
    G = right_packed.shape[0]
    gb = min(_BLOCK_GROUPS_F32, max(G, 1))
    pad = (-G) % gb
    arrs = (right_packed, left_packed) + tuple(dict_planes) + (klo, khi)
    if pad:
        arrs = tuple(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                     for a in arrs)
    Gp = G + pad
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_rd_dict_f32_count_kernel, rbw=rbw, lbw=lbw),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(rbw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((gb, max(lbw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)] + [meta_spec] * 10,
        out_specs=pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, 128), jnp.int32),
        interpret=_interpret(),
    )(arrs[0] if rbw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      arrs[1] if lbw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      *arrs[2:])
    return out[:G]


def _rd_f32_kernel(right_ref, left_ref, out, *, rbw: int):
    left = left_ref[:]
    if rbw == 0:
        out[:] = left
        return
    right = _unpack_all(right_ref, rbw, 32, 1).lo
    out[:] = right | (left << _U32(rbw))


@functools.partial(jax.jit, static_argnames=("rbw",))
def rd_decode_f32(right_packed, left_resolved, *, rbw: int):
    """Fused ALP_RD float decode -> [G, 32, 128] f32 bit planes."""
    G = right_packed.shape[0]
    gb = min(_BLOCK_GROUPS_F32, max(G, 1))
    pad = (-G) % gb
    if pad:
        right_packed, left_resolved = (
            jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            for a in (right_packed, left_resolved))
    Gp = G + pad
    out = pl.pallas_call(
        functools.partial(_rd_f32_kernel, rbw=rbw),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(rbw, 1), 128),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((gb, 32, 128), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((gb, 32, 128), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, 32, 128), jnp.uint32),
        interpret=_interpret(),
    )(right_packed if rbw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      left_resolved)
    return out[:G]


# ---------------------------------------------------------------------------
# unFFOR only (unfused decode / ALP_RD right+left parts)
# ---------------------------------------------------------------------------

def _unffor_kernel(packed_ref, base_lo, base_hi, out_hi, out_lo, *,
                   bw: int, slots: int):
    lpb = 2 if slots == 64 else 1
    base = U64(base_hi[:][:, None, :], base_lo[:][:, None, :])
    if bw == 0:
        shape = out_lo.shape
        ints = U64(jnp.broadcast_to(base.hi, shape),
                   jnp.broadcast_to(base.lo, shape))
    else:
        ints = _u64_add(_unpack_all(packed_ref, bw, slots, lpb), base)
    if out_hi is not None:
        out_hi[:] = ints.hi
    out_lo[:] = ints.lo


@functools.partial(jax.jit, static_argnames=("bw", "element_bits"))
def unffor_tile(packed, base_lo, base_hi, *, bw: int, element_bits: int):
    """unFFOR on tiles: returns (hi, lo) planes for 64-bit elements, or
    (None-like zeros omitted) a single [G, 32, 128] plane for 32-bit."""
    G = packed.shape[0]
    slots = 64 if element_bits == 64 else 32
    n_limbs = 2 * bw if element_bits == 64 else bw
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    if pad:
        packed, base_lo, base_hi = (
            jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            for a in (packed, base_lo, base_hi))
    Gp = G + pad
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    two_planes = element_bits == 64

    def kernel(packed_ref, blo, bhi, *outs):
        if two_planes:
            _unffor_kernel(packed_ref, blo, bhi, outs[0], outs[1],
                           bw=bw, slots=slots)
        else:
            _unffor_kernel(packed_ref, blo, bhi, None, outs[0],
                           bw=bw, slots=slots)

    n_out = 2 if two_planes else 1
    out = pl.pallas_call(
        kernel,
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, max(n_limbs, 1), 128),
                               lambda i: (i, i * 0, i * 0), memory_space=pltpu.VMEM),
                  meta_spec, meta_spec],
        out_specs=[pl.BlockSpec((gb, slots, 128), lambda i: (i, i * 0, i * 0),
                                memory_space=pltpu.VMEM)] * n_out,
        out_shape=[jax.ShapeDtypeStruct((Gp, slots, 128), jnp.uint32)] * n_out,
        interpret=_interpret(),
    )(packed if bw else jnp.zeros((Gp, 1, 128), jnp.uint32),
      base_lo, base_hi)
    if two_planes:
        return out[0][:G], out[1][:G]
    return out[0][:G]


# ---------------------------------------------------------------------------
# FFOR pack (encode side)
# ---------------------------------------------------------------------------

def _u64_sub(a: U64, b: U64) -> U64:
    lo = a.lo - b.lo
    borrow = (a.lo < b.lo).astype(_U32)
    return U64(a.hi - b.hi - borrow, lo)


def _ffor_kernel(values_ref, base_lo, base_hi, out_ref, *,
                 bw: int, element_bits: int):
    slots = 64 if element_bits == 64 else 32
    lpb = element_bits // 32
    base = U64(base_hi[:], base_lo[:])
    mask_lo = _U32((1 << min(bw, 32)) - 1 if bw < 32 else 0xFFFFFFFF)
    mask_hi = _U32((1 << (bw - 32)) - 1) if 32 < bw < 64 else (
        _U32(0xFFFFFFFF) if bw == 64 else _U32(0))

    # delta[v] masked to bw bits, as U64 per slot
    deltas = []
    for v in range(slots):
        if lpb == 2:
            val = U64(values_ref[:, 2 * v + 1, :], values_ref[:, 2 * v, :])
        else:
            val = U64(jnp.zeros_like(values_ref[:, v, :]),
                      values_ref[:, v, :])
        d = _u64_sub(val, base)
        deltas.append(U64(d.hi & mask_hi, d.lo & mask_lo))

    n_limbs = lpb * bw
    for j in range(n_limbs):
        lo_bit = 32 * j
        acc = None
        for v in range(slots):
            off = v * bw
            if off + bw <= lo_bit or off >= lo_bit + 32:
                continue
            rel = off - lo_bit
            d = deltas[v]
            if rel >= 0:
                # value's bit 0 lands at limb bit rel: take low window
                term = (d.lo << _U32(rel)) if rel else d.lo
            else:
                k = -rel  # limb starts k bits into the value
                if k < 32:
                    term = (d.lo >> _U32(k)) | (d.hi << _U32(32 - k))
                elif k == 32:
                    term = d.hi
                else:
                    term = d.hi >> _U32(k - 32)
            acc = term if acc is None else (acc | term)
        out_ref[:, j, :] = acc


def _ffor_planes_kernel(vhi_ref, vlo_ref, base_lo, base_hi, out_ref, *,
                        bw: int):
    v = U64(vhi_ref[:], vlo_ref[:])
    _ffor_pack_body(v, base_lo, base_hi, out_ref, bw=bw)


def _ffor_planes_patch_kernel(vhi_ref, vlo_ref, exc_ref, fill_lo, fill_hi,
                              base_lo, base_hi, out_ref, *, bw: int):
    # exception slots take the vector's first non-exception value before
    # the FOR subtract (encoder.hpp:382-399 fused into the pack pass)
    sel = exc_ref[:] != 0
    v = U64(jnp.where(sel, fill_hi[:][:, None, :], vhi_ref[:]),
            jnp.where(sel, fill_lo[:][:, None, :], vlo_ref[:]))
    _ffor_pack_body(v, base_lo, base_hi, out_ref, bw=bw)


def _ffor_pack_body(v, base_lo, base_hi, out_ref, *, bw: int):
    base = U64(base_hi[:][:, None, :], base_lo[:][:, None, :])
    mask_lo = _U32((1 << min(bw, 32)) - 1 if bw < 32 else 0xFFFFFFFF)
    mask_hi = _U32((1 << (bw - 32)) - 1) if 32 < bw < 64 else (
        _U32(0xFFFFFFFF) if bw == 64 else _U32(0))
    d = _u64_sub(v, base)
    d = U64(d.hi & mask_hi, d.lo & mask_lo)
    deltas = [U64(d.hi[:, v, :], d.lo[:, v, :]) for v in range(64)]
    for j in range(2 * bw):
        lo_bit = 32 * j
        acc = None
        for v in range(64):
            off = v * bw
            if off + bw <= lo_bit or off >= lo_bit + 32:
                continue
            rel = off - lo_bit
            dv = deltas[v]
            if rel >= 0:
                term = (dv.lo << _U32(rel)) if rel else dv.lo
            else:
                k = -rel
                if k < 32:
                    term = (dv.lo >> _U32(k)) | (dv.hi << _U32(32 - k))
                elif k == 32:
                    term = dv.hi
                else:
                    term = dv.hi >> _U32(k - 32)
            acc = term if acc is None else (acc | term)
        out_ref[:, j, :] = acc


@functools.partial(jax.jit, static_argnames=("bw",))
def ffor_planes_f64(vhi, vlo, base_lo, base_hi, *, bw: int):
    """FOR + pack int64 (hi, lo) planes [G, 64, 128] -> [G, 2*bw, 128]."""
    return _ffor_planes_call(
        _ffor_planes_kernel, (vhi, vlo), (base_lo, base_hi), bw=bw)


@functools.partial(jax.jit, static_argnames=("bw",))
def ffor_planes_patch_f64(vhi, vlo, exc, fill_lo, fill_hi, base_lo,
                          base_hi, *, bw: int):
    """FOR + pack with exception patching fused (exception slots read
    the per-vector fill value): packs UNPATCHED encode planes + exc mask
    directly, saving the separate patch pass over the planes."""
    return _ffor_planes_call(
        _ffor_planes_patch_kernel, (vhi, vlo, exc),
        (fill_lo, fill_hi, base_lo, base_hi), bw=bw)


def _ffor_planes_call(kernel, planes, metas, *, bw: int):
    G = planes[0].shape[0]
    if bw == 0:
        return jnp.zeros((G, 0, 128), jnp.uint32)
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    if pad:
        planes = tuple(jnp.pad(a, ((0, pad), (0, 0), (0, 0)))
                       for a in planes)
        metas = tuple(jnp.pad(a, ((0, pad), (0, 0))) for a in metas)
    Gp = G + pad
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(kernel, bw=bw),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, 64, 128), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)] * len(planes)
        + [meta_spec] * len(metas),
        out_specs=pl.BlockSpec((gb, 2 * bw, 128), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, 2 * bw, 128), jnp.uint32),
        interpret=_interpret(),
    )(*planes, *metas)
    return out[:G]


@functools.partial(jax.jit, static_argnames=("bw", "element_bits"))
def ffor_tile(values, base_lo, base_hi, *, bw: int, element_bits: int):
    """FOR + bit-pack value tiles [G, S*lpb, 128] -> [G, lpb*bw, 128]."""
    G = values.shape[0]
    lpb = element_bits // 32
    if bw == 0:
        return jnp.zeros((G, 0, 128), jnp.uint32)
    gb = min(_BLOCK_GROUPS, max(G, 1))
    pad = (-G) % gb
    if pad:
        values, base_lo, base_hi = (
            jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            for a in (values, base_lo, base_hi))
    Gp = G + pad
    meta_spec = pl.BlockSpec((gb, 128), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_ffor_kernel, bw=bw, element_bits=element_bits),
        grid=(Gp // gb,),
        in_specs=[pl.BlockSpec((gb, values.shape[1], 128),
                               lambda i: (i, i * 0, i * 0), memory_space=pltpu.VMEM),
                  meta_spec, meta_spec],
        out_specs=pl.BlockSpec((gb, lpb * bw, 128), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, lpb * bw, 128), jnp.uint32),
        interpret=_interpret(),
    )(values, base_lo, base_hi)
    return out[:G]
