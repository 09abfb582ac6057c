"""TPU tile layout for FastLanes-packed vectors, and converters.

The reference packs each 1024-value vector into ``bw`` words per lane with
L = 1024/S lanes (S = element bits): 16 u64 lanes for doubles, 32 u32 lanes
for floats (reference src/fastlanes_generated_unffor.cpp:5988-6040; layout
summary in SURVEY.md §2.1).  Those lane counts match 512-bit SIMD registers;
the TPU VPU is 8x128 lanes, so the TPU-native layout interleaves a *group*
of ``128 / L`` consecutive vectors (8 doubles / 4 floats) into one 128-lane
tile:

    tile[g, j, c]   with  c = (vector_in_group * L) + lane,
                          j = u32 limb index of the lane's bitstream.

Within a lane, packing is LSB-first little-endian, so the lane's bitstream
is just a sequence of u32 limbs: limb ``j`` holds bits [32j, 32j+32).  For
doubles the reference's u64 word ``w`` maps to limbs ``2w`` (low half) and
``2w + 1`` (high half) — the tile is a pure byte-level transpose of the
reference packed buffer, converted losslessly in either direction.

A packed group is ``[LIMBS(bw), 128]`` u32 with LIMBS = bw * S/32 * L * 128
/ 128... concretely ``2 * bw`` limbs for doubles and ``bw`` for floats.
Value ``k = v * L + lane`` of vector ``n`` lives at bit offset ``v * bw`` of
column ``(n % group) * L + lane`` of group ``n // group``.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from ..constants import VECTOR_SIZE


def geometry(element_bits: int):
    """(lanes_per_vector, vectors_per_group, limbs_per_bw_unit)."""
    L = VECTOR_SIZE // element_bits          # 16 for f64, 32 for f32
    group = 128 // L                          # 8 for f64, 4 for f32
    limbs_per_bw = element_bits // 32         # 2 for f64, 1 for f32
    return L, group, limbs_per_bw


def n_groups(n_vectors: int, element_bits: int) -> int:
    _, group, _ = geometry(element_bits)
    return (n_vectors + group - 1) // group


def pad_vectors(n_vectors: int, element_bits: int) -> int:
    """Number of vectors after padding to a whole group."""
    _, group, _ = geometry(element_bits)
    return n_groups(n_vectors, element_bits) * group


# ---------------------------------------------------------------------------
# Reference layout <-> tile layout (host-side numpy; bit-lossless)
# ---------------------------------------------------------------------------

def ref_to_tile(packed: np.ndarray, bw: int, element_bits: int) -> np.ndarray:
    """[n_vectors, bw * L] reference packed words -> [G, limbs, 128] u32.

    ``packed`` dtype is u64 (doubles) or u32 (floats).  n_vectors must be a
    multiple of the group size (pad with zero vectors first).
    """
    L, group, lpb = geometry(element_bits)
    n = packed.shape[0]
    assert n % group == 0, f"pad to a multiple of {group} vectors first"
    G = n // group
    if bw == 0:
        return np.zeros((G, 0, 128), dtype=np.uint32)
    # words [n, bw, L] -> u32 limbs [n, bw, L, lpb] (little-endian split)
    u32 = np.ascontiguousarray(
        packed.reshape(n, bw, L)).view(np.uint32).reshape(n, bw, L, lpb)
    # -> [G, group, bw, L, lpb] -> [G, bw, lpb, group, L]
    t = u32.reshape(G, group, bw, L, lpb).transpose(0, 2, 4, 1, 3)
    return np.ascontiguousarray(t).reshape(G, bw * lpb, 128)


def ref_to_tile_device(packed_words: np.ndarray, bw: int,
                       element_bits: int):
    """:func:`ref_to_tile` with the transpose ON DEVICE: the host ships
    the packed bytes verbatim (one zero-copy u32 view) and XLA performs
    the layout permutation — the cold-path staging cost is then pure
    transfer instead of a serial numpy transpose of the whole payload.
    Returns a device array [G, limbs, 128] u32."""
    import jax.numpy as jnp
    _, group, _ = geometry(element_bits)
    n = packed_words.shape[0]
    assert n % group == 0
    if bw == 0:
        return jnp.zeros((n // group, 0, 128), jnp.uint32)
    u32 = packed_words.view(np.uint32)            # zero-copy (LE limbs)
    return _tile_transpose(jnp.asarray(u32), bw=bw,
                           element_bits=element_bits)


@functools.partial(jax.jit, static_argnames=("bw", "element_bits"))
def _tile_transpose(packed_u32, *, bw: int, element_bits: int):
    _, group, lpb = geometry(element_bits)
    n = packed_u32.shape[0]
    L = VECTOR_SIZE // element_bits
    G = n // group
    u32 = packed_u32.reshape(n, bw, L, lpb)
    t = u32.reshape(G, group, bw, L, lpb).transpose(0, 2, 4, 1, 3)
    return t.reshape(G, bw * lpb, 128)


def tile_to_ref(tile: np.ndarray, bw: int, element_bits: int,
                n_vectors: int) -> np.ndarray:
    """Inverse of :func:`ref_to_tile`; returns [n_vectors, bw * L] words."""
    L, group, lpb = geometry(element_bits)
    wt = np.dtype(np.uint64 if element_bits == 64 else np.uint32)
    G = tile.shape[0]
    n = G * group
    if bw == 0:
        return np.zeros((n_vectors, 0), dtype=wt)
    t = tile.reshape(G, bw, lpb, group, L).transpose(0, 3, 1, 4, 2)
    words = np.ascontiguousarray(t).reshape(n, bw * L * lpb).view(wt)
    return words[:n_vectors]


def values_to_tile(values: np.ndarray, element_bits: int) -> np.ndarray:
    """[n, 1024] element arrays -> [G, S_slots, 128] in tile value order.

    Value k = v * L + lane of vector n maps to [n // group, v * lpb ...]:
    for doubles the value is split into (lo, hi) u32 limbs at rows
    ``2v``/``2v+1``; floats occupy row ``v`` directly.
    """
    L, group, lpb = geometry(element_bits)
    n = values.shape[0]
    assert n % group == 0
    G = n // group
    S = element_bits
    u32 = np.ascontiguousarray(values.reshape(n, S, L)).view(
        np.uint32).reshape(n, S, L, lpb)
    t = u32.reshape(G, group, S, L, lpb).transpose(0, 2, 4, 1, 3)
    return np.ascontiguousarray(t).reshape(G, S * lpb, 128)


def tile_to_values(tile: np.ndarray, element_bits: int, dtype,
                   n_vectors: int) -> np.ndarray:
    """Inverse of :func:`values_to_tile` -> [n_vectors, 1024] of ``dtype``."""
    L, group, lpb = geometry(element_bits)
    S = element_bits
    G = tile.shape[0]
    n = G * group
    t = tile.reshape(G, S, lpb, group, L).transpose(0, 3, 1, 4, 2)
    vals = np.ascontiguousarray(t).reshape(n, VECTOR_SIZE * lpb).view(
        np.dtype(dtype))
    return vals[:n_vectors]


def plane_to_tile(values_u32: np.ndarray, element_bits: int) -> np.ndarray:
    """[n, 1024] u32 per-value payloads -> [G, S, 128] tile value order.

    One u32 row per slot (used for <=32-bit side channels of 64-bit
    elements, e.g. dictionary-resolved ALP_RD left parts)."""
    L, group, _ = geometry(element_bits)
    S = element_bits
    n = values_u32.shape[0]
    assert n % group == 0
    G = n // group
    t = values_u32.reshape(G, group, S, L).transpose(0, 2, 1, 3)
    return np.ascontiguousarray(t).reshape(G, S, 128)


def lane_expand(per_vector: np.ndarray, element_bits: int) -> np.ndarray:
    """[n] per-vector metadata -> [G, 128] per-lane (repeat across lanes)."""
    L, group, _ = geometry(element_bits)
    n = per_vector.shape[0]
    assert n % group == 0
    G = n // group
    return np.repeat(per_vector.reshape(G, group), L, axis=1)
