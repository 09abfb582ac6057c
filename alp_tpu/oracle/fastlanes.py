"""NumPy oracle for FastLanes FFOR bit-packing (interleaved layout).

Reproduces, byte-exactly, the layout of the reference generated kernels
(reference src/fastlanes_generated_ffor.cpp / _unffor.cpp; layout summarised
in SURVEY.md section 2.1):

For an element type of S bits (S in {8, 16, 32, 64}) a 1024-value vector is
split into L = 1024/S lanes of S values each.

* logical value index k lives at lane ``i = k % L``, slot ``v = k // L``
  (the unffor kernels write ``out[i + L*v]``),
* lane ``i`` packs its S values slot-major, LSB-first, into ``bw`` S-bit
  words (a value straddling a word boundary puts its low bits in the first
  word),
* packed word ``w`` of lane ``i`` is stored at ``packed[w*L + i]``
  (lane-major interleave), for a total of ``bw * L`` words == 1024*bw bits.

FFOR subtracts the frame-of-reference base (wrapping) before masking to
``bw`` bits; unFFOR adds it back.  ``bw == 0`` packs to zero words and
unpacks to a broadcast of the base.

This module is the correctness oracle: simple, vectorised NumPy, validated
against golden data.  The TPU-facing implementations live in alp_tpu.ops.
"""

from __future__ import annotations

import numpy as np

from ..constants import VECTOR_SIZE

_UNSIGNED = {8: np.uint8, 16: np.uint16, 32: np.uint32, 64: np.uint64}


def _shape_check(arr: np.ndarray) -> None:
    if arr.shape != (VECTOR_SIZE,):
        raise ValueError(f"expected a ({VECTOR_SIZE},) vector, got {arr.shape}")


def ffor_pack(values: np.ndarray, bit_width: int, base) -> np.ndarray:
    """FOR + bit-pack one 1024-value vector into the FastLanes layout.

    ``values`` may be signed or unsigned; arithmetic wraps (two's
    complement), exactly like the reference kernels.  Returns an array of
    ``bw * L`` unsigned words of the same bit size as the input element.
    """
    _shape_check(values)
    S = values.dtype.itemsize * 8
    L = VECTOR_SIZE // S
    ut = _UNSIGNED[S]
    bw = int(bit_width)
    if not 0 <= bw <= S:
        raise ValueError(f"bit_width {bw} out of range for {S}-bit elements")
    if bw == 0:
        return np.empty((0,), dtype=ut)

    with np.errstate(over="ignore"):
        delta = (values.view(ut) - np.asarray(base, dtype=values.dtype).view(ut))
    if bw < S:
        delta = delta & ut((1 << bw) - 1)

    # m[v, i] = lane i, slot v.
    m = delta.reshape(S, L)
    # bits[v, i, b] = bit b of slot v of lane i.
    shifts = np.arange(bw, dtype=ut)
    bits = (m[:, :, None] >> shifts[None, None, :]) & ut(1)
    # Lane bitstream is slot-major: lane i -> bits[v, i, b] at position v*bw+b.
    stream = bits.transpose(1, 0, 2).reshape(L, S * bw)
    # Words are S consecutive stream bits, LSB-first.
    words = stream.reshape(L, bw, S)
    weights = (ut(1) << np.arange(S, dtype=ut))
    packed_per_lane = (words.astype(ut) * weights[None, None, :]).sum(
        axis=2, dtype=ut
    )  # [L, bw]
    # packed[w*L + i] = word w of lane i.
    return np.ascontiguousarray(packed_per_lane.T).reshape(-1)


def unffor_unpack(packed: np.ndarray, bit_width: int, base, out_dtype) -> np.ndarray:
    """Inverse of :func:`ffor_pack`: unpack + add base (wrapping)."""
    out_dtype = np.dtype(out_dtype)
    S = out_dtype.itemsize * 8
    L = VECTOR_SIZE // S
    ut = _UNSIGNED[S]
    bw = int(bit_width)
    base_u = np.asarray(base, dtype=out_dtype).view(ut)
    if bw == 0:
        return np.full(VECTOR_SIZE, base_u, dtype=ut).view(out_dtype)
    if packed.shape != (bw * L,):
        raise ValueError(f"expected {bw * L} packed words, got {packed.shape}")

    per_lane = packed.view(ut).reshape(bw, L).T  # [L, bw]
    weights_bits = np.arange(S, dtype=ut)
    bits = (per_lane[:, :, None] >> weights_bits[None, None, :]) & ut(1)  # [L,bw,S]
    stream = bits.reshape(L, bw * S)
    vals_bits = stream.reshape(L, S, bw)  # [L, v, b]
    weights = (ut(1) << np.arange(bw, dtype=ut))
    vals = (vals_bits.astype(ut) * weights[None, None, :]).sum(axis=2, dtype=ut)
    # vals[i, v] -> out[v*L + i]
    out = np.ascontiguousarray(vals.T).reshape(-1)
    with np.errstate(over="ignore"):
        out = out + base_u
    return out.view(out_dtype)
