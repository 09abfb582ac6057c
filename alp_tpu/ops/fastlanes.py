"""FastLanes FFOR bit-packing as batched jnp ops (static bit width).

The reference ships one generated C++ kernel per (element width, bit width)
pair (src/fastlanes_generated_{ffor,unffor}.cpp; dispatch switch at
unffor.cpp:23010).  The TPU-native equivalent is one traced function per
static ``bw`` — XLA unrolls the slot loop into a fused shift/or graph over
``[n_vectors, L]`` lanes (the jit cache plays the role of the dispatch
switch; only bit widths actually present in the data get compiled).

Layout is byte-identical to the reference (SURVEY.md §2.1): L = 1024/S
lanes, value k at (lane k % L, slot k // L), lane-major word interleave,
LSB-first within a lane's bitstream.

For the double path the packed words are uint64; XLA's 64-bit integer
emulation on TPU is exact.  The Pallas speed-of-light kernels use a
u32-limb view of the same bytes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import VECTOR_SIZE


def _geometry(dtype):
    S = np.dtype(dtype).itemsize * 8
    return S, VECTOR_SIZE // S


@partial(jax.jit, static_argnames=("bw",))
def ffor_pack(values: jnp.ndarray, base: jnp.ndarray, *, bw: int):
    """FOR + bit-pack [n, 1024] vectors -> [n, bw * L] words (same dtype
    unsigned).  ``base``: [n] frame-of-reference (subtracted, wrapping)."""
    st = values.dtype
    ut = np.dtype(f"uint{st.itemsize * 8}")
    S, L = _geometry(st)
    n = values.shape[0]
    if bw == 0:
        return jnp.zeros((n, 0), dtype=ut)
    delta = (values.astype(ut) - base.astype(ut)[:, None])
    if bw < S:
        delta = delta & ut.type((1 << bw) - 1)
    m = delta.reshape(n, S, L)                 # [n, slot, lane]

    words = [jnp.zeros((n, L), dtype=ut) for _ in range(bw)]
    for v in range(S):
        off = v * bw
        w0, s0 = off // S, off % S
        words[w0] = words[w0] | (m[:, v, :] << ut.type(s0))
        if s0 + bw > S and w0 + 1 < bw:
            words[w0 + 1] = words[w0 + 1] | (m[:, v, :] >> ut.type(S - s0))
    return jnp.stack(words, axis=1).reshape(n, bw * L)


@partial(jax.jit, static_argnames=("bw", "signed"))
def unffor_unpack(packed: jnp.ndarray, base: jnp.ndarray, *, bw: int,
                  signed: bool = True):
    """Inverse of :func:`ffor_pack`: [n, bw*L] words -> [n, 1024] values
    (signed or unsigned per ``signed``), adding the base back."""
    ut = np.dtype(packed.dtype)
    S, L = _geometry(ut)
    out_dtype = np.dtype(f"int{S}") if signed else ut
    n = packed.shape[0]
    if bw == 0:
        return jnp.broadcast_to(base.astype(out_dtype)[:, None],
                                (n, VECTOR_SIZE))
    words = packed.reshape(n, bw, L)
    mask = ut.type((1 << bw) - 1) if bw < S else ut.type(~np.uint64(0)
                                                         if S == 64 else
                                                         (1 << S) - 1)
    slots = []
    for v in range(S):
        off = v * bw
        w0, s0 = off // S, off % S
        val = words[:, w0, :] >> ut.type(s0)
        if s0 + bw > S and w0 + 1 < bw:
            val = val | (words[:, w0 + 1, :] << ut.type(S - s0))
        slots.append(val & mask)
    m = jnp.stack(slots, axis=1)               # [n, slot, lane]
    out = m.reshape(n, VECTOR_SIZE) + base.astype(ut)[:, None]
    return out.astype(out_dtype)


def packed_words(bw: int, dtype) -> int:
    """Number of packed words for one 1024-value vector."""
    S, L = _geometry(dtype)
    return bw * L
