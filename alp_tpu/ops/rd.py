"""Batched ALP_RD primitives (jit-able, TPU-first).

Mirrors reference include/alp/rd.hpp:109-178 with vectors batched as
``[n, 1024]``.  The left/right bit split and the 8-entry dictionary lookup
are pure vector ops (the dictionary is compared 8-wide, the TPU analog of
the reference's unordered_map lookup per value).  Dictionary *construction*
(rd.hpp:33-104) happens on ≤256 sampled values per rowgroup and stays on
the host (oracle.rd) — it is planning, not throughput work.

Doubles travel as uint64 bit patterns (ops.numerics convention).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np



@partial(jax.jit, static_argnames=("element_bits",))
def rd_encode_vectors(bits, right_bw, left_dict, dict_size, *, element_bits):
    """rd_encoder::encode (rd.hpp:109-147) batched.

    bits: [n, 1024] uint64/uint32 bit patterns; right_bw: [n] int32 (per
    vector's rowgroup); left_dict: [n, 8] uint16 (rowgroup dictionary,
    padded with 0xFFFF); dict_size: [n] int32.
    Returns (right [n,1024] ut, left_idx [n,1024] u16, exc_mask [n,1024],
    left_raw [n,1024] u16).  Exception compaction is container-side.
    """
    ut = bits.dtype
    rbw = right_bw.astype(ut)[:, None]
    one = jnp.ones((), ut)
    right = bits & ((one << rbw) - one)
    left_raw = (bits >> rbw).astype(jnp.uint16)

    # guard against the 0xFFFF pad sentinel: only entries below the
    # rowgroup's actual dictionary size may match (a data value whose
    # left part IS 0xFFFF must become an exception, as in the oracle
    # and the reference's hash-map lookup, rd.hpp:127-144)
    k = jnp.arange(left_dict.shape[1], dtype=jnp.int32)
    valid = k[None, :] < dict_size[:, None]
    matches = (left_raw[:, :, None] == left_dict[:, None, :]) \
        & valid[:, None, :]
    in_dict = matches.any(axis=2)
    idx = jnp.argmax(matches, axis=2).astype(jnp.uint16)
    idx = jnp.where(in_dict, idx, dict_size[:, None].astype(jnp.uint16))
    exc_mask = ~in_dict
    return right, idx, exc_mask, left_raw


@partial(jax.jit, static_argnames=("element_bits",))
def rd_decode_vectors(right, left_idx, right_bw, left_dict, *, element_bits):
    """rd_encoder::decode (rd.hpp:152-178) batched; exceptions patched by
    the caller (the reference overwrites exception positions afterwards)."""
    ut = right.dtype
    safe = jnp.minimum(left_idx.astype(jnp.int32),
                       left_dict.shape[1] - 1)
    left = jnp.take_along_axis(left_dict, safe, axis=1).astype(ut)
    rbw = right_bw.astype(ut)[:, None]
    return (left << rbw) | right
