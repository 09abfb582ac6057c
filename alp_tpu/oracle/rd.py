"""NumPy oracle for the ALP_RD ("real doubles") scheme.

Bit-exact reimplementation of reference include/alp/rd.hpp:17-186.  Each
value's bit pattern is cut into a left part (top ``cut`` bits,
dictionary-encoded against an 8-entry dictionary built from the rowgroup
sample) and a right part (bottom ``width - cut`` bits, stored raw).  Left
parts missing from the dictionary become (value, position) exceptions.

Determinism note: the reference sorts candidate left parts by repetition
count with std::sort over an unordered_map's iteration order, so the order
of *tied* counts is implementation-defined there.  We tie-break by smaller
left value, which is deterministic and yields identical compressed sizes
(the cost model only depends on counts).
"""

from __future__ import annotations

import dataclasses
import math
import numpy as np

from .. import constants as C
from ..constants import TypeConstants
from .core import AlpState, first_level_sample


def _left_parts_histogram(sample_bits: np.ndarray, right_bw: int):
    lefts, counts = np.unique(sample_bits >> np.uint64(right_bw)
                              if sample_bits.dtype == np.uint64
                              else sample_bits >> np.uint32(right_bw),
                              return_counts=True)
    # Sort by count desc, then left value asc (deterministic tie-break).
    order = np.lexsort((lefts, -counts))
    return lefts[order], counts[order]


def build_left_parts_dictionary(sample: np.ndarray, right_bw: int,
                                stt: AlpState, tc: TypeConstants,
                                persist: bool) -> float:
    """build_left_parts_dictionary (rd.hpp:33-87): returns estimated size.

    estimated bits/value = left_bw + right_bw + exceptions*(16+16)/n_samples.
    """
    bits = sample.view(tc.ut)
    lefts, counts = _left_parts_histogram(bits, right_bw)
    exceptions_count = int(counts[C.MAX_RD_DICTIONARY_SIZE:].sum())
    actual_dictionary_size = min(C.MAX_RD_DICTIONARY_SIZE, len(lefts))
    left_bw = max(1, math.ceil(math.log2(actual_dictionary_size))
                  if actual_dictionary_size else 0)

    if persist:
        stt.left_parts_dict = lefts[:actual_dictionary_size].astype(np.uint16)
        stt.left_parts_dict_map = {
            int(lefts[i]): i for i in range(actual_dictionary_size)
        }
        stt.left_bit_width = left_bw
        stt.right_bit_width = right_bw
        stt.actual_dictionary_size = actual_dictionary_size

    exceptions_size = exceptions_count * (C.RD_EXCEPTION_POSITION_SIZE
                                          + C.RD_EXCEPTION_SIZE)
    return right_bw + left_bw + exceptions_size / stt.sampled_values_n


def find_best_dictionary(sample: np.ndarray, stt: AlpState,
                         tc: TypeConstants) -> None:
    """find_best_dictionary (rd.hpp:89-104): sweep cut in [1, 16]."""
    best_right_bw = 0
    best_size = math.inf
    for cut in range(1, C.CUTTING_LIMIT + 1):
        right_bw = tc.exact_type_bit_size - cut
        size = build_left_parts_dictionary(sample, right_bw, stt, tc,
                                           persist=False)
        if size < best_size:
            best_right_bw = right_bw
            best_size = size
    build_left_parts_dictionary(sample, best_right_bw, stt, tc, persist=True)


@dataclasses.dataclass
class RdEncodedVector:
    right_parts: np.ndarray      # UT[1024]  (bottom right_bw bits)
    left_parts: np.ndarray       # u16[1024] (dictionary indexes)
    exc_values: np.ndarray       # u16[n_exc] (raw left parts)
    exc_positions: np.ndarray    # u16[n_exc]


def rd_encode_vector(values: np.ndarray, stt: AlpState,
                     tc: TypeConstants) -> RdEncodedVector:
    """rd_encoder::encode (rd.hpp:109-147), vectorised."""
    bits = values.view(tc.ut)
    rbw = stt.right_bit_width
    right = bits & tc.ut.type((1 << rbw) - 1)
    left_raw = (bits >> tc.ut.type(rbw)).astype(np.uint16)

    dict_arr = stt.left_parts_dict  # u16[actual_dictionary_size]
    # index of each left part in the dictionary; misses -> dict size.
    matches = left_raw[:, None] == dict_arr[None, :].astype(np.uint16)
    idx = np.where(matches.any(axis=1), matches.argmax(axis=1),
                   stt.actual_dictionary_size).astype(np.uint16)
    exc_mask = idx >= stt.actual_dictionary_size
    exc_positions = np.nonzero(exc_mask)[0].astype(np.uint16)
    return RdEncodedVector(
        right_parts=right,
        left_parts=idx,
        exc_values=left_raw[exc_positions],
        exc_positions=exc_positions,
    )


def rd_decode_vector(enc: RdEncodedVector, stt: AlpState,
                     tc: TypeConstants) -> np.ndarray:
    """rd_encoder::decode (rd.hpp:152-178): glue left<<rbw | right + patch."""
    rbw = tc.ut.type(stt.right_bit_width)
    # Out-of-dictionary indexes will be patched below; clip for the gather.
    safe_idx = np.minimum(enc.left_parts,
                          max(stt.actual_dictionary_size - 1, 0))
    left = stt.left_parts_dict[safe_idx].astype(tc.ut)
    out = (left << rbw) | enc.right_parts
    out[enc.exc_positions] = ((enc.exc_values.astype(tc.ut) << rbw)
                              | enc.right_parts[enc.exc_positions])
    return out.view(tc.pt)


def rd_encoder_init(data: np.ndarray, offset: int,
                    tc: TypeConstants) -> AlpState:
    """rd_encoder::init (rd.hpp:180-185)."""
    stt = AlpState(scheme=C.SCHEME_ALP_RD)
    sample = first_level_sample(data, offset)
    stt.sampled_values_n = len(sample)
    find_best_dictionary(sample, stt, tc)
    return stt
