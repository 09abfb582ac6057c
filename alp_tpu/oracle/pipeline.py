"""Column-level oracle pipelines and the compressed-size cost model.

``roundtrip_first_vector`` mirrors the reference unit test flow
(test/test_alp_sample.cpp:97-187); ``bench_column`` mirrors the
reference user benchmark rowgroup loop (benchmarks/benchmark.cpp:150-297)
including its quirks (sampling offset = rowgroup index, trailing
sub-vector values dropped), because the published compression-ratio
numbers depend on them.
"""

from __future__ import annotations

import dataclasses
import math
import numpy as np

from .. import constants as C
from ..constants import TypeConstants, constants_for
from . import core, rd, fastlanes


@dataclasses.dataclass
class VectorMetadata:
    scheme: int
    bit_width: int = 0
    exceptions_count: int = 0
    right_bit_width: int = 0
    left_bit_width: int = 0


# Cost model: publication/source_code/bench_compression_ratio/alp.cpp:14-49.
ALP_OVERHEAD_PER_VECTOR = (8 + 8 + 8 + 64) / C.VECTOR_SIZE
ALPRD_OVERHEAD_PER_VECTOR = (C.MAX_RD_DICTIONARY_SIZE * 16) / C.ROWGROUP_SIZE


def compression_ratio_bits_per_value(metadata: list[VectorMetadata],
                                     tc: TypeConstants) -> float:
    """Average bits/value under the reference's hypothetical file format."""
    if not metadata:
        return float("nan")
    total = 0.0
    scheme = metadata[0].scheme
    for m in metadata:
        if m.scheme == C.SCHEME_ALP:
            total += m.bit_width + m.exceptions_count * (
                tc.exception_size + C.EXCEPTION_POSITION_SIZE) / C.VECTOR_SIZE
        else:
            total += m.right_bit_width + m.left_bit_width + (
                m.exceptions_count
                * (C.RD_EXCEPTION_SIZE + C.RD_EXCEPTION_POSITION_SIZE)
                / C.VECTOR_SIZE)
    avg = total / len(metadata)
    avg += (ALPRD_OVERHEAD_PER_VECTOR if scheme == C.SCHEME_ALP_RD
            else ALP_OVERHEAD_PER_VECTOR)
    return avg


@dataclasses.dataclass
class FirstVectorResult:
    scheme: int
    decoded: np.ndarray
    exceptions_count: int
    bit_width: int


def roundtrip_first_vector(values: np.ndarray) -> FirstVectorResult:
    """Full encode→pack→unpack→decode pipeline on one 1024-value vector,
    exactly as test/test_alp_sample.cpp:136-180 drives it."""
    tc = constants_for(values.dtype)
    stt = core.encoder_init(values, 0, tc)

    if stt.scheme == C.SCHEME_ALP_RD:
        stt = rd.rd_encoder_init(values, 0, tc)
        enc = rd.rd_encode_vector(values, stt, tc)
        packed_right = fastlanes.ffor_pack(enc.right_parts,
                                           stt.right_bit_width, tc.ut.type(0))
        packed_left = fastlanes.ffor_pack(enc.left_parts, stt.left_bit_width,
                                          np.uint16(0))
        un_right = fastlanes.unffor_unpack(packed_right, stt.right_bit_width,
                                           tc.ut.type(0), tc.ut)
        un_left = fastlanes.unffor_unpack(packed_left, stt.left_bit_width,
                                          np.uint16(0), np.uint16)
        enc2 = dataclasses.replace(enc, right_parts=un_right,
                                   left_parts=un_left)
        decoded = rd.rd_decode_vector(enc2, stt, tc)
        return FirstVectorResult(C.SCHEME_ALP_RD, decoded,
                                 len(enc.exc_positions), 0)

    enc = core.encode(values, stt, tc)
    bw, base = core.analyze_ffor(enc.encoded, tc)
    packed = fastlanes.ffor_pack(enc.encoded, bw, base)
    unpacked = fastlanes.unffor_unpack(packed, bw, base, tc.st)
    decoded = core.decode_vector(unpacked, enc.factor_idx, enc.exponent_idx,
                                 enc.exc_values, enc.exc_positions, tc)
    return FirstVectorResult(C.SCHEME_ALP, decoded, len(enc.exc_positions), bw)


def bench_column(data: np.ndarray, validate: bool = True
                 ) -> tuple[list[VectorMetadata], float]:
    """Rowgroup loop of benchmarks/benchmark.cpp:200-287 (quirks included).

    Returns (per-vector metadata, bits/value under the cost model).
    """
    tc = constants_for(data.dtype)
    n_tuples = len(data)
    n_vecs = n_tuples // C.VECTOR_SIZE
    n_rowgroups = math.ceil(n_tuples / C.ROWGROUP_SIZE)
    metadata: list[VectorMetadata] = []

    for rg_idx in range(n_rowgroups):
        rg = data[rg_idx * C.ROWGROUP_SIZE:]
        if n_rowgroups == 1:
            n_vec_rg = n_vecs
        elif rg_idx == n_rowgroups - 1:
            n_vec_rg = n_vecs % C.N_VECTORS_PER_ROWGROUP
        else:
            n_vec_rg = C.N_VECTORS_PER_ROWGROUP
        n_values_rg = n_vec_rg * C.VECTOR_SIZE
        # Reference quirk: sampling offset = rowgroup index (benchmark.cpp:218).
        stt = core.encoder_init(rg[:n_values_rg], rg_idx, tc)

        if stt.scheme == C.SCHEME_ALP_RD:
            stt = rd.rd_encoder_init(rg[:n_values_rg], 0, tc)
            for v in range(n_vec_rg):
                vec = rg[v * C.VECTOR_SIZE:(v + 1) * C.VECTOR_SIZE]
                enc = rd.rd_encode_vector(vec, stt, tc)
                if validate:
                    dec = rd.rd_decode_vector(enc, stt, tc)
                    _assert_roundtrip(vec, dec)
                metadata.append(VectorMetadata(
                    scheme=C.SCHEME_ALP_RD,
                    right_bit_width=stt.right_bit_width,
                    left_bit_width=stt.left_bit_width,
                    exceptions_count=len(enc.exc_positions)))
        else:
            for v in range(n_vec_rg):
                vec = rg[v * C.VECTOR_SIZE:(v + 1) * C.VECTOR_SIZE]
                enc = core.encode(vec, stt, tc)
                bw, base = core.analyze_ffor(enc.encoded, tc)
                if validate:
                    dec = core.decode_vector(
                        enc.encoded.copy(), enc.factor_idx, enc.exponent_idx,
                        enc.exc_values, enc.exc_positions, tc)
                    _assert_roundtrip(vec, dec)
                metadata.append(VectorMetadata(
                    scheme=C.SCHEME_ALP,
                    bit_width=bw,
                    exceptions_count=len(enc.exc_positions)))

    return metadata, compression_ratio_bits_per_value(metadata, tc)


def _assert_roundtrip(original: np.ndarray, decoded: np.ndarray) -> None:
    """ALP_ASSERT (test_alp_sample.cpp:14-24): bit-exact incl -0.0 and NaN."""
    o, d = original, decoded
    nan_ok = np.isnan(o) & np.isnan(d)
    eq = (o == d)
    neg_zero = (o == 0.0) & np.signbit(o)
    zero_sign_ok = ~neg_zero | ((d == 0.0) & np.signbit(d))
    ok = (eq | nan_ok) & zero_sign_ok
    if not ok.all():
        bad = np.nonzero(~ok)[0][:5]
        raise AssertionError(
            f"round-trip mismatch at {bad}: {o[bad]} != {d[bad]}")
