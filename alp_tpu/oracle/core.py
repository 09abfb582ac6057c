"""NumPy oracle for the ALP classic (pseudo-decimal) scheme.

Bit-exact reimplementation of the reference algorithm layer
(reference include/alp/encoder.hpp, decoder.hpp, sampler.hpp).  Every
function mirrors one reference primitive; the docstrings cite the mirrored
code.  This oracle pins the exact floating-point semantics (magic-number
rounding, wrap-around integer products, tie-breaking in the (e, f) search)
that the JAX/Pallas implementations are tested against.
"""

from __future__ import annotations

import dataclasses
import math
import numpy as np

from .. import constants as C
from ..constants import TypeConstants


# ---------------------------------------------------------------------------
# Scalar/vector primitives
# ---------------------------------------------------------------------------

def _float_to_int_cast(x: np.ndarray, tc: TypeConstants) -> np.ndarray:
    """C-style float->int cast with x86 semantics.

    Truncates toward zero; NaN and out-of-range values produce INT_MIN,
    matching cvttsd2si/cvttss2si (what the reference binary does for the
    UB cases of static_cast<ST>, e.g. encoder.hpp:88 on huge inputs).
    """
    lo = tc.pt.type(tc.int_min)          # -2^63 / -2^31, exact in PT
    hi = -lo                             # +2^63 / +2^31, exact in PT
    ok = (x >= lo) & (x < hi)            # NaN compares false
    with np.errstate(invalid="ignore"):
        out = np.where(ok, x, 0).astype(tc.st)
    return np.where(ok, out, tc.st.type(tc.int_min))


def encode_value_unsafe(values: np.ndarray, factor_idx: int, exponent_idx: int,
                        tc: TypeConstants) -> np.ndarray:
    """encode_value<SAFE=false> (reference encoder.hpp:82-89), vectorised.

    n = cast((v * 10^e * 10^-f) + MAGIC - MAGIC); the magic-number trick
    rounds to nearest integer in PT arithmetic.
    """
    v = values.astype(tc.pt, copy=False)
    tmp = (v * tc.exp_arr[exponent_idx]) * tc.frac_arr[factor_idx]
    tmp = (tmp + tc.pt.type(tc.magic_number)) - tc.pt.type(tc.magic_number)
    return _float_to_int_cast(tmp, tc)


def encode_value_safe(values: np.ndarray, factor_idx: int, exponent_idx: int,
                      tc: TypeConstants) -> np.ndarray:
    """encode_value<SAFE=true> (reference encoder.hpp:82-89).

    If the scaled value is non-finite or out of int64-castable range or -0.0,
    returns cast(ENCODING_UPPER_LIMIT) instead (which for the float path is
    an out-of-int32-range double, i.e. INT32_MIN after the cast).
    """
    v = values.astype(tc.pt, copy=False)
    tmp = (v * tc.exp_arr[exponent_idx]) * tc.frac_arr[factor_idx]
    tmp64 = tmp.astype(np.float64)  # the C++ range check compares as double
    with np.errstate(invalid="ignore"):
        impossible = (~np.isfinite(tmp64)
                      | (tmp64 > C.ENCODING_UPPER_LIMIT)
                      | (tmp64 < C.ENCODING_LOWER_LIMIT)
                      | ((tmp64 == 0.0) & np.signbit(tmp64)))
    rounded = (tmp + tc.pt.type(tc.magic_number)) - tc.pt.type(tc.magic_number)
    encoded = _float_to_int_cast(rounded, tc)
    # return ENCODING_UPPER_LIMIT; (a double) converted to ST: exact for
    # int64, INT32_MIN (x86) for int32.
    if tc.st == np.int64:
        fallback = tc.st.type(int(C.ENCODING_UPPER_LIMIT))
    else:
        fallback = tc.st.type(tc.int_min)
    return np.where(impossible, fallback, encoded)


def decode_value(encoded: np.ndarray, factor_idx: int, exponent_idx: int,
                 tc: TypeConstants) -> np.ndarray:
    """decode_value (reference decoder.hpp:128-131), vectorised.

    v = (n * FACT[f]) * FRAC[e]; the integer product wraps in ST, then is
    converted (correctly rounded) to PT before the fractional multiply.

    Reference quirk: for the float path, Constants<float>::FACT_ARR has 10
    entries while MAX_EXPONENT is 10, so the candidate pair (e=10, f=10)
    makes the reference read out of bounds (constants.hpp:63) — garbage that
    in practice never round-trips, so the pair loses the search.  We model
    that deterministically as NaN (never equal, always an exception).
    """
    if factor_idx >= len(tc.fact_arr):
        return np.full(encoded.shape, np.nan, dtype=tc.pt)
    with np.errstate(over="ignore"):
        m = encoded.astype(tc.st, copy=False) * tc.fact_arr[factor_idx]
    return m.astype(tc.pt) * tc.frac_arr[exponent_idx]


def replace_specials(values: np.ndarray, tc: TypeConstants) -> np.ndarray:
    """Replace NaN/+-Inf/-0.0 with ENCODING_UPPER_LIMIT (encoder.hpp:324-338)."""
    bits = values.view(tc.ut)
    special = ((bits & tc.ut.type(tc.sign_bit_mask))
               >= tc.ut.type(tc.exponential_bits_mask))
    special |= bits == tc.ut.type(tc.negative_zero)
    return np.where(special, tc.encoding_upper_limit_pt, values)


def count_bits(delta: int) -> int:
    """count_bits (reference encoder.hpp:91-99): bit length, 0 for 0."""
    return int(delta).bit_length()


def width_of_range(max_enc, min_enc, tc: TypeConstants) -> int:
    """count_bits(max, min) (encoder.hpp:101-106): bits of wrapping delta."""
    mask = (1 << tc.exact_type_bit_size) - 1
    delta = (int(max_enc) - int(min_enc)) & mask
    return count_bits(delta)


def analyze_ffor(encoded: np.ndarray, tc: TypeConstants):
    """analyze_ffor (encoder.hpp:109-120): (bit_width, base=min)."""
    mn = encoded.min()
    mx = encoded.max()
    return width_of_range(mx, mn, tc), tc.st.type(mn)


# ---------------------------------------------------------------------------
# Vector encode (exceptions handling) — encoder.hpp:307-400
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class EncodedVector:
    encoded: np.ndarray            # ST[1024] with exception slots patched
    exc_values: np.ndarray         # PT[n_exc]  (original input values)
    exc_positions: np.ndarray      # u16[n_exc]
    factor_idx: int
    exponent_idx: int


def encode_vector(values: np.ndarray, factor_idx: int, exponent_idx: int,
                  tc: TypeConstants) -> EncodedVector:
    """encode_simdized (reference encoder.hpp:307-400), vectorised.

    Exception slots in the integer vector are overwritten with the first
    non-exception encoded value (0 if the whole vector is exceptional) to
    keep the frame-of-reference range tight.
    """
    replaced = replace_specials(values, tc)
    encoded = encode_value_unsafe(replaced, factor_idx, exponent_idx, tc)
    decoded = decode_value(encoded, factor_idx, exponent_idx, tc)
    exc_mask = decoded != replaced
    exc_positions = np.nonzero(exc_mask)[0].astype(np.uint16)

    non_exc = np.nonzero(~exc_mask)[0]
    a_non_exception_value = encoded[non_exc[0]] if non_exc.size else tc.st.type(0)

    patched = encoded.copy()
    patched[exc_positions] = a_non_exception_value
    return EncodedVector(
        encoded=patched,
        exc_values=values[exc_positions],
        exc_positions=exc_positions,
        factor_idx=factor_idx,
        exponent_idx=exponent_idx,
    )


def decode_vector(encoded: np.ndarray, factor_idx: int, exponent_idx: int,
                  exc_values: np.ndarray, exc_positions: np.ndarray,
                  tc: TypeConstants) -> np.ndarray:
    """decode + patch_exceptions (decoder.hpp:134-149)."""
    out = decode_value(encoded, factor_idx, exponent_idx, tc)
    out[exc_positions] = exc_values
    return out


# ---------------------------------------------------------------------------
# First-level sampling — sampler.hpp:15-52
# ---------------------------------------------------------------------------

def first_level_sample(data: np.ndarray, offset: int) -> np.ndarray:
    """sampler::first_level_sample over one rowgroup starting at ``offset``.

    Picks every ROWGROUP_SAMPLES_JUMP-th vector and 32 equidistant values
    from each; skips incomplete (<32 value) tail vectors unless nothing has
    been sampled yet.
    """
    data_size = len(data)
    left_in_data = data_size - offset
    portion = min(C.ROWGROUP_SIZE, left_in_data)
    available_vectors = math.ceil(portion / C.VECTOR_SIZE)
    out = []
    data_idx = offset
    for vector_idx in range(available_vectors):
        cur_n = min(data_size - data_idx, C.VECTOR_SIZE)
        if vector_idx % C.ROWGROUP_SAMPLES_JUMP != 0:
            data_idx += cur_n
            continue
        inc = max(1, math.ceil(cur_n / C.SAMPLES_PER_VECTOR))
        if cur_n < C.SAMPLES_PER_VECTOR and out:
            data_idx += cur_n
            continue
        out.append(data[data_idx:data_idx + cur_n:inc])
        data_idx += cur_n
    if not out:
        return data[:0]
    return np.concatenate(out)


# ---------------------------------------------------------------------------
# Rowgroup-level (e, f) search — encoder.hpp:139-235
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class AlpState:
    """Mirror of alp::state (encoder.hpp:35-62), shared by both schemes."""
    scheme: int = C.SCHEME_INVALID
    sampled_values_n: int = 0
    k_combinations: int = C.MAX_K_COMBINATIONS
    best_k_combinations: list = dataclasses.field(default_factory=list)
    exp: int = 0
    fac: int = 0
    # ALP_RD
    right_bit_width: int = 0
    left_bit_width: int = 0
    left_parts_dict: np.ndarray | None = None     # u16[actual_dictionary_size]
    left_parts_dict_map: dict = dataclasses.field(default_factory=dict)
    actual_dictionary_size: int = 0


def _ef_pairs(tc: TypeConstants):
    """The (exponent, factor) iteration order of find_top_k_combinations."""
    pairs = []
    for e in range(tc.max_exponent, -1, -1):
        for f in range(e, -1, -1):
            pairs.append((e, f))
    return pairs


def find_top_k_combinations(sample: np.ndarray, stt: AlpState,
                            tc: TypeConstants) -> None:
    """find_top_k_combinations (encoder.hpp:139-235), semantics-exact.

    Per sampled vector, exhaustively scores every (e, f) pair on up to 32
    samples; votes the per-vector winner into a global map; if even the best
    estimate is above RD_SIZE_THRESHOLD_LIMIT, switches the scheme to ALP_RD;
    else keeps the top-k (by count, then larger e, then larger f).
    """
    n = stt.sampled_values_n
    n_vectors = math.ceil(tc.pt.type(n) / C.SAMPLES_PER_VECTOR) if n else 0
    samples_size = min(n, C.SAMPLES_PER_VECTOR)
    worst = (samples_size * (tc.exception_size + C.EXCEPTION_POSITION_SIZE)
             + samples_size * tc.exception_size)
    pairs = _ef_pairs(tc)

    global_combinations: dict[tuple[int, int], int] = {}
    best_estimated = worst
    offset = 0
    for _ in range(int(n_vectors)):
        chunk = sample[offset:offset + samples_size]
        found_e, found_f = 0, 0
        sample_estimated = worst
        for (e, f) in pairs:
            encoded = encode_value_safe(chunk, f, e, tc)
            decoded = decode_value(encoded, f, e, tc)
            ok = decoded == chunk
            non_exc = int(ok.sum())
            exc = samples_size - non_exc
            if non_exc < 2:
                continue
            mx = encoded[ok].max()
            mn = encoded[ok].min()
            bits = width_of_range(mx, mn, tc)
            est = samples_size * bits + exc * (tc.exception_size
                                               + C.EXCEPTION_POSITION_SIZE)
            if (est < sample_estimated
                    or (est == sample_estimated and found_e < e)
                    or (est == sample_estimated and found_e == e and found_f < f)):
                sample_estimated = est
                found_e, found_f = e, f
                if sample_estimated < best_estimated:
                    best_estimated = sample_estimated
        key = (found_e, found_f)
        global_combinations[key] = global_combinations.get(key, 0) + 1
        offset += samples_size

    if best_estimated >= tc.rd_size_threshold_limit:
        stt.scheme = C.SCHEME_ALP_RD
        return

    ranked = sorted(global_combinations.items(),
                    key=lambda kv: (-kv[1], -kv[0][0], -kv[0][1]))
    stt.k_combinations = min(stt.k_combinations, len(ranked))
    stt.best_k_combinations = [ef for ef, _ in ranked[:stt.k_combinations]]


def find_best_exponent_factor_from_combinations(
        combinations: list, top_k: int, vector: np.ndarray,
        tc: TypeConstants) -> tuple[int, int]:
    """Second-level sampling (encoder.hpp:241-305): returns (factor, exponent).

    Scores the top-k candidates on 32 strided samples of the vector; stops
    early after SAMPLING_EARLY_EXIT_THRESHOLD consecutive non-improvements.
    """
    n = len(vector)
    inc = max(1, int(math.ceil(n // C.SAMPLES_PER_VECTOR)))
    samples = vector[0:n:inc]
    found_e, found_f = 0, 0
    best_size = 0
    worse_count = 0
    for k in range(top_k):
        e, f = combinations[k]
        encoded = encode_value_safe(samples, f, e, tc)
        decoded = decode_value(encoded, f, e, tc)
        ok = decoded == samples
        exc = int((~ok).sum())
        if ok.any():
            mx = encoded[ok].max()
            mn = encoded[ok].min()
        else:  # all exceptions: min/max keep their sentinel init values
            mx, mn = tc.int_min, tc.int_max
        bits = width_of_range(mx, mn, tc)
        est = (C.SAMPLES_PER_VECTOR * bits
               + exc * (tc.exception_size + C.EXCEPTION_POSITION_SIZE))
        if k == 0:
            best_size = est
            found_e, found_f = e, f
            continue
        if est >= best_size:
            worse_count += 1
            if worse_count == C.SAMPLING_EARLY_EXIT_THRESHOLD:
                break
            continue
        best_size = est
        found_e, found_f = e, f
        worse_count = 0
    return found_f, found_e


def find_top_k_combinations_fast(sample: np.ndarray, stt: AlpState,
                                 tc: TypeConstants) -> None:
    """NumPy-vectorised find_top_k_combinations: all (e, f) pairs scored at
    once per sampled vector.  Semantics-identical to the loop version (the
    sequential better-than rule at encoder.hpp:190-197 reduces to the
    lexicographic min of (size, -e, -f)); cross-checked by tests.
    """
    n = stt.sampled_values_n
    if n == 0:
        stt.best_k_combinations = [(0, 0)]
        stt.k_combinations = 1
        return
    n_vectors = int(math.ceil(tc.pt.type(n) / C.SAMPLES_PER_VECTOR))
    samples_size = min(n, C.SAMPLES_PER_VECTOR)
    worst = (samples_size * (tc.exception_size + C.EXCEPTION_POSITION_SIZE)
             + samples_size * tc.exception_size)
    pairs = np.array(_ef_pairs(tc), np.int64)          # [P, 2] (e, f)
    es, fs = pairs[:, 0], pairs[:, 1]

    # fully-broadcast SAFE encode + decode over [n_vectors, P, s]
    chunks = np.zeros((n_vectors, samples_size), tc.pt)
    valid = np.zeros((n_vectors, samples_size), bool)
    for i in range(n_vectors):
        c = sample[i * samples_size:(i + 1) * samples_size]
        chunks[i, :len(c)] = c
        valid[i, :len(c)] = True
    exp_c = tc.exp_arr[es][None, :, None]              # 10^e
    frac_c = tc.frac_arr[fs][None, :, None]            # 10^-f
    v = chunks[:, None, :]
    with np.errstate(all="ignore"):
        tmp = (v * exp_c) * frac_c
        tmp64 = tmp.astype(np.float64)
        impossible = (~np.isfinite(tmp64)
                      | (tmp64 > C.ENCODING_UPPER_LIMIT)
                      | (tmp64 < C.ENCODING_LOWER_LIMIT)
                      | ((tmp64 == 0.0) & np.signbit(tmp64)))
        rounded = (tmp + tc.pt.type(tc.magic_number)) - tc.pt.type(
            tc.magic_number)
        enc = _float_to_int_cast(rounded, tc)
        if tc.st == np.int64:
            fallback = tc.st.type(int(C.ENCODING_UPPER_LIMIT))
        else:
            fallback = tc.st.type(tc.int_min)
        enc = np.where(impossible, fallback, enc)
        # decode: wrapping int product then float multiply; model the
        # float-path OOB factor read (fs == len(fact_arr)) as NaN
        fact = np.zeros(len(pairs), tc.st)
        valid_f = fs < len(tc.fact_arr)
        fact[valid_f] = tc.fact_arr[fs[valid_f]]
        m = enc * fact[None, :, None]
        dec = m.astype(tc.pt) * tc.frac_arr[es][None, :, None]
        dec[:, ~valid_f, :] = np.nan
    ok3 = (dec == v) & valid[:, None, :]   # padded tail slots = exceptions
    non_exc3 = ok3.sum(axis=2)
    mx3 = np.where(ok3, enc, tc.st.type(tc.int_min)).max(axis=2)
    mn3 = np.where(ok3, enc, tc.st.type(tc.int_max)).min(axis=2)
    with np.errstate(over="ignore"):
        delta3 = (mx3.view(tc.ut) - mn3.view(tc.ut))
    # vectorised bit length (SWAR over the unsigned delta)
    bits3 = np.zeros(delta3.shape, np.int64)
    d = delta3.copy()
    for s in (32, 16, 8, 4, 2, 1):
        if s < tc.exact_type_bit_size:
            big = (d >> tc.ut.type(s)) != 0
            bits3 += np.where(big, s, 0)
            d = np.where(big, d >> tc.ut.type(s), d)
    bits3 += (d != 0)
    est3 = (samples_size * bits3
            + (samples_size - non_exc3)
            * (tc.exception_size + C.EXCEPTION_POSITION_SIZE))

    global_combinations: dict[tuple[int, int], int] = {}
    best_estimated = worst
    for i in range(n_vectors):
        non_exc = non_exc3[i]
        est = est3[i]
        # Sequential accept rule (encoder.hpp:190-197) == lexicographic min
        # of (est, -e, -f) over pairs with est <= worst; ties at est==worst
        # against the (0, 0) initialisation resolve identically because
        # lexsort prefers larger e/f and the initial state is (0, 0).
        valid = (non_exc >= 2) & (est <= worst)
        if not valid.any():
            key = (0, 0)
        else:
            est_v = np.where(valid, est, worst + 1)
            order = np.lexsort((-fs, -es, est_v))
            i = order[0]
            key = (int(es[i]), int(fs[i]))
            best_estimated = min(best_estimated, int(est_v[i]))
        global_combinations[key] = global_combinations.get(key, 0) + 1

    if best_estimated >= tc.rd_size_threshold_limit:
        stt.scheme = C.SCHEME_ALP_RD
        return
    ranked = sorted(global_combinations.items(),
                    key=lambda kv: (-kv[1], -kv[0][0], -kv[0][1]))
    stt.k_combinations = min(stt.k_combinations, len(ranked))
    stt.best_k_combinations = [ef for ef, _ in ranked[:stt.k_combinations]]


def encoder_init(data: np.ndarray, offset: int, tc: TypeConstants,
                 fast: bool = True) -> AlpState:
    """encoder::init (encoder.hpp:420-427): sample + pick scheme and top-k."""
    stt = AlpState(scheme=C.SCHEME_ALP)
    sample = first_level_sample(data, offset)
    stt.sampled_values_n = len(sample)
    stt.k_combinations = C.MAX_K_COMBINATIONS
    stt.best_k_combinations = []
    if fast:
        find_top_k_combinations_fast(sample, stt, tc)
    else:
        find_top_k_combinations(sample, stt, tc)
    return stt


def encode(vector: np.ndarray, stt: AlpState, tc: TypeConstants) -> EncodedVector:
    """encoder::encode (encoder.hpp:402-418): 2nd-level pick + vector encode."""
    if stt.k_combinations > 1:
        fac, exp = find_best_exponent_factor_from_combinations(
            stt.best_k_combinations, stt.k_combinations, vector, tc)
    else:
        exp, fac = stt.best_k_combinations[0]
    stt.exp, stt.fac = exp, fac
    return encode_vector(vector, fac, exp, tc)
