"""Batched ALP primitives (jit-able, TPU-first).

Arrays are shaped ``[n_vectors, 1024]``; per-vector metadata is SoA
(``fac[n]``, ``exp[n]``, ...).  Doubles travel as uint64 bit patterns with
softfloat semantics (see ops.numerics); floats are native f32.

These mirror the reference per-vector primitives
(include/alp/encoder.hpp:241-418, decoder.hpp:128-149) with control flow
vectorised: the sequential early-exit of the second-level sampling is
replayed as a 5-step scan with identical accept/stop semantics, so results
are bit-identical to the oracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from .numerics import Numerics, numerics_for


def _take(table: np.ndarray, idx) -> jnp.ndarray:
    return jnp.asarray(table)[idx]


def bit_width_of(delta) -> jnp.ndarray:
    """Bit length of an unsigned integer array (0 for 0), any int width."""
    x = delta
    nbits = np.dtype(x.dtype).itemsize * 8
    bw = jnp.zeros(x.shape, jnp.int32)
    s = nbits // 2
    while s:
        big = (x >> x.dtype.type(s)) != 0
        bw = bw + jnp.where(big, jnp.int32(s), 0)
        x = jnp.where(big, x >> x.dtype.type(s), x)
        s //= 2
    return bw + (x != 0).astype(jnp.int32)


def encode_value_unsafe(nm: Numerics, values, fac_idx, exp_idx):
    """encode_value<SAFE=false> (encoder.hpp:82-89), batched.

    ``values`` in ops representation; fac/exp int32, broadcastable.
    """
    tmp = nm.mul(values, _take(nm.exp_tab, exp_idx))
    tmp = nm.mul(tmp, _take(nm.frac_tab, fac_idx))
    magic = nm.values_from_np(np.array(nm.tc.magic_number, nm.tc.pt))[()]
    neg_magic = nm.values_from_np(np.array(-nm.tc.magic_number, nm.tc.pt))[()]
    # barrier: XLA's simplifier can reassociate (x + M) + (-M) into x,
    # deleting the magic rounding (observed on the f32 path)
    rounded = nm.add(jax.lax.optimization_barrier(nm.add(tmp, magic)),
                     neg_magic)
    return nm.float_to_int(rounded)


def decode_value(nm: Numerics, encoded, fac_idx, exp_idx):
    """decode_value (decoder.hpp:128-131), batched.

    Emulates the reference float-path OOB quirk (factor index == table
    size) by returning NaN, which never round-trips (see oracle.core).
    """
    n_fact = len(nm.fact_tab)
    safe_fac = jnp.minimum(fac_idx, n_fact - 1)
    fact = _take(nm.fact_tab, safe_fac)
    m = encoded.astype(nm.st) * fact.astype(nm.st)   # wrapping product
    out = nm.mul(nm.int_to_float(m), _take(nm.frac_tab, exp_idx))
    if np.dtype(nm.vt) == np.uint64:
        nan_rep = jnp.uint64(0x7FF8000000000000)
    else:
        nan_rep = jnp.array(np.nan, jnp.float32)
    return jnp.where(fac_idx >= n_fact, nan_rep, out)


def replace_specials(nm: Numerics, values):
    """NaN/±Inf/-0.0 -> ENCODING_UPPER_LIMIT (encoder.hpp:324-338)."""
    bits = nm.bits(values)
    ut = bits.dtype.type
    special = ((bits & ut(nm.tc.sign_bit_mask))
               >= ut(nm.tc.exponential_bits_mask))
    special = special | (bits == ut(nm.tc.negative_zero))
    upper = nm.values_from_np(
        np.array(nm.tc.encoding_upper_limit_pt, nm.tc.pt))[()]
    return jnp.where(special, upper, values)


def encode_vectors(nm: Numerics, values, fac_idx, exp_idx):
    """encode_simdized (encoder.hpp:307-400), batched over vectors.

    values: [n, 1024] (ops representation); fac/exp: [n] int32.
    Returns (patched_encoded [n,1024] st, exc_mask [n,1024] bool).
    Exception *values* are the original inputs at masked positions;
    compaction to (value, position) lists happens container-side.
    """
    replaced = replace_specials(nm, values)
    f = fac_idx[:, None]
    e = exp_idx[:, None]
    encoded = encode_value_unsafe(nm, replaced, f, e)
    decoded = decode_value(nm, encoded, f, e)
    exc = ~nm.eq(decoded, replaced)
    ok = ~exc
    first_ok = jnp.argmax(ok, axis=1)
    any_ok = ok.any(axis=1)
    a_non_exc = jnp.where(
        any_ok,
        jnp.take_along_axis(encoded, first_ok[:, None], axis=1)[:, 0],
        nm.st.type(0))
    patched = jnp.where(exc, a_non_exc[:, None], encoded)
    return patched, exc


def decode_vectors(nm: Numerics, encoded, fac_idx, exp_idx):
    """decoder::decode batched; exceptions patched separately."""
    return decode_value(nm, encoded, fac_idx[:, None], exp_idx[:, None])


def analyze_ffor(nm: Numerics, encoded):
    """analyze_ffor (encoder.hpp:109-120) batched: (bit_width, base)."""
    mn = encoded.min(axis=1)
    mx = encoded.max(axis=1)
    delta = (mx.astype(nm.ut) - mn.astype(nm.ut))
    return bit_width_of(delta), mn


def _estimate_sizes(nm: Numerics, samples, fac_idx, exp_idx, n_samples):
    """Estimated compressed size of ``samples`` under each (e, f).

    samples: [..., s]; fac/exp broadcastable to samples[..., 1] leading dims.
    Mirrors encoder.hpp:260-281 (SAFE encode, count_bits over the wrapped
    min/max delta with sentinel init values when everything excepts).
    Returns (est_size, exc_count, non_exc_count) with the reference's
    32-sample bit-cost convention.
    """
    tmp = nm.mul(samples, _take(nm.exp_tab, exp_idx))
    tmp = nm.mul(tmp, _take(nm.frac_tab, fac_idx))
    # SAFE guard (encoder.hpp:84-85), with the C++ promotion-to-double rules
    impossible = nm.is_impossible(tmp)
    magic = nm.values_from_np(np.array(nm.tc.magic_number, nm.tc.pt))[()]
    neg_magic = nm.values_from_np(np.array(-nm.tc.magic_number, nm.tc.pt))[()]
    # barrier: XLA's simplifier reassociates (x + M) + (-M) into x under
    # jit, deleting the magic rounding (observed on the f32 path: the
    # second-level estimate then mis-ranks candidates vs the oracle)
    rounded = nm.add(jax.lax.optimization_barrier(nm.add(tmp, magic)),
                     neg_magic)
    encoded = nm.float_to_int(rounded)
    if np.dtype(nm.st) == np.int64:
        fallback = nm.st.type(int(C.ENCODING_UPPER_LIMIT))
    else:
        fallback = nm.st.type(np.iinfo(nm.st).min)
    encoded = jnp.where(impossible, fallback, encoded)
    decoded = decode_value(nm, encoded, fac_idx, exp_idx)
    ok = nm.eq(decoded, samples)

    int_min = nm.st.type(np.iinfo(nm.st).min)
    int_max = nm.st.type(np.iinfo(nm.st).max)
    mx = jnp.where(ok, encoded, int_min).max(axis=-1)
    mn = jnp.where(ok, encoded, int_max).min(axis=-1)
    non_exc = ok.sum(axis=-1).astype(jnp.int32)
    exc = n_samples - non_exc
    bits = bit_width_of(mx.astype(nm.ut) - mn.astype(nm.ut))
    est = (C.SAMPLES_PER_VECTOR * bits.astype(jnp.int64)
           + exc.astype(jnp.int64)
           * (nm.tc.exception_size + C.EXCEPTION_POSITION_SIZE))
    return est, exc, non_exc


def choose_factor_exponent(nm: Numerics, vectors, combos, k_count):
    """Second-level sampling (encoder.hpp:241-305), batched over vectors.

    vectors: [n, 1024]; combos: [n, 5, 2] int32 (exp, fac) per vector's
    rowgroup, padded; k_count: [n] int32 (1..5).
    Returns (fac [n], exp [n]) int32, replaying the sequential early-exit.
    """
    samples = vectors[:, ::C.VECTOR_SIZE // C.SAMPLES_PER_VECTOR]
    return choose_factor_exponent_from_samples(nm, samples, combos,
                                               k_count)


def choose_factor_exponent_from_samples(nm: Numerics, samples, combos,
                                        k_count):
    """Second-level choice given the 32-value-per-vector sample strides
    directly (device pipelines gather the stride on device and ship only
    3% of the data to this host-side exact-f64 step)."""
    combos = jnp.asarray(combos)
    k_count = jnp.asarray(k_count)
    exps = combos[:, :, 0]
    facs = combos[:, :, 1]
    est, _, _ = _estimate_sizes(
        nm, samples[:, None, :], facs[:, :, None], exps[:, :, None],
        jnp.int32(C.SAMPLES_PER_VECTOR))        # [n, 5]
    return accept_scan(est, combos, k_count)


def accept_scan(est, combos, k_count):
    """The sequential accept/early-exit rule of the second-level choice
    (encoder.hpp:283-302) over precomputed estimates [n, 5]; shared by
    the exact path above and the Pallas scorer (kernels.score)."""
    n = est.shape[0]
    combos = jnp.asarray(combos)
    k_count = jnp.asarray(k_count)
    exps = combos[:, :, 0]
    facs = combos[:, :, 1]
    est = est.astype(jnp.int64)

    def step(carry, k):
        found_e, found_f, best, worse, stopped = carry
        e_k = exps[:, k]
        f_k = facs[:, k]
        est_k = est[:, k]
        active = (~stopped) & (k < k_count)
        is_first = k == 0
        improve = est_k < best
        accept = active & (is_first | improve)
        new_worse = jnp.where(
            active & ~is_first & ~improve, worse + 1, jnp.where(
                active & improve, 0, worse))
        stop = new_worse >= C.SAMPLING_EARLY_EXIT_THRESHOLD
        carry = (
            jnp.where(accept, e_k, found_e),
            jnp.where(accept, f_k, found_f),
            jnp.where(accept, est_k, best),
            new_worse,
            stopped | (active & stop),
        )
        return carry, None

    init = (jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
            jnp.zeros(n, jnp.int64), jnp.zeros(n, jnp.int32),
            jnp.zeros(n, jnp.bool_))
    (found_e, found_f, _, _, _), _ = jax.lax.scan(
        step, init, jnp.arange(C.MAX_K_COMBINATIONS))
    return found_f, found_e


def first_level_combos(nm: Numerics, chunks):
    """First-level rowgroup planning (find_top_k_combinations,
    encoder.hpp:139-235) fully in-graph, for FULL rowgroups (every
    sampled vector carries SAMPLES_PER_VECTOR valid samples).

    chunks: [R, V, S] rowgroup samples in ops representation (V sampled
    vectors x S = 32 strided values each).  Returns
    ``(combos [R, 5, 2] int32 (e, f), k_count [R] int32, is_rd [R])`` —
    the exact oracle outputs (vote per sampled vector = lexicographic
    min of (est, -e, -f); rank by (-count, -e, -f); scheme = ALP_RD
    when even the best estimate reaches RD_SIZE_THRESHOLD_LIMIT).
    Semantics cross-checked against oracle.find_top_k_combinations in
    tests; runs on TPU via exact softfloat, so device compression needs
    no host round-trip for planning.
    """
    tc = nm.tc
    R, V, S = chunks.shape
    es_np, fs_np = ef_pairs_arrays(tc)
    es = jnp.asarray(es_np)
    fs = jnp.asarray(fs_np)
    est, _, non_exc = _estimate_sizes(
        nm, chunks[:, :, None, :], fs[None, None, :, None],
        es[None, None, :, None], jnp.int32(S))          # [R, V, P]
    return first_level_vote(est, non_exc, S, tc)


def ef_pairs_arrays(tc):
    """(e, f) candidate enumeration in find_top_k iteration order."""
    pairs = [(e, f) for e in range(tc.max_exponent, -1, -1)
             for f in range(e, -1, -1)]
    return (np.array([p[0] for p in pairs], np.int32),
            np.array([p[1] for p in pairs], np.int32))


def first_level_vote(est, non_exc, S, tc):
    """Vote + rank of find_top_k_combinations over precomputed per-pair
    estimates [R, V, P] (pair axis in ef_pairs_arrays order); shared by
    the exact softfloat path above and the Pallas scorer."""
    es_np, fs_np = ef_pairs_arrays(tc)
    es = jnp.asarray(es_np)
    fs = jnp.asarray(fs_np)
    P = len(es_np)
    est = est.astype(jnp.int64)
    worst = (S * (tc.exception_size + C.EXCEPTION_POSITION_SIZE)
             + S * tc.exception_size)
    valid = (non_exc >= 2) & (est <= worst)
    # per-vector winner: lexicographic min of (est, -e, -f) — composite
    # key fits int32 (est <= worst < 2^13, e/f <= 18 < 2^5)
    me = jnp.int32(tc.max_exponent)
    comp = ((est.astype(jnp.int32) << 16)
            | ((me - es) << 8)[None, None, :] | (me - fs)[None, None, :])
    keys = jnp.where(valid, comp, jnp.int32(2**31 - 1))
    win = jnp.argmin(keys, axis=-1)                     # [R, V]
    any_valid = valid.any(axis=-1)
    win = jnp.where(any_valid, win, jnp.int32(P - 1))   # fallback (0, 0)
    est_win = jnp.take_along_axis(est, win[..., None], -1)[..., 0]
    contrib = jnp.where(any_valid, est_win, jnp.int64(worst))
    best_est = jnp.minimum(jnp.int64(worst), contrib.min(axis=1))
    is_rd = best_est >= tc.rd_size_threshold_limit
    counts = (win[..., None] == jnp.arange(P)[None, None, :]).sum(
        axis=1).astype(jnp.int32)                       # [R, P]
    rank = jnp.where(counts > 0, (counts << 16) | (es << 8)[None] | fs[None],
                     jnp.int32(-1))
    _, top_idx = jax.lax.top_k(rank, C.MAX_K_COMBINATIONS)   # [R, 5]
    k_count = jnp.minimum(jnp.int32(C.MAX_K_COMBINATIONS),
                          (counts > 0).sum(axis=-1).astype(jnp.int32))
    combos = jnp.stack([es[top_idx], fs[top_idx]], axis=-1)  # [R, 5, 2]
    live = (jnp.arange(C.MAX_K_COMBINATIONS)[None, :]
            < k_count[:, None])[..., None]
    return jnp.where(live, combos, 0), k_count, is_rd


@partial(jax.jit, static_argnames=("dtype",))
def encode_pipeline(values, combos, k_count, *, dtype):
    """Fused per-vector encode: 2nd-level (e,f) choice + encode + analyze.

    values: [n, 1024] ops representation; combos/k_count per vector.
    Returns dict of patched ints, exception mask, fac, exp, bit_width, base.
    """
    nm = numerics_for(dtype)
    fac, exp = choose_factor_exponent(nm, values, combos, k_count)
    patched, exc = encode_vectors(nm, values, fac, exp)
    bw, base = analyze_ffor(nm, patched)
    return {"encoded": patched, "exc_mask": exc, "fac": fac, "exp": exp,
            "bit_width": bw, "base": base}


@partial(jax.jit, static_argnames=("dtype",))
def decode_pipeline(encoded, fac, exp, *, dtype):
    """Unfused decode (decoder.hpp:134-138) batched; patching is separate."""
    nm = numerics_for(dtype)
    return decode_vectors(nm, encoded, fac, exp)
