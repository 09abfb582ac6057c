"""Direct cross-check of the three rowgroup planners.

encoder_init(fast=True) (vectorised), fast=False (reference-exact loop,
encoder.hpp:139-235 semantics), and the native C++ engine's alp_init_f64
must return identical scheme / top-k combinations on every input —
including tail rowgroups whose sample count is not a multiple of 32.
"""

import numpy as np
import pytest

from alp_tpu import constants as C
from alp_tpu.oracle import core as ocore
from alp_tpu.utils import datasets, io

try:
    from alp_tpu import native
    native.build()
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False


def _cases():
    rng = np.random.default_rng(42)
    cases = [
        ("decimal2", np.round(rng.uniform(-1000, 1000, C.ROWGROUP_SIZE), 2)),
        ("decimal5", np.round(rng.uniform(-5, 5, C.ROWGROUP_SIZE), 5)),
        ("ints", rng.integers(-10**6, 10**6, C.ROWGROUP_SIZE).astype(
            np.float64)),
        ("highprec", rng.standard_normal(C.ROWGROUP_SIZE)),
        # tail rowgroups: not a multiple of 1024 values -> ragged sampling
        ("tail_1500", np.round(rng.uniform(-10, 10, 1500), 3)),
        ("tail_100", np.round(rng.uniform(-10, 10, 100), 1)),
        ("tail_33", np.round(rng.uniform(0, 1, 33), 4)),
        ("tail_9000", np.round(rng.uniform(-1, 1, 9000), 6)),
        ("single", np.array([3.17])),
        ("mixed_mag", np.concatenate([
            np.round(rng.uniform(-1e6, 1e6, 700), 1),
            np.round(rng.uniform(-1e-3, 1e-3, 700), 8)])),
    ]
    for col in datasets.ALP_DATASET:
        if col.name in ("City-Temp", "Air-Pressure", "POI-lat", "Gov/26"):
            data = io.read_csv(col.csv_path, np.float64)
            cases.append((col.name, data[:C.ROWGROUP_SIZE]))
            # dataset-derived tail (not multiple of 32 samples)
            cases.append((col.name + "_tail", data[:1337]))
    return cases


@pytest.mark.parametrize("name,data", _cases(), ids=lambda c: c if
                         isinstance(c, str) else "")
def test_planners_agree(name, data):
    tc = C.DOUBLE
    fast = ocore.encoder_init(data, 0, tc, fast=True)
    loop = ocore.encoder_init(data, 0, tc, fast=False)
    assert fast.scheme == loop.scheme
    if fast.scheme == C.SCHEME_ALP:
        assert fast.best_k_combinations == loop.best_k_combinations
    if HAVE_NATIVE:
        scheme, combos, k = native.init_f64(data, 0)
        assert scheme == loop.scheme
        if scheme == C.SCHEME_ALP:
            got = [tuple(int(x) for x in c) for c in combos[:k]]
            assert got == loop.best_k_combinations


@pytest.mark.parametrize("name,data", [c for c in _cases()
                                       if len(c[1]) >= C.ROWGROUP_SIZE])
def test_in_graph_first_level_matches_oracle(name, data):
    """ops.alp.first_level_combos (the in-graph device planner used by
    compress_device on full rowgroups) must reproduce the oracle's
    scheme decision and top-k combinations exactly."""
    from alp_tpu.ops import alp as oalp
    from alp_tpu.ops.numerics import numerics_for

    data = data[:C.ROWGROUP_SIZE]
    tc = C.constants_for(np.float64)
    nm = numerics_for(np.float64)
    pos = ocore.first_level_sample(
        np.arange(C.ROWGROUP_SIZE, dtype=np.float64), 0).astype(np.int64)
    V = len(pos) // C.SAMPLES_PER_VECTOR
    chunks = data[pos].reshape(1, V, C.SAMPLES_PER_VECTOR)
    combos, kc, is_rd = (np.asarray(x) for x in oalp.first_level_combos(
        nm, nm.values_from_np(chunks)))

    stt = ocore.AlpState(scheme=C.SCHEME_ALP)
    stt.sampled_values_n = len(pos)
    stt.k_combinations = C.MAX_K_COMBINATIONS
    stt.best_k_combinations = []
    ocore.find_top_k_combinations_fast(data[pos], stt, tc)
    assert bool(is_rd[0]) == (stt.scheme == C.SCHEME_ALP_RD)
    if not is_rd[0]:
        got = [tuple(map(int, combos[0, k])) for k in range(kc[0])]
        want = [tuple(map(int, ef)) for ef in stt.best_k_combinations]
        assert got == want


def test_f32_second_level_matches_oracle_under_jit():
    """Regression: XLA's simplifier folded (x + M) - M inside the jitted
    f32 second-level estimate, deleting the magic rounding and mis-
    ranking candidates vs the oracle (encode_value_unsafe already had
    the optimization_barrier; _estimate_sizes did not)."""
    from alp_tpu import container
    from alp_tpu.ops import alp as oalp
    from alp_tpu.ops.numerics import numerics_for

    rng = np.random.default_rng(19)
    rng.uniform(-900, 900, 3000)
    rng.uniform(0, 10, 2048)
    data = np.concatenate([
        np.round(rng.uniform(-50, 50, 52 * 1024), d).astype(np.float32)
        for d in (1, 2, 0, 2)])
    vectors, n_vec = container._pad_to_vectors(data)
    tc = C.constants_for(np.float32)
    flat = vectors.reshape(-1)
    combos = np.zeros((n_vec, C.MAX_K_COMBINATIONS, 2), np.int32)
    k_count = np.zeros(n_vec, np.int32)
    for rg in range(3):
        lo = rg * C.N_VECTORS_PER_ROWGROUP
        hi = min(n_vec, lo + C.N_VECTORS_PER_ROWGROUP)
        stt = ocore.encoder_init(flat[lo * 1024:hi * 1024], 0, tc)
        for i, (e, f) in enumerate(stt.best_k_combinations):
            combos[lo:hi, i] = (e, f)
        k_count[lo:hi] = len(stt.best_k_combinations)
    nm = numerics_for(np.float32)
    res = oalp.encode_pipeline(nm.values_from_np(vectors),
                               combos, k_count, dtype=np.float32)
    fac_j = np.asarray(res["fac"])
    exp_j = np.asarray(res["exp"])
    # the historically mis-chosen vectors (jit picked (7,5); oracle (6,4))
    for v in (61, 62, 102, 189):
        cand = [tuple(map(int, combos[v, i])) for i in range(k_count[v])]
        f_o, e_o = ocore.find_best_exponent_factor_from_combinations(
            cand, len(cand), vectors[v][::32], tc)
        assert (int(fac_j[v]), int(exp_j[v])) == (f_o, e_o), v
