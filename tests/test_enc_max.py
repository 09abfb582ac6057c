"""Format-v2 enc_max acceleration metadata.

Every compress path persists the exact per-vector max FFOR delta so
build_plan proves fast-variant eligibility without re-unpacking
borderline vectors (VERDICT r2 item 3; reference has per-vector bw/base
available at zero cost in its format, alp.cpp:236-239 scan path).
"""

import numpy as np
import pytest

import alp_tpu
from alp_tpu import container
from alp_tpu import constants as C
from alp_tpu.kernels import decode as kdecode
from alp_tpu.oracle import fastlanes as ofl


def _true_umax(col, v):
    if int(col.bit_width[v]) == 0:
        return np.uint64(0)
    u = ofl.unffor_unpack(col.packed[v], int(col.bit_width[v]),
                          np.uint64(0), np.uint64)
    return np.uint64(u.max())


@pytest.mark.parametrize("path", [
    "city_temperature_f_tw.bin", "bitcoin_transactions_f_tw.bin",
    "nyc29_tw.bin", "gov26_tw.bin"])
def test_enc_max_is_exact(path):
    data = np.fromfile(f"/root/reference/data/1_rg_data_sample/{path}",
                       np.float64)
    cc = container.compress(data)
    assert cc.enc_max is not None
    vec_rg = np.arange(cc.n_vectors) // C.N_VECTORS_PER_ROWGROUP
    for v in range(cc.n_vectors):
        if cc.rg_scheme[vec_rg[v]] != C.SCHEME_ALP:
            continue
        assert cc.enc_max[v] == _true_umax(cc, v), v


def test_enc_max_survives_serialization():
    rng = np.random.default_rng(7)
    data = np.round(rng.uniform(-100, 100, 3000), 2)
    cc = container.compress(data)
    assert cc.enc_max is not None
    back = container.CompressedColumn.from_bytes(cc.to_bytes())
    np.testing.assert_array_equal(back.enc_max, cc.enc_max)
    # column without the metadata serializes flag-free and loads as None
    cc.enc_max = None
    back2 = container.CompressedColumn.from_bytes(cc.to_bytes())
    assert back2.enc_max is None
    out = container.decompress(back2)
    np.testing.assert_array_equal(out.view(np.uint64), data.view(np.uint64))


def test_enc_max_range_validated():
    rng = np.random.default_rng(8)
    cc = container.compress(np.round(rng.uniform(-100, 100, 2048), 2))
    bad = cc.enc_max.copy()
    bad[0] = np.uint64(1) << np.uint64(int(cc.bit_width[0]) + 1)
    cc.enc_max = bad
    with pytest.raises(ValueError, match="enc_max"):
        container.CompressedColumn.from_bytes(cc.to_bytes())


@pytest.mark.parametrize("path", [
    "bitcoin_transactions_f_tw.bin",   # bw 30 at the 2^53 odd-part edge
    "nyc29_tw.bin",                    # bw > 32 (mid64 route)
    "city_temperature_f_tw.bin"])
def test_plan_routing_matches_refinement(path):
    """Plans built from persisted enc_max must route every bucket exactly
    as the on-demand refinement (host unpack) does."""
    data = np.fromfile(f"/root/reference/data/1_rg_data_sample/{path}",
                       np.float64)
    cc = container.compress(data)
    with_meta = kdecode.build_plan(cc)
    cc.enc_max = None
    without = kdecode.build_plan(cc)
    key = lambda p: sorted((g.bw, g.variant, g.flags, g.n_vectors,
                            tuple(g.vec_indices)) for g in p.groups)
    assert key(with_meta) == key(without)


def test_device_decode_with_enc_max_bit_exact():
    data = np.fromfile(
        "/root/reference/data/1_rg_data_sample/bitcoin_transactions_f_tw.bin",
        np.float64)
    cc = container.compress(data)
    assert cc.enc_max is not None
    out = kdecode.decompress_device(cc).reshape(-1)[:len(data)]
    np.testing.assert_array_equal(out.view(np.uint64), data.view(np.uint64))
