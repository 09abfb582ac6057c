"""JAX ops layer vs NumPy oracle: bit-exact equivalence on real data.

Every batched op must reproduce the oracle exactly — same encoded
integers, same exception sets, same (fac, exp) choices, same packed bytes.
"""

import numpy as np
import pytest

from alp_tpu import constants as C
from alp_tpu.oracle import core as ocore
from alp_tpu.oracle import fastlanes as ofl
from alp_tpu.ops import alp as jalp
from alp_tpu.ops import fastlanes as jfl
from alp_tpu.ops.numerics import numerics_for
from alp_tpu.utils import datasets, io


def _dataset_vectors(max_cols=8):
    """A few real first-vectors spanning schemes/dtypes, plus synthetics."""
    out = []
    for col in datasets.ALP_DATASET[:max_cols] + [datasets.ALP_DATASET[23]]:
        if col.csv_path and col.csv_path.exists():
            out.append(io.read_first_vector(col))
    rng = np.random.default_rng(5)
    v = np.round(rng.normal(50, 10, 1024), 4)
    v[[3, 77, 1000]] = [np.nan, -np.inf, -0.0]
    out.append(v)
    out.append(np.full(1024, 1.25))
    return out


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_encode_decode_batch_matches_oracle(dtype):
    tc = C.constants_for(dtype)
    nm = numerics_for(dtype)
    vecs = [v.astype(dtype) for v in _dataset_vectors()]
    n = len(vecs)
    batch = np.stack(vecs)

    # Pick (fac, exp) per vector with the oracle's rowgroup machinery.
    facs, exps = [], []
    oracle_encoded, oracle_exc = [], []
    for v in vecs:
        stt = ocore.encoder_init(v, 0, tc)
        if stt.scheme != C.SCHEME_ALP:
            stt.best_k_combinations = [(tc.max_exponent, tc.max_exponent // 2)]
            stt.k_combinations = 1
        enc = ocore.encode(v, stt, tc)
        facs.append(enc.factor_idx)
        exps.append(enc.exponent_idx)
        oracle_encoded.append(enc.encoded)
        mask = np.zeros(1024, bool)
        mask[enc.exc_positions] = True
        oracle_exc.append(mask)

    values = nm.values_from_np(batch)
    fac = np.array(facs, np.int32)
    exp = np.array(exps, np.int32)
    patched, exc = jalp.encode_vectors(nm, values, fac, exp)
    np.testing.assert_array_equal(np.asarray(patched),
                                  np.stack(oracle_encoded))
    np.testing.assert_array_equal(np.asarray(exc), np.stack(oracle_exc))

    # analyze_ffor parity
    bw, base = jalp.analyze_ffor(nm, patched)
    for i in range(n):
        obw, obase = ocore.analyze_ffor(oracle_encoded[i], tc)
        assert int(bw[i]) == obw
        assert base[i] == obase

    # decode parity (bit patterns)
    decoded = jalp.decode_vectors(nm, patched, fac, exp)
    for i in range(n):
        od = ocore.decode_value(oracle_encoded[i], facs[i], exps[i], tc)
        np.testing.assert_array_equal(
            nm.values_to_np(np.asarray(decoded[i])).view(tc.ut), od.view(tc.ut))


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_second_level_choice_matches_oracle(dtype):
    tc = C.constants_for(dtype)
    nm = numerics_for(dtype)
    vecs = [v.astype(dtype) for v in _dataset_vectors()]

    combos_all, kc_all, expect, kept = [], [], [], []
    for v in vecs:
        stt = ocore.encoder_init(v, 0, tc)
        if stt.scheme != C.SCHEME_ALP or not stt.best_k_combinations:
            continue
        combos = stt.best_k_combinations
        k = stt.k_combinations
        if k > 1:
            f, e = ocore.find_best_exponent_factor_from_combinations(
                combos, k, v, tc)
        else:
            e, f = combos[0]
        pad = combos + [(0, 0)] * (C.MAX_K_COMBINATIONS - len(combos))
        combos_all.append(pad[:C.MAX_K_COMBINATIONS])
        kc_all.append(k)
        expect.append((f, e))
        kept.append(v)

    batch = np.stack(kept)
    fac, exp = jalp.choose_factor_exponent(
        nm, nm.values_from_np(batch),
        np.array(combos_all, np.int32), np.array(kc_all, np.int32))
    got = list(zip(np.asarray(fac).tolist(), np.asarray(exp).tolist()))
    assert got == expect


@pytest.mark.parametrize("dtype,max_bw", [(np.int64, 64), (np.int32, 32)])
def test_jnp_ffor_matches_oracle(dtype, max_bw):
    rng = np.random.default_rng(11)
    for bw in list(range(0, max_bw + 1, 3)) + [max_bw]:
        n = 4
        base = rng.integers(-100, 100, n).astype(dtype)
        vals = (rng.integers(0, 1 << min(bw, 62), (n, 1024), dtype=np.int64)
                .astype(dtype))
        with np.errstate(over="ignore"):
            if bw < max_bw:
                vals = vals & dtype((1 << bw) - 1)
            vals = vals + base[:, None]
        packed = np.asarray(jfl.ffor_pack(vals, base, bw=bw))
        for i in range(n):
            expect = ofl.ffor_pack(vals[i], bw, base[i])
            np.testing.assert_array_equal(packed[i].view(expect.dtype), expect)
        back = np.asarray(jfl.unffor_unpack(packed, base, bw=bw))
        np.testing.assert_array_equal(back, vals)


def test_rd_lookup_pad_sentinel_is_exception():
    """A left part equal to the 0xFFFF pad sentinel with dict_size < 8
    must be an exception (oracle/reference hash-map semantics,
    rd.hpp:127-144) — regression for the padded-dict false match."""
    from alp_tpu.constants import constants_for
    from alp_tpu.oracle import rd as ord_
    from alp_tpu.oracle.core import AlpState
    from alp_tpu.ops import rd as ordops

    tc = constants_for(np.float64)
    stt = AlpState(scheme=C.SCHEME_ALP_RD)
    stt.left_parts_dict = np.array([0x3FF8, 0x4000], np.uint16)
    stt.actual_dictionary_size = 2
    stt.left_bit_width = 1
    stt.right_bit_width = 48
    bits = np.full(1024, 1.5).view(np.uint64).copy()
    bits[7] = (np.uint64(0xFFFF) << np.uint64(48)) | np.uint64(12345)

    enc_o = ord_.rd_encode_vector(bits.view(np.float64), stt, tc)
    assert list(enc_o.exc_positions) == [7]

    dict_pad = np.full((1, 8), 0xFFFF, np.uint16)
    dict_pad[0, :2] = stt.left_parts_dict
    _, idx, excm, lraw = ordops.rd_encode_vectors(
        bits[None, :], np.array([48], np.int32), dict_pad,
        np.array([2], np.int32), element_bits=64)
    assert list(np.nonzero(np.asarray(excm)[0])[0]) == [7]
    assert np.asarray(idx)[0, 7] == 2
    assert np.asarray(lraw)[0, 7] == 0xFFFF
