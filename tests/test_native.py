"""Native host engine (libalpcore) parity vs the oracle."""

import numpy as np
import pytest

from alp_tpu import constants as C
from alp_tpu.oracle import core as ocore
from alp_tpu.oracle import fastlanes as ofl

native = pytest.importorskip("alp_tpu.native")

try:
    native.build()
except native.NativeUnavailable:
    pytest.skip("no C++ toolchain", allow_module_level=True)

rng = np.random.default_rng(0)


@pytest.mark.parametrize("ut,bws", [
    (np.uint64, (0, 5, 17, 33, 52, 64)),
    (np.uint32, (0, 3, 17, 32)),
    (np.uint16, (0, 2, 9, 16)),
])
def test_native_ffor_roundtrip(ut, bws):
    for bw in bws:
        lim = min(bw, 62)
        vals = (rng.integers(0, 1 << lim, (4, 1024), dtype=np.uint64)
                .astype(ut) if bw else np.zeros((4, 1024), ut))
        base = ut(7)
        vals += base
        pk = native.ffor(vals, bw, base)
        exp = np.stack([ofl.ffor_pack(v, bw, base) for v in vals])
        np.testing.assert_array_equal(pk, exp)
        back = native.unffor(pk, bw, base, ut)
        np.testing.assert_array_equal(back, vals)


def test_native_falp_matches_oracle():
    tc = C.DOUBLE
    ints = rng.integers(0, 1 << 30, (3, 1024), dtype=np.int64)
    pk = native.ffor(ints.view(np.uint64), 30, np.uint64(0))
    offs = (np.arange(3, dtype=np.int32) * 30 * 16)
    out = native.falp_f64(pk.reshape(-1), offs,
                          np.full(3, 30, np.uint8), np.zeros(3, np.int64),
                          tc.fact_arr[np.full(3, 5)],
                          tc.frac_arr[np.full(3, 9)])
    expect = ocore.decode_value(ints, 5, 9, tc)
    np.testing.assert_array_equal(out.view(np.uint64),
                                  expect.view(np.uint64))
