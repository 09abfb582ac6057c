"""FastLanes oracle property tests: pack/unpack inverse across all widths.

Byte-exactness vs the reference generated kernels was established once by
compiling the reference ffor/unffor/falp kernels and diffing outputs for
every bit width (all passed; see SURVEY.md §2.1 for the layout spec).
These tests keep the oracle honest without needing the C++ toolchain.
"""

import numpy as np
import pytest

from alp_tpu.oracle import ffor_pack, unffor_unpack


@pytest.mark.parametrize("dtype,max_bw", [(np.uint64, 64), (np.uint32, 32),
                                          (np.uint16, 16)])
def test_pack_unpack_roundtrip(dtype, max_bw):
    rng = np.random.default_rng(7)
    S = np.dtype(dtype).itemsize * 8
    L = 1024 // S
    for bw in range(max_bw + 1):
        mask = (1 << bw) - 1
        base = dtype(rng.integers(0, 1 << 8))
        vals = (rng.integers(0, 1 << 62, 1024).astype(dtype) & dtype(mask)
                if bw else np.zeros(1024, dtype))
        with np.errstate(over="ignore"):
            vals = vals + base
        packed = ffor_pack(vals, bw, base)
        assert packed.shape == (bw * L,)
        back = unffor_unpack(packed, bw, base, dtype)
        np.testing.assert_array_equal(back, vals)


def test_signed_base_roundtrip():
    rng = np.random.default_rng(3)
    vals = rng.integers(-5000, 5000, 1024).astype(np.int64)
    bw = 14
    base = np.int64(vals.min())
    packed = ffor_pack(vals, bw, base)
    back = unffor_unpack(packed, bw, base, np.int64)
    np.testing.assert_array_equal(back, vals)


def test_known_layout_u64_bw3():
    """Straddling spec check (SURVEY.md §2.1): slot 21 of a lane at bw=3
    occupies bit 63 of word 0 and bits 0-1 of word 1."""
    vals = np.zeros(1024, dtype=np.uint64)
    # lane 0, slot 21 -> logical index 21*16 + 0
    vals[21 * 16] = 0b101
    packed = ffor_pack(vals, 3, np.uint64(0))
    assert packed[0] >> 63 == 1          # low bit in word 0, bit 63
    assert packed[16] & 0b11 == 0b10     # high bits in word 1 (lane 0)
