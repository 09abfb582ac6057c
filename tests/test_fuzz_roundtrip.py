"""Adversarial whole-column round-trip fuzz (seeded, CPU).

Every distribution class that has historically broken FP codecs:
mixed magnitudes, denormals, specials, all-exception vectors, constant
runs, sign flips, values at the encode limits.  The contract under test
is the public one: compress -> serialize -> deserialize -> decompress
is the identity on bit patterns.
"""

import numpy as np
import pytest

from alp_tpu import container
from alp_tpu.kernels import decode as kdecode


def _mixtures(rng):
    yield "decimals", np.round(rng.uniform(-1e4, 1e4, 3000), 3)
    yield "tiny-decimals", np.round(rng.uniform(-1e-4, 1e-4, 2048), 9)
    yield "int-like", rng.integers(-10**9, 10**9, 2500).astype(np.float64)
    yield "denormals", rng.uniform(1e-310, 1e-308, 1500)
    yield "huge", rng.uniform(1e300, 1e308, 1200) * rng.choice(
        [-1.0, 1.0], 1200)
    yield "high-precision", rng.standard_normal(2200)
    yield "const-runs", np.repeat(
        np.round(rng.uniform(-5, 5, 30), 1), 100)
    yield "specials-dense", np.where(
        rng.random(2048) < 0.3,
        rng.choice([np.nan, np.inf, -np.inf, -0.0], 2048),
        np.round(rng.uniform(-9, 9, 2048), 2))
    yield "magnitude-mix", np.concatenate([
        np.round(rng.uniform(-1e6, 1e6, 700), 1),
        np.round(rng.uniform(-1e-6, 1e-6, 700), 12),
        rng.standard_normal(700) * 1e150,
    ])
    yield "near-limits", rng.choice(
        [9.2233720368547758e18, -9.2233720368547758e18,
         4.9e-324, 1.7976931348623157e308], 1100) * rng.uniform(
        0.5, 1.0, 1100)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_roundtrip_f64(seed):
    rng = np.random.default_rng(seed)
    for name, data in _mixtures(rng):
        data = np.asarray(data, np.float64)
        cc = container.compress(data)
        blob = cc.to_bytes()
        out = container.decompress(
            container.CompressedColumn.from_bytes(blob))
        same = out.view(np.uint64) == data.view(np.uint64)
        # NaN payloads: the reference preserves the value via the
        # exception list, so bit patterns must match exactly too
        assert same.all(), f"seed {seed} / {name}"


def test_fuzz_device_decode_matches_host():
    rng = np.random.default_rng(7)
    for name, data in _mixtures(rng):
        data = np.asarray(data, np.float64)
        cc = container.compress(data)
        if (cc.rg_scheme == 1).all():
            continue                      # RD-only covered by host test
        dev = kdecode.decompress_device(cc).reshape(-1)[:len(data)]
        host = container.decompress(cc)
        vec_rg = np.arange(len(data)) // (100 * 1024)
        alp_mask = cc.rg_scheme[np.minimum(vec_rg,
                                           cc.n_rowgroups - 1)] == 2
        same = dev.view(np.uint64) == host.view(np.uint64)
        assert same[alp_mask].all(), name


@pytest.mark.parametrize("seed", [3, 4])
def test_fuzz_roundtrip_f32(seed):
    rng = np.random.default_rng(seed)
    cases = [
        np.round(rng.uniform(-1e4, 1e4, 3000), 2).astype(np.float32),
        (rng.standard_normal(2048) * 1e-40).astype(np.float32),
        np.where(rng.random(1500) < 0.2,
                 np.float32(np.nan),
                 np.round(rng.uniform(0, 99, 1500), 1)).astype(np.float32),
    ]
    for i, data in enumerate(cases):
        cc = container.compress(data)
        out = container.decompress(
            container.CompressedColumn.from_bytes(cc.to_bytes()))
        assert (out.view(np.uint32) == data.view(np.uint32)).all(), \
            f"seed {seed} case {i}"


def _flag_mixtures(rng):
    """Columns engineered to hit the round-4 static-flag decode paths:
    alo_zero (max |n| < 2^48 wide / < 2^16 mid, incl. boundary bws),
    banded magnitudes (k_static: min and max |n| share one octave),
    allneg/maghi wide buckets, and straddle-zero bases."""
    # banded negatives ~ nyc29: n = value*10^f in one octave, all < 0
    yield "banded-allneg", -np.round(rng.uniform(640.0, 1100.0, 4096), 9)
    # banded positives just UNDER the 2^48 alo threshold
    yield "banded-alo48", np.round(rng.uniform(1.0, 2.0, 4096), 13)
    # banded positives just OVER 2^48 (no alo_zero)
    yield "banded-no-alo", np.round(rng.uniform(4.0, 8.0, 4096), 14)
    # mid alo_zero boundary: |n| right at 2^16
    yield "mid-alo16", np.round(rng.uniform(0.0, 6.5535, 4096), 4)
    yield "mid-over16", np.round(rng.uniform(0.0, 13.0, 4096), 4)
    # straddle-zero FOR base (no nonneg/allneg flags)
    yield "straddle", np.round(rng.uniform(-1e5, 1e5, 4096), 2)
    # wide maghi: every |n| >= 2^32
    yield "maghi", np.round(rng.uniform(43.0, 99.0, 4096), 9)


def test_fuzz_flag_paths_device_decode():
    """Device fused decode (with the alo_zero/k_static/maghi/allneg
    static prunes the plan derives) must match the host decode
    bit-exactly on columns engineered for each flag combination."""
    rng = np.random.default_rng(11)
    seen = set()
    for name, data in _flag_mixtures(rng):
        data = np.asarray(data, np.float64)
        cc = container.compress(data)
        plan = kdecode.build_plan(cc)
        for g in plan.groups:
            seen.add((g.variant, int(g.flags)))
        dev = kdecode.decompress_device(cc).reshape(-1)[:len(data)]
        host = container.decompress(cc)
        assert (dev.view(np.uint64) == host.view(np.uint64)).all(), name
    # the engineered columns must actually exercise the new flag bits
    assert any(f & 128 for v, f in seen if v in ("mid64", "midc96")), seen
    assert any(f & 16 for v, f in seen if v == "mid"), seen
    assert any((f >> 9) & 0x7F for v, f in seen), seen
