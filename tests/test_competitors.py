"""Competitor codec sanity: sizes beat raw on compressible data, the
Gorillas bitstream round-trips, and ALP beats the XOR family on the
decimal datasets (the reference's headline claim, table_4.md)."""

import numpy as np
import pytest

from alp_tpu import container
from alp_tpu.competitors import xor_codecs
from alp_tpu.competitors import (ALL_CODECS, chimp_roundtrip,
                                 gorillas_bits, gorillas_roundtrip,
                                 patas_roundtrip, chimp128_roundtrip)
from alp_tpu.utils import datasets, io


def _city_temp():
    col = [c for c in datasets.ALP_DATASET if c.name == "City-Temp"][0]
    return io.read_csv(col.csv_path, np.float64)


def test_codecs_compress_decimal_data():
    data = _city_temp()
    raw_bits = data.size * 64
    for name, fn in ALL_CODECS.items():
        bits = fn(data)
        # Gorillas is known to expand noisy decimals slightly
        # (published table_4.md shows ~60+ bits/value on such columns)
        limit = raw_bits * (1.1 if name == "gorillas" else 1.0)
        assert 0 < bits < limit, name


def test_gorillas_roundtrip():
    data = _city_temp()[:2048]
    assert gorillas_roundtrip(data)
    rng = np.random.default_rng(0)
    noisy = rng.standard_normal(512)
    assert gorillas_roundtrip(noisy)


def test_chimp_roundtrip():
    data = _city_temp()[:2048]
    assert chimp_roundtrip(data)
    rng = np.random.default_rng(2)
    assert chimp_roundtrip(rng.standard_normal(512))
    assert chimp_roundtrip(np.repeat(rng.standard_normal(32), 16))


def test_patas_roundtrip():
    data = _city_temp()[:2048]
    assert patas_roundtrip(data)
    rng = np.random.default_rng(5)
    assert patas_roundtrip(rng.standard_normal(512))
    assert patas_roundtrip(np.repeat(rng.standard_normal(32), 16))


def test_chimp128_roundtrip():
    data = _city_temp()[:2048]
    assert chimp128_roundtrip(data)
    rng = np.random.default_rng(6)
    assert chimp128_roundtrip(rng.standard_normal(512))
    assert chimp128_roundtrip(np.repeat(rng.standard_normal(32), 16))


def test_alp_beats_xor_family_on_decimals():
    data = _city_temp()
    cc = container.compress(data)
    alp_bits = cc.bits_per_value() * data.size
    for name in ("gorillas", "chimp", "chimp128", "patas"):
        assert alp_bits < ALL_CODECS[name](data), name


def test_codecs_f32():
    rng = np.random.default_rng(1)
    # repeated readings: the regime the XOR family is designed for
    data = np.repeat(np.round(rng.uniform(0, 50, 256), 1), 16).astype(
        np.float32)
    raw = data.size * 32
    assert gorillas_bits(data) < raw


def test_suite_average_matches_published():
    """Suite-average ratio parity: published full-dataset ALL AVG is
    21.7 bits/value (reference publication/tables/table_4.md:35); the
    CSV samples land within noise of it."""
    import math
    totals = []
    for col in datasets.ALP_DATASET:
        data = io.read_csv(col.csv_path, np.float64)
        cc = container.compress(data)
        totals.append(cc.bits_per_value())
    avg = sum(totals) / len(totals)
    assert 20.0 < avg < 23.0, avg


class TestNativeCodecs:
    """Native C++ competitor codecs: round-trip + bit-count parity with
    the Python cost models (same formats, so sizes must match exactly)."""

    def _cases(self):
        rng = np.random.default_rng(31)
        col = [c for c in datasets.ALP_DATASET if c.name == "City-Temp"][0]
        city = io.read_csv(col.csv_path, np.float64)[:4096]
        return {
            "city": city,
            "smooth": np.cumsum(rng.standard_normal(4096)) * 0.125,
            "repeat": np.repeat(np.round(rng.uniform(0, 9, 64), 1), 64),
            "random": rng.standard_normal(4096),
            "tiny": np.array([3.14]),
        }

    @pytest.mark.parametrize("name,bits_fn", [
        ("gorillas", xor_codecs.gorillas_bits),
        ("chimp", xor_codecs.chimp_bits),
        ("chimp128", xor_codecs.chimp128_bits),
        ("patas", xor_codecs.patas_bits),
    ])
    def test_native_roundtrip_and_size(self, name, bits_fn):
        from alp_tpu import native
        try:
            native.competitors_lib()
        except native.NativeUnavailable:
            pytest.skip("no compiler")
        for label, data in self._cases().items():
            stream, nbits = native.competitor_encode(name, data)
            assert nbits == bits_fn(data), f"{name}/{label} size"
            out = native.competitor_decode(name, stream, len(data))
            assert (out.view(np.uint64) == data.view(np.uint64)).all(), \
                f"{name}/{label} roundtrip"


def test_native_chunked_encode_roundtrip():
    """cmp_chunked_encode_f64 (the table-6 COMP-column encoder: OpenMP
    over rowgroup chunks) round-trips through the chunked decoder and
    produces thread-count-independent streams; the PDE chunk matches
    the Python pde_encode spec exactly."""
    from alp_tpu import native
    from alp_tpu.competitors import pde_codec as pde
    try:
        native.competitors_lib()
    except native.NativeUnavailable:
        pytest.skip("no compiler")
    rng = np.random.default_rng(7)
    data = np.round(rng.normal(20.0, 8.0, 30000), 2)
    data[::577] = rng.standard_normal(data[::577].shape) * 1e200
    data[1234] = np.nan
    data[2345] = -0.0
    CH = 7000                                # uneven tail chunk
    for name in ("gorillas", "chimp", "chimp128", "patas", "pde"):
        flat, cap_off, ow, ns = native.competitor_encode_chunked(
            name, data, CH, 8)
        streams = [flat[cap_off[c]:cap_off[c] + ow[c]].copy()
                   for c in range(len(ns))]
        out = np.zeros(len(data), np.uint64)
        native.competitor_decode_chunked(name, streams, ns, out, 2)
        o = out.view(np.float64).copy()
        if name == "pde":
            for c in range(len(ns)):
                n, off = int(ns[c]), c * CH
                expv = streams[c][(n + 1) // 2:].view(np.uint8)[:n]
                sel = expv == 23
                o[off:off + n][sel] = data[off:off + n][sel]
            s_, e_, _ = pde.pde_encode(data[:CH])
            assert np.array_equal(
                streams[0][:(CH + 1) // 2].view(np.int32)[:CH], s_)
            assert np.array_equal(
                streams[0][(CH + 1) // 2:].view(np.uint8)[:CH], e_)
        assert np.array_equal(o.view(np.uint64), data.view(np.uint64))
        _, _, ow1, _ = native.competitor_encode_chunked(
            name, data, CH, 1)
        assert np.array_equal(ow1, ow)


class TestZstd:
    """Real Zstd via ctypes libzstd (reference fetches zstd v1.5.5,
    compresses rowgroup chunks at level 3 — bench_compression_ratio/
    zstd.cpp:11-12,64)."""

    def setup_method(self):
        from alp_tpu.competitors import zstd_codec
        if not zstd_codec.HAVE_ZSTD:
            pytest.skip("libzstd absent")
        self.z = zstd_codec

    def test_roundtrip_and_ratio(self):
        data = _city_temp()
        bits = self.z.zstd_roundtrip(data)
        assert bits == self.z.zstd_bits(data)
        assert 0 < bits < data.size * 64

    def test_chunking_matches_reference_geometry(self):
        # 1.5 rowgroups: two chunks (102400 + 51200 values)
        rng = np.random.default_rng(9)
        data = np.round(rng.uniform(0, 100, 153600), 2)
        assert self.z.zstd_roundtrip(data) > 0

    def test_beats_raw_on_decimals_f32(self):
        data = _city_temp().astype(np.float32)
        assert self.z.zstd_roundtrip(data) < data.size * 32

    def test_in_codec_table(self):
        assert "zstd" in ALL_CODECS


class TestElf:
    """Elf erase-based codec (behavioral reimplementation of the
    reference's Java artifact, publication/source_code/extern/elf/ —
    erase stage AbstractElfCompressor.addValue, XOR stage
    ElfXORCompressor, restore AbstractElfDecompressor.roundUp)."""

    def test_roundtrip_datasets(self):
        from alp_tpu.competitors import elf_roundtrip
        for name in ("City-Temp", "Btc-Price", "POI-lat", "Food-prices"):
            col = [c for c in datasets.ALP_DATASET if c.name == name][0]
            data = io.read_csv(col.csv_path, np.float64)[:2048]
            assert elf_roundtrip(data), name

    def test_roundtrip_edge_values(self):
        from alp_tpu.competitors import elf_roundtrip
        rng = np.random.default_rng(7)
        x = np.round(rng.normal(100, 30, 1500), 3)
        # specials the erase stage passes through (NaN is the format's
        # end sentinel and cannot appear mid-stream)
        x[5] = 0.0; x[6] = np.inf; x[7] = -np.inf; x[8] = -0.0
        x[9] = 1e-7; x[10] = 1e-15; x[11] = -1e-3; x[12] = 0.1
        x[13] = 123456.789; x[14] = 2.0**-1022; x[15] = 1e17
        assert elf_roundtrip(x)

    def test_erase_saves_bits_on_decimals(self):
        # the erase stage is Elf's whole point: on decimal data it must
        # beat its own XOR stage applied to the raw values
        from alp_tpu.competitors.elf_codec import (
            elf_bits, _BitWriter, _ElfXorEncoder)
        data = _city_temp()[:4096]
        w = _BitWriter()
        enc = _ElfXorEncoder(w)
        for v in data.tolist():
            enc.add(int(np.float64(v).view(np.uint64)))
        enc.close()
        raw_xor_bits = w.total + len(data)  # + the per-value flag bit
        assert elf_bits(data) < 0.8 * raw_xor_bits

    def test_in_codec_table_and_ratio_sane(self):
        from alp_tpu.competitors import ALL_CODECS
        assert "elf" in ALL_CODECS
        data = _city_temp()[:2048]
        bits = ALL_CODECS["elf"](data) / data.size
        # published Elf on City-Temp is 23.4 bits/value (full corpus,
        # reference publication/tables/table_4.md); the sample should
        # land in the same regime and always beat raw
        assert 8.0 < bits < 40.0
        f32 = data.astype(np.float32)
        assert ALL_CODECS["elf"](f32) is None   # double-only reference


def test_pde_roundtrip_and_native():
    """PDE (BtrBlocks Pseudodecimal behavioral reimpl): bit-exact
    round-trip incl. specials; the native decode matches numpy."""
    import numpy as np
    from alp_tpu.competitors import pde_codec as pde
    rng = np.random.default_rng(21)
    d = np.round(rng.normal(0, 100, 50000), 2)
    d[10] = np.nan
    d[11] = np.inf
    d[12] = -0.0
    d[13] = -np.inf
    d[14] = 1.23456789e300
    sig, exp, patches = pde.pde_encode(d)
    out = pde.pde_decode(sig, exp, patches)
    assert np.array_equal(out.view(np.uint64), d.view(np.uint64))
    assert pde.pde_bits(d) > 0
    try:
        from alp_tpu import native
        native.build()
    except Exception:
        return
    outn = native.pde_decode(sig, exp, patches)
    assert np.array_equal(outn.view(np.uint64), d.view(np.uint64))
