"""Competitor codecs for compression-ratio comparisons.

Size-faithful reimplementations of the XOR-family codecs the reference
benchmarks against (reference publication/source_code/include/{chimp,
gorillas,patas}; DuckDB-derived), the Elf erase-based codec (reference
runs its Java artifact, publication/source_code/extern/elf/), plus
real Zstd via a ctypes binding to system libzstd (reference fetches
zstd v1.5.5 and compresses rowgroup chunks at level 3 —
bench_compression_ratio/zstd.cpp).  If libzstd is absent, DEFLATE
(zlib) stands in and is labeled as such.  Gorillas, Chimp, Chimp128,
Patas, and Elf also ship decoders for round-trip tests.
"""

from .xor_codecs import (
    gorillas_bits,
    chimp_bits,
    chimp128_bits,
    patas_bits,
    zlib_bits,
    gorillas_roundtrip,
    chimp_roundtrip,
    patas_roundtrip,
    chimp128_roundtrip,
)
from .elf_codec import elf_bits, elf_roundtrip, elf_encode, elf_decode
from .zstd_codec import HAVE_ZSTD, zstd_bits, zstd_roundtrip, zstd_version

ALL_CODECS = {
    "gorillas": gorillas_bits,
    "chimp": chimp_bits,
    "chimp128": chimp128_bits,
    "patas": patas_bits,
}


def _elf_bits_f64_only(data):
    import numpy as np
    if data.dtype != np.float64:
        return None          # the Elf reference build is double-only
    return elf_bits(data)


ALL_CODECS["elf"] = _elf_bits_f64_only
if HAVE_ZSTD:
    ALL_CODECS["zstd"] = zstd_bits
else:  # pragma: no cover - image ships libzstd
    ALL_CODECS["zlib"] = zlib_bits
