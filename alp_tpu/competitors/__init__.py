"""Competitor codecs for compression-ratio comparisons.

Size-faithful reimplementations of the XOR-family codecs the reference
benchmarks against (reference publication/source_code/include/{chimp,
gorillas,patas}; DuckDB-derived), plus real Zstd via a ctypes binding
to system libzstd (reference fetches zstd v1.5.5 and compresses
rowgroup chunks at level 3 — bench_compression_ratio/zstd.cpp).  If
libzstd is absent, DEFLATE (zlib) stands in and is labeled as such.
Gorillas and Chimp also ship decoders for round-trip tests.
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
from .zstd_codec import HAVE_ZSTD, zstd_bits, zstd_roundtrip, zstd_version

ALL_CODECS = {
    "gorillas": gorillas_bits,
    "chimp": chimp_bits,
    "chimp128": chimp128_bits,
    "patas": patas_bits,
}
if HAVE_ZSTD:
    ALL_CODECS["zstd"] = zstd_bits
else:  # pragma: no cover - image ships libzstd
    ALL_CODECS["zlib"] = zlib_bits
