"""Competitor codecs for compression-ratio comparisons.

Size-faithful reimplementations of the XOR-family codecs the reference
benchmarks against (reference publication/source_code/include/{chimp,
gorillas,patas}; DuckDB-derived), plus DEFLATE (zlib) standing in for
Zstd (not in this image).  Used by the ratio reports; Gorillas and Chimp
also ship decoders for round-trip tests.
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

ALL_CODECS = {
    "gorillas": gorillas_bits,
    "chimp": chimp_bits,
    "chimp128": chimp128_bits,
    "patas": patas_bits,
    "zlib": zlib_bits,
}
