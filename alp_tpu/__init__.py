"""alp_tpu — TPU-native adaptive lossless floating-point compression.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the ALP
reference (cwida/ALP, SIGMOD 2024): the ALP classic (pseudo-decimal) and
ALP_RD (real-doubles) schemes, adaptive per-rowgroup scheme selection,
FastLanes FFOR bit-packing, fused decompression kernels, and a columnar
container format — designed TPU-first (static shapes, batched vectors,
softfloat f64 semantics on exact integer ops, shard_map data parallelism).
"""

__version__ = "0.1.0"

import sys as _sys

# Tracing the softfloat expression graphs (deeply nested jnp calls inside
# Pallas kernels) exceeds CPython's default 1000-frame recursion limit.
_sys.setrecursionlimit(max(_sys.getrecursionlimit(), 20000))

import os as _os

import jax as _jax

# The ops layer carries int64 (exact on TPU via XLA integer emulation) and
# f64 *bit patterns* as uint64; it never relies on XLA float64 arithmetic
# (not correctly rounded on TPU) — softfloat provides those semantics.
_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: kernel variants are bw-specialised, so a
# column with several bit widths triggers several Mosaic compiles; the
# disk cache (works through the axon remote-compile tunnel) makes every
# later process start warm.
if not _os.environ.get("ALP_TPU_NO_COMPILE_CACHE"):
    # the dir is keyed by the host CPU's feature fingerprint: XLA:CPU
    # persists AOT executables whose cache key does NOT include the
    # exact CPU features, so a cache shared across heterogeneous
    # machines serves artifacts with instructions this host lacks
    # (loader warns "could lead to execution errors such as SIGILL";
    # observed as intermittent segfaults in long pytest runs)
    try:
        with open("/proc/cpuinfo") as _f:
            _cpu_flags = next(
                (_ln for _ln in _f if _ln.startswith("flags")), "")
    except OSError:
        _cpu_flags = ""
    import hashlib as _hashlib
    _cpu_tag = _hashlib.sha256(_cpu_flags.encode()).hexdigest()[:8]
    _cache = _os.environ.get(
        "ALP_TPU_COMPILE_CACHE",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), f".jax_cache-{_cpu_tag}"))
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from . import constants
from . import oracle


def compress(data):
    """Compress a 1-D float64/float32 numpy array (adaptive ALP/ALP_RD).

    Top-level alias for :func:`alp_tpu.container.compress`."""
    from . import container
    return container.compress(data)


def decompress(col):
    """Bit-exact inverse of :func:`compress`."""
    from . import container
    return container.decompress(col)


def save_plan(col, path):
    """Snapshot ``col``'s device decode plan to ``path`` (the
    load -> first-query cold-path artifact; plan_store docstring)."""
    from . import plan_store
    return plan_store.save_plan(col, path)


def load_plan(path):
    """Restore a decode plan snapshot: one device transfer, ready to
    serve queries."""
    from . import plan_store
    return plan_store.load_plan(path)


def __getattr__(name):
    # public re-export of the compressed-column type without importing
    # the (jax-heavy) container module at package import time
    if name == "CompressedColumn":
        from . import container
        return container.CompressedColumn
    raise AttributeError(f"module 'alp_tpu' has no attribute {name!r}")
