"""Persistable device decode plans: the load -> first-query cold path.

``build_plan`` (kernels/decode.py) does real host work per column:
ragged payload concatenation, fast-variant eligibility proofs, metadata
plane construction, per-bucket staging.  Steady-state queries amortise
it (the plan is cached on the column), but a fresh process pays it
before the first query.  The reference has no equivalent cost — its
scan consumes the stored format directly — so the TPU design closes the
gap by making the PLAN itself a storable artifact:

* :func:`snapshot` serializes a built plan into one blob: a small JSON
  manifest plus every device tensor concatenated into a single
  little-endian u32 payload.  Per-vector metadata planes are stored
  UN-expanded ([n] per vector, 16x/32x smaller than the [G, 128]
  lane-expanded planes the kernels consume) and the whole payload is
  zstd-compressed when that wins (the reference's own competitor
  codec, bound via ctypes).
* :func:`restore` rebuilds the plan with ONE host->device transfer of
  the payload and ONE jitted device program that slices, reshapes and
  lane-expands every tensor — a single dispatch, which matters when
  each dispatch rides a remote-TPU tunnel RPC.  First query after
  restore is one kernel dispatch away.

The blob is an acceleration artifact, not the interchange format: the
ALPT container (container.py) remains the canonical bytes; a snapshot
can always be regenerated from it.
"""

from __future__ import annotations

import json
import struct

import numpy as np

from . import constants as C
from .kernels.decode import DecodePlan, _Group

_MAGIC = b"ALPP"
_VERSION = 2

# payload compression codes
_COMP_RAW = 0
_COMP_ZSTD = 1


def _tensor_entries(g):
    """(name, array, kind) triples of a group's device tensors, in a
    fixed order shared by snapshot and restore.  kind is "raw" (u32/i32
    words stored verbatim) or "vec" (a lane-expanded [G, 128] per-vector
    metadata plane, stored un-expanded as [G*group] words)."""
    entries = [("tiles", g.tiles, "raw")]
    meta = list(g.meta)
    if g.scheme == C.SCHEME_ALP_RD:
        entries.append(("m0", meta[0], "raw"))       # left tiles
        for i, p in enumerate(meta[2:]):
            entries.append((f"m{i + 2}", p, "vec"))  # 8 dict planes
    else:
        for i, p in enumerate(meta):
            entries.append((f"m{i}", p, "vec"))
    for nm in ("exc_g", "exc_slot", "exc_lane", "exc_hi", "exc_lo"):
        a = getattr(g, nm)
        if a is not None and getattr(a, "shape", (0,))[0]:
            entries.append((nm, a, "raw"))
    return entries


def _lanes_per_vector(dtype) -> int:
    return 16 if np.dtype(dtype) == np.float64 else 32


def snapshot(plan: DecodePlan, *, compress: bool = True) -> bytes:
    """Serialize a built decode plan into one self-contained blob."""
    L = _lanes_per_vector(plan.dtype)
    manifest = {
        "dtype": np.dtype(plan.dtype).name,
        "n_vectors": int(plan.n_vectors),
        "decoded_bytes": int(plan.decoded_bytes),
        "groups": [],
    }
    payload = []
    off = 0
    vec_idx = []
    for g in plan.groups:
        gm = {
            "bw": int(g.bw), "n_vectors": int(g.n_vectors),
            "scheme": int(g.scheme), "variant": g.variant,
            "flags": int(g.flags), "tensors": {},
        }
        if g.scheme == C.SCHEME_ALP_RD:
            gm["lbw"] = int(g.meta[1])
        for nm, a, kind in _tensor_entries(g):
            arr = np.asarray(a)
            if kind == "vec":
                # store per-vector words; restore lane-expands on device
                arr = np.ascontiguousarray(arr[:, ::L]).reshape(-1)
            gm["tensors"][nm] = {
                "off": off, "shape": list(np.asarray(a).shape),
                "dtype": np.asarray(a).dtype.name, "kind": kind,
            }
            payload.append(np.ascontiguousarray(arr).view(np.uint32))
            off += payload[-1].size
        vec_idx.append(np.asarray(g.vec_indices, np.int64))
        manifest["groups"].append(gm)
    mjson = json.dumps(manifest).encode()
    pay = (np.concatenate([p.reshape(-1) for p in payload])
           if payload else np.empty(0, np.uint32))
    vecs = (np.concatenate(vec_idx) if vec_idx
            else np.empty(0, np.int64))
    raw = pay.tobytes()
    comp = _COMP_RAW
    if compress and len(raw) >= 1 << 16:
        z = _zstd_compress(raw)
        if z is not None and len(z) < len(raw):
            raw, comp = z, _COMP_ZSTD
    head = struct.pack("<4sHBIIQ", _MAGIC, _VERSION, comp, len(mjson),
                       vecs.size, pay.size)
    return head + mjson + vecs.tobytes() + raw


def _zstd_compress(raw: bytes):
    try:
        from .competitors import zstd_codec
        if not zstd_codec.HAVE_ZSTD:
            return None
        lib = zstd_codec._load()
        return zstd_codec._compress_chunk(lib, raw)
    except Exception:
        return None


def _zstd_decompress(blob: bytes, n_out: int) -> bytes:
    import ctypes
    from .competitors import zstd_codec
    lib = zstd_codec._load()
    out = ctypes.create_string_buffer(n_out)
    n = lib.ZSTD_decompress(out, n_out, blob, len(blob))
    if lib.ZSTD_isError(n) or n != n_out:
        raise ValueError("plan snapshot: corrupt zstd payload")
    return out.raw


_RESTORE_CACHE: dict = {}


def _build_restore_program(manifest):
    """One jitted device program: payload words in, every group tensor
    out (slices + bitcasts + reshapes + lane expands fused into a single
    dispatch — the cold path is dispatch-count bound through a tunnel).
    Cached on the manifest's tensor structure: restoring the same
    column (or any column with identical bucket shapes) reuses the
    compiled executable instead of re-tracing per call."""
    import jax
    import jax.numpy as jnp

    L = _lanes_per_vector(np.dtype(manifest["dtype"]))
    specs = []                     # (shape, dtype, kind, off) in order
    for gm in manifest["groups"]:
        for t in gm["tensors"].values():
            specs.append((tuple(t["shape"]), t["dtype"], t["kind"],
                          t["off"]))
    key = (manifest["dtype"], L, tuple(specs))
    cached = _RESTORE_CACHE.get(key)
    if cached is not None:
        return cached

    def run(buf):
        outs = []
        for shape, dt, kind, off in specs:
            if kind == "vec":
                G, lanes = shape
                group = lanes // L
                piece = jax.lax.slice(buf, (off,), (off + G * group,))
                outs.append(jnp.repeat(
                    piece.reshape(G, group), L, axis=1,
                    total_repeat_length=lanes))
                continue
            size = int(np.prod(shape)) if shape else 1
            words = size * (2 if dt in ("int64", "uint64") else 1)
            piece = jax.lax.slice(buf, (off,), (off + words,))
            if dt != "uint32":
                piece = jax.lax.bitcast_convert_type(piece, jnp.dtype(dt))
            outs.append(piece.reshape(shape))
        return outs

    prog = jax.jit(run)
    _RESTORE_CACHE[key] = prog
    return prog


def restore(blob: bytes) -> DecodePlan:
    """Rebuild a decode plan from a snapshot blob: one host->device
    transfer of the payload, then ONE jitted program producing every
    tensor (single dispatch)."""
    import jax.numpy as jnp

    magic, ver, comp, mlen, nvec_idx, n_words = struct.unpack_from(
        "<4sHBIIQ", blob, 0)
    if magic != _MAGIC or ver != _VERSION:
        raise ValueError("not an ALPP v2 plan snapshot")
    off = struct.calcsize("<4sHBIIQ")
    manifest = json.loads(blob[off:off + mlen])
    off += mlen
    vecs = np.frombuffer(blob, np.int64, nvec_idx, off)
    off += nvec_idx * 8
    if comp == _COMP_ZSTD:
        raw = _zstd_decompress(blob[off:], n_words * 4)
        payload_np = np.frombuffer(raw, np.uint32)
    else:
        payload_np = np.frombuffer(blob, np.uint32, n_words, off)
    # the ONE host->device transfer; the jitted program below slices,
    # bitcasts, reshapes and lane-expands everything in ONE dispatch
    buf = jnp.asarray(payload_np)
    tensors = iter(_build_restore_program(manifest)(buf))

    groups = []
    v_off = 0
    for gm in manifest["groups"]:
        ts = gm["tensors"]
        got = {nm: next(tensors) for nm in ts}
        tiles = got["tiles"]
        if gm["scheme"] == C.SCHEME_ALP_RD:
            meta = (got["m0"], gm["lbw"]) + tuple(
                got[f"m{i}"] for i in range(2, 10))
        else:
            n_meta = sum(1 for k in ts if k.startswith("m"))
            meta = tuple(got[f"m{i}"] for i in range(n_meta))
        g = _Group(gm["bw"], gm["n_vectors"],
                   vecs[v_off:v_off + gm["n_vectors"]].copy(),
                   tiles, meta, scheme=gm["scheme"],
                   variant=gm["variant"], flags=gm["flags"])
        v_off += gm["n_vectors"]
        if "exc_g" in ts:
            g.exc_g = got["exc_g"]
            g.exc_slot = got["exc_slot"]
            g.exc_lane = got["exc_lane"]
            if "exc_hi" in ts:
                g.exc_hi = got["exc_hi"]
            g.exc_lo = got["exc_lo"]
        else:
            g.exc_g = jnp.zeros(0, jnp.int32)
        groups.append(g)
    dtype = np.dtype(manifest["dtype"])
    return DecodePlan(dtype, manifest["n_vectors"], groups,
                      manifest["decoded_bytes"])


def save_plan(col, path: str) -> int:
    """Snapshot ``col``'s decode plan to ``path``; returns byte size."""
    blob = snapshot(col.plan())
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_plan(path: str) -> DecodePlan:
    with open(path, "rb") as f:
        return restore(f.read())
