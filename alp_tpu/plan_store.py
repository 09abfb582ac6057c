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
  little-endian u32 payload.
* :func:`restore` rebuilds the plan with ONE host->device transfer of
  that payload and per-tensor device-side slices/reshapes — no
  concatenates, no tile transposes, no eligibility re-proofs, no
  payload re-walk.  First query after restore is one kernel dispatch
  away.

The blob is an acceleration artifact, not the interchange format: the
ALPT container (container.py) remains the canonical bytes; a snapshot
can always be regenerated from it.
"""

from __future__ import annotations

import json
import struct

import numpy as np

from . import constants as C
from .constants import constants_for
from .kernels.decode import DecodePlan, _Group

_MAGIC = b"ALPP"
_VERSION = 1


def _tensor_entries(g):
    """(name, array) pairs of a group's device tensors, in a fixed
    order shared by snapshot and restore.  All are u32/i32 2-D/3-D."""
    entries = [("tiles", g.tiles)]
    meta = list(g.meta)
    if g.scheme == C.SCHEME_ALP_RD:
        entries.append(("m0", meta[0]))          # left tiles
        for i, p in enumerate(meta[2:]):
            entries.append((f"m{i + 2}", p))     # 8 dict planes
    else:
        for i, p in enumerate(meta):
            entries.append((f"m{i}", p))
    for nm in ("exc_g", "exc_slot", "exc_lane", "exc_hi", "exc_lo"):
        a = getattr(g, nm)
        if a is not None and getattr(a, "shape", (0,))[0]:
            entries.append((nm, a))
    return entries


def snapshot(plan: DecodePlan) -> bytes:
    """Serialize a built decode plan into one self-contained blob."""
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
        for nm, a in _tensor_entries(g):
            arr = np.asarray(a)
            gm["tensors"][nm] = {
                "off": off, "shape": list(arr.shape),
                "dtype": arr.dtype.name,
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
    head = struct.pack("<4sHII", _MAGIC, _VERSION, len(mjson), vecs.size)
    return head + mjson + vecs.tobytes() + pay.tobytes()


def restore(blob: bytes) -> DecodePlan:
    """Rebuild a decode plan from a snapshot blob: one device transfer
    of the u32 payload, then device-side slices/reshapes per tensor."""
    import jax
    import jax.numpy as jnp

    magic, ver, mlen, nvec_idx = struct.unpack_from("<4sHII", blob, 0)
    if magic != _MAGIC or ver != _VERSION:
        raise ValueError("not an ALPP v1 plan snapshot")
    off = struct.calcsize("<4sHII")
    manifest = json.loads(blob[off:off + mlen])
    off += mlen
    vecs = np.frombuffer(blob, np.int64, nvec_idx, off)
    off += nvec_idx * 8
    payload_np = np.frombuffer(blob, np.uint32, offset=off)
    # the ONE host->device transfer; everything below slices it there
    buf = jnp.asarray(payload_np)

    def take(t):
        size = int(np.prod(t["shape"])) if t["shape"] else 1
        words = size * (2 if t["dtype"] in ("int64", "uint64") else 1)
        piece = jax.lax.slice(buf, (t["off"],), (t["off"] + words,))
        if t["dtype"] != "uint32":
            piece = jax.lax.bitcast_convert_type(
                piece, jnp.dtype(t["dtype"]))
        return piece.reshape(t["shape"])

    groups = []
    v_off = 0
    for gm in manifest["groups"]:
        ts = gm["tensors"]
        tiles = take(ts["tiles"])
        if gm["scheme"] == C.SCHEME_ALP_RD:
            meta = (take(ts["m0"]), gm["lbw"]) + tuple(
                take(ts[f"m{i}"]) for i in range(2, 10))
        else:
            n_meta = sum(1 for k in ts if k.startswith("m"))
            meta = tuple(take(ts[f"m{i}"]) for i in range(n_meta))
        g = _Group(gm["bw"], gm["n_vectors"],
                   vecs[v_off:v_off + gm["n_vectors"]].copy(),
                   tiles, meta, scheme=gm["scheme"],
                   variant=gm["variant"], flags=gm["flags"])
        v_off += gm["n_vectors"]
        if "exc_g" in ts:
            g.exc_g = take(ts["exc_g"])
            g.exc_slot = take(ts["exc_slot"])
            g.exc_lane = take(ts["exc_lane"])
            if "exc_hi" in ts:
                g.exc_hi = take(ts["exc_hi"])
            g.exc_lo = take(ts["exc_lo"])
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
