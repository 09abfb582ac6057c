"""Columnar container: whole-column compress / decompress.

The reference's de-facto column pipeline is the rowgroup loop of
benchmarks/benchmark.cpp:200-287 driving the L2 primitives
(encoder::init -> per-vector encode/analyze_ffor/ffor, or rd_encoder) with
a trivial MemStorer byte sink (include/alp/storer.hpp:10-53).  This module
is the TPU-native equivalent, restructured for batched execution:

* **Planning** (per rowgroup, tiny data): first-level sampling, (e, f)
  top-k search / RD dictionary construction — host side, on <=256 samples
  per rowgroup (oracle.core / oracle.rd semantics, bit-exact).
* **Throughput** (per vector, bulk data): second-level (e, f) choice,
  encode+verify, FFOR analysis, RD split/dict-lookup — batched jit ops
  over ``[n_vectors, 1024]`` (ops.alp / ops.rd), and FastLanes packing.
* **Serialization**: a sectioned little-endian byte format carrying the
  same information as the reference's hypothetical file format; sizes are
  additionally reported under the reference cost model
  (publication/source_code/bench_compression_ratio/alp.cpp:14-49).

Vector geometry matches the reference: 1024-value vectors, 100-vector
rowgroups (include/alp/config.hpp:11-15).  A trailing partial vector is
padded with its own last value (recorded via ``n_values``); the reference
library leaves last-vector strategy to the caller (PRIMITIVES.md "Last
Vector Encoding") — padding keeps round-trips exact for any length.
"""

from __future__ import annotations

import dataclasses
import math
import struct

import numpy as np

from . import constants as C
from .constants import constants_for
from .oracle import core as ocore
from .oracle import rd as ord_
from .oracle import fastlanes as ofl
from .ops import alp as oalp
from .ops import rd as ordops
from .ops import fastlanes as jfl
from .ops.numerics import numerics_for

_MAGIC = b"ALPT"
_VERSION = 2
_FLAG_ENC_MAX = 1


def _host_cpu():
    """Context manager pinning jit compute to the host CPU backend.

    The container's correctness paths (compress planning+encode, unfused
    decompress) are host-side work in this architecture; the TPU carries
    the Pallas kernel paths (kernels.decode / kernels.falp).  Running the
    big softfloat encode graphs through the remote-TPU tunnel would burn
    minutes of XLA compile time for no benefit.
    """
    import jax
    return jax.default_device(jax.devices("cpu")[0])


@dataclasses.dataclass
class CompressedColumn:
    """Compressed representation of one float64/float32 column (SoA)."""
    dtype: np.dtype
    n_values: int
    n_vectors: int
    # per rowgroup
    rg_scheme: np.ndarray          # u8[n_rg]: C.SCHEME_ALP / C.SCHEME_ALP_RD
    rd_dict: np.ndarray            # u16[n_rg, 8] (zeros for ALP rowgroups)
    rd_dict_size: np.ndarray       # u8[n_rg]
    rd_left_bw: np.ndarray         # u8[n_rg]
    rd_right_bw: np.ndarray        # u8[n_rg]
    # per vector
    fac: np.ndarray                # u8[n_vec]
    exp: np.ndarray                # u8[n_vec]
    bit_width: np.ndarray          # u8[n_vec] (ALP) / right parts use rg bw
    base: np.ndarray               # st[n_vec] (FOR base; 0 for RD)
    exc_count: np.ndarray          # u16[n_vec]
    # ragged payloads (lists of per-vector arrays)
    packed: list                   # ALP: wt words; RD: right-part words
    left_packed: list              # RD only: u16 words ([] for ALP vectors)
    exc_values: list               # ALP: PT values; RD: u16 left parts
    exc_positions: list            # u16 positions
    # acceleration metadata (format v2): exact per-vector max FFOR delta
    # (max encoded n - base), so the decode-plan builder can prove
    # fast-variant eligibility without re-unpacking borderline vectors
    # (kernels/decode.py).  Derivable from the payload - a v1 blob loads
    # with None and the planner falls back to on-demand refinement.  Not
    # part of the reference cost model (bits_per_value is unaffected).
    enc_max: np.ndarray | None = None   # u64[n_vec] (0 for RD vectors)
    # lazily built+cached device decode plan (kernels.decode.DecodePlan):
    # queries over the same column share staged tiles instead of
    # re-uploading per query (the reference's scan likewise consumes the
    # already-resident format).  Not serialized.
    _plan_cache: object = dataclasses.field(
        default=None, repr=False, compare=False)

    @property
    def n_rowgroups(self) -> int:
        return len(self.rg_scheme)

    def plan(self):
        """The column's device decode plan, built once and cached."""
        if self._plan_cache is None:
            from .kernels import decode as kdecode
            object.__setattr__(self, "_plan_cache",
                               kdecode.build_plan(self))
        return self._plan_cache

    # -- size accounting ---------------------------------------------------

    def compressed_size_bytes(self) -> int:
        return len(self.to_bytes())

    def bits_per_value(self) -> float:
        """Reference cost model (alp.cpp:14-49; SURVEY.md §2.2).

        The per-value format overhead is accumulated by each rowgroup's
        own scheme (per-vector metadata for ALP, dictionary amortisation
        for ALP_RD), so mixed ALP/RD columns are priced correctly; for
        homogeneous columns this reduces to the reference's flat term.
        """
        tc = constants_for(self.dtype)
        alp_overhead = (8 + 8 + 8 + 64) / C.VECTOR_SIZE
        rd_overhead = (C.MAX_RD_DICTIONARY_SIZE * 16) / C.ROWGROUP_SIZE
        total = 0.0
        for v in range(self.n_vectors):
            rg = v // C.N_VECTORS_PER_ROWGROUP
            if self.rg_scheme[rg] == C.SCHEME_ALP:
                total += (int(self.bit_width[v])
                          + int(self.exc_count[v])
                          * (tc.exception_size + C.EXCEPTION_POSITION_SIZE)
                          / C.VECTOR_SIZE
                          + alp_overhead)
            else:
                total += (int(self.rd_left_bw[rg]) + int(self.rd_right_bw[rg])
                          + int(self.exc_count[v])
                          * (C.RD_EXCEPTION_SIZE + C.RD_EXCEPTION_POSITION_SIZE)
                          / C.VECTOR_SIZE
                          + rd_overhead)
        return total / max(self.n_vectors, 1)

    # -- serialization -----------------------------------------------------

    def to_bytes(self) -> bytes:
        dtype_tag = 0 if self.dtype == np.float64 else 1
        flags = _FLAG_ENC_MAX if self.enc_max is not None else 0
        head = struct.pack("<4sHBBQII", _MAGIC, _VERSION, dtype_tag, flags,
                           self.n_values, self.n_vectors, self.n_rowgroups)
        tc = constants_for(self.dtype)

        def ragged(parts, dt):
            # one C-level concatenate + one copy-out, no per-vector join
            if not parts:
                return b""
            return np.concatenate(
                [np.asarray(p, dt) for p in parts] or
                [np.empty(0, dt)]).tobytes()

        sections = [
            self.rg_scheme.astype(np.uint8).tobytes(),
            self.rd_dict.astype(np.uint16).tobytes(),
            self.rd_dict_size.astype(np.uint8).tobytes(),
            self.rd_left_bw.astype(np.uint8).tobytes(),
            self.rd_right_bw.astype(np.uint8).tobytes(),
            self.fac.astype(np.uint8).tobytes(),
            self.exp.astype(np.uint8).tobytes(),
            self.bit_width.astype(np.uint8).tobytes(),
            self.base.tobytes(),
            self.exc_count.astype(np.uint16).tobytes(),
            (self.enc_max.astype(np.uint64).tobytes()
             if self.enc_max is not None else b""),
            ragged(self.packed, tc.ut),
            ragged(self.left_packed, np.uint16),
            b"".join(np.asarray(p).tobytes() for p in self.exc_values),
            ragged(self.exc_positions, np.uint16),
        ]
        return head + b"".join(sections)

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CompressedColumn":
        magic, ver, dtype_tag, flags, n_values, n_vec, n_rg = \
            struct.unpack_from("<4sHBBQII", buf, 0)
        if magic != _MAGIC or ver not in (1, 2):
            raise ValueError("not an ALPT v1/v2 buffer")
        if dtype_tag not in (0, 1):
            raise ValueError(f"bad dtype tag {dtype_tag}")
        dtype = np.dtype(np.float64 if dtype_tag == 0 else np.float32)
        tc = constants_for(dtype)
        off = struct.calcsize("<4sHBBQII")

        # header consistency: geometry must match before any count is
        # trusted for allocation (corrupt buffers raise ValueError here,
        # not opaque frombuffer/IndexError downstream)
        if n_vec < 1 or n_vec != max(1, -(-n_values // C.VECTOR_SIZE)):
            raise ValueError(
                f"n_vectors {n_vec} inconsistent with n_values {n_values}")
        if n_rg != max(1, -(-n_vec // C.N_VECTORS_PER_ROWGROUP)):
            raise ValueError(
                f"n_rowgroups {n_rg} inconsistent with n_vectors {n_vec}")

        def take(dt, count):
            nonlocal off
            dt = np.dtype(dt)
            end = off + dt.itemsize * count
            if end > len(buf):
                raise ValueError(
                    f"truncated ALPT buffer: need {end} bytes, "
                    f"have {len(buf)}")
            arr = np.frombuffer(buf, dt, count, off)
            off = end
            return arr

        rg_scheme = take(np.uint8, n_rg)
        rd_dict = take(np.uint16, n_rg * 8).reshape(n_rg, 8)
        rd_dict_size = take(np.uint8, n_rg)
        rd_left_bw = take(np.uint8, n_rg)
        rd_right_bw = take(np.uint8, n_rg)
        fac = take(np.uint8, n_vec)
        exp = take(np.uint8, n_vec)
        bit_width = take(np.uint8, n_vec)
        base = take(tc.st, n_vec)
        exc_count = take(np.uint16, n_vec)
        enc_max = None
        if ver >= 2 and (flags & _FLAG_ENC_MAX):
            enc_max = take(np.uint64, n_vec)

        eb = tc.exact_type_bit_size
        if not np.all(np.isin(rg_scheme, (C.SCHEME_ALP, C.SCHEME_ALP_RD))):
            raise ValueError("invalid rowgroup scheme byte")
        if bit_width.max(initial=0) > eb:
            raise ValueError(f"bit_width exceeds {eb}")
        if rd_right_bw.max(initial=0) > eb or rd_left_bw.max(initial=0) > 16:
            raise ValueError("RD bit widths out of range")
        if exc_count.max(initial=0) > C.VECTOR_SIZE:
            raise ValueError("exceptions_count exceeds vector size")

        wt = np.dtype(tc.ut)
        S = tc.exact_type_bit_size
        L = C.VECTOR_SIZE // S
        L16 = C.VECTOR_SIZE // 16

        # vectorized ragged-section split: per-vector sizes derive from
        # the metadata (no per-vector buffer reads; np.split returns
        # zero-copy views of one frombuffer per section)
        vec_rg = np.arange(n_vec) // C.N_VECTORS_PER_ROWGROUP
        is_alp = rg_scheme[vec_rg] == C.SCHEME_ALP
        if enc_max is not None:
            chk = is_alp & (bit_width < eb)
            if np.any(enc_max[chk] >> bit_width[chk].astype(np.uint64)):
                raise ValueError("enc_max exceeds bit_width range")

        def split_section(sizes, dt):
            total = int(sizes.sum())
            flat = take(dt, total)
            return np.split(flat, np.cumsum(sizes[:-1], dtype=np.int64))

        packed_sizes = np.where(
            is_alp, bit_width.astype(np.int64) * L,
            rd_right_bw[vec_rg].astype(np.int64) * L)
        packed = split_section(packed_sizes, wt)
        left_sizes = np.where(
            is_alp, 0, rd_left_bw[vec_rg].astype(np.int64) * L16)
        left_packed = split_section(left_sizes, np.uint16)
        # exc_values is dtype-ragged (PT for ALP, u16 left parts for RD):
        # split the byte stream, then view each piece
        ev_item = np.where(is_alp, tc.pt.itemsize, 2)
        ev_bytes = exc_count.astype(np.int64) * ev_item
        ev_parts = split_section(ev_bytes, np.uint8)
        exc_values = [p.view(dtype) if a else p.view(np.uint16)
                      for p, a in zip(ev_parts, is_alp)]
        exc_positions = split_section(exc_count.astype(np.int64), np.uint16)
        return cls(dtype, n_values, n_vec, rg_scheme, rd_dict, rd_dict_size,
                   rd_left_bw, rd_right_bw, fac, exp, bit_width, base,
                   exc_count, packed, left_packed, exc_values, exc_positions,
                   enc_max=enc_max)


# ---------------------------------------------------------------------------
# Compress
# ---------------------------------------------------------------------------

def _pad_to_vectors(data: np.ndarray):
    n = len(data)
    n_vec = max(1, math.ceil(n / C.VECTOR_SIZE))
    if n == n_vec * C.VECTOR_SIZE:
        return data.reshape(n_vec, C.VECTOR_SIZE), n_vec
    padded = np.empty(n_vec * C.VECTOR_SIZE, dtype=data.dtype)
    padded[:n] = data
    if n:
        padded[n:] = data[n - 1]
    else:
        padded[:] = 0
    return padded.reshape(n_vec, C.VECTOR_SIZE), n_vec


def _compact_exceptions(mask: np.ndarray):
    """[n, 1024] bool -> per-vector position arrays (u16)."""
    out = []
    for row in mask:
        out.append(np.nonzero(row)[0].astype(np.uint16))
    return out


def compress(data: np.ndarray, *, mesh=None,
             device: bool = False) -> CompressedColumn:
    """Compress a 1-D float64/float32 array (both ALP schemes, adaptive).

    ``mesh``: a jax.sharding.Mesh — shard the per-vector encode stages
    over its ``rg`` axis (parallel.container_par.compress_sharded);
    output is bit-identical to the single-device path.
    ``device=True``: run the encode hot path as TPU kernels
    (device_compress.compress_device; float64).
    """
    if mesh is not None:
        from .parallel.container_par import compress_sharded
        return compress_sharded(data, mesh)
    if device:
        from .device_compress import compress_device
        return compress_device(data)
    with _host_cpu():
        return _compress(data)


def _compress(data: np.ndarray) -> CompressedColumn:
    data = np.ascontiguousarray(data)
    tc = constants_for(data.dtype)
    nm = numerics_for(data.dtype)
    vectors, n_vec = _pad_to_vectors(data)
    n_rg = max(1, math.ceil(n_vec / C.N_VECTORS_PER_ROWGROUP))

    # --- planning: per-rowgroup sampling & scheme/candidate selection -----
    nat = None
    try:
        from . import native as _nat
        _nat.build()
        nat = _nat
    except Exception:
        nat = None

    flat = vectors.reshape(-1)
    rg_scheme = np.zeros(n_rg, np.uint8)
    combos = np.zeros((n_vec, C.MAX_K_COMBINATIONS, 2), np.int32)
    k_count = np.zeros(n_vec, np.int32)
    rd_states = {}
    if nat is not None:
        # whole-column planning in one native call (OpenMP over rowgroups)
        if data.dtype == np.float64:
            schemes, combos_rg, k_rg = nat.init_f64_multi(flat, n_rg)
        else:
            schemes, combos_rg, k_rg = nat.init_f32_multi(flat, n_rg)
        for rg in range(n_rg):
            lo_v = rg * C.N_VECTORS_PER_ROWGROUP
            hi_v = min(n_vec, lo_v + C.N_VECTORS_PER_ROWGROUP)
            if schemes[rg] == C.SCHEME_ALP_RD:
                rg_scheme[rg] = C.SCHEME_ALP_RD
                rd_states[rg] = ord_.rd_encoder_init(
                    flat[lo_v * C.VECTOR_SIZE: hi_v * C.VECTOR_SIZE], 0, tc)
            else:
                rg_scheme[rg] = C.SCHEME_ALP
                ks = max(int(k_rg[rg]), 1)
                combos[lo_v:hi_v, :ks] = combos_rg[rg, :ks][None, :, :]
                k_count[lo_v:hi_v] = ks
    else:
        for rg in range(n_rg):
            lo_v = rg * C.N_VECTORS_PER_ROWGROUP
            hi_v = min(n_vec, lo_v + C.N_VECTORS_PER_ROWGROUP)
            rg_data = flat[lo_v * C.VECTOR_SIZE: hi_v * C.VECTOR_SIZE]
            stt = ocore.encoder_init(rg_data, 0, tc)
            if stt.scheme == C.SCHEME_ALP_RD:
                rg_scheme[rg] = C.SCHEME_ALP_RD
                rd_states[rg] = ord_.rd_encoder_init(rg_data, 0, tc)
            else:
                rg_scheme[rg] = C.SCHEME_ALP
                ks = len(stt.best_k_combinations)
                for i, (e, f) in enumerate(stt.best_k_combinations):
                    combos[lo_v:hi_v, i, 0] = e
                    combos[lo_v:hi_v, i, 1] = f
                k_count[lo_v:hi_v] = ks

    # --- throughput: batched encode -------------------------------------
    fac = np.zeros(n_vec, np.uint8)
    exp = np.zeros(n_vec, np.uint8)
    bit_width = np.zeros(n_vec, np.uint8)
    base = np.zeros(n_vec, tc.st)
    enc_max = np.zeros(n_vec, np.uint64)
    exc_count = np.zeros(n_vec, np.uint16)
    packed = [None] * n_vec
    left_packed = [np.empty(0, np.uint16)] * n_vec
    exc_values = [None] * n_vec
    exc_positions = [None] * n_vec

    vec_rg = np.arange(n_vec) // C.N_VECTORS_PER_ROWGROUP
    alp_idx = np.nonzero(rg_scheme[vec_rg] == C.SCHEME_ALP)[0]
    rd_idx = np.nonzero(rg_scheme[vec_rg] == C.SCHEME_ALP_RD)[0]

    use_native = False
    if alp_idx.size:
        try:
            from . import native as nat
            nat.build()
            use_native = True
        except Exception:
            use_native = False

    if alp_idx.size and use_native:
        # Native C++ encode engine: ONE call over the whole column (one
        # OpenMP region across every vector; per-rowgroup candidate sets
        # resolved inside, container.py round-2 rework).
        from . import native as nat
        combos_rg = combos[::C.N_VECTORS_PER_ROWGROUP].astype(np.int32)
        k_rg = np.maximum(k_count[::C.N_VECTORS_PER_ROWGROUP], 1).astype(
            np.int32)
        if data.dtype == np.float64:
            res = nat.encode_f64_multi(vectors, combos_rg, k_rg,
                                       C.N_VECTORS_PER_ROWGROUP)
        else:
            res = nat.encode_f32_multi(vectors, combos_rg, k_rg,
                                       C.N_VECTORS_PER_ROWGROUP)
        encoded = res["encoded"]
        fac[alp_idx] = res["fac"][alp_idx]
        exp[alp_idx] = res["exp"][alp_idx]
        bit_width[alp_idx] = res["bit_width"][alp_idx]
        base[alp_idx] = res["base"][alp_idx]
        exc_count[alp_idx] = res["exc_count"][alp_idx]
        empty_u16 = np.empty(0, np.uint16)
        empty_val = np.empty(0, data.dtype)
        for v in alp_idx:
            exc_positions[v] = empty_u16
            exc_values[v] = empty_val
        # vectorised ragged exception gather: one fancy-index into the
        # [n, 1024] scratch, then zero-copy np.split views (the former
        # per-vector .copy() loop was ~15% of host compress at 128 MiB)
        nz = alp_idx[np.nonzero(res["exc_count"][alp_idx])[0]]
        if nz.size:
            cnts = res["exc_count"][nz].astype(np.int64)
            rows = np.repeat(nz, cnts)
            ends = np.cumsum(cnts)
            cols = np.arange(int(ends[-1])) - np.repeat(ends - cnts, cnts)
            pos_flat = res["exc_positions"][rows, cols]
            val_flat = res["exc_values"][rows, cols]
            splits = ends[:-1]
            for v, p, w in zip(nz, np.split(pos_flat, splits),
                               np.split(val_flat, splits)):
                exc_positions[v] = p
                exc_values[v] = w
        enc_max[alp_idx] = res["enc_max"][alp_idx]
        # whole-column ragged pack: one native call, zero-copy views
        # (RD vectors pack at bw 0 here and are overwritten below)
        bw_pack = bit_width.copy()
        bw_pack[rd_idx] = 0
        if data.dtype == np.float64:
            flat_pk, off = nat.ffor_ragged(encoded, bw_pack, base)
        else:
            flat_pk, off = nat.ffor_ragged32(encoded, bw_pack, base)
        for v in alp_idx:
            packed[v] = flat_pk[off[v]:off[v + 1]]
    elif alp_idx.size:
        vals_dev = nm.values_from_np(vectors[alp_idx])
        res = oalp.encode_pipeline(vals_dev, combos[alp_idx],
                                   k_count[alp_idx], dtype=data.dtype)
        encoded = np.asarray(res["encoded"])
        exc_mask = np.asarray(res["exc_mask"])
        fac[alp_idx] = np.asarray(res["fac"], np.uint8)
        exp[alp_idx] = np.asarray(res["exp"], np.uint8)
        bws = np.asarray(res["bit_width"])
        bit_width[alp_idx] = bws.astype(np.uint8)
        bases = np.asarray(res["base"], tc.st)
        base[alp_idx] = bases
        enc_max[alp_idx] = (
            encoded.max(axis=1).astype(np.int64).view(np.uint64)
            - bases.astype(np.int64).view(np.uint64))
        positions = _compact_exceptions(exc_mask)
        for j, v in enumerate(alp_idx):
            exc_positions[v] = positions[j]
            exc_values[v] = vectors[v][positions[j]]
            exc_count[v] = len(positions[j])
        # pack per distinct bit width (batched)
        for bw in np.unique(bws):
            sel = np.nonzero(bws == bw)[0]
            pk = np.asarray(jfl.ffor_pack(
                encoded[sel], bases[sel], bw=int(bw)), tc.ut)
            for r, j in enumerate(sel):
                packed[alp_idx[j]] = pk[r]

    for rg, stt in rd_states.items():
        lo_v = rg * C.N_VECTORS_PER_ROWGROUP
        hi_v = min(n_vec, lo_v + C.N_VECTORS_PER_ROWGROUP)
        sel = np.arange(lo_v, hi_v)
        bits = vectors[sel].view(tc.ut)
        nrg = len(sel)
        dict_pad = np.full((nrg, C.MAX_RD_DICTIONARY_SIZE), 0xFFFF, np.uint16)
        dict_pad[:, :stt.actual_dictionary_size] = stt.left_parts_dict
        right, left_idx, exc_mask, left_raw = ordops.rd_encode_vectors(
            bits, np.full(nrg, stt.right_bit_width, np.int32), dict_pad,
            np.full(nrg, stt.actual_dictionary_size, np.int32),
            element_bits=tc.exact_type_bit_size)
        right = np.asarray(right)
        left_idx = np.asarray(left_idx)
        exc_mask = np.asarray(exc_mask)
        left_raw = np.asarray(left_raw)
        rbw = stt.right_bit_width
        lbw = stt.left_bit_width
        pk_r = np.asarray(jfl.ffor_pack(
            right, np.zeros(nrg, tc.ut), bw=rbw), tc.ut)
        pk_l = np.asarray(jfl.ffor_pack(
            left_idx, np.zeros(nrg, np.uint16), bw=lbw), np.uint16)
        positions = _compact_exceptions(exc_mask)
        for r, v in enumerate(sel):
            packed[v] = pk_r[r]
            left_packed[v] = pk_l[r]
            exc_positions[v] = positions[r]
            exc_values[v] = left_raw[r][positions[r]]
            exc_count[v] = len(positions[r])

    rd_dict = np.zeros((n_rg, C.MAX_RD_DICTIONARY_SIZE), np.uint16)
    rd_dict_size = np.zeros(n_rg, np.uint8)
    rd_left_bw = np.zeros(n_rg, np.uint8)
    rd_right_bw = np.zeros(n_rg, np.uint8)
    for rg, stt in rd_states.items():
        rd_dict[rg, :stt.actual_dictionary_size] = stt.left_parts_dict
        rd_dict_size[rg] = stt.actual_dictionary_size
        rd_left_bw[rg] = stt.left_bit_width
        rd_right_bw[rg] = stt.right_bit_width

    return CompressedColumn(
        dtype=np.dtype(data.dtype), n_values=len(data), n_vectors=n_vec,
        rg_scheme=rg_scheme, rd_dict=rd_dict, rd_dict_size=rd_dict_size,
        rd_left_bw=rd_left_bw, rd_right_bw=rd_right_bw,
        fac=fac, exp=exp, bit_width=bit_width, base=base,
        exc_count=exc_count, packed=packed, left_packed=left_packed,
        exc_values=exc_values, exc_positions=exc_positions,
        enc_max=enc_max)


# ---------------------------------------------------------------------------
# Decompress (correctness path; kernels.decode has the speed path)
# ---------------------------------------------------------------------------

def decompress(col: CompressedColumn, *, mesh=None) -> np.ndarray:
    """Decompress to a 1-D numpy array; bit-exact round-trip.

    ``mesh``: shard each decode bucket's tile groups over the mesh
    (SPMD fused kernels, ordered host gather of the planes)."""
    if mesh is not None:
        from .parallel.container_par import decompress_sharded
        return decompress_sharded(col, mesh)
    with _host_cpu():
        return _decompress(col)


def _decompress(col: CompressedColumn) -> np.ndarray:
    tc = constants_for(col.dtype)
    nm = numerics_for(col.dtype)
    n_vec = col.n_vectors
    out = np.empty((n_vec, C.VECTOR_SIZE), dtype=col.dtype)
    vec_rg = np.arange(n_vec) // C.N_VECTORS_PER_ROWGROUP
    scheme = col.rg_scheme[vec_rg]

    nat = None
    try:
        from . import native as _nat
        _nat.build()
        nat = _nat
    except Exception:
        nat = None

    alp_idx = np.nonzero(scheme == C.SCHEME_ALP)[0]
    if alp_idx.size and nat is not None:
        # native fused falp decode, mixed bit widths in one call,
        # straight into the output buffer; exceptions patched with one
        # vectorised scatter (decoder::patch_exceptions analog)
        f64 = col.dtype == np.float64
        L = 16 if f64 else 32
        packed_flat = np.concatenate(
            [col.packed[v] for v in alp_idx] or
            [np.empty(0, tc.ut)]).astype(tc.ut, copy=False)
        sizes = col.bit_width[alp_idx].astype(np.int64) * L
        offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(
            np.int32)
        full = alp_idx.size == n_vec
        dest = out if full else np.empty((len(alp_idx), C.VECTOR_SIZE),
                                         col.dtype)
        # the float FACT table is only MAX_EXPONENT long (reference OOB
        # quirk); a stored fac index can never exceed it for values
        # that round-tripped, but guard the table read anyway
        facts = tc.fact_arr[np.minimum(col.fac[alp_idx],
                                       len(tc.fact_arr) - 1)]
        if f64:
            nat.falp_f64(
                packed_flat, offsets, col.bit_width[alp_idx],
                col.base[alp_idx].astype(np.int64), facts,
                tc.frac_arr[col.exp[alp_idx]], out=dest)
        else:
            nat.falp_f32(
                packed_flat, offsets, col.bit_width[alp_idx],
                col.base[alp_idx].astype(np.int32), facts,
                tc.frac_arr[col.exp[alp_idx]], out=dest)
        exc_vecs = alp_idx[col.exc_count[alp_idx] > 0]
        if exc_vecs.size:
            rows = exc_vecs if full else np.searchsorted(alp_idx, exc_vecs)
            vv = np.repeat(rows, col.exc_count[exc_vecs].astype(np.int64))
            pp = np.concatenate([col.exc_positions[v] for v in exc_vecs])
            vals = np.concatenate([col.exc_values[v] for v in exc_vecs])
            dest[vv, pp.astype(np.int64)] = vals
        if not full:
            out[alp_idx] = dest
    elif alp_idx.size:
        bws = col.bit_width[alp_idx]
        decoded = np.empty((len(alp_idx), C.VECTOR_SIZE), dtype=col.dtype)
        for bw in np.unique(bws):
            sel = np.nonzero(bws == bw)[0]
            pk = np.stack([col.packed[alp_idx[j]] for j in sel])
            ints = np.asarray(jfl.unffor_unpack(
                pk, col.base[alp_idx[sel]], bw=int(bw)), tc.st)
            dec = oalp.decode_pipeline(
                ints, col.fac[alp_idx[sel]].astype(np.int32),
                col.exp[alp_idx[sel]].astype(np.int32), dtype=col.dtype)
            decoded[sel] = nm.values_to_np(np.asarray(dec)).reshape(
                len(sel), C.VECTOR_SIZE)
        for j, v in enumerate(alp_idx):
            decoded[j][col.exc_positions[v]] = col.exc_values[v]
            out[v] = decoded[j]

    rd_idx = np.nonzero(scheme == C.SCHEME_ALP_RD)[0]
    if rd_idx.size:
        # batched per (right bw, left bw) bucket: one unFFOR call over
        # the stacked payload (native OpenMP for f64), one dictionary
        # take, one vectorised exception scatter — replaces the former
        # per-vector Python loop
        rbws = col.rd_right_bw[vec_rg[rd_idx]]
        lbws = col.rd_left_bw[vec_rg[rd_idx]]
        for rbw, lbw in {(int(r), int(l)) for r, l in zip(rbws, lbws)}:
            sel = rd_idx[(rbws == rbw) & (lbws == lbw)]
            pk = np.stack([col.packed[v] for v in sel])
            lp = np.stack([col.left_packed[v] for v in sel])
            if nat is not None:
                # one fused native call: unFFOR right + left indexes,
                # dictionary resolve, glue (OpenMP across vectors)
                vals = nat.rd_decode(
                    pk, lp, col.rd_dict[vec_rg[sel]],
                    col.rd_dict_size[vec_rg[sel]], rbw, lbw, tc.ut)
            else:
                right = np.asarray(jfl.unffor_unpack(
                    pk, np.zeros(len(sel), tc.ut), bw=rbw,
                    signed=False), tc.ut)
                left_idx = np.asarray(jfl.unffor_unpack(
                    lp, np.zeros(len(sel), np.uint16), bw=lbw,
                    signed=False), np.uint16)
                dict_rows = col.rd_dict[vec_rg[sel]]       # [m, 8] u16
                clamp = np.maximum(
                    col.rd_dict_size[vec_rg[sel]].astype(np.int32) - 1,
                    0)
                safe = np.minimum(left_idx.astype(np.int32),
                                  clamp[:, None])
                left = np.take_along_axis(dict_rows, safe,
                                          axis=1).astype(tc.ut)
                vals = (left << tc.ut.type(rbw)) | right
            exc_sel = sel[col.exc_count[sel] > 0]
            if exc_sel.size:
                rows = np.searchsorted(sel, exc_sel)
                vv = np.repeat(rows,
                               col.exc_count[exc_sel].astype(np.int64))
                pp = np.concatenate(
                    [col.exc_positions[v] for v in exc_sel]).astype(
                        np.int64)
                lv = np.concatenate(
                    [col.exc_values[v] for v in exc_sel]).astype(tc.ut)
                rmask = tc.ut.type((1 << rbw) - 1)
                vals[vv, pp] = ((lv << tc.ut.type(rbw))
                                | (vals[vv, pp] & rmask))
            out[sel] = vals.view(col.dtype)

    return out.reshape(-1)[:col.n_values]
