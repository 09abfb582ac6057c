"""Per-precision numeric kernels for the ops layer.

The ops layer carries doubles as ``uint64`` *bit patterns* (never as XLA
f64, whose TPU emulation is not correctly rounded) and int64 natively
(XLA's 64-bit integer emulation on TPU is exact).  The float path is
native f32/i32 (TPU VPU f32 arithmetic is IEEE).  This module exposes one
uniform interface over both.

Requires jax_enable_x64 (set by ``import alp_tpu``).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .. import constants as C
from . import softfloat as sf

_U32_MASK = jnp.uint64(0xFFFFFFFF)


def _split(x: jnp.ndarray) -> sf.U64:
    x = x.astype(jnp.uint64)
    return sf.U64((x >> jnp.uint64(32)).astype(jnp.uint32),
                  (x & _U32_MASK).astype(jnp.uint32))


def _join(p: sf.U64) -> jnp.ndarray:
    return ((p.hi.astype(jnp.uint64) << jnp.uint64(32))
            | p.lo.astype(jnp.uint64))


# -- f64-as-u64 wrappers ----------------------------------------------------

def f64_mul(a, b):
    return _join(sf.f64_mul(_split(a), _split(b)))


def f64_add(a, b):
    return _join(sf.f64_add(_split(a), _split(b)))


def i64_to_f64(x):
    return _join(sf.i64_to_f64(_split(x)))


def f64_to_i64_x86(x):
    return _join(sf.f64_to_i64_x86(_split(x))).astype(jnp.int64)


def f64_eq_ieee(a, b):
    return sf.f64_eq_ieee(_split(a), _split(b))


@dataclasses.dataclass(frozen=True)
class Numerics:
    """Uniform value/int kernel set for one precision.

    ``vt`` is the dtype values travel in (u64 bits for doubles, f32 for
    floats); ``st``/``ut`` the signed/unsigned integer types.
    """
    tc: C.TypeConstants
    vt: np.dtype
    st: np.dtype
    ut: np.dtype

    # tables as device-constant arrays (bit patterns for the double path)
    exp_tab: np.ndarray
    frac_tab: np.ndarray
    fact_tab: np.ndarray

    def mul(self, a, b):
        raise NotImplementedError

    def values_from_np(self, arr: np.ndarray) -> np.ndarray:
        """Host float array -> ops-layer representation."""
        raise NotImplementedError

    def values_to_np(self, arr) -> np.ndarray:
        raise NotImplementedError


class _DoubleNumerics(Numerics):
    def mul(self, a, b):
        return f64_mul(a, b)

    def add(self, a, b):
        return f64_add(a, b)

    def int_to_float(self, x):
        return i64_to_f64(x.astype(jnp.int64))

    def float_to_int(self, x):
        return f64_to_i64_x86(x)

    def eq(self, a, b):
        return f64_eq_ieee(a, b)

    def is_finite(self, a):
        return sf.f64_is_finite(_split(a))

    def is_nan(self, a):
        return sf.f64_is_nan(_split(a))

    def gt(self, a, b):
        return sf.f64_gt(_split(a), _split(b))

    def lt(self, a, b):
        return sf.f64_lt(_split(a), _split(b))

    def signbit(self, a):
        return sf.f64_signbit(_split(a))

    def is_zero(self, a):
        return sf.f64_is_zero(_split(a))

    def is_impossible(self, tmp):
        """is_impossible_to_encode (encoder.hpp:75-78) on the scaled value."""
        upper = np.array(C.ENCODING_UPPER_LIMIT, np.float64).view(np.uint64)
        lower = np.array(C.ENCODING_LOWER_LIMIT, np.float64).view(np.uint64)
        s = _split(tmp)
        return (~sf.f64_is_finite(s)
                | self.gt(tmp, jnp.uint64(upper))
                | self.lt(tmp, jnp.uint64(lower))
                | (sf.f64_is_zero(s) & sf.f64_signbit(s)))

    def bits(self, a):
        return a.astype(jnp.uint64)

    def from_bits(self, b):
        return b.astype(jnp.uint64)

    def values_from_np(self, arr):
        return np.ascontiguousarray(arr).view(np.uint64)

    def values_to_np(self, arr):
        return np.asarray(arr, dtype=np.uint64).view(np.float64)


class _FloatNumerics(Numerics):
    def mul(self, a, b):
        return a * b

    def add(self, a, b):
        return a + b

    def int_to_float(self, x):
        return x.astype(jnp.int32).astype(jnp.float32)

    def float_to_int(self, x):
        # x86 cvttss2si semantics: out-of-range/NaN -> INT32_MIN
        lo = jnp.float32(-(2.0 ** 31))
        hi = jnp.float32(2.0 ** 31)
        ok = (x >= lo) & (x < hi)
        out = jnp.where(ok, x, 0).astype(jnp.int32)
        return jnp.where(ok, out, jnp.int32(-(1 << 31)))

    def eq(self, a, b):
        return a == b

    def is_finite(self, a):
        return jnp.isfinite(a)

    def is_nan(self, a):
        return jnp.isnan(a)

    def gt(self, a, b):
        return a > b

    def lt(self, a, b):
        return a < b

    def signbit(self, a):
        return jnp.signbit(a)

    def is_zero(self, a):
        return a == 0

    def is_impossible(self, tmp):
        """is_impossible_to_encode with the C++ promotion to double: an f32
        value compares > (2^63 - 1024) as double iff it is >= 2^63 as f32
        (the largest f32 below 2^63 is 2^63 - 2^39, well under the limit)."""
        hi = jnp.float32(2.0 ** 63)
        return (~jnp.isfinite(tmp) | (tmp >= hi) | (tmp <= -hi)
                | ((tmp == 0) & jnp.signbit(tmp)))

    def bits(self, a):
        return jnp.asarray(a).view(jnp.uint32)

    def from_bits(self, b):
        return jnp.asarray(b).view(jnp.float32)

    def values_from_np(self, arr):
        return np.ascontiguousarray(arr, dtype=np.float32)

    def values_to_np(self, arr):
        return np.asarray(arr, dtype=np.float32)


def _make_double() -> _DoubleNumerics:
    tc = C.DOUBLE
    return _DoubleNumerics(
        tc=tc, vt=np.dtype(np.uint64), st=np.dtype(np.int64),
        ut=np.dtype(np.uint64),
        exp_tab=tc.exp_arr.view(np.uint64),
        frac_tab=tc.frac_arr.view(np.uint64),
        fact_tab=tc.fact_arr.copy(),
    )


def _make_float() -> _FloatNumerics:
    tc = C.FLOAT
    # Reference quirk (constants.hpp:63): FACT_ARR<float> has 10 entries but
    # MAX_EXPONENT is 10, so factor index 10 reads OOB garbage that never
    # round-trips.  ops.alp.decode_value models that as a NaN decode.
    return _FloatNumerics(
        tc=tc, vt=np.dtype(np.float32), st=np.dtype(np.int32),
        ut=np.dtype(np.uint32),
        exp_tab=tc.exp_arr.copy(),
        frac_tab=tc.frac_arr.copy(),
        fact_tab=tc.fact_arr.copy(),
    )


DOUBLE_NUMERICS = _make_double()
FLOAT_NUMERICS = _make_float()


def numerics_for(dtype) -> Numerics:
    dt = np.dtype(dtype)
    if dt in (np.float64, np.uint64):
        return DOUBLE_NUMERICS
    if dt in (np.float32,):
        return FLOAT_NUMERICS
    raise TypeError(f"unsupported dtype {dt}")
