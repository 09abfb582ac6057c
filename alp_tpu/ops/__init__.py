"""JAX/Pallas ops: the TPU compute path of alp_tpu.

- ``softfloat``: exact IEEE-754 binary64 on u32 limbs (jit- and
  Pallas-compatible).
- ``numerics``: per-precision kernel dispatch (u64-bits doubles / native
  f32).
- ``alp``: batched ALP primitives (encode/decode/analyze/second-level).
- ``fastlanes``: batched FFOR bit-packing (static-bw specializations).
"""

from . import softfloat
from . import numerics
from . import alp
from . import fastlanes
