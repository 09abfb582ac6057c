"""NumPy oracle: exact, host-side reference semantics for ALP.

This subpackage pins the bit-exact behaviour (IEEE-754 double/float math,
FastLanes packing bytes, tie-breaking) that the TPU implementations in
``alp_tpu.ops`` are validated against.  It is also the host-side planner
used for tiny inputs where dispatching to the accelerator isn't worth it.
"""

from .core import (AlpState, EncodedVector, analyze_ffor, decode_value,
                   decode_vector, encode, encode_value_safe,
                   encode_value_unsafe, encode_vector, encoder_init,
                   find_best_exponent_factor_from_combinations,
                   find_top_k_combinations, first_level_sample,
                   replace_specials, width_of_range)
from .fastlanes import ffor_pack, unffor_unpack
from .rd import (RdEncodedVector, build_left_parts_dictionary,
                 find_best_dictionary, rd_decode_vector, rd_encode_vector,
                 rd_encoder_init)
from .pipeline import (VectorMetadata, bench_column,
                       compression_ratio_bits_per_value,
                       roundtrip_first_vector)
