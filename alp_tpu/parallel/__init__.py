"""Multi-chip data parallelism for ALP compression (shard_map over a Mesh).

The reference's parallelism is thread-level morsels over whole vectors
(TBB pools {1,8,16}, reference
publication/source_code/bench_end_to_end/include/benchmarks/alp/config.hpp:26-92,
thread-safe primitives via thread_local scratch, encoder.hpp:314-319).
The TPU-native equivalent scales the same embarrassingly-parallel unit —
rowgroups of 1024-value vectors — across chips with ``shard_map`` over a
1-D device mesh, with jax collectives providing the (previously
nonexistent) distributed metrics/planning layer.
"""

from .sharded import (
    make_mesh,
    sharded_encode_decode_step,
    sharded_decode,
)
