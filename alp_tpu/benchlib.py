"""Measurement utilities for TPU kernel throughput.

Through a remote-execution tunnel (axon), per-dispatch timing is
unreliable: identical dispatches can be deduplicated and
block_until_ready does not bound device execution of the full stream.
The robust method is one jitted program that runs the kernel ``n``
times inside ``lax.fori_loop`` with a data dependence between iterations
(output folds into an input), returning a single scalar — wall time then
bounds true device time.

A single such program still pays a fixed program-level cost (dispatch
RPC through the tunnel + fetch, ~30 ms here; µs on directly-attached
hardware) that is NOT kernel time.  ``loop_bench`` therefore times the
program at two trip counts (n and 4n, same compiled executable — the
trip count is a traced scalar) and reports the slope: the marginal
per-iteration device time, with the program constant cancelled.  This
matches the reference's steady-state methodology (30k-iteration timing
loops, fls_bench.hpp) where dispatch overhead is negligible by
construction.

Operand arrays must be passed via ``args`` (not closed over): closures
over concrete arrays embed them as constants in the compile payload,
which a remote-compile transport rejects for large benches.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def loop_bench(step, args: tuple, iters: int, reps: int = 2) -> float:
    """Marginal per-iteration device time of ``step(carry, *args)``.

    ``step`` runs the computation under test and returns a uint32 scalar
    derived from its output; fold the carry into an *input* of the hot
    computation so no part of it is loop-invariant (XLA hoists invariant
    subgraphs out of the loop).  Returns seconds per iteration: the
    (4·iters − iters)-run time difference divided by 3·iters, best of
    ``reps`` passes — compile, warmup, and the per-program dispatch/RPC
    constant all cancel.
    """

    @jax.jit
    def run(n, carry0, *a):
        def body(_, carry):
            return step(carry, *a)
        return jax.lax.fori_loop(0, n, body, carry0)

    carry0 = jnp.zeros((), jnp.uint32)
    int(run(jnp.int32(4 * iters), carry0, *args))   # compile + warm pass

    def measure(k):
        n1 = jnp.asarray(k, jnp.int32)
        n2 = jnp.asarray(4 * k, jnp.int32)
        ds = []
        for _ in range(reps):
            t0 = time.perf_counter()
            int(run(n1, carry0, *args))  # scalar fetch forces completion
            t1 = time.perf_counter()
            int(run(n2, carry0, *args))
            t2 = time.perf_counter()
            ds.append(((t2 - t1) - (t1 - t0)) / (3 * k))
        return ds

    ds = measure(iters)
    if min(ds) <= 0:
        # an RPC hiccup on one pass can make the slope non-positive;
        # re-measure with 4x the trip count (amortises the hiccup)
        # rather than silently publishing an absurd rate
        ds = measure(4 * iters)
        if min(ds) <= 0:
            raise RuntimeError(
                "loop_bench: non-positive slope twice — measurement "
                f"invalid (deltas: {ds}); check for device contention")
    return min(ds)
