"""Measurement utilities for TPU kernel throughput.

Through a remote-execution tunnel (axon), per-dispatch timing is
unreliable: identical dispatches can be deduplicated and
block_until_ready does not bound device execution of the full stream.
The robust method is one jitted program that runs the kernel ``iters``
times inside ``lax.fori_loop`` with a data dependence between iterations
(output folds into an input), returning a single scalar — wall time then
bounds true device time, amortising all RPC overhead.

Operand arrays must be passed via ``args`` (not closed over): closures
over concrete arrays embed them as constants in the compile payload,
which a remote-compile transport rejects for large benches.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def loop_bench(step, args: tuple, iters: int) -> float:
    """Time ``iters`` dependent executions of ``step(carry, *args)``.

    ``step`` runs the computation under test and returns a uint32 scalar
    derived from its output (the data dependence).  Returns seconds per
    iteration (compile + warmup excluded).
    """

    @jax.jit
    def run(carry0, *a):
        def body(_, carry):
            return step(carry, *a)
        return jax.lax.fori_loop(0, iters, body, carry0)

    carry0 = jnp.zeros((), jnp.uint32)
    int(run(carry0, *args))          # compile + one full pass
    t0 = time.perf_counter()
    int(run(carry0, *args))          # scalar fetch forces completion
    return (time.perf_counter() - t0) / iters
