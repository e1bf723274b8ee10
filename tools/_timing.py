"""Shared device-timing helper for the tools/ scripts.

Dispatching the same jitted call with identical arguments repeatedly is
memoized by the axon relay (the warp tools measured ~0 ms for such
loops), so `chained_timeit` runs the workload inside ONE jitted
fori_loop and perturbs the primary operand each iteration by a
numerically-negligible function of the previous output (+= s * 1e-8 —
data-dependent, so neither memoizable nor hoistable as loop-invariant).
The perturbation costs one elementwise read+write of the primary operand
per iteration (~0.02 ms for a 1080p plane).
"""

import time

import jax
import jax.numpy as jnp  # noqa: F401  (convenience for importers)


def chained_timeit(fn, primary, *rest, iters=10):
    """Per-call seconds of ``fn(primary, *rest)`` under an input chain."""

    @jax.jit
    def run(x):
        def body(_, x):
            out = fn(x, *rest)
            s = jax.tree_util.tree_leaves(out)[0].ravel()[0]
            return x + (s * 1e-8).astype(x.dtype)

        return jax.lax.fori_loop(0, iters, body, x)

    jax.block_until_ready(run(primary))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(run(primary))
    return (time.perf_counter() - t0) / iters
