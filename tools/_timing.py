"""Shared device-timing helper for the tools/ scripts.

Two axon-relay artifacts make naive timing wrong here (both measured):

* dispatching the same jitted call with identical args repeatedly is
  memoized by the relay (~0 ms loops), and `block_until_ready` returns
  without actually waiting for remote execution (a 1080p/56ch kernel
  "completed" in 0.02 ms);
* the only reliable completion barrier is a real data fetch
  (`float(...)`), but one fetch costs ~40 ms of relay round-trip, which
  biased the old per-call loops by +4-5 ms/call at iters=10.

`chained_timeit` therefore runs the workload inside ONE jitted fori_loop
(each iteration perturbs the primary operand by a data-dependent epsilon
so nothing is memoizable or hoistable) and measures DIFFERENTIALLY: the
fetch-terminated wall time at `iters` and `2*iters` iterations, whose
difference cancels the fetch/dispatch constant exactly.
"""

import functools
import time

import jax
import jax.numpy as jnp  # noqa: F401  (convenience for importers)


def chained_timeit(fn, primary, *rest, iters=8, reps=3):
    """Per-call seconds of ``fn(primary, *rest)``, relay-bias-free."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(x, n):
        def body(_, x):
            out = fn(x, *rest)
            s = jax.tree_util.tree_leaves(out)[0].ravel()[0]
            return x + (s * 1e-8).astype(x.dtype)

        return jax.lax.fori_loop(0, n, body, x)

    def t_of(n):
        t0 = time.perf_counter()
        float(run(primary, n).ravel()[0])  # fetch = the only real barrier
        return time.perf_counter() - t0

    for n in (iters, 2 * iters):  # compile + warm both programs
        float(run(primary, n).ravel()[0])
    t1 = min(t_of(iters) for _ in range(reps))
    t2 = min(t_of(2 * iters) for _ in range(reps))
    return max(t2 - t1, 0.0) / iters
