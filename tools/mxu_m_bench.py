"""Does the MXU pad LHS M to 128, or stream at 8-sublane granularity?

Times dot([M,256]@[256,2048]) for M in {8,48,128,144,256,384} with a cheap
anti-hoist (select between two small lhs buffers), slope method.

Also: lane-shift relayout vs aligned copy cost for [240,2048] bf16.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run_dot(m, k, n, reps):
    def kernel(a0_ref, a1_ref, b_ref, out_ref):
        def body(i, acc):
            a = jax.lax.cond(
                i % 2 == 0, lambda: a0_ref[:, :], lambda: a1_ref[:, :]
            )
            return acc + jax.lax.dot_general(
                a, b_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        out_ref[:, :] = jax.lax.fori_loop(
            0, reps, body, jnp.zeros((m, n), jnp.float32)
        ).astype(out_ref.dtype)

    @jax.jit
    def run(a0, a1, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(a0, a1, b)

    return run


def run_copy(rows, n, reps, shift):
    def kernel(x_ref, out_ref, scratch):
        def body(i, s):
            if shift:
                scratch[:, :] = scratch[:, :] + jnp.concatenate(
                    [x_ref[:, 1:], x_ref[:, :1]], axis=1
                )
            else:
                scratch[:, :] = scratch[:, :] + x_ref[:, :]
            return s + 1

        scratch[:, :] = x_ref[:, :]
        n_ = jax.lax.fori_loop(0, reps, body, 0)
        out_ref[:, :] = scratch[0:8, 0:128].astype(jnp.float32) + n_

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((rows, n), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(x)

    return run


def timeit(mk_run, args, r1=200, r2=4200, iters=8):
    lo, hi = mk_run(r1), mk_run(r2)
    ts = []
    for run, reps in ((lo, r1), (hi, r2)):
        out = run(*args)
        float(jnp.sum(out.ravel()[:1]))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(*args)
        float(jnp.sum(out.ravel()[:1]))
        ts.append((time.perf_counter() - t0) / iters)
    return (ts[1] - ts[0]) / (r2 - r1)


def main():
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    def mk(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32)).astype(bf)

    k, n = 256, 2048
    for m in (8, 16, 48, 128):
        t = timeit(lambda r: run_dot(m, k, n, r), (mk(m, k), mk(m, k), mk(k, n)))
        fl = 2 * m * k * n
        print(f"dot [{m:3d},{k}]@[{k},{n}]  {1e6 * t:8.2f} us  {fl / t / 1e12:6.1f} TF/s")
    # dw grouped-dot candidates: [48/g*? ...] (M, K=49*M patterns) + batched-N
    for k2, n2, m2 in (
        (49 * 8, 2048, 8), (49 * 16, 2048, 16), (49 * 24, 2048, 24),
        (49 * 48, 2048, 48), (49 * 8, 8 * 2048, 8), (48, 2048, 192),
        (192, 2048, 48),
    ):
        t = timeit(lambda r: run_dot(m2, k2, n2, r), (mk(m2, k2), mk(m2, k2), mk(k2, n2)))
        fl = 2 * m2 * k2 * n2
        print(f"dot [{m2:3d},{k2}]@[{k2},{n2}]  {1e6 * t:8.2f} us  {fl / t / 1e12:6.1f} TF/s")

    for shift in (False, True):
        t = timeit(lambda r: run_copy(240, 2048, r, shift), (mk(240, 2048),))
        byt = 240 * 2048 * 2 * 2
        print(f"copy [240,2048] shift={int(shift)}    {1e6 * t:8.2f} us  {byt / t / 1e9:6.0f} GB/s")


if __name__ == "__main__":
    main()
