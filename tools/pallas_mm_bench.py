"""MXU/VPU rates for the primitives a fused 48-ch conv kernel needs.

Times each VMEM-resident op at two in-kernel rep counts and reports the
slope, cancelling dispatch and pipeline-fill overhead.

    python tools/pallas_mm_bench.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run_dot(m, k, n, reps):
    def kernel(a_ref, b_ref, out_ref):
        def body(i, acc):
            # NOTE: the dot is loop-invariant; if Mosaic ever hoists it the
            # slope collapses and the TF/s print becomes absurd — watch it.
            return acc + jax.lax.dot_general(
                a_ref[:, :], b_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        out_ref[:, :] = jax.lax.fori_loop(
            0, reps, body, jnp.zeros((m, n), jnp.float32)
        ).astype(out_ref.dtype)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(a, b)

    return run


def run_patch_build(c, tw, reps):
    """Cost of building [9C, tw] im2col patches from a [C, 3, tw+128] window
    (9 shifted slices, sublane-offset stores)."""

    def kernel(w_ref, out_ref, patches):
        def body(i, s):
            for dy in range(3):
                for dx in range(3):
                    patches[(3 * dy + dx) * c : (3 * dy + dx + 1) * c, :] = (
                        w_ref[:, dy, dx : dx + tw]
                    )
            return s + patches[0:1, 0:128].astype(jnp.float32)[0, 0]

        val = jax.lax.fori_loop(0, reps, body, 0.0)
        out_ref[:, :] = jnp.full((1, 1), val, jnp.float32)

    @jax.jit
    def run(w):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[pltpu.VMEM((9 * c, tw), w.dtype)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(w)

    return run


def timeit(mk_run, mk_args, r1=200, r2=4200, iters=8):
    a = mk_args()
    lo, hi = mk_run(r1), mk_run(r2)
    ts = []
    for run, reps in ((lo, r1), (hi, r2)):
        out = run(*a)
        float(jnp.sum(out.ravel()[:1]))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(*a)
        float(jnp.sum(out.ravel()[:1]))
        ts.append((time.perf_counter() - t0) / iters)
    return (ts[1] - ts[0]) / (r2 - r1)


def main():
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    def mk(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32)).astype(bf)

    dots = [
        ("B row  [48,432]@[432,1920] ", 48, 432, 1920),
        ("B row  [48,432]@[432,512]  ", 48, 432, 512),
        ("B wide [48,432]@[432,3840] ", 48, 432, 3840),
        ("B dec  [96,864]@[864,1920] ", 96, 864, 1920),
        ("B pad  [64,512]@[512,1920] ", 64, 512, 1920),
        ("A slab [1920,432]@[432,48] ", 1920, 432, 48),
        ("A slab [1920,432]@[432,128]", 1920, 432, 128),
        ("peak   [512,512]@[512,512] ", 512, 512, 512),
        ("peak   [256,1024]@[1024,1024]", 256, 1024, 1024),
    ]
    for name, m, k, n in dots:
        t = timeit(lambda r: run_dot(m, k, n, r), lambda: (mk(m, k), mk(k, n)))
        fl = 2 * m * k * n
        print(f"{name} {1e6 * t:8.2f} us  {fl / t / 1e12:6.1f} TF/s")

    for c, tw in ((48, 1920), (48, 512)):
        t = timeit(lambda r: run_patch_build(c, tw, r), lambda: (mk(c, 3, tw + 128),))
        byt = 9 * c * tw * 2 * 2  # read+write bf16
        print(f"patches [{9*c},{tw}] build    {1e6 * t:8.2f} us  {byt / t / 1e9:6.0f} GB/s")


if __name__ == "__main__":
    main()
