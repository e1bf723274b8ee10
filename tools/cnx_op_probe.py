"""Per-op VPU/MXU cost probes for the ConvNeXt block at 1080p row volume.

Times, per 1080 rows of wl=2048 lanes: the expanded-GELU nonlinearity
(tanh vs erf vs relu vs logistic), the channel LayerNorm, the pw dots, and
the dw dense dot — isolating which term dominates the 8 ms/block.
"""

import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F = 48
WL = 2048
ROWS = 240  # fits whole-array VMEM specs; timings scale linearly in rows


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(out.ravel()[:2].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.ravel()[:2].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def probe_rowloop(body, n_rows=ROWS, c=F, out_c=8, wt=None):
    """Run `body(x_block [c, WL] f32[, wt]) -> [out_c, WL]` per row inside
    one pallas kernel over n_rows rows; returns seconds per call."""

    def kernel(*refs):
        if wt is not None:
            x_ref, w_ref, out_ref = refs
        else:
            (x_ref, out_ref) = refs
            w_ref = None

        def row(r, carry):
            xb = x_ref[pl.ds(pl.multiple_of(r * c, 8), c), :].astype(jnp.float32)
            args = (xb,) if w_ref is None else (xb, w_ref[:, :])
            out_ref[:, :] = body(*args).astype(jnp.bfloat16)
            return carry

        jax.lax.fori_loop(0, n_rows, row, 0)

    x = jnp.asarray(
        (np.random.default_rng(0).standard_normal((n_rows * c, WL)) * 0.5).astype(
            np.float32
        )
    ).astype(jnp.bfloat16)
    ins = (x,) if wt is None else (x, wt)
    fn = jax.jit(
        lambda *ins: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((out_c, WL), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024
            ),
        )(*ins)
    )
    return timeit(fn, *ins)


def main():
    rng = np.random.default_rng(0)
    w1 = jnp.asarray((rng.standard_normal((4 * F, F)) * 0.1).astype(np.float32)).astype(jnp.bfloat16)
    w2 = jnp.asarray((rng.standard_normal((F, 4 * F)) * 0.1).astype(np.float32)).astype(jnp.bfloat16)
    wd = jnp.asarray((rng.standard_normal((F, 49 * F)) * 0.1).astype(np.float32)).astype(jnp.bfloat16)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    t = probe_rowloop(lambda xb: xb[:8] * 1.0001)
    print(f"baseline row loop (load only)      {1e3*t*1080/ROWS:7.2f} ms/1080rows")

    t = probe_rowloop(lambda xb: jnp.maximum(jnp.tile(xb, (4, 1)), 0.0)[:8])
    print(f"tile4 + relu [192,2048]            {1e3*t*1080/ROWS:7.2f} ms/1080rows")

    for name, act in (
        ("tanh-gelu", lambda v: jax.nn.gelu(v, approximate=True)),
        ("erfpoly-gelu", __import__("rvdd_tpu.ops.pallas.convnext_pallas", fromlist=["x"])._gelu_erf),
        ("logistic-gelu", lambda v: v * jax.lax.logistic(1.702 * v)),
        ("tanh only", jnp.tanh),
    ):
        t = probe_rowloop(lambda xb, act=act: act(jnp.tile(xb, (4, 1)))[:8])
        print(f"tile4 + {name:14s} [192,2048]  {1e3*t*1080/ROWS:7.2f} ms/1080rows")

    def ln(xb):
        u = jnp.mean(xb, axis=0, keepdims=True)
        d = xb - u
        s2 = jnp.mean(d * d, axis=0, keepdims=True)
        return (d * jax.lax.rsqrt(s2 + 1e-6))[:8]

    t = probe_rowloop(ln)
    print(f"channel LayerNorm [48,2048]        {1e3*t*1080/ROWS:7.2f} ms/1080rows")

    t = probe_rowloop(lambda xb, w: dot(w, xb.astype(jnp.bfloat16))[:8], wt=w1)
    print(f"pw1 dot [192,48]@[48,2048]         {1e3*t*1080/ROWS:7.2f} ms/1080rows")

    t = probe_rowloop(
        lambda xb, w: dot(w, jnp.tile(xb, (4, 1)).astype(jnp.bfloat16))[:8], wt=w2
    )
    print(f"pw2 dot [48,192]@[192,2048]        {1e3*t*1080/ROWS:7.2f} ms/1080rows")

    # dw dense dot at K=49*48 (reads 49F rows per iteration)
    def kernel_dw(x_ref, w_ref, out_ref):
        def row(r, carry):
            pj = x_ref[pl.ds(pl.multiple_of(r * F, 8), 49 * F), :]
            out_ref[:, :] = dot(w_ref[:, :], pj)[:8].astype(jnp.bfloat16)
            return carry

        jax.lax.fori_loop(0, ROWS, row, 0)

    x = jnp.asarray(
        (rng.standard_normal(((ROWS + 49) * F, WL)) * 0.5).astype(np.float32)
    ).astype(jnp.bfloat16)
    fn = jax.jit(
        lambda x, w: pl.pallas_call(
            kernel_dw,
            out_shape=jax.ShapeDtypeStruct((8, WL), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024
            ),
        )(x, w)
    )
    t = timeit(fn, x, wd)
    print(f"dw dense dot [48,2352]@[2352,2048] {1e3*t*1080/ROWS:7.2f} ms/1080rows")


if __name__ == "__main__":
    main()
