"""Attribute the v3 warp kernel's 1080p time: scaling vs channels/rows.

If time scales with C, the per-group inner loop dominates; if flat, the
per-tile mask build / DMA / launch overhead does.

    python tools/warp_attrib.py
"""

import time

import numpy as np
import jax
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax.numpy as jnp


def _fetch(out):
    return float(jnp.sum(out.ravel()[:8].astype(jnp.float32)))


def timeit(fn, x, flow, iters=8, warmup=0):
    # differential in-jit timing (see tools/_timing.py: the relay memoizes
    # identical dispatches, block_until_ready does not block, and a fetch
    # costs ~40 ms — the old call-chain loop was biased +4-5 ms/call)
    from _timing import chained_timeit

    return chained_timeit(fn, x, flow, iters=iters)


def main():
    from scipy.ndimage import gaussian_filter

    from rvdd_tpu.ops.pallas.warp_rowmajor import warp_planar_pallas

    H, W = 1080, 1920
    wl = 2048
    rng = np.random.default_rng(0)
    fl = np.stack(
        [gaussian_filter(rng.standard_normal((H, W)), 40) * 25 + 2,
         gaussian_filter(rng.standard_normal((H, W)), 40) * 25 - 1],
        -1,
    ).astype(np.float32)
    flow = jnp.asarray(fl)

    for c in (8, 16, 32, 56):
        x = jnp.asarray(
            rng.uniform(-1, 1, (H * c, wl)).astype(np.float32)
        ).astype(jnp.bfloat16)
        fn = jax.jit(lambda x, f: warp_planar_pallas(x, f, h_img=H, w_img=W))
        t = timeit(fn, x, flow)
        print(f"c={c:3d}   {1e3 * t:7.2f} ms   ({1e3 * t / c:6.3f} ms/ch)")

    # zero flow: minimal n_d, e sweep unchanged
    c = 56
    x = jnp.asarray(
        rng.uniform(-1, 1, (H * c, wl)).astype(np.float32)
    ).astype(jnp.bfloat16)
    fn = jax.jit(lambda x, f: warp_planar_pallas(x, f, h_img=H, w_img=W))
    t = timeit(fn, x, jnp.zeros_like(flow))
    print(f"zero flow c=56   {1e3 * t:7.2f} ms")

    # half height: is it linear in tiles?
    Hh = 540
    xh = jnp.asarray(
        rng.uniform(-1, 1, (Hh * c, wl)).astype(np.float32)
    ).astype(jnp.bfloat16)
    fnh = jax.jit(lambda x, f: warp_planar_pallas(x, f, h_img=Hh, w_img=W))
    t = timeit(fnh, xh, flow[:Hh])
    print(f"H=540 c=56       {1e3 * t:7.2f} ms")


if __name__ == "__main__":
    main()
