"""Sweep the v3 planar warp kernel's tiling knobs on the real chip.

Finds where the 1080p 56-channel warp time goes (issue overhead vs FLOPs
vs DMA) by varying chunk sizes and sweep widths on the bench's synthetic
smooth flow.

    python tools/warp_sweep.py
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
    c = 56
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.uniform(-1, 1, (H * c, wl)).astype(np.float32)
    ).astype(jnp.bfloat16)
    fl = np.stack(
        [gaussian_filter(rng.standard_normal((H, W)), 40) * 25 + 2,
         gaussian_filter(rng.standard_normal((H, W)), 40) * 25 - 1],
        -1,
    ).astype(np.float32)
    flow = jnp.asarray(fl)

    ref = None
    for kw in (
        dict(),  # current defaults
        dict(group=16),
        dict(group=28),
        dict(group=56),
        dict(tile_c=1024),
        dict(tile_c=2048),
        dict(group=28, tile_c=2048),
        dict(d_max=8),
        dict(e_halo=2),
        dict(d_max=8, group=28, tile_c=2048),
        dict(tile_h=120),
        dict(tile_h=40),
    ):
        fn = jax.jit(lambda x, f, kw=dict(kw): warp_planar_pallas(
            x, f, h_img=H, w_img=W, **kw))
        try:
            out = fn(x, flow)
            if ref is None:
                ref = out.astype(jnp.float32)
                err = 0.0
            else:
                err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
            t = timeit(fn, x, flow)
            print(f"{str(kw):44s} {1e3 * t:7.2f} ms   maxdiff {err:.2e}")
        except Exception as e:  # noqa: BLE001
            print(f"{str(kw):44s} FAILED: {str(e)[:100]}")


if __name__ == "__main__":
    main()
