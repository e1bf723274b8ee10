"""Fused conv-chain kernel benchmarks at 1080p on the TPU.

Decomposes cost per chain depth and runs the real chain-A shape
(convunet+feat encoder level 0).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from rvdd_tpu.ops.pallas.conv_pallas import fused_conv_chain, lane_width, pack_weight


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a.ravel()[:2].astype(jnp.float32))), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a.ravel()[:2].astype(jnp.float32))), out)
    return (time.perf_counter() - t0) / iters


def mkw(rng, ci, co, split=None):
    wt = jnp.asarray((rng.standard_normal((3, 3, ci, co)) * 0.05).astype(np.float32))
    return pack_weight(wt, split)


def main():
    h, w = 1080, 1920
    wl = lane_width(w)
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    def mk(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.2).astype(bf)

    x48 = mk(h * 48, wl)
    b48 = jnp.zeros(48, jnp.float32)

    # depth sweep: L x (48 -> 48 relu)
    for nl in (1, 2, 4):
        ws = tuple(mkw(rng, 48, 48) for _ in range(nl))
        bs = (b48,) * nl
        acts = ("relu",) * nl
        ks = (3,) * nl
        fn = jax.jit(
            lambda x, ws=ws, bs=bs, acts=acts, ks=ks: fused_conv_chain(
                x, ws, bs, acts, ks, h_img=h, w_img=w, tile_h=36,
            )
        )
        t = timeit(fn, x48)
        gf = 2 * h * w * 9 * 48 * 48 * nl / 1e9
        print(f"chain {nl}x(48->48)  : {1e3 * t:7.2f} ms  {1e3 * t / nl:6.2f} ms/conv  ({gf / t / 1e3:5.1f} TF/s)")

    # the real chain A (convunet+feat enc level 0)
    x = mk(h * 8, wl)
    feat = mk(h * 48, wl)
    ws = (
        mkw(rng, 8, 48),
        mkw(rng, 96, 48, 48),
        mkw(rng, 48, 48),
        mkw(rng, 48, 48),
    )
    bs = (b48,) * 4
    acts = ("none", "relu", "relu", "none")
    ks = (3, 3, 3, 3)
    for tile_h in (36,):
        fn = jax.jit(
            lambda x, feat: fused_conv_chain(
                x, ws, bs, acts, ks, h_img=h, w_img=w,
                aux=feat, emit=(2, 3), tile_h=tile_h,
            )
        )
        t = timeit(fn, x, feat)
        gf = 2 * h * w * 9 * (8 * 48 + 96 * 48 + 48 * 48 + 48 * 48) / 1e9
        print(f"chainA tile_h={tile_h}: {1e3 * t:7.2f} ms   ({gf / t / 1e3:5.1f} TF/s eff)")


if __name__ == "__main__":
    main()
