"""Attribute the fp32-recurrence-carry cost (measured ~7.6 ms/frame at
1080p: 26.9 fps fp32 carry vs 33.8 fps bf16 carry, bench.py --state_dtype).

Times the two components that touch the carry dtype in isolation on the
real chip:
  1. warp_planar_pallas on the [H*56, WL+256] pre-padded state (fp32 vs
     bf16 input; the win_dtype follows the input dtype).
  2. the dec2 combined-state chain emit (out_dtype fp32 vs bf16).

    python tools/carry_attrib.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def fetch(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0].ravel()[:8].astype(jnp.float32)))


def timeit(fn, *args, iters=8, warmup=0):
    # differential in-jit timing (tools/_timing.py): cancels the relay's
    # ~40 ms fetch constant that biased per-call loops by +4-5 ms
    import os, sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _timing import chained_timeit

    return chained_timeit(fn, *args, iters=iters)


def main():
    from rvdd_tpu.ops.pallas.warp_rowmajor import (
        STATE_LANE_EXTRA,
        warp_planar_pallas,
    )

    h, w = 1080, 1920
    wl = 2048
    c = 56
    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter

    fl = np.stack(
        [
            gaussian_filter(rng.standard_normal((h, w)), 40) * 25 + 2,
            gaussian_filter(rng.standard_normal((h, w)), 40) * 25 - 1,
        ],
        -1,
    ).astype(np.float32)
    flow = jnp.asarray(fl)
    state_f32 = jnp.asarray(
        rng.uniform(-1, 1, (h * c, wl + STATE_LANE_EXTRA)).astype(np.float32)
    )
    state_bf16 = state_f32.astype(jnp.bfloat16)

    for name, x in [("fp32", state_f32), ("bf16", state_bf16)]:
        t = timeit(
            lambda s: warp_planar_pallas(
                s, flow, h_img=h, w_img=w, out_dtype=jnp.bfloat16,
                prepadded=True,
            ),
            x,
        )
        print(f"warp state[{name}]: {t*1e3:7.2f} ms")

    # dec2 chain emit dtype cost, via the full fused forward
    from rvdd_tpu.models import build_network
    from rvdd_tpu.models.factory import init_network
    from rvdd_tpu.models.fast_unet import fast_forward_planar, pack_fast_params

    net = build_network(
        "convunet-mode=fixedfeatures+feat", 6, 3, True, dtype=jnp.bfloat16
    )
    params = init_network(net, jax.random.PRNGKey(0), (1, 128, 128, 6))
    packed = pack_fast_params(params, True, 6)
    xp = jnp.asarray(
        rng.uniform(-1, 1, (h * 8, wl)).astype(np.float32)
    ).astype(jnp.bfloat16)
    # aux mirrors the engine's warp output: [H*56, WL], not pre-padded
    aux = jnp.asarray(
        rng.uniform(-1, 1, (h * c, wl)).astype(np.float32)
    ).astype(jnp.bfloat16)

    for name, sd in [("fp32", jnp.float32), ("bf16", jnp.bfloat16)]:
        fwd = jax.jit(
            lambda xp, aux: fast_forward_planar(
                net, packed, xp, aux, h, w, aux_channels=(8, 48),
                precision="fast", combine_state=True, state_dtype=sd,
            ),
            static_argnames=(),
        )
        t = timeit(fwd, xp, aux)
        print(f"fused fwd + state emit[{name}]: {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
