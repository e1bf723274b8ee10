"""Per-component timing of the FUSED 1080p inference step (real TPU).

Decomposes the headline bench path (bench.py, net_impl=fused) into:
demosaic, flow x2 upsample, planar warp (state 56ch / future 8ch), the
fused net forward, and the full step - so fps work targets the measured
bottleneck.

    python tools/fused_step_profile.py [--model convunet+feat] [--precision fast]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def _fetch(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0].ravel()[:8].astype(jnp.float32)))


from _timing import chained_timeit as timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="convunet+feat")
    ap.add_argument("--precision", default="fast",
                    choices=["fast", "mixed", "accurate"])
    args = ap.parse_args()

    from scipy.ndimage import gaussian_filter

    from rvdd_tpu.models import build_network
    from rvdd_tpu.models.factory import init_network
    from rvdd_tpu.ops.demosaic import hamilton_adams
    from rvdd_tpu.ops.warp import flow_upsample_2x
    from rvdd_tpu.ops.pallas.warp_rowmajor import warp_planar_pallas
    from rvdd_tpu.models.fast_unet import FUSED_PRECISIONS
    from rvdd_tpu.recurrent.engine import (
        EngineConfig, inference_step, prepare_frames, fused_pack,
    )

    h, w = 540, 960
    H, W = 2 * h, 2 * w
    wl = 2048
    rng = np.random.default_rng(0)
    feat = "feat" in args.model
    fd = 1 if "future" in args.model else 0
    arch = {
        "convunet": "convunet-mode=fixedfeatures",
        "convunet+feat": "convunet-mode=fixedfeatures+feat",
        "convnext+feat+future": "newunet-mode=feat",
    }[args.model]
    cfg = EngineConfig(
        model_patch_depth=2, patch_depth=2 + fd, future_patch_depth=fd,
        feature_rec=feat, warp_impl="pallas", state_dtype="float32",
        net_impl="fused", fused_precision=args.precision,
    )
    kw = {"fast_act": args.precision == "fast"} if "newunet" in arch else {}
    net = build_network(arch, cfg.network_input_nc, 3, feat,
                        dtype=jnp.bfloat16, **kw)
    params = init_network(net, jax.random.PRNGKey(0),
                          (1, 128, 128, cfg.network_input_nc))
    bd = FUSED_PRECISIONS[args.precision]["band_dtype"]

    raw = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 4)).astype(np.float32))
    fl = np.stack(
        [gaussian_filter(rng.standard_normal((H, W)), 40) * 25 + 2,
         gaussian_filter(rng.standard_normal((H, W)), 40) * 25 - 1],
        -1,
    ).astype(np.float32)
    flow = jnp.asarray(fl)
    flow_half = jnp.asarray(fl[::2, ::2] / 2)[None]

    cf = 8 + (48 if feat else 0)
    state_p = jnp.asarray(
        rng.uniform(-1, 1, (H * cf, wl)).astype(np.float32)
    ).astype(bd)

    t = timeit(jax.jit(hamilton_adams), raw)
    print(f"hamilton_adams 540x960->1080p        {1e3*t:7.2f} ms")
    t = timeit(jax.jit(flow_upsample_2x), flow_half)
    print(f"flow_upsample_2x                     {1e3*t:7.2f} ms")
    wfn = jax.jit(lambda x, f: warp_planar_pallas(x, f, h_img=H, w_img=W,
                                                  out_dtype=bd))
    t = timeit(wfn, state_p, flow)
    print(f"planar warp {cf}ch 1080p ({args.precision})   {1e3*t:7.2f} ms")

    if "newunet" in arch:
        from rvdd_tpu.models.fast_convnext import (
            fast_forward_planar_cnx as fwd, pack_fast_cnx as packf)
    else:
        from rvdd_tpu.models.fast_unet import (
            fast_forward_planar as fwd, pack_fast_params as packf)
    packed = packf(params, feat, cfg.network_input_nc)
    in_pad = -(-cfg.network_input_nc // 8) * 8
    xp = jnp.asarray(
        rng.uniform(-1, 1, (H * in_pad, wl)).astype(np.float32)
    ).astype(bd)
    aux = state_p if feat else None
    net_fn = jax.jit(lambda xp, aux: fwd(
        net, packed, xp, aux, H, W,
        aux_channels=(8, 48) if feat else None, precision=args.precision))
    t = timeit(net_fn, xp, aux)
    print(f"fused net forward ({args.model})    {1e3*t:7.2f} ms")

    win = cfg.d + 1 + fd
    raw_window = jnp.asarray(
        rng.uniform(-1, 1, (1, win, h, w, 4)).astype(np.float32))
    flows = jnp.asarray(
        np.broadcast_to(fl[::2, ::2] / 2, (1, 1, cfg.d + fd, h, w, 2)).copy())
    packed2 = fused_pack(cfg, net, params)

    def step_fn(params, state, raw_window, flows):
        frames, flows2 = prepare_frames(cfg, raw_window, flows)
        nil = net.nil_features(1, H, W) if feat else None
        return inference_step(cfg, net, params, state, frames, flows2[:, 0],
                              nil, packed2)

    first = jax.jit(lambda p, r, f: step_fn(p, None, r, f))
    den, state = first(params, raw_window, flows)
    _fetch(den)
    step = jax.jit(step_fn, donate_argnums=(1,))

    def run(state):
        den, state = step(params, state, raw_window, flows)
        return den, state

    den, state = run(state)
    _fetch(den)
    t0 = time.perf_counter()
    for _ in range(20):
        den, state = run(state)
    _fetch(den)
    t = (time.perf_counter() - t0) / 20
    print(f"full fused step ({args.precision})          {1e3*t:7.2f} ms  "
          f"= {1/t:5.1f} fps")


if __name__ == "__main__":
    main()
