"""Train-step cost attribution on the real TPU.

The --train bench measured 0.03 samples/s (67 s/step) for the production
convunet+feat config; this times the pieces: full grad step vs no-warp
grad step (isolates the XLA warp's forward+backward), forward-only vs
forward-no-warp (isolates the warp forward), at production patch sizes.

    python tools/train_attrib.py [--patch 136] [--batch 2] [--unroll 4]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--patch", type=int, default=136)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--unroll", type=int, default=4)
    ap.add_argument("--feat", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rvdd_tpu.config import setup_compilation_cache
    from rvdd_tpu.models import build_network
    from rvdd_tpu.models.factory import init_network
    from rvdd_tpu.precision import use_exact_precision
    from rvdd_tpu.recurrent.engine import (
        EngineConfig, compute_losses, prepare_frames, unrolled_forward,
    )

    setup_compilation_cache("~/.cache/rvdd_tpu/xla")
    use_exact_precision()

    td = args.unroll
    pw = args.patch
    B = args.batch
    base = EngineConfig(
        model_patch_depth=2, patch_depth=td + 1, future_patch_depth=0,
        feature_rec=True, warp_impl="xla", net_impl="xla",
    )
    net = build_network(
        "convunet-mode=fixedfeatures+feat", base.network_input_nc, 3, True
    )
    params = init_network(
        net, jax.random.PRNGKey(0), (1, 128, 128, base.network_input_nc)
    )
    rng = np.random.default_rng(0)
    t_frames = base.patch_depth
    frames = jnp.asarray(
        rng.uniform(-1, 1, (B, t_frames, pw, pw, 4)).astype(np.float32))
    flows = jnp.asarray(
        rng.uniform(-1, 1, (B, td, base.d, pw, pw, 2)).astype(np.float32))
    gt = jnp.asarray(
        rng.uniform(-1, 1, (B, t_frames, 2 * pw, 2 * pw, 3)).astype(np.float32))
    weights = jnp.full((td,), 1.0 / td, jnp.float32)

    def loss_fn(cfg, p):
        fr, fl = prepare_frames(cfg, frames, flows)
        nil = net.nil_features(B, fr.shape[2], fr.shape[3], fr.dtype)
        outs = unrolled_forward(cfg, net, p, fr, fl, td, nil)
        return compute_losses(cfg, outs, gt, weights)["Denoiser"]

    def timeit(fn, label):
        t0 = time.perf_counter()
        v = fn(params)
        v = jax.tree_util.tree_leaves(v)[0]
        float(jnp.sum(v))  # compile + barrier
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            v = fn(params)
        v = jax.tree_util.tree_leaves(v)[0]
        float(jnp.sum(v))
        dt = (time.perf_counter() - t0) / 3
        print(f"{label:<42s} {dt*1e3:9.1f} ms   (compile {tc:.0f} s)",
              flush=True)
        return dt

    for label, cfg in [
        ("cfg shift-warp", dataclasses.replace(base, warp_impl="shift")),
        ("cfg no_warp", dataclasses.replace(base, no_warp=True)),
        ("cfg xla-warp", base),
    ]:
        fwd = jax.jit(lambda p, c=cfg: loss_fn(c, p))
        timeit(fwd, f"forward        {label}")
        g = jax.jit(jax.grad(lambda p, c=cfg: loss_fn(c, p)))
        timeit(g, f"forward+grad   {label}")


if __name__ == "__main__":
    main()
