"""MFU / roofline accounting for BENCH.md.

Counts the algorithmic FLOPs of one 1080p inference step (or one training
step) per variant from XLA's own HLO cost analysis of the *exact* graph
(net_impl='xla'), then combines them with the measured fps from BENCH.md to
report achieved TFLOP/s and %-of-peak.  The FLOPs of the algorithm are
implementation-independent, so the same count prices the fused Pallas path
(its extra lane padding / dual-writes are overhead, not useful work — MFU
convention).

    python tools/mfu.py                    # all inference variants
    python tools/mfu.py --train            # training step FLOPs
    python tools/mfu.py --with_flow        # include the TV-L1 solver

Reference harness being beaten: /root/reference/validate.py:54-114 (the
reference publishes no fps/MFU numbers at all — SURVEY.md §6).

TPU v5e (v5 lite) peaks used: 197 TFLOP/s bf16, 98.5 TFLOP/s fp32(fp32
inputs via 3xbf16 ~ 1/6 MXU), HBM 819 GB/s.  The binding-resource notes
also use the MXU contraction geometry: with 48-channel convs the
contracting dim fills 48/128 sublanes, capping channel-dot utilization.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# FLOPs counting happens on the CPU backend: HLO cost analysis of the same
# graph is identical, and 1080p buffers never have to fit on the chip.
# (The axon sitecustomize overrides JAX_PLATFORMS after import, so force
# the platform via the config API — see .claude/skills/verify/SKILL.md.)
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK = 197e12
V5E_FP32_PEAK = 98.5e12
V5E_HBM_BPS = 819e9

VARIANTS = {
    "convunet": ("convunet-mode=fixedfeatures", False, 0),
    "convunet+feat": ("convunet-mode=fixedfeatures+feat", True, 0),
    "convunet+feat+future": ("convunet-mode=fixedfeatures+feat", True, 1),
    "convnext+feat+future": ("newunet-mode=feat", True, 1),
}


def _cost(jitted, *args):
    ca = jitted.lower(*args).compile().cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def inference_cost(model: str, h: int, w: int, with_flow: bool):
    from rvdd_tpu.models import build_network
    from rvdd_tpu.models.factory import init_network
    from rvdd_tpu.recurrent.engine import (
        EngineConfig, compute_window_flows, inference_step, prepare_frames,
    )

    arch, feat, fd = VARIANTS[model]
    cfg = EngineConfig(
        model_patch_depth=2, patch_depth=2 + fd, future_patch_depth=fd,
        feature_rec=feat, warp_impl="xla", net_impl="xla",
    )
    net = build_network(arch, cfg.network_input_nc, 3, feat)
    params = init_network(
        net, jax.random.PRNGKey(0), (1, 128, 128, cfg.network_input_nc)
    )
    win = cfg.d + 1 + fd

    def step_fn(params, state, raw_window, flows):
        if with_flow:
            from rvdd_tpu.ops.tvl1 import TVL1Params

            flows = compute_window_flows(
                cfg, raw_window, TVL1Params(nwarps=2, max_iterations=75)
            )[:, None]
        frames, flows2 = prepare_frames(cfg, raw_window, flows)
        nil = net.nil_features(1, 2 * h, 2 * w) if feat else None
        return inference_step(cfg, net, params, state, frames, flows2[:, 0], nil)

    raw = jnp.zeros((1, win, h, w, 4), jnp.float32)
    flows = jnp.zeros((1, 1, cfg.d + fd, h, w, 2), jnp.float32)

    # bootstrap a state pytree with a cheap call at tiny size
    from rvdd_tpu.recurrent.engine import init_state

    frames0, _ = prepare_frames(cfg, raw, flows)
    nil0 = net.nil_features(1, 2 * h, 2 * w) if feat else None
    state = init_state(cfg, frames0, nil0)

    # net-only cost for the attribution column
    x = jnp.zeros((1, 2 * h, 2 * w, cfg.network_input_nc), jnp.float32)
    if feat:
        f0 = net.nil_features(1, 2 * h, 2 * w)
        net_fl, net_by = _cost(
            jax.jit(lambda p, a, b: net.apply({"params": p}, a, b)), params, x, f0
        )
    else:
        net_fl, net_by = _cost(
            jax.jit(lambda p, a: net.apply({"params": p}, a)), params, x
        )

    tot_fl, tot_by = _cost(jax.jit(step_fn), params, state, raw, flows)
    return tot_fl, tot_by, net_fl


def train_cost(model: str, pw: int, td: int, batch: int):
    from rvdd_tpu.models import build_network
    from rvdd_tpu.models.factory import init_network
    from rvdd_tpu.recurrent.engine import EngineConfig
    from rvdd_tpu.training.train_state import (
        create_train_state, make_train_step, set_learning_rate,
    )

    arch, feat, fd = VARIANTS[model]
    cfg = EngineConfig(
        model_patch_depth=2, patch_depth=td + 1, future_patch_depth=fd,
        feature_rec=feat, warp_impl="xla", net_impl="xla",
    )
    net = build_network(arch, cfg.network_input_nc, 3, feat)
    params = init_network(
        net, jax.random.PRNGKey(0), (1, 2 * 64, 2 * 64, cfg.network_input_nc)
    )
    state, tx = create_train_state(params)
    state = set_learning_rate(state, 1e-4)
    train_step = make_train_step(cfg, net, tx)
    t_frames = cfg.patch_depth + fd
    frames = jnp.zeros((batch, t_frames, pw, pw, 4), jnp.float32)
    flows = jnp.zeros((batch, td, cfg.d + fd, pw, pw, 2), jnp.float32)
    gt = jnp.zeros((batch, t_frames, 2 * pw, 2 * pw, 3), jnp.float32)
    weights = jnp.full((td,), 1.0 / td, jnp.float32)
    fl, by = _cost(jax.jit(train_step), state, frames, flows, gt, weights)
    return fl, by


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, help="one variant (default: all)")
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--with_flow", action="store_true")
    ap.add_argument("--train_patch", type=int, default=136)
    ap.add_argument("--train_unrollings", type=int, default=4)
    ap.add_argument("--batch_size", type=int, default=2)
    args = ap.parse_args()

    models = [args.model] if args.model else list(VARIANTS)
    out = {}
    for m in models:
        if args.train:
            fl, by = train_cost(m, args.train_patch, args.train_unrollings, args.batch_size)
            out[m] = {"train_flops_per_batch": fl, "bytes": by,
                      "flops_per_sample": fl / args.batch_size}
            print(f"{m}: train {fl/1e9:.1f} GFLOP/batch  "
                  f"({fl/args.batch_size/1e9:.1f} GFLOP/sample), "
                  f"{by/1e9:.2f} GB accessed (HLO estimate)")
        else:
            fl, by, net_fl = inference_cost(m, args.height, args.width, args.with_flow)
            out[m] = {"flops_per_frame": fl, "bytes": by, "net_flops": net_fl}
            print(f"{m}: {fl/1e9:.1f} GFLOP/frame (net {net_fl/1e9:.1f}, "
                  f"other {(fl-net_fl)/1e9:.1f}), {by/1e9:.2f} GB accessed")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
