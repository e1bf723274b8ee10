"""Headline benchmark: 1080p recurrent denoise+demosaic throughput per chip.

Protocol (BASELINE.md north star): recurrent convunet+feat streaming
inference — Hamilton-Adams pre-demosaic, flow-guided bicubic warp of the
previous output and feature map, U-Net forward — on 1080p output frames
(packed GBRG raw input 540x960x4 -> RGB 1080x1920x3), flows precomputed
(the reference precomputes them offline too).  Prints one JSON line.

    python bench.py [--model convunet+feat] [--frames 30] [--exact]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="convunet+feat",
                    choices=["convunet", "convunet+feat", "convunet+feat+future",
                             "convnext+feat+future"])
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--streams", type=int, default=1,
                    help="batched independent video streams (throughput mode)")
    ap.add_argument("--scan", action="store_true",
                    help="whole-clip lax.scan jit (no per-frame host sync)")
    ap.add_argument("--with_flow", action="store_true",
                    help="self-contained mode: compute TV-L1 on device inside the step")
    ap.add_argument("--fast_flow", action="store_true",
                    help="with --with_flow: fast solver preset (2 warps, 75 iters)")
    ap.add_argument("--height", type=int, default=540)   # raw half-res
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--exact", action="store_true",
                    help="fp32-exact XLA convs (the validate-CLI parity "
                    "configuration); the warp stays the production Pallas "
                    "kernel, matching the protocol the 20-cell parity "
                    "matrix was measured with")
    ap.add_argument("--train", action="store_true",
                    help="benchmark the jitted train step instead of "
                    "inference (production defaults: 4 unrollings, "
                    "136px raw patches, fp32-exact convs, shift warp)")
    ap.add_argument("--batch_size", type=int, default=2,
                    help="--train mode batch size (Options default 2)")
    ap.add_argument("--train_patch", type=int, default=136,
                    help="--train mode raw patch width (Options default)")
    ap.add_argument("--train_unrollings", type=int, default=4,
                    help="--train mode unrollings (patch_depth 5 default)")
    ap.add_argument("--train_precision", default="highest",
                    choices=["highest", "high", "default"],
                    help="--train matmul precision (highest = fp32-exact; "
                    "high = 3-pass bf16, the reference's TF32 class)")
    ap.add_argument("--train_radius", type=int, default=8,
                    help="--train shift-warp residual radius")
    ap.add_argument("--train_remat", action="store_true",
                    help="--train: per-unrolling rematerialization (exact "
                    "grads, O(net) activation memory — required for "
                    "batch >= 8 on a 16 GB chip; always on for convnext)")
    ap.add_argument("--trace_dir", default=None,
                    help="capture a 5-step jax.profiler device trace here")
    ap.add_argument("--dw_impl", default=None, choices=["mxu", "mxu2", "vpu"],
                    help="override the ConvNeXt fused-chain depthwise "
                    "engine (fast_convnext.DW_KNOBS) for A/B benching")
    ap.add_argument("--dw_group", type=int, default=None,
                    help="override the dw channel-group width")
    ap.add_argument("--precision", default="auto",
                    help="fused-path numerics preset (FUSED_PRECISIONS key "
                    "or 'hybrid:<chain>+...' per-chain mixed/fast blend); "
                    "auto = fastest preset within the 0.05 dB parity budget "
                    "for the variant")
    ap.add_argument("--state_dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="recurrence-carry dtype (attribution knob; "
                    "float32 is the production default)")
    ap.add_argument("--no_split", action="store_true",
                    help="attribution knob: drop the selective dec2 "
                    "weight-split from the 'fast' preset (costs ~0.06 dB)")
    args = ap.parse_args()
    if args.dw_impl or args.dw_group:
        from rvdd_tpu.models import fast_convnext

        if args.dw_impl:
            fast_convnext.DW_KNOBS["dw_impl"] = args.dw_impl
        if args.dw_group:
            fast_convnext.DW_KNOBS["dw_group"] = args.dw_group

    # Fail fast if the TPU relay is unreachable: the axon backend init
    # otherwise blocks FOREVER on the first array op (no timeout inside
    # PJRT), which reads as a hung benchmark rather than a down device.
    # Probe in a subprocess so the block is boundable.
    import subprocess
    import sys

    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices(); print('ok')"],
            capture_output=True, text=True, timeout=150,
        )
        ok = "ok" in probe.stdout
    except subprocess.TimeoutExpired:
        ok = False
    if not ok:
        print(
            json.dumps({
                "metric": f"1080p_fps_per_chip_{args.model.replace('+', '_')}",
                "value": 0.0,
                "unit": "frames/sec", "vs_baseline": 0.0,
                "error": "TPU backend unreachable (axon init probe failed "
                         "within 150s); no measurement taken",
            })
        )
        raise SystemExit(1)

    import jax
    import jax.numpy as jnp

    from rvdd_tpu.config import setup_compilation_cache

    setup_compilation_cache("~/.cache/rvdd_tpu/xla")

    # fp32 XLA-net modes: --exact, and the flagship's 'accurate' preset —
    # fp32 fused bands cannot tile the 5-block 7x7 dec2 chain at 1080p
    # (the [H*48, WL] f32 scratch exceeds VMEM for every feasible row
    # tile; fast_convnext.py:340-345), so the flagship's accurate path IS
    # the fp32 XLA net, numerically identical to --exact.
    xla_net = args.exact or (
        args.precision == "accurate" and args.model.startswith("convnext")
    )
    if xla_net:
        from rvdd_tpu.precision import use_exact_precision

        use_exact_precision()

    from rvdd_tpu.models import build_network
    from rvdd_tpu.models.factory import init_network
    from rvdd_tpu.recurrent.engine import (
        EngineConfig,
        compute_window_flows,
        inference_step,
        prepare_frames,
    )

    fd = 1 if "future" in args.model else 0
    feat = "feat" in args.model
    arch = {
        "convunet": "convunet-mode=fixedfeatures",
        "convunet+feat": "convunet-mode=fixedfeatures+feat",
        "convunet+feat+future": "convunet-mode=fixedfeatures+feat",
        "convnext+feat+future": "newunet-mode=feat",
    }[args.model]
    from rvdd_tpu.models.fast_unet import FUSED_PRECISIONS, resolve_fused_precision

    precision = resolve_fused_precision(
        args.precision, arch=arch, feature_rec=feat, future=fd > 0
    )
    if args.no_split:
        FUSED_PRECISIONS["fast"] = dict(
            FUSED_PRECISIONS["fast"], weight_dtype=None)
    cfg = EngineConfig(
        model_patch_depth=2, patch_depth=2 + fd, future_patch_depth=fd,
        # Pallas warp in every inference mode, including --exact: the
        # validate CLI resolves warp_impl to 'pallas' on TPU
        # (config.resolve_warp_impl), so the 20-cell parity matrix was
        # measured with it — the XLA per-pixel-gather warp (~2 s per
        # 48-ch 1080p warp) is not any protocol's configuration
        feature_rec=feat, warp_impl="pallas",
        # fp32 recurrence carry is the production default (Options.state_dtype
        # and the PARITY/BENCH quality rows are measured with it); the bench
        # must run the same numerics it pairs fps with
        state_dtype=args.state_dtype,
        net_impl="xla" if xla_net else "fused",
        fused_precision=precision,
    )
    if args.train:
        # production training config: XLA net (the fused kernels are
        # inference-only), shift warp (what loop.py resolves to on TPU —
        # the XLA warp's scatter backward measures 67 s/step), fp32-exact
        # convs (Options.exact_precision default)
        from rvdd_tpu.precision import use_exact_precision
        from rvdd_tpu.training.train_state import (
            create_train_state, make_train_step, set_learning_rate,
        )

        if args.train_precision == "highest":
            use_exact_precision()
        else:
            jax.config.update(
                "jax_default_matmul_precision", args.train_precision
            )
        td = args.train_unrollings
        pw = args.train_patch
        train_warp = "shift" if jax.default_backend() != "cpu" else "xla"
        cfg_t = EngineConfig(
            model_patch_depth=2, patch_depth=td + 1, future_patch_depth=fd,
            feature_rec=feat, warp_impl=train_warp, net_impl="xla",
            shift_warp_radius=args.train_radius,
            # the flagship's 4-unrolling backward OOMs 16 GB HBM without
            # per-unrolling rematerialization (exact grads either way)
            remat=args.train_remat or args.model.startswith("convnext"),
        )
        net_t = build_network(arch, cfg_t.network_input_nc, 3, feat)
        params_t = init_network(
            net_t, jax.random.PRNGKey(0), (1, 2 * 64, 2 * 64, cfg_t.network_input_nc)
        )
        state, tx = create_train_state(params_t)
        state = set_learning_rate(state, 1e-4)
        train_step = make_train_step(cfg_t, net_t, tx)
        B = args.batch_size
        t_frames = cfg_t.patch_depth + fd
        rng = np.random.default_rng(0)
        frames = jnp.asarray(
            rng.uniform(-1, 1, (B, t_frames, pw, pw, 4)).astype(np.float32))
        flows = jnp.asarray(
            rng.uniform(-1, 1, (B, td, cfg_t.d + fd, pw, pw, 2)).astype(np.float32))
        gt = jnp.asarray(
            rng.uniform(-1, 1, (B, t_frames, 2 * pw, 2 * pw, 3)).astype(np.float32))
        weights = jnp.full((td,), 1.0 / td, jnp.float32)

        # a data fetch is the only reliable completion barrier on this
        # relay (block_until_ready returns at dispatch, ~10x optimistic)
        fetch = lambda ls: float(jax.tree_util.tree_leaves(ls)[0])
        state, losses = train_step(state, frames, flows, gt, weights)  # compile
        fetch(losses)
        state, losses = train_step(state, frames, flows, gt, weights)  # warm
        fetch(losses)
        t0 = time.perf_counter()
        for _ in range(args.frames):
            state, losses = train_step(state, frames, flows, gt, weights)
        fetch(losses)
        dt = time.perf_counter() - t0
        sps = args.frames * B / dt
        print(
            json.dumps({
                "metric": "train_samples_per_sec_"
                + args.model.replace("+", "_"),
                "value": round(sps, 2),
                "unit": "samples/sec",
                "vs_baseline": 0.0,
            })
        )
        return

    net_dtype = None if xla_net else jnp.bfloat16
    kw = {}
    if "newunet" in arch and not xla_net:
        kw["fast_act"] = True
    net = build_network(arch, cfg.network_input_nc, 3, feat, dtype=net_dtype, **kw)
    h, w = args.height, args.width
    params = init_network(net, jax.random.PRNGKey(0), (1, 2 * 64, 2 * 64, cfg.network_input_nc))

    win = cfg.d + 1 + fd

    flow_params = None
    if args.with_flow:
        from rvdd_tpu.ops.tvl1 import TVL1Params

        flow_params = (
            TVL1Params(nwarps=2, max_iterations=75) if args.fast_flow else TVL1Params()
        )

    def step_fn(params, state, raw_window, flows):
        if args.with_flow:
            flows = compute_window_flows(cfg, raw_window, flow_params)[:, None]
        frames, flows2 = prepare_frames(cfg, raw_window, flows)
        nil = net.nil_features(raw_window.shape[0], 2 * h, 2 * w) if feat else None
        return inference_step(cfg, net, params, state, frames, flows2[:, 0], nil)

    step = jax.jit(step_fn, donate_argnums=(1,))

    rng = np.random.default_rng(0)
    B = args.streams
    raw_window = jnp.asarray(rng.uniform(-1, 1, (B, win, h, w, 4)).astype(np.float32))
    # smooth, TV-L1-like flow field (what the solver actually produces)
    from scipy.ndimage import gaussian_filter

    fl = np.stack(
        [
            gaussian_filter(rng.standard_normal((h, w)), 40) * 25 + 2,
            gaussian_filter(rng.standard_normal((h, w)), 40) * 25 - 1,
        ],
        -1,
    ).astype(np.float32)
    flows = jnp.asarray(np.broadcast_to(fl, (B, 1, cfg.d + fd, h, w, 2)).copy())

    if args.scan:
        from rvdd_tpu.recurrent.engine import scan_video

        t_frames = args.frames

        @jax.jit
        def scan_fn(params, raw_clip, clip_flows):
            frames, flows2 = prepare_frames(cfg, raw_clip, clip_flows)
            frames_t = jnp.swapaxes(frames, 0, 1)
            flows_t = jnp.swapaxes(flows2, 0, 1)
            nil = net.nil_features(B, 2 * h, 2 * w) if feat else None
            return scan_video(cfg, net, params, frames_t, flows_t, nil)

        raw_clip = jnp.asarray(
            rng.uniform(-1, 1, (B, t_frames, h, w, 4)).astype(np.float32)
        )
        clip_flows = jnp.asarray(
            np.broadcast_to(fl, (B, t_frames, cfg.d + fd, h, w, 2)).copy()
        )
        dens = scan_fn(params, raw_clip, clip_flows)
        float(jnp.sum(dens))  # warmup + completion barrier
        t0 = time.perf_counter()
        dens = scan_fn(params, raw_clip, clip_flows)
        float(jnp.sum(dens))
        dt = time.perf_counter() - t0
        fps = t_frames * args.streams / dt
        print(
            json.dumps(
                {
                    "metric": f"1080p_fps_per_chip_{args.model.replace('+', '_')}_scan"
                    + ("" if args.streams == 1 else f"_x{args.streams}streams")
                    + ("" if precision == "fast" else f"_{precision}"),
                    "value": round(fps, 2),
                    "unit": "frames/sec",
                    "vs_baseline": round(fps / 30.0, 3),
                }
            )
        )
        return

    # init state from a first call with state=None
    first = jax.jit(lambda p, r, f: step_fn(p, None, r, f))
    den, state = first(params, raw_window, flows)
    float(jnp.sum(den))

    # warmup the steady-state specialization
    den, state = step(params, state, raw_window, flows)
    float(jnp.sum(den))

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            for _ in range(5):
                den, state = step(params, state, raw_window, flows)
            float(jnp.sum(den))

    t0 = time.perf_counter()
    for _ in range(args.frames):
        den, state = step(params, state, raw_window, flows)
    # a data fetch is the only reliable completion barrier on this relay
    float(jnp.sum(den))
    dt = time.perf_counter() - t0
    fps = args.frames * args.streams / dt

    print(
        json.dumps(
            {
                "metric": f"1080p_fps_per_chip_{args.model.replace('+', '_')}"
                + ("" if args.streams == 1 else f"_x{args.streams}streams")
                + ("_online_flow" if args.with_flow else "")
                + ("_exact" if args.exact else
                   "" if precision == "fast" else f"_{precision}"),
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
