"""Fused-path quality measurement under the real eval protocol.

Runs the fused (Pallas fast-inference) validate and the exact (XLA fp32)
validate on the tiny synthetic val set with released reference weights
(the same protocol as tools/compare_parity.py / PARITY.md; reference
harness: validate.py:54-114) and reports the per-variant PSNR delta.

Exact-path numbers are cached in --cache (they never change); fused runs
re-execute every time so numerics work can iterate quickly.

    python tools/fused_quality.py --iso 3200 --variants recurrent-convunet+feat
    python tools/fused_quality.py          # full matrix, both ISOs
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# variants with a fused fast path (model_patch_depth=2, released configs)
VARIANTS = {
    "recurrent-convunet": dict(net="convunet-mode=fixedfeatures", feat=False, fd=0),
    "recurrent-convunet+feat": dict(net="convunet-mode=fixedfeatures+feat", feat=True, fd=0),
    "recurrent-convunet+feat-future": dict(net="convunet-mode=fixedfeatures+feat", feat=True, fd=1),
    "recurrent-ConvNeXtUnet+feat-future": dict(net="newunet-mode=feat", feat=True, fd=1),
}


def build_opt(variant: str, iso: int, dataroot: str, workdir: str, net_impl: str,
              fused_precision: str = "fast", warp_impl: str = "auto",
              exact_glue: bool = False, online_flow: bool = False,
              flow_preset: str = "default"):
    from rvdd_tpu.config import Options

    v = VARIANTS[variant]
    opt = Options(
        online_flow=online_flow,
        flow_preset=flow_preset,
        fused_precision=fused_precision,
        netDenoiser=v["net"],
        feature_rec=v["feat"],
        future_patch_depth=v["fd"],
        patch_depth=5,  # recurrent at test time (carries state)
        val_dataroot=dataroot,
        val_videos="000",
        gtFolder=f"gt_iso{iso}",
        nFolder=f"noisy_iso{iso}",
        gt_linear_RGB_Folder=f"gt_raw_linear_RGB_iso{iso}",
        checkpoints_dir=os.path.join(workdir, net_impl),
        suffix=f"fq-{variant}-{iso}",
        path2epoch=f"/root/reference/trained-nets/{variant}-iso{iso}",
        net_impl=net_impl,
        warp_impl=warp_impl,
        exact_precision=(net_impl == "xla" or exact_glue),
    )
    opt.isTrain = False
    return opt.finalize()


def force_interpret():
    """Route every pallas_call through the interpreter (CPU evidence path:
    bit-identical kernel semantics incl. bf16 rounding, no TPU needed).
    One patch on the shared jax.experimental.pallas module covers every
    kernel module — they all hold the same `pl` object."""
    import jax.experimental.pallas as pl_mod

    orig = pl_mod.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    pl_mod.pallas_call = patched


def run_one(opt):
    import jax

    from rvdd_tpu.models import build_network
    from rvdd_tpu.models.factory import init_network
    from rvdd_tpu.training.checkpoints import load_checkpoint
    from rvdd_tpu.training.loop import build_validation, compute_validation

    jax.config.update(
        "jax_default_matmul_precision",
        "highest" if opt.exact_precision else "default",
    )
    cfg = opt.engine_config()
    val_ds = build_validation(opt)
    net = build_network(
        opt.netDenoiser, cfg.network_input_nc, opt.output_nc, cfg.feature_rec
    )
    example = (1, 128, 128, cfg.network_input_nc)
    params = init_network(net, jax.random.PRNGKey(0), example, None)
    params, _ = load_checkpoint(
        opt.path2epoch, None, params, net=net, example_shape=example
    )
    t0 = time.time()
    losses = compute_validation(opt, net, params, val_ds, None, save_visuals=False)
    return losses["PSNR_valLoss"], time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--iso", default="3200,12800")
    ap.add_argument("--dataroot", default="/tmp/tiny_synth_iso{iso}/validation")
    ap.add_argument("--workdir", default="/tmp/fused_quality")
    ap.add_argument("--cache", default="/tmp/fused_quality/exact_cache.json")
    ap.add_argument("--out", default="/tmp/fused_quality/results.json")
    ap.add_argument("--fused_precision", default="fast",
                    help="FUSED_PRECISIONS key or 'hybrid:<chain>+...' "
                    "(per-chain mixed/fast blend, fast_unet.py)")
    ap.add_argument("--exact_glue", action="store_true",
                    help="run the fused pipeline's XLA glue (demosaic, flow "
                    "upsample, middle) at HIGHEST matmul precision — "
                    "attribution knob for TPU DEFAULT-precision fp32 convs")
    ap.add_argument("--warp_impl", default="auto",
                    choices=["auto", "xla", "pallas"],
                    help="fused-path state-warp engine (xla = quality "
                    "attribution: isolates the Pallas warp kernel)")
    ap.add_argument("--online_flow", action="store_true",
                    help="fused run computes TV-L1 on device inside the "
                    "step instead of reading cached flows (the exact "
                    "baseline keeps cached flows, so the delta isolates "
                    "the online/preset flow quality)")
    ap.add_argument("--flow_preset", default="default",
                    choices=["default", "fast"],
                    help="--online_flow solver preset (fast = 2 warps, "
                    "<=75 iters — bench.py --fast_flow)")
    ap.add_argument("--interpret", action="store_true",
                    help="run Pallas kernels in interpret mode (CPU)")
    ap.add_argument("--emulate_bf16", action="store_true",
                    help="with --interpret: model the real MXU's DEFAULT-"
                    "precision bf16 operand rounding in the conv-chain "
                    "kernel's dots (the interpreter otherwise computes fp32 "
                    "dots exactly, understating the fast preset's error; "
                    "ConvNeXt kernel dots are not emulated — its measured "
                    "bf16 cost is -0.002 dB)")
    args = ap.parse_args()
    if args.interpret:
        force_interpret()
    if args.emulate_bf16:
        import rvdd_tpu.ops.pallas.conv_pallas as cp

        cp._EMULATE_BF16_DOT = True

    os.makedirs(args.workdir, exist_ok=True)
    cache = {}
    if os.path.exists(args.cache):
        cache = json.load(open(args.cache))

    results = {}
    for variant in args.variants.split(","):
        for iso in (int(i) for i in args.iso.split(",")):
            key = f"{variant}-iso{iso}"
            dataroot = args.dataroot.format(iso=iso)
            if key not in cache:
                opt = build_opt(variant, iso, dataroot, args.workdir, "xla")
                psnr, dt = run_one(opt)
                cache[key] = psnr
                json.dump(cache, open(args.cache, "w"), indent=2)
                print(f"[exact] {key}: {psnr:.4f} dB  ({dt:.0f}s)")
            exact = cache[key]
            opt = build_opt(
                variant, iso, dataroot, args.workdir, "fused",
                args.fused_precision, args.warp_impl, args.exact_glue,
                args.online_flow, args.flow_preset,
            )
            fused, dt = run_one(opt)
            delta = fused - exact
            results[key] = dict(exact=exact, fused=fused, delta=delta)
            flag = "OK " if abs(delta) <= 0.05 else "FAIL"
            print(
                f"[{flag}] {key}: exact {exact:.4f}  fused {fused:.4f}  "
                f"delta {delta:+.4f} dB  ({dt:.0f}s)"
            )
    json.dump(results, open(args.out, "w"), indent=2)
    worst = min((r["delta"] for r in results.values()), default=0.0)
    print(f"worst delta: {worst:+.4f} dB over {len(results)} cells")


if __name__ == "__main__":
    main()
