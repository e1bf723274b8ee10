"""Validation / inference CLI (reference: validate.py).

Runs serial full-frame inference over the validation videos, carrying the
recurrence across frames, saving ``<frame>_denoised.tif`` visuals and
printing averaged losses.  Loads either framework checkpoints
(``--epoch latest_val`` etc.) or released PyTorch weights directly
(``--path2epoch /root/reference/trained-nets/<variant>``).
"""

from __future__ import annotations

import json
import time
from os.path import join

import jax

from rvdd_tpu.config import parse_options
from rvdd_tpu.models import build_network
from rvdd_tpu.models.factory import init_network
from rvdd_tpu.training.checkpoints import load_checkpoint
from rvdd_tpu.training.loop import (
    build_validation,
    compute_validation,
    compute_validation_scan,
)


def main(argv=None):
    opt = parse_options(argv, train=False)
    opt.isTrain = False
    if opt.exact_precision:
        from rvdd_tpu.precision import use_exact_precision

        use_exact_precision()

    from rvdd_tpu.config import setup_compilation_cache

    setup_compilation_cache(opt.compilation_cache_dir)

    cfg = opt.engine_config()
    val_ds = build_validation(opt)
    print(f"Number of validation images = {len(val_ds)}")

    net = build_network(opt.netDenoiser, cfg.network_input_nc, opt.output_nc, cfg.feature_rec)
    pw = 64 * (1 if opt.no_predemosaic else 2)
    example = (1, pw, pw, cfg.network_input_nc)
    params = init_network(net, jax.random.PRNGKey(0), example, None)
    if opt.path2epoch:
        params, _ = load_checkpoint(opt.path2epoch, None, params, net=net, example_shape=example)
        print(f"loading the model from {opt.path2epoch}")
    else:
        params, _ = load_checkpoint(opt.save_dir, opt.epoch, params, net=net, example_shape=example)
        print(f"loading the model from {opt.save_dir} @ {opt.epoch}")

    val_image_dir = join(opt.save_dir, "val_visuals")
    t0 = time.time()
    if opt.val_scan:
        if opt.val_flow_from_denoised:
            raise NotImplementedError("--val_scan with --val_flow_from_denoised")
        losses = compute_validation_scan(opt, net, params, val_ds, val_image_dir)
    else:
        losses = compute_validation(
            opt, net, params, val_ds, val_image_dir,
            flow_from_denoised=opt.val_flow_from_denoised,
        )
    msg = ", ".join(f"{k}: {v:.3f}" for k, v in losses.items())
    print(f"---> validation: (time: {time.time()-t0:.1f}, #data: {len(val_ds)}) [{msg}]")
    with open(join(opt.save_dir, "val_losses.json"), "w") as f:
        json.dump(losses, f, indent=2)


if __name__ == "__main__":
    main()
