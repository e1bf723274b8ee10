"""Run the REFERENCE train.py on a dataset for convergence-parity comparison.

Executes /root/reference's full training loop (torch CPU) on the given
tiny dataset with a reduced protocol, so TRAINING.md can compare its
val-PSNR trajectory against `rvdd_tpu.cli.train` run with the identical
configuration.  Reference code is executed in place, not copied
(train loop: /root/reference/train.py:67-130; unroll schedule:
/root/reference/models/recurrent_model.py:352-466).

    python tools/run_reference_train.py --dataroot /tmp/convtrain/train \
        --val_dataroot /tmp/convtrain/validation --iso 3200 \
        --out /tmp/reftrain -- --niter 14 --niter_decay 6 \
        --unroll_focus gradual04_from05 --batch_size 4 --patch_width 32
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_reference_validate import REF, VARIANTS, build_bridge, stub_modules


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--val_dataroot", required=True)
    ap.add_argument("--variant", default="recurrent-convunet+feat")
    ap.add_argument("--filters", type=int, default=0,
                    help="override net width via the arch string (0 = keep)")
    ap.add_argument("--iso", type=int, default=3200)
    ap.add_argument("--out", default="/tmp/reftrain")
    ap.add_argument("--val_videos", default="000,001")
    ap.add_argument("rest", nargs=argparse.REMAINDER,
                    help="extra train.py flags after --")
    a = ap.parse_args()

    stub_modules()
    work = pathlib.Path(a.out)
    work.mkdir(parents=True, exist_ok=True)
    build_bridge(work)
    os.chdir(work)  # so ./build/libBridge.so resolves
    sys.path.insert(0, str(REF))

    net = VARIANTS[a.variant]["net"]
    if a.filters:
        net = f"{net}-filters={a.filters}"
    rest = [x for x in a.rest if x != "--"]
    sys.argv = (
        ["train.py"]
        + ["--gpu_ids", "-1"]
        + ["--netDenoiser", net]
        + VARIANTS[a.variant]["args"]
        + ["--dataroot", a.dataroot]
        + ["--val_dataroot", a.val_dataroot]
        + ["--gtFolder", f"gt_iso{a.iso}"]
        + ["--nFolder", f"noisy_iso{a.iso}"]
        + ["--gt_linear_RGB_Folder", f"gt_raw_linear_RGB_iso{a.iso}"]
        + ["--val_videos", a.val_videos]
        + ["--checkpoints_dir", str(work / "checkpoints")]
        + ["--suffix", "convergence"]
        + ["--num_threads", "0"]  # single-core host: no worker processes
        + rest
    )

    import runpy

    runpy.run_path(str(REF / "train.py"), run_name="__main__")


if __name__ == "__main__":
    main()
