"""End-to-end parity check: our validate CLI vs the reference validate.

Runs both pipelines on the same dataset with the same released weights and
reports the PSNR delta and the per-pixel visual difference.

    python tools/compare_parity.py --dataroot /tmp/tiny_synth/validation \
        --variant recurrent-convunet --iso 3200
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
from os.path import join

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OUR_FLAGS = {
    "non_recurrent-convunet-no_warp": ["--netDenoiser", "convunet-mode=fixedfeatures", "--no_warp", "--patch_depth", "2"],
    "non_recurrent-convunet-no_warp-future": ["--netDenoiser", "convunet-mode=fixedfeatures", "--no_warp", "--patch_depth", "2", "--future_patch_depth", "1"],
    "non_recurrent-convunet": ["--netDenoiser", "convunet-mode=fixedfeatures", "--patch_depth", "2"],
    "non_recurrent-convunet-future": ["--netDenoiser", "convunet-mode=fixedfeatures", "--patch_depth", "2", "--future_patch_depth", "1"],
    "recurrent-convunet": ["--netDenoiser", "convunet-mode=fixedfeatures"],
    "recurrent-convunet-future": ["--netDenoiser", "convunet-mode=fixedfeatures", "--future_patch_depth", "1"],
    "recurrent-convunet+feat": ["--netDenoiser", "convunet-mode=fixedfeatures+feat", "--feature_rec"],
    "recurrent-convunet+feat-future": ["--netDenoiser", "convunet-mode=fixedfeatures+feat", "--feature_rec", "--future_patch_depth", "1"],
    "recurrent-ConvNeXtUnet": ["--netDenoiser", "newunet"],
    "recurrent-ConvNeXtUnet+feat-future": ["--netDenoiser", "newunet-mode=feat", "--feature_rec", "--future_patch_depth", "1"],
}


def run(cmd, log):
    with open(log, "w") as f:
        subprocess.run(cmd, check=True, stdout=f, stderr=subprocess.STDOUT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--variant", default="recurrent-convunet")
    ap.add_argument("--iso", type=int, default=3200)
    ap.add_argument("--videos", default="000")
    ap.add_argument("--workdir", default="/tmp/parity")
    a = ap.parse_args()

    work = join(a.workdir, a.variant)
    os.makedirs(work, exist_ok=True)

    # ours
    run(
        [sys.executable, "-m", "rvdd_tpu.cli.validate"]
        + OUR_FLAGS[a.variant]
        + ["--path2epoch", f"/root/reference/trained-nets/{a.variant}-iso{a.iso}"]
        + ["--val_dataroot", a.dataroot, "--val_videos", a.videos]
        + ["--gtFolder", f"gt_iso{a.iso}", "--nFolder", f"noisy_iso{a.iso}"]
        + ["--gt_linear_RGB_Folder", f"gt_raw_linear_RGB_iso{a.iso}"]
        + ["--checkpoints_dir", join(work, "ours"), "--suffix", "parity"],
        join(work, "ours.log"),
    )
    # reference
    run(
        [sys.executable, join(REPO, "tools", "run_reference_validate.py"),
         "--dataroot", a.dataroot, "--variant", a.variant, "--iso", str(a.iso),
         "--videos", a.videos, "--out", join(work, "ref")],
        join(work, "ref.log"),
    )

    ref_line = open(join(work, "ref.log")).read()
    m = re.search(r"PSNR_valLoss: ([\d.]+)", ref_line)
    ref_psnr = float(m.group(1))
    ours = json.load(
        open(next(
            join(work, "ours", d, "val_losses.json")
            for d in os.listdir(join(work, "ours"))
        ))
    )
    our_psnr = ours["PSNR_valLoss"]

    # per-pixel visual diff
    import imageio.v2 as iio

    our_vis_dir = next(
        join(work, "ours", d, "val_visuals", a.videos.split(",")[0])
        for d in os.listdir(join(work, "ours"))
    )
    ref_vis_dir = next(
        join(work, "ref", "checkpoints", d, "val_visuals", a.videos.split(",")[0])
        for d in os.listdir(join(work, "ref", "checkpoints"))
    )
    diffs = []
    for f in sorted(os.listdir(ref_vis_dir)):
        if not f.endswith("_denoised.tif"):
            continue
        x = np.asarray(iio.imread(join(our_vis_dir, f)), np.float64)
        y = np.asarray(iio.imread(join(ref_vis_dir, f)), np.float64)
        diffs.append(np.abs(x - y).max())

    print(f"variant: {a.variant} iso{a.iso}")
    print(f"reference PSNR: {ref_psnr:.3f}  ours: {our_psnr:.3f}  delta: {abs(our_psnr-ref_psnr)*1.0:.4f} dB")
    print(f"max per-pixel |diff| across {len(diffs)} frames (0-255 scale): {max(diffs):.4f}")
    ok = abs(our_psnr - ref_psnr) <= 0.05
    print("PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
