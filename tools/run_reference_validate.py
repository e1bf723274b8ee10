"""Run the REFERENCE validate path on a dataset for parity comparison.

Executes /root/reference's model + dataloader (torch CPU) with the released
weights on the given dataset and writes reference denoised outputs +
per-frame losses, so `tools/compare_parity.py` can diff them against our
validate CLI's outputs.  Reference code is executed in place, not copied.

The reference needs its C flow library; we build it once into a temp dir
and chdir so './build/libBridge.so' resolves (library.py:143-148).

    python tools/run_reference_validate.py --dataroot /tmp/tiny_synth/validation \
        --variant recurrent-convunet --iso 3200 --out /tmp/refval
"""

from __future__ import annotations

import argparse
import os
import pathlib
import subprocess
import sys
import types

import numpy as np

REF = pathlib.Path("/root/reference")


def stub_modules():
    # the reference predates numpy 1.24 (np.int alias removal)
    if not hasattr(np, "int"):
        np.int = int  # type: ignore[attr-defined]

    import imageio.v2 as iio2

    iio = types.ModuleType("iio")
    iio.read = lambda p: np.asarray(iio2.imread(p))
    iio.write = lambda p, a: iio2.imwrite(p, np.ascontiguousarray(a))
    sys.modules["iio"] = iio

    sk = types.ModuleType("skimage")
    skio = types.ModuleType("skimage.io")
    skcolor = types.ModuleType("skimage.color")
    skcolor.rgb2gray = lambda x: np.asarray(x) @ np.array([0.2125, 0.7154, 0.0721])
    sk.io = skio
    sk.color = skcolor
    sys.modules["skimage"] = sk
    sys.modules["skimage.io"] = skio
    sys.modules["skimage.color"] = skcolor

    tvt = types.ModuleType("torchvision.transforms")
    tv = types.ModuleType("torchvision")

    class _Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    import torch

    def _to_tensor():
        def f(x):
            t = torch.from_numpy(np.ascontiguousarray(x))
            if t.ndim == 3:
                t = t.permute(2, 0, 1)
            return t.float()

        return f

    tvt.Compose = _Compose
    tvt.ToTensor = _to_tensor
    tvt.Lambda = lambda f: f
    tv.transforms = tvt
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tvt


def build_bridge(workdir: pathlib.Path) -> None:
    build = workdir / "build"
    build.mkdir(parents=True, exist_ok=True)
    so = build / "libBridge.so"
    if so.exists():
        return
    src = REF / "3rdparty" / "tvl1flow"
    objs = []
    for f in ["tvl1flow_lib.c", "mask.c", "bicubic_interpolation.c", "zoom.c", "xmalloc.c"]:
        o = build / (f + ".o")
        subprocess.run(
            ["gcc", "-O2", "-fPIC", "-fopenmp", "-c", "-I", str(src), "-o", str(o), str(src / f)],
            check=True,
        )
        objs.append(str(o))
    subprocess.run(
        ["g++", "-O2", "-fPIC", "-shared", "-fopenmp", "-I", str(src),
         "-o", str(so), str(REF / "libBridge.cpp")] + objs + ["-lm"],
        check=True,
    )


VARIANTS = {
    "non_recurrent-convunet-no_warp": dict(
        net="convunet-mode=fixedfeatures", args=["--no_warp", "--patch_depth", "2"]
    ),
    "non_recurrent-convunet": dict(
        net="convunet-mode=fixedfeatures", args=["--patch_depth", "2"]
    ),
    "non_recurrent-convunet-no_warp-future": dict(
        net="convunet-mode=fixedfeatures",
        args=["--no_warp", "--patch_depth", "2", "--future_patch_depth", "1"],
    ),
    "non_recurrent-convunet-future": dict(
        net="convunet-mode=fixedfeatures",
        args=["--patch_depth", "2", "--future_patch_depth", "1"],
    ),
    "recurrent-convunet": dict(net="convunet-mode=fixedfeatures", args=[]),
    "recurrent-convunet-future": dict(
        net="convunet-mode=fixedfeatures", args=["--future_patch_depth", "1"]
    ),
    "recurrent-convunet+feat": dict(
        net="convunet-mode=fixedfeatures+feat", args=["--feature_rec"]
    ),
    "recurrent-convunet+feat-future": dict(
        net="convunet-mode=fixedfeatures+feat",
        args=["--feature_rec", "--future_patch_depth", "1"],
    ),
    "recurrent-ConvNeXtUnet": dict(net="newunet", args=[]),
    "recurrent-ConvNeXtUnet+feat-future": dict(
        net="newunet-mode=feat", args=["--feature_rec", "--future_patch_depth", "1"]
    ),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--variant", default="recurrent-convunet")
    ap.add_argument("--iso", type=int, default=3200)
    ap.add_argument("--out", default="/tmp/refval")
    ap.add_argument("--videos", default="000")
    a = ap.parse_args()

    stub_modules()
    work = pathlib.Path(a.out)
    work.mkdir(parents=True, exist_ok=True)
    build_bridge(work)
    os.chdir(work)  # so ./build/libBridge.so resolves
    sys.path.insert(0, str(REF))
    sys.argv = (
        ["validate.py"]
        + ["--gpu_ids", "-1"]
        + ["--netDenoiser", VARIANTS[a.variant]["net"]]
        + VARIANTS[a.variant]["args"]
        + ["--path2epoch", str(REF / "trained-nets" / f"{a.variant}-iso{a.iso}")]
        + ["--val_dataroot", a.dataroot]
        + ["--gtFolder", f"gt_iso{a.iso}"]
        + ["--nFolder", f"noisy_iso{a.iso}"]
        + ["--gt_linear_RGB_Folder", f"gt_raw_linear_RGB_iso{a.iso}"]
        + ["--val_videos", a.videos]
        + ["--checkpoints_dir", str(work / "checkpoints")]
        + ["--suffix", "parity"]
    )

    # the reference validate.py runs at import under __main__ semantics
    import runpy

    runpy.run_path(str(REF / "validate.py"), run_name="__main__")


if __name__ == "__main__":
    main()
