"""Generate golden parity fixtures by EXECUTING the reference implementation.

This script runs the public reference code at /root/reference (and plain
torch ops) on small random inputs and stores inputs+outputs as .npz files
under tests/golden/.  No reference code is copied into the repository; the
fixtures are data.  Re-run when adding new parity tests:

    python tools/make_goldens.py [--only name ...]

Sections that need the reference checkout or the compiled C flow library
are skipped gracefully when unavailable.
"""

from __future__ import annotations

import argparse
import pathlib
import subprocess
import sys
import tempfile

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
REF = pathlib.Path("/root/reference")
OUT = REPO / "tests" / "golden"
OUT.mkdir(parents=True, exist_ok=True)


def save(name, **arrs):
    np.savez_compressed(OUT / f"{name}.npz", **arrs)
    print(f"wrote {name}.npz: " + ", ".join(f"{k}{v.shape}" for k, v in arrs.items() if hasattr(v, "shape")))


# ---------------------------------------------------------------------------


def golden_hamilton_adams():
    import torch

    sys.path.insert(0, str(REF))
    from util.Hamilton_Adam_demo import HamiltonAdam  # reference impl (executed, not vendored)

    ha = HamiltonAdam("gbrg")
    rng = np.random.default_rng(1)
    raw = rng.uniform(-1, 1, size=(2, 4, 16, 24)).astype(np.float32)
    with torch.no_grad():
        rgb = ha(torch.from_numpy(raw)).numpy()
        remos = ha.remosaick(torch.from_numpy(rgb)).numpy()
    save("hamilton_adams", raw=raw, rgb=rgb, remosaic=remos)

    # multi-frame packing path (view(-1, 4, H, W))
    raw2 = rng.uniform(0, 1, size=(1, 8, 12, 12)).astype(np.float32)
    with torch.no_grad():
        rgb2 = ha(torch.from_numpy(raw2)).numpy()
    save("hamilton_adams_multiframe", raw=raw2, rgb=rgb2)


def golden_warp():
    """torch grid_sample parity data via the reference warp()."""
    import torch

    sys.path.insert(0, str(REF))
    from util.flow_utils import warp as ref_warp, upsample_factor_2

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 17, 23)).astype(np.float32)
    flow = (rng.standard_normal((2, 2, 17, 23)) * 3.0).astype(np.float32)
    outs = {}
    for mode in ["bicubic", "bilinear", "nearest"]:
        with torch.no_grad():
            y, m = ref_warp(torch.from_numpy(x), torch.from_numpy(flow), mode)
        outs[f"warped_{mode}"] = y.numpy()
        outs[f"mask_{mode}"] = m.numpy()
    with torch.no_grad():
        up = upsample_factor_2(torch.from_numpy(flow), multiply_by=2).numpy()
    save("warp", x=x, flow=flow, flow_up2=up, **outs)


def golden_resize():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 5, 13, 19)).astype(np.float32)
    t = torch.from_numpy(x)
    with torch.no_grad():
        up_ac = F.interpolate(t, scale_factor=2, mode="bilinear", align_corners=True).numpy()
        up_nac = F.interpolate(t, scale_factor=2, mode="bilinear", align_corners=False).numpy()
        up_nn = F.interpolate(t, scale_factor=2, mode="nearest").numpy()
        mp = F.max_pool2d(t, 2).numpy()
        ap = F.avg_pool2d(t, 2).numpy()
    save("resize", x=x, up_ac=up_ac, up_nac=up_nac, up_nn=up_nn, maxpool=mp, avgpool=ap)


def _stub_modules():
    """Stub optional heavy deps the reference imports but we don't exercise."""
    import types

    for name in [
        "iio",
        "skimage",
        "skimage.io",
        "skimage.color",
        "skimage.metrics",
        "torchvision",
        "torchvision.transforms",
    ]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
    sys.modules["skimage"].io = sys.modules["skimage.io"]
    sys.modules["skimage"].color = sys.modules["skimage.color"]
    sys.modules["skimage.color"].rgb2gray = lambda x: x @ [0.2125, 0.7154, 0.0721]
    sys.modules["skimage.metrics"].structural_similarity = lambda *a, **k: 0.0
    sys.modules["iio"].read = None
    sys.modules["iio"].write = None
    tvt = sys.modules["torchvision.transforms"]
    sys.modules["torchvision"].transforms = tvt
    tvt.Compose = lambda fns: (lambda x: x)
    tvt.ToTensor = lambda: (lambda x: x)
    tvt.Lambda = lambda f: f


def golden_pipeline():
    """Inverse + forward camera pipeline, run via the reference modules."""
    import torch

    if not (REF / "dataset").exists():
        print("skip pipeline (no reference)")
        return
    _stub_modules()
    sys.path.insert(0, str(REF / "dataset"))
    import importlib

    # fwd_ppipe imports and instantiates a .cuda() tensor at module scope;
    # run it with CUDA mocked to CPU.
    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore
    fwd = importlib.import_module("fwd_ppipe")

    rng = np.random.default_rng(4)
    im = (rng.uniform(0, 1, size=(10, 14, 3)) * 4000 + 100).astype(np.float32)
    n, red, blue = fwd.find_gains(0, 3200)
    srgb = fwd.ppipe(
        im.copy(), torch.FloatTensor([1.0 / n]), torch.FloatTensor([red]), torch.FloatTensor([blue]), 3200
    )
    srgb12800 = fwd.ppipe(
        im.copy(), torch.FloatTensor([1.0 / n]), torch.FloatTensor([red]), torch.FloatTensor([blue]), 12800
    )
    save(
        "fwd_ppipe",
        im=im,
        srgb3200=np.asarray(srgb, np.float32),
        srgb12800=np.asarray(srgb12800, np.float32),
        gains=np.array([n, red, blue], np.float32),
    )

    # inverse pipeline pieces (no dither so it is deterministic): reproduce
    # single_image_rgb2raw without its quantization noise by calling the ops.
    gen = importlib.import_module("generate_raw_from_RGB") if False else None
    # generate_raw_from_RGB.py runs its __main__ body on import; instead we
    # exercise the op chain through torch manually in the test itself.


def golden_tvl1():
    """Compile the reference C TV-L1 and record flows on small pairs."""
    import ctypes

    src = REF / "3rdparty" / "tvl1flow"
    if not src.exists():
        print("skip tvl1 (no reference)")
        return
    build = pathlib.Path(tempfile.mkdtemp(prefix="tvl1build"))
    lib_c = [
        src / "tvl1flow_lib.c",
        src / "mask.c",
        src / "bicubic_interpolation.c",
        src / "zoom.c",
        src / "xmalloc.c",
    ]
    # xmalloc.h etc live in the same dir; build a tiny extern C wrapper that
    # mirrors libBridge's parameter defaulting.
    wrapper = build / "wrap.c"
    wrapper.write_text(
        """
#include <math.h>
extern void Dual_TVL1_optic_flow_multiscale(
    float*,float*,float*,float*,int,int,float,float,float,int,int,float,int,float,int);
void tvl1flow_golden(float *I0, float *I1, float *u, int nx, int ny)
{
    int nscales = 100;
    const float zfactor = 0.5f;
    const float N = 1 + log(hypot(nx, ny) / 16.0) / log(1 / zfactor);
    if (N < nscales) nscales = N;
    float *v = u + nx * ny;
    Dual_TVL1_optic_flow_multiscale(I0, I1, u, v, nx, ny,
        0.25f, 0.15f, 0.3f, nscales, 0, zfactor, 5, 0.01f, 0);
}
"""
    )
    so = build / "libtvl1golden.so"
    cmd = (
        ["gcc", "-O2", "-fPIC", "-shared", "-fopenmp", "-I", str(src), "-o", str(so), str(wrapper)]
        + [str(p) for p in lib_c]
        + ["-lm"]
    )
    subprocess.run(cmd, check=True)
    lib = ctypes.cdll.LoadLibrary(str(so))
    lib.tvl1flow_golden.argtypes = [ctypes.c_void_p] * 3 + [ctypes.c_int] * 2

    rng = np.random.default_rng(5)
    cases = {}
    for name, (h, w) in {"small": (48, 64), "tiny": (24, 32)}.items():
        # smooth random image pair with a known shift + noise
        base = rng.standard_normal((h + 8, w + 8))
        from scipy.ndimage import gaussian_filter

        base = gaussian_filter(base, 3.0) * 40 + 100
        i0 = base[4 : 4 + h, 4 : 4 + w].astype(np.float32)
        i1 = base[5 : 5 + h, 6 : 6 + w].astype(np.float32)  # shift (dy=1, dx=2)
        i1 = i1 + rng.standard_normal((h, w)).astype(np.float32) * 0.5
        flow = np.zeros(2 * h * w, np.float32)
        fp = ctypes.POINTER(ctypes.c_float)
        lib.tvl1flow_golden(
            i0.ravel().ctypes.data_as(fp), i1.ravel().ctypes.data_as(fp),
            flow.ctypes.data_as(fp), ctypes.c_int(w), ctypes.c_int(h),
        )
        cases[f"{name}_i0"] = i0
        cases[f"{name}_i1"] = i1
        cases[f"{name}_flow"] = flow.reshape(2, h, w).transpose(1, 2, 0)
    save("tvl1", **cases)


def golden_networks():
    """Run the reference networks with released weights on fixed inputs."""
    import torch

    sys.path.insert(0, str(REF))
    from networks.unet import UNet_FixedFeatures, UNet_FixedFeatures_feat
    from networks.new_unet import NewUNet, NewUNet_feat

    rng = np.random.default_rng(6)
    tn = REF / "trained-nets"

    def run(net, sd_name, x, feat=None):
        sd = torch.load(tn / f"{sd_name}_net_Denoise.pth", map_location="cpu")
        missing = net.load_state_dict(sd, strict=False)
        assert not missing.missing_keys, missing
        net.eval()
        with torch.no_grad():
            if feat is not None:
                net.set_rec_features([torch.from_numpy(feat)])
            y = net(torch.from_numpy(x))
            newfeat = net.get_current_features()[0].numpy() if feat is not None else None
        return y.numpy(), newfeat

    H, W = 32, 40
    # convunet fixedfeatures, 6ch in (non-recurrent: prev+current RGB)
    x6 = rng.uniform(-1, 1, (1, 6, H, W)).astype(np.float32)
    net = UNet_FixedFeatures(in_channels=6, out_channels=3, depth=4)
    y, _ = run(net, "recurrent-convunet-iso3200", x6)
    save("net_convunet", x=x6, y=y)

    # convunet 9ch (future variant)
    x9 = rng.uniform(-1, 1, (1, 9, H, W)).astype(np.float32)
    net = UNet_FixedFeatures(in_channels=9, out_channels=3, depth=4)
    y, _ = run(net, "recurrent-convunet-future-iso3200", x9)
    save("net_convunet_future", x=x9, y=y)

    # convunet+feat
    feat = rng.uniform(-1, 1, (1, 48, H, W)).astype(np.float32)
    net = UNet_FixedFeatures_feat(in_channels=6, out_channels=3, depth=4)
    y, nf = run(net, "recurrent-convunet+feat-iso3200", x6, feat)
    save("net_convunet_feat", x=x6, feat=feat, y=y, newfeat=nf)

    # ConvNeXt+feat+future (the flagship)
    net = NewUNet_feat(9, 3)
    y, nf = run(net, "recurrent-ConvNeXtUnet+feat-future-iso3200", x9, feat)
    save("net_convnext_feat_future", x=x9, feat=feat, y=y, newfeat=nf)

    # plain ConvNeXt (random init, fixed seed) for architecture-only parity
    torch.manual_seed(0)
    net = NewUNet(6, 3)
    net.eval()
    with torch.no_grad():
        y = net(torch.from_numpy(x6)).numpy()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    np.savez_compressed(OUT / "net_convnext_random.npz", x=x6, y=y, **{f"sd/{k}": v for k, v in sd.items()})
    print("wrote net_convnext_random.npz")


def golden_gradients():
    """Training gradient parity: run the reference recurrentModel's actual
    forward + loss backward (models/recurrent_model.py:161-538) on tiny
    random-init nets and record dL/dparams for every parameter.

    The model object is assembled attribute-by-attribute (same pattern as
    golden_schedules) so no Options/BaseModel/GPU machinery is needed; the
    math exercised is the real unrolled recurrence: Hamilton-Adams
    pre-demosaic, x2 flow upsample, bicubic warps of the carried denoised
    frame (and feature map / future frame), the UNet forward per unrolling,
    and the weighted L1 loss (x lambda_L1) summed over unrollings.
    """
    import torch

    _stub_modules()
    sys.path.insert(0, str(REF))
    import importlib

    rm = importlib.import_module("models.recurrent_model")
    from networks.unet import UNet_FixedFeatures, UNet_FixedFeatures_feat
    from util.Hamilton_Adam_demo import HamiltonAdam

    class Opt:
        model_patch_depth = 2
        future_patch_depth = 0
        input_nc = 3
        output_nc = 3
        patch_depth = 4
        feature_rec = False
        no_warp = False
        no_predemosaic = False
        warp_raw = False
        prev_noisy_frame = False
        raw_gt = False
        lambda_L1 = 100.0
        unroll_focus = "all"
        non_blocking = False

    def run_case(name, feat, fD, seed):
        opt = Opt()
        opt.feature_rec = feat
        opt.future_patch_depth = fD
        torch.manual_seed(seed)
        rng = np.random.default_rng(seed)
        D = opt.model_patch_depth - 1
        TD = opt.patch_depth - opt.model_patch_depth + 1
        T = opt.patch_depth + fD
        h, w = 12, 16  # raw half-res -> RGB 24x32
        in_nc = (opt.model_patch_depth + fD) * opt.input_nc
        cls = UNet_FixedFeatures_feat if feat else UNet_FixedFeatures
        net = cls(in_channels=in_nc, out_channels=3, depth=4, filters=12)

        model = rm.recurrentModel.__new__(rm.recurrentModel)
        model.opt = opt
        model.device = torch.device("cpu")
        model.isTrain = True
        model.netDenoise = net
        model._netDenoise = net
        model.criterionL1 = torch.nn.L1Loss()
        model.hamilton_adam = HamiltonAdam("gbrg")
        model.gt_nc = opt.input_nc
        model.data_nc = 4
        model.training_unrollings = TD

        raw = rng.uniform(-1, 1, (1, T, h, w, 4)).astype(np.float32)
        gt = rng.uniform(-1, 1, (1, T, 2 * h, 2 * w, 3)).astype(np.float32)
        from scipy.ndimage import gaussian_filter

        fl = np.stack(
            [
                gaussian_filter(
                    rng.standard_normal((TD, D + fD, h, w)), (0, 0, 2, 2)
                )
                * 1.5
                for _ in range(2)
            ],
            axis=2,
        ).astype(np.float32)  # [TD, D+fD, 2, h, w]

        model.set_input(
            {
                "n": torch.from_numpy(
                    raw.transpose(0, 1, 4, 2, 3).reshape(1, T * 4, h, w)
                ),
                "gt": torch.from_numpy(
                    gt.transpose(0, 1, 4, 2, 3).reshape(1, T * 3, 2 * h, 2 * w)
                ),
                "n_path": ["x"],
                "flow": torch.from_numpy(fl[None].copy()),
                "epoch": 99,
                "epoch_iter": 0,
                "epoch_length": 100,
            }
        )
        model.forward()
        model.compute_losses()
        model.loss_Denoiser.backward()

        arrs = dict(
            raw=raw,
            gt=gt,
            flow=fl,
            loss=np.float32(model.loss_Denoiser.item()),
            weights=np.asarray(
                model.compute_unrolling_weights().numpy(), np.float32
            ),
            denoised=np.stack(
                [d.detach().numpy() for d in model.denoised_list], 1
            ),
        )
        arrs.update(
            {f"sd/{k}": v.detach().numpy() for k, v in net.state_dict().items()}
        )
        arrs.update(
            {
                f"gd/{k}": (
                    p.grad.numpy()
                    if p.grad is not None
                    else np.zeros(p.shape, np.float32)
                )
                for k, p in net.named_parameters()
            }
        )
        np.savez_compressed(OUT / f"grads_{name}.npz", **arrs)
        print(f"wrote grads_{name}.npz loss={model.loss_Denoiser.item():.5f}")

    run_case("convunet_feat", True, 0, 11)
    run_case("convunet_future", False, 1, 12)


def golden_schedules():
    """Unrolling-weight schedules from the reference model, densely sampled."""
    import torch

    _stub_modules()
    sys.path.insert(0, str(REF))
    import importlib

    rm = importlib.import_module("models.recurrent_model")

    class Dummy:
        pass

    results = {}
    for focus in ["all", "ge_1", "gradual04_from20", "graduni04_from20"]:
        model = rm.recurrentModel.__new__(rm.recurrentModel)
        opt = Dummy()
        opt.patch_depth = 5
        opt.model_patch_depth = 2
        opt.unroll_focus = focus
        model.opt = opt
        model.device = torch.device("cpu")
        model.n = torch.zeros(1, 1, 4, 4)
        ws = []
        for epoch in [1, 5, 19, 20, 21, 22, 23, 24, 30, 99]:
            for it, length in [(0, 100), (50, 100), (99, 100)]:
                model.epoch = epoch
                model.epoch_iter = it
                model.epoch_length = length
                w = model.compute_unrolling_weights()
                w = np.atleast_1d(np.asarray(w, np.float32))
                ws.append((epoch, it, length, w))
        results[focus] = ws
    flat = {}
    for focus, ws in results.items():
        key = focus.replace("_", "")
        flat[f"{key}_meta"] = np.array([[e, i, l] for e, i, l, _ in ws], np.int32)
        maxlen = max(len(w) for *_, w in ws)
        arr = np.zeros((len(ws), maxlen), np.float32)
        for r, (_, _, _, w) in enumerate(ws):
            arr[r, : len(w)] = w
        flat[f"{key}_w"] = arr
    save("unroll_schedules", **flat)


ALL = {
    "hamilton_adams": golden_hamilton_adams,
    "warp": golden_warp,
    "resize": golden_resize,
    "pipeline": golden_pipeline,
    "tvl1": golden_tvl1,
    "networks": golden_networks,
    "gradients": golden_gradients,
    "schedules": golden_schedules,
}

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()
    for name, fn in ALL.items():
        if args.only and name not in args.only:
            continue
        print(f"== {name} ==")
        try:
            fn()
        except Exception as e:  # keep going; individual fixtures can fail
            import traceback

            traceback.print_exc()
            print(f"FAILED {name}: {e}")
