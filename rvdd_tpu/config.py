"""Options system: one dataclass mirroring the reference's 3-tier argparse
surface (reference: options/base_options.py, options/train_options.py, and
the model/dataset-injected flags).

The experiment name is auto-generated the same way
("%s-%s%s-i%do%d%s"; reference: options/base_options.py:130-136) so
checkpoint directories line up with reference conventions.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass, field

from rvdd_tpu.recurrent.engine import EngineConfig


@dataclass
class Options:
    # basic
    checkpoints_dir: str = "./checkpoints"
    name: str = ""  # auto-generated if empty
    suffix: str = ""
    verbose: bool = False

    # model
    model: str = "recurrent"
    input_nc: int = 3
    output_nc: int = 3
    netDenoiser: str = "convunet-mode=fixedfeatures"
    init_type: str = "kaiming"
    init_gain: float = 0.02
    model_patch_depth: int = 2
    unroll_focus: str = "gradual04_from20"
    feature_rec: bool = False
    prev_noisy_frame: bool = False
    warp_raw: bool = False
    no_predemosaic: bool = False
    raw_gt: bool = False

    # dataset
    dataroot: str = "./datasets/train_dataset"
    nFolder: str = "noisy"
    gtFolder: str = "gt"
    gt_linear_RGB_Folder: str = "gt_linear_RGB"
    flowFolder: str = "flow"
    bit_depth: int = 12
    no_warp: bool = False
    warp_method: str = "tvl1"
    videos: str | None = None
    dataset_mode: str = "axel4rec"
    #: validation dataset registry name (reference: recurrent_model.py:27
    #: injects val_dataset_mode='infer4rec')
    val_dataset_mode: str = "infer4rec"
    batch_size: int = 2
    patch_width: int = 136
    patch_stride: int = 3
    patch_depth: int = 5
    future_patch_depth: int = 0
    frames2load: int = 10
    crop_data: str | None = None
    persist_flows: bool = True
    # compute TV-L1 on device inside the inference step instead of the
    # disk cache (self-contained streaming; the reference has no analogue)
    online_flow: bool = False
    # --online_flow solver preset: 'default' (the C library's parameters,
    # 5 warps / <=300 iters) or 'fast' (2 warps / <=75 iters — the
    # bench.py --fast_flow preset; PSNR delta measured in BENCH.md)
    flow_preset: str = "default"

    # training
    niter: int = 70
    niter_decay: int = 30
    beta1: float = 0.9
    lr: float = 0.00016
    lr_policy: str = "linear"
    lr_decay_iters: int = 50
    weight_decay: float = 0.01
    optimizer: str = "adamw"
    lambda_L1: float = 100.0
    print_freq: int = 100
    save_epoch_freq: int = 1
    autoresume: bool = False
    path2epoch: str = ""
    epoch: str = "latest_val"
    seed: int = 0
    # rematerialize each unrolling in the training backward (exact grads,
    # O(net) instead of O(unrollings*net) activation memory; needed for
    # the ConvNeXt flagship's production config on a 16 GB chip)
    remat: bool = False

    # validation
    val_epoch_freq: int = 1
    val_dataroot: str = "./datasets/validation_dataset"
    val_videos: str = "000,001,002,003,004"
    no_val: bool = False
    val_flow_from_denoised: bool = False
    # pad full frames up to a multiple (raw-domain pixels) so mixed frame
    # sizes share one jit specialization; 0 = exact sizes (default)
    val_pad_multiple: int = 0
    # stream whole clips through one lax.scan jit instead of per-frame
    # steps (no host sync per frame; first D frames use denoised-prev
    # recursion instead of the noisy-prev init, see scan_video)
    val_scan: bool = False

    # TPU-specific
    mesh_shape: str = "data"  # data-parallel over all devices
    exact_precision: bool = True  # fp32-exact convs (parity); False = bf16 MXU
    #: training matmul precision: 'highest' (fp32-exact, 6-pass MXU — the
    #: default, strictest), 'high' (3-pass bf16 decomposition — the
    #: TF32-accumulation class the reference trains under on Ampere), or
    #: 'default' (1-pass bf16).  Applies to the train step (and in-loop
    #: validation); the validate CLI stays exact regardless.
    train_matmul_precision: str = "highest"
    #: residual radius of the training shift warp's banded sweep (see
    #: EngineConfig.shift_warp_radius)
    shift_warp_radius: int = 8
    warp_impl: str = "auto"  # auto | xla | pallas (inference warping)
    #: 'xla' (exact, any backend) | 'fused' (TPU fast inference: planar
    #: Pallas step; see BENCH.md for measured speed/PSNR per precision)
    net_impl: str = "xla"
    #: fused-path numerics: 'fast' (bf16, 1-pass MXU) | 'mixed' (fp32
    #: storage, manual 3-pass bf16_3x dots) | 'accurate' (fp32, 6-pass)
    fused_precision: str = "auto"  # auto -> parity-safe preset per variant
    #: persistent XLA compilation cache (cold start: the 1080p step's first
    #: jit is 20-40 s; cached reloads are near-instant).  Empty disables.
    compilation_cache_dir: str = "~/.cache/rvdd_tpu/xla"
    #: fused-path recurrence-carry storage; bf16 carry rounding feeds back
    #: through the recurrence and accumulates over a clip (drift)
    state_dtype: str = "float32"
    profile_dir: str = ""  # capture a jax.profiler trace of a few steps
    distributed: bool = False  # multi-host: call jax.distributed.initialize()

    isTrain: bool = True

    def finalize(self) -> "Options":
        if not self.name:
            warpstr = "-warp" if not self.no_warp else ""
            sufstr = f"-{self.suffix}" if self.suffix else ""
            self.name = (
                f"{self.model}-{self.netDenoiser}{warpstr}"
                f"-i{self.input_nc}o{self.output_nc}{sufstr}"
            )
        return self

    @property
    def save_dir(self) -> str:
        return os.path.join(self.checkpoints_dir, self.name)

    def engine_config(self) -> EngineConfig:
        # resolve --model through the registry (reference resolves model
        # classes by name via importlib, models/__init__.py:25-45); user
        # code can register_model() a config subclass with the same surface
        from rvdd_tpu.registry import get_model

        factory = get_model(self.model)
        return factory(
            model_patch_depth=self.model_patch_depth,
            patch_depth=self.patch_depth,
            future_patch_depth=self.future_patch_depth,
            input_nc=self.input_nc,
            output_nc=self.output_nc,
            no_warp=self.no_warp,
            no_predemosaic=self.no_predemosaic,
            warp_raw=self.warp_raw,
            prev_noisy_frame=self.prev_noisy_frame,
            feature_rec=self.feature_rec,
            raw_gt=self.raw_gt,
            lambda_l1=self.lambda_L1,
            warp_impl=self.resolve_warp_impl(),
            net_impl=self.net_impl,
            shift_warp_radius=self.shift_warp_radius,
            state_dtype=self.state_dtype,
            fused_precision=self.resolve_fused_precision(),
            remat=self.remat,
        )

    def resolve_fused_precision(self) -> str:
        from rvdd_tpu.models.fast_unet import resolve_fused_precision

        return resolve_fused_precision(
            self.fused_precision,
            arch=self.netDenoiser,
            feature_rec=self.feature_rec,
            future=self.future_patch_depth > 0,
        )

    def resolve_warp_impl(self) -> str:
        if self.warp_impl != "auto":
            return self.warp_impl
        import jax

        return "pallas" if jax.default_backend() not in ("cpu",) else "xla"

    def resolve_train_warp_impl(self) -> str:
        """Warp impl for the differentiable training path.

        The Pallas kernel is forward-only, and the generic XLA warp's
        backward is a per-pixel 4x4-block scatter-add that XLA:TPU
        serializes (measured 67 s/step in the production config).  On
        TPU, training uses the displacement-banded 'shift' warp
        (ops/warp_shift.py): same grid_sample numerics, scatter-free
        transpose.  On CPU the flat-gather XLA path is exact and fast.
        """
        if self.warp_impl in ("xla", "shift"):
            return self.warp_impl
        import jax

        return "shift" if jax.default_backend() not in ("cpu",) else "xla"

    def gt_folder_for_mode(self) -> str:
        return self.gtFolder if self.raw_gt else self.gt_linear_RGB_Folder

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2, default=str)

    def dump(self) -> str:
        lines = ["----------------- Options ---------------"]
        for f_ in sorted(dataclasses.fields(self), key=lambda f: f.name):
            lines.append(f"{f_.name:>25}: {getattr(self, f_.name)}")
        lines.append("----------------- End -------------------")
        return "\n".join(lines)


def setup_compilation_cache(path: str) -> None:
    """Enable JAX's persistent compilation cache (content-addressed; safe to
    share across runs).  The 1080p step's first jit is 20-40 s cold; cached
    reloads are near-instant.  Empty/None path disables."""
    if not path:
        return
    import jax

    p = os.path.expanduser(path)
    try:
        os.makedirs(p, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", p)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # non-fatal: a cold compile is slower, not wrong
        print(f"compilation cache disabled ({e})")


def build_parser(train: bool = True) -> argparse.ArgumentParser:
    """argparse mirror of the dataclass (flags keep the reference names)."""
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    defaults = Options()
    if train:
        # reference train-mode default overrides
        # (models/recurrent_model.py:27-28)
        defaults.patch_depth = 5
        defaults.patch_width = 136
    for f_ in dataclasses.fields(Options):
        if f_.name == "isTrain":
            continue
        default = getattr(defaults, f_.name)
        arg = f"--{f_.name}"
        if f_.type == "bool" or isinstance(default, bool):
            if default:
                p.add_argument(arg, action="store_true", default=True)
                p.add_argument(
                    f"--no_{f_.name}".replace("no_no_", "no_"),
                    dest=f_.name,
                    action="store_false",
                )
            else:
                p.add_argument(arg, action="store_true", default=False)
        elif isinstance(default, int):
            p.add_argument(arg, type=int, default=default)
        elif isinstance(default, float):
            p.add_argument(arg, type=float, default=default)
        else:
            p.add_argument(arg, type=str, default=default)
    return p


def parse_options(argv=None, train: bool = True) -> Options:
    args = build_parser(train).parse_args(argv)
    opt = Options(**{k: v for k, v in vars(args).items()})
    opt.isTrain = train
    return opt.finalize()
