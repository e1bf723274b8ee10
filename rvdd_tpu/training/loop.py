"""Epoch loop and validation loop (the train.py / validate.py internals).

Mirrors the reference loops (reference: train.py:67-130, validate.py:54-114)
with TPU-native mechanics: one jitted, donated train step; batches sharded
over the mesh 'data' axis; validation streams frames serially carrying the
recurrence state with a FirstOfVideo reset.
"""

from __future__ import annotations

import os
import time
from os.path import basename, join
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from rvdd_tpu.config import Options
from rvdd_tpu.data.datasets import InferenceDataset, TrainWindowDataset
from rvdd_tpu.data.flow_cache import FlowCache
from rvdd_tpu.data.io import imwrite
from rvdd_tpu.models import build_network
from rvdd_tpu.ops.bayer import remosaic
from rvdd_tpu.ops.tvl1 import to_gray, tvl1_flow
from rvdd_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from rvdd_tpu.recurrent.engine import (
    EngineConfig,
    compute_losses,
    inference_step,
    prepare_frames,
)
from rvdd_tpu.recurrent.schedules import active_unrollings, unroll_weights
from rvdd_tpu.training.checkpoints import (
    load_checkpoint,
    load_status,
    save_checkpoint,
    save_status,
)
from rvdd_tpu.training.train_state import (
    TrainState,
    create_train_state,
    lr_for_epoch,
    make_train_step,
    set_learning_rate,
)


class Logger:
    """loss_log.txt writer (reference: util/visualizer.py:36-102)."""

    def __init__(self, save_dir: str):
        os.makedirs(save_dir, exist_ok=True)
        self.path = join(save_dir, "loss_log.txt")
        with open(self.path, "a") as f:
            f.write(f"================ Training Loss ({time.strftime('%c')}) ================\n")

    def line(self, msg: str) -> None:
        print(msg)
        with open(self.path, "a") as f:
            f.write(msg + "\n")


def build_validation(opt: Options) -> InferenceDataset:
    cache = None
    if not opt.no_warp and not opt.online_flow:
        cache = FlowCache(
            opt.val_dataroot, opt.nFolder, opt.flowFolder, opt.warp_method,
            persist=opt.persist_flows,
        )
    from rvdd_tpu.registry import get_dataset

    return get_dataset(opt.val_dataset_mode)(
        opt.val_dataroot,
        opt.gt_folder_for_mode(),
        opt.nFolder,
        patch_depth=opt.model_patch_depth,
        future_patch_depth=opt.future_patch_depth,
        bit_depth=opt.bit_depth,
        raw_gt=opt.raw_gt,
        no_predemosaic=opt.no_predemosaic,
        videos=opt.val_videos,
        flow_cache=cache,
        no_warp=opt.no_warp,
        crop_data=opt.crop_data,
    )


from functools import partial


@partial(
    jax.jit,
    static_argnames=("cfg", "net", "online_flow", "flow_preset", "padded"),
)
def _val_step(
    params, state_or_none, frames, flows, gt_last, valid_hw,
    *, cfg, net, online_flow, flow_preset="default", padded=False,
):
    """One validation step.  Module-level + static (cfg, net) so the jit
    cache survives across compute_validation calls — the per-epoch
    validation costs zero recompiles after the first epoch.

    With ``padded=True``, frames AND gt arrive padded to the same bucket
    and ``valid_hw`` holds the true gt spatial size (dynamic, so every
    frame size in a bucket shares one specialization); losses are masked
    to the valid region.
    """
    if online_flow and not cfg.no_warp:
        from rvdd_tpu.ops.tvl1 import TVL1Params
        from rvdd_tpu.recurrent.engine import compute_window_flows

        fp = (
            TVL1Params(nwarps=2, max_iterations=75)
            if flow_preset == "fast"
            else None
        )
        flows = compute_window_flows(cfg, frames, fp)[:, None]
    frames2, flows2 = prepare_frames(cfg, frames, flows)
    fl = flows2[:, 0] if flows2 is not None else None
    nil = (
        net.nil_features(frames2.shape[0], frames2.shape[2], frames2.shape[3])
        if cfg.feature_rec
        else None
    )
    den, state = inference_step(cfg, net, params, state_or_none, frames2, fl, nil)
    raw_domain_gt = cfg.raw_gt and not cfg.no_predemosaic
    g = 2 if raw_domain_gt else 1
    den_c = den[:, : g * gt_last.shape[1], : g * gt_last.shape[2]]
    out = remosaic(den_c) if raw_domain_gt else den_c
    if padded:
        gh, gw = gt_last.shape[1], gt_last.shape[2]
        mask = (
            (jnp.arange(gh)[:, None] < valid_hw[0])
            & (jnp.arange(gw)[None, :] < valid_hw[1])
        ).astype(out.dtype)[None, :, :, None]
        n_valid = jnp.sum(mask) * out.shape[0] * out.shape[-1]
        diff = (out - gt_last) * mask
        l1 = jnp.sum(jnp.abs(diff)) / n_valid * cfg.lambda_l1
        mse = jnp.sum(diff * diff) / n_valid
        ps = 10.0 * jnp.log10(4.0 / mse)
    else:
        l1 = jnp.mean(jnp.abs(out - gt_last)) * cfg.lambda_l1
        from rvdd_tpu.ops.metrics import psnr

        ps = psnr(out, gt_last, 2.0)
    return den_c, state, {"L1": l1, "PSNR": ps, "Denoiser": l1}


@partial(jax.jit, static_argnames=("cfg",))
def _flow_from_prev(prev_den, cur_noisy_raw, *, cfg):
    """--val_flow_from_denoised: TV-L1 between the remosaicked previous
    output and the current noisy raw (reference: validate.py:16-38)."""
    prev = prev_den
    if not cfg.no_predemosaic:
        prev = remosaic(prev_den)
    prev01 = (prev + 1.0) / 2.0
    cur01 = (cur_noisy_raw + 1.0) / 2.0
    return tvl1_flow(to_gray(cur01[0]), to_gray(prev01[0]))[None]


def _pad_window(frames, flows, multiple: int):
    """Pad a raw window (and flows) up to the next bucket so repeated
    validation over near-identical frame sizes reuses one compilation
    (SURVEY §7 hard-parts list).  Frames pad edge-replicated, flows zero."""
    h, w = frames.shape[2], frames.shape[3]
    ph, pw = (-h) % multiple, (-w) % multiple
    if not ph and not pw:
        return frames, flows
    frames = jnp.pad(
        frames, ((0, 0), (0, 0), (0, ph), (0, pw), (0, 0)), mode="edge"
    )
    if flows is not None:
        flows = jnp.pad(flows, ((0, 0), (0, 0), (0, 0), (0, ph), (0, pw), (0, 0)))
    return frames, flows


def compute_validation(
    opt: Options,
    net,
    params,
    val_dataset: InferenceDataset,
    val_image_dir: Optional[str] = None,
    save_visuals: bool = True,
    flow_from_denoised: bool = False,
    carry_state: Optional[bool] = None,
) -> Dict[str, float]:
    """Serial full-frame validation with carried recurrence (reference:
    validate.py:54-114).  Returns averaged losses ('<name>_valLoss').

    ``carry_state`` overrides the recurrence-carry protocol; the in-training
    caller passes the epoch's ``active_unrollings(...) > 1`` because the
    reference validates NON-recurrently while the gradual schedule is still
    in its non-recurrent phase (training_unrollings == 1 resets the
    recurrence on every frame, recurrent_model.py:233-238)."""
    cfg = opt.engine_config()  # warp_impl resolved (pallas on TPU)
    pad_multiple = opt.val_pad_multiple
    if pad_multiple and flow_from_denoised:
        raise NotImplementedError(
            "--val_flow_from_denoised with --val_pad_multiple"
        )

    def val_step(params, state_or_none, frames, flows, gt_last, valid_hw):
        return _val_step(
            params, state_or_none, frames, flows, gt_last, valid_hw,
            cfg=cfg, net=net, online_flow=opt.online_flow,
            flow_preset=opt.flow_preset, padded=bool(pad_multiple),
        )

    def flow_from_prev(prev_den, cur_noisy_raw):
        return _flow_from_prev(prev_den, cur_noisy_raw, cfg=cfg)

    # a net trained with 1 unrolling (patch_depth == model_patch_depth)
    # is non-recurrent: the recurrence re-initializes from the noisy
    # previous frame on EVERY test frame (reference:
    # recurrent_model.py:233-238 via training_unrollings == 1)
    if carry_state is None:
        carry_state = cfg.train_unrollings > 1

    totals: Dict[str, float] = {}
    count = 0
    state = None
    prev_den = None
    for item in val_dataset:
        first = item["FirstOfVideo"]
        if first or not carry_state:
            state = None
        frames = jnp.asarray(item["n"])[None]
        flows = None
        if "flow" in item:
            flows = jnp.asarray(item["flow"])[None][:, None]  # [B,1,D+fD,H,W,2]
        if flow_from_denoised and not first and prev_den is not None and flows is not None:
            # recompute the past-frame flow from the previous *denoised*
            # output (reference: validate.py:16-38; that path only supports
            # future_patch_depth == 0, as does this one)
            if cfg.future_patch_depth:
                raise NotImplementedError(
                    "--val_flow_from_denoised with future frames"
                )
            if cfg.d > 1 and count == 0:
                # the reference's loop (validate.py:27-36) computes the SAME
                # flow (last denoised -> current noisy) for every one of the
                # patch_depth-1 slots; repeating it here is exact parity,
                # but for D > 1 older slots get the wrong displacement
                print(
                    "warning: --val_flow_from_denoised with model_patch_depth"
                    " > 2 repeats the last-frame flow for all previous-frame"
                    " slots (reference behaviour)"
                )
            fl = flow_from_prev(prev_den, frames[:, -1])
            flows = fl[:, None, None].repeat(flows.shape[2], axis=2)
        gt_last = jnp.asarray(item["gt"][-1])[None]
        gh, gw = gt_last.shape[1], gt_last.shape[2]
        valid_hw = jnp.asarray([gh, gw], jnp.int32)
        if pad_multiple:
            frames, flows = _pad_window(frames, flows, pad_multiple)
            raw_domain_gt = cfg.raw_gt and not cfg.no_predemosaic
            # gt buckets to g x the raw bucket so every size in a bucket
            # shares one specialization
            gm = pad_multiple * (1 if raw_domain_gt or cfg.no_predemosaic else 2)
            gt_last = jnp.pad(
                gt_last,
                ((0, 0), (0, (-gh) % gm), (0, (-gw) % gm), (0, 0)),
            )
        den, state, losses = val_step(params, state, frames, flows, gt_last, valid_hw)
        prev_den = den
        for k, v in losses.items():
            totals[k] = totals.get(k, 0.0) + float(v)
        count += 1

        if save_visuals and val_image_dir is not None:
            seq = item["seq"]
            name = os.path.splitext(basename(item["n_path"]))[0]
            g = 2 if (cfg.raw_gt and not cfg.no_predemosaic) else 1
            img = (np.asarray(den[0])[: g * gh, : g * gw] + 1.0) / 2.0 * 255.0
            imwrite(join(val_image_dir, seq, f"{name}_denoised.tif"), img.astype(np.float32))

    return {f"{k}_valLoss": v / max(count, 1) for k, v in totals.items()}


@partial(jax.jit, static_argnames=("cfg", "net"))
def _val_scan_clip(params, raw_clip, flows, *, cfg, net):
    """Whole-clip streaming inference under one jit (lax.scan over time,
    O(1) recurrence state, no per-frame host sync)."""
    from rvdd_tpu.recurrent.engine import scan_video

    frames, flows2 = prepare_frames(cfg, raw_clip, flows)
    frames_t = jnp.swapaxes(frames, 0, 1)  # [T, B, H, W, C]
    flows_t = jnp.swapaxes(flows2, 0, 1) if flows2 is not None else None
    nil = (
        net.nil_features(frames.shape[0], frames.shape[2], frames.shape[3])
        if cfg.feature_rec
        else None
    )
    return scan_video(cfg, net, params, frames_t, flows_t, nil)  # [T, B, ...]


def compute_validation_scan(
    opt: Options,
    net,
    params,
    val_dataset: InferenceDataset,
    val_image_dir: Optional[str] = None,
    save_visuals: bool = True,
) -> Dict[str, float]:
    """--val_scan: one lax.scan jit per clip instead of per-frame steps.

    Protocol difference vs the per-frame path (and the reference): every
    frame runs through the denoised-prev recursion from frame 0, so the
    first D scored frames see a denoised (not noisy) previous frame; the
    scored rows are the same N-D-fD frames per video.
    """
    cfg = opt.engine_config()
    from rvdd_tpu.ops.metrics import psnr as psnr_fn

    d, fd = cfg.d, cfg.future_patch_depth
    totals: Dict[str, float] = {}
    count = 0
    for gt_dir, n_dir in zip(val_dataset.gt_dirs, val_dataset.n_dirs):
        from rvdd_tpu.data.io import list_video_files

        n_paths = list_video_files(n_dir)
        gt_paths = list_video_files(gt_dir)
        seq = basename(n_dir)
        from rvdd_tpu.data.datasets import _to_net
        from rvdd_tpu.data.io import load_image, load_image_stack

        noisy01 = load_image_stack(n_paths, val_dataset.bit_depth)
        # flows are computed/cached at full frame size (matching the
        # per-frame path, which crops only after the cache lookup)
        raw_full = noisy01 * (2.0 ** float(val_dataset.bit_depth) - 1.0)
        if val_dataset.crop is not None:
            cx, cy = val_dataset.crop
            noisy01 = noisy01[:, :cx, :cy]
        noisy = _to_net(noisy01)  # [N, h, w, 4]
        n = noisy.shape[0]

        flows = None
        if not cfg.no_warp and val_dataset.flow_cache is not None:
            raw = raw_full
            flows = np.zeros(noisy.shape[:1] + (d + fd,) + noisy.shape[1:3] + (2,), np.float32)
            for p in range(n):
                pairs, slots = [], []
                for k in range(d):  # frame p-d+k -> p
                    src = p - d + k
                    if src >= 0:
                        pairs.append((src, p))
                        slots.append(k)
                for j in range(fd):  # frame p+1+j -> p
                    src = p + 1 + j
                    if src < n:
                        pairs.append((src, p))
                        slots.append(d + j)
                if pairs:
                    fl = val_dataset.flow_cache.get_flows(seq, n_paths, pairs, frames=raw)
                    for s, f in zip(slots, fl):
                        # cached flows may be full-frame when --crop_data is on
                        flows[p, s] = f[: flows.shape[2], : flows.shape[3]]
            flows = jnp.asarray(flows)[None]  # [1, N, d+fd, h, w, 2]

        dens = _val_scan_clip(params, jnp.asarray(noisy)[None], flows, cfg=cfg, net=net)
        dens = np.asarray(dens[:, 0])  # [N, H, W, C_out]

        raw_domain_gt = cfg.raw_gt and not cfg.no_predemosaic
        for p in range(d, n - fd):
            gt_np = load_image(gt_paths[p], val_dataset.bit_depth) * 2.0 - 1.0
            if val_dataset.crop is not None:
                cx, cy = val_dataset.crop
                g = 1 if val_dataset.raw_gt else 2
                gt_np = gt_np[: g * cx, : g * cy]
            gt_last = jnp.asarray(gt_np)
            den = jnp.asarray(dens[p])
            out = remosaic(den[None])[0] if raw_domain_gt else den
            l1 = float(jnp.mean(jnp.abs(out - gt_last))) * cfg.lambda_l1
            ps = float(psnr_fn(out, gt_last, 2.0))
            for k, v in {"L1": l1, "PSNR": ps, "Denoiser": l1}.items():
                totals[k] = totals.get(k, 0.0) + v
            count += 1
            if save_visuals and val_image_dir is not None:
                name = os.path.splitext(basename(n_paths[p]))[0]
                img = (dens[p] + 1.0) / 2.0 * 255.0
                imwrite(
                    join(val_image_dir, seq, f"{name}_denoised.tif"),
                    img.astype(np.float32),
                )
    return {f"{k}_valLoss": v / max(count, 1) for k, v in totals.items()}


def train(opt: Options) -> None:
    """Full training entry (reference: train.py)."""
    from rvdd_tpu.models.factory import init_network

    if opt.distributed:
        # multi-host: one process per host, mesh spans all slices; intra-
        # slice collectives ride ICI, cross-slice DP rides DCN
        jax.distributed.initialize()

    if opt.exact_precision:
        from rvdd_tpu.precision import use_exact_precision

        use_exact_precision()
    if opt.train_matmul_precision != "highest":
        # 'high' = 3-pass bf16 decomposition, the TF32-accumulation class
        # the reference trains under on Ampere GPUs; 'default' = 1-pass
        # bf16.  Process-wide (covers in-loop validation too); the
        # validate CLI is a separate process and stays exact.
        jax.config.update(
            "jax_default_matmul_precision", opt.train_matmul_precision
        )

    from rvdd_tpu.config import setup_compilation_cache

    setup_compilation_cache(opt.compilation_cache_dir)

    # training differentiates through the warp -> pick a differentiable
    # impl ('shift' on TPU, 'xla' on CPU; never the forward-only Pallas
    # kernel the inference side resolves to)
    import dataclasses as _dc

    cfg = _dc.replace(
        opt.engine_config(), warp_impl=opt.resolve_train_warp_impl()
    )
    save_dir = opt.save_dir
    log = Logger(save_dir)
    opt.save(join(save_dir, "opt_train.json"))
    log.line(opt.dump())

    cache = None
    if not opt.no_warp:
        cache = FlowCache(
            opt.dataroot, opt.nFolder, opt.flowFolder, opt.warp_method,
            persist=opt.persist_flows,
        )
    from rvdd_tpu.registry import get_dataset

    train_ds = get_dataset(opt.dataset_mode)(
        opt.dataroot,
        opt.gt_folder_for_mode(),
        opt.nFolder,
        patch_width=opt.patch_width,
        patch_stride=opt.patch_stride,
        patch_depth=opt.patch_depth,
        model_patch_depth=opt.model_patch_depth,
        future_patch_depth=opt.future_patch_depth,
        frames2load=opt.frames2load,
        bit_depth=opt.bit_depth,
        raw_gt=opt.raw_gt,
        no_predemosaic=opt.no_predemosaic,
        videos=opt.videos,
        flow_cache=cache,
        no_warp=opt.no_warp,
        seed=opt.seed,
    )
    log.line(f"The number of training images = {len(train_ds)}")
    val_ds = None if opt.no_val else build_validation(opt)
    if val_ds is not None:
        log.line(f"Number of validation images = {len(val_ds)}")

    net = build_network(opt.netDenoiser, cfg.network_input_nc, opt.output_nc, cfg.feature_rec)
    pw = opt.patch_width * (1 if opt.no_predemosaic else 2)
    params = init_network(
        net, jax.random.PRNGKey(opt.seed), (1, pw, pw, cfg.network_input_nc), opt.init_type
    )
    if opt.path2epoch:
        params, _ = load_checkpoint(
            opt.path2epoch, None, params, net=net,
            example_shape=(1, pw, pw, cfg.network_input_nc),
        )
        log.line(f"loaded weights from {opt.path2epoch}")

    state, tx = create_train_state(params, opt.optimizer, opt.beta1, opt.weight_decay)

    mesh = make_mesh(opt.mesh_shape, batch_size=opt.batch_size)
    state = TrainState(
        replicate(mesh, state.params), replicate(mesh, state.opt_state), state.step
    )
    train_step = make_train_step(cfg, net, tx)

    # autoresume (reference: train.py:15-28); unlike the reference we also
    # restore optimizer state
    epoch_start = 1
    status = load_status(save_dir)
    if opt.autoresume and status:
        e = str(status["epoch"])
        p, o = load_checkpoint(save_dir, e, state.params, state.opt_state)
        state = TrainState(replicate(mesh, p), replicate(mesh, o or state.opt_state), state.step)
        epoch_start = status["epoch"] + 1
        log.line(f"autoresumed from epoch {status['epoch']}")
    else:
        save_checkpoint(save_dir, "0", state.params)

    best_val = float(status.get("best_val", "inf")) if status else float("inf")
    td = opt.patch_depth - 1
    total_iters = 0
    val_image_dir = join(save_dir, "val_visuals")
    # plateau policy state (reference: networks/__init__.py:39-46)
    plateau_factor, plateau_best, plateau_wait = 1.0, float("inf"), 0

    for epoch in range(epoch_start, opt.niter + opt.niter_decay + 1):
        if opt.lr_policy == "plateau":
            lr = opt.lr * plateau_factor
        else:
            lr = lr_for_epoch(
                epoch, opt.lr, opt.lr_policy, opt.niter, opt.niter_decay, opt.lr_decay_iters
            )
        state = set_learning_rate(state, lr)
        epoch_t0 = time.time()
        epoch_len = max(len(train_ds) // opt.batch_size, 1)
        data_t0 = time.time()
        for it, batch in enumerate(train_ds.batches(opt.batch_size)):
            t_data = time.time() - data_t0
            unrollings = active_unrollings(opt.unroll_focus, td, epoch)
            w = unroll_weights(opt.unroll_focus, td, epoch, it, epoch_len)
            frames, flows = prepare_host_batch(cfg, batch)
            sharded = shard_batch(
                mesh,
                {
                    "frames": frames,
                    **({"flows": flows} if flows is not None else {}),
                    "gt": batch["gt"],
                },
                # shard patch height over the 'space' axis when the mesh has
                # one (H is axis -3 in every batch tensor; conv halo
                # exchanges are inserted by XLA under jit)
                spatial_axis=(
                    -3 if dict(mesh.shape).get("space", 1) > 1 else None
                ),
            )
            # optional profiler capture of steps 2..5 of the first epoch
            if opt.profile_dir and epoch == epoch_start and it == 2:
                jax.profiler.start_trace(opt.profile_dir)
            t0 = time.time()
            state, losses = train_step(
                state,
                sharded["frames"],
                sharded.get("flows"),
                sharded["gt"],
                jnp.asarray(w),
            )
            if opt.profile_dir and epoch == epoch_start and it == 5:
                jax.block_until_ready(losses)
                jax.profiler.stop_trace()
            total_iters += opt.batch_size
            if total_iters % opt.print_freq < opt.batch_size:
                jax.block_until_ready(losses)
                t_comp = (time.time() - t0) / opt.batch_size
                msg = f"(epoch: {epoch}, iters: {total_iters}, time: {t_comp:.3f}, data: {t_data:.3f}) "
                msg += " ".join(f"{k}: {float(v):.3f}" for k, v in losses.items())
                log.line(msg)
                if float(losses.get("warp_clamp", 0.0)) > 0.0:
                    log.line(
                        f"WARNING: shift-warp clamped "
                        f"{100 * float(losses['warp_clamp']):.2f}% of warped"
                        " pixels this step — flows exceed the sweep radius;"
                        " raise --shift_warp_radius or switch"
                        " --warp_impl xla (ops/warp_shift.py:26-31)"
                    )
            data_t0 = time.time()

        if epoch % opt.save_epoch_freq == 0:
            save_checkpoint(save_dir, "latest", state.params, state.opt_state)
            save_checkpoint(save_dir, str(epoch), state.params, state.opt_state)
            save_status(save_dir, {"epoch": epoch, "best_val": best_val})

        if val_ds is not None and epoch % opt.val_epoch_freq == 0:
            v0 = time.time()
            val_losses = compute_validation(
                opt, net, state.params, val_ds, val_image_dir,
                # the reference validates non-recurrently while the gradual
                # schedule still trains with 1 unrolling
                # (recurrent_model.py:233-238,255-264)
                carry_state=active_unrollings(opt.unroll_focus, td, epoch) > 1,
            )
            val_losses["lr"] = lr
            msg = f"---> validation: (epoch: {epoch}, time: {time.time()-v0:.1f}, #data: {len(val_ds)}) ["
            msg += ", ".join(f"{k}: {v:.3f}" for k, v in val_losses.items()) + "]"
            log.line(msg)
            if val_losses["Denoiser_valLoss"] < best_val:
                best_val = val_losses["Denoiser_valLoss"]
                save_checkpoint(save_dir, "latest_val", state.params, state.opt_state)
                save_status(save_dir, {"epoch": epoch, "best_val": best_val})

            if opt.lr_policy == "plateau":
                v = val_losses["Denoiser_valLoss"]
                if v < plateau_best * (1.0 - 0.01):
                    plateau_best, plateau_wait = v, 0
                else:
                    plateau_wait += 1
                    if plateau_wait > 5:
                        plateau_factor *= 0.2
                        plateau_wait = 0
                        log.line(f"plateau: lr factor -> {plateau_factor:.3e}")

        train_ds.prepare_epoch()
        log.line(
            f"End of epoch {epoch} / {opt.niter + opt.niter_decay} \t"
            f" Time Taken: {int(time.time() - epoch_t0)} sec (lr {lr:.7f})"
        )


def prepare_host_batch(cfg: EngineConfig, batch: Dict[str, np.ndarray]):
    """Host-side packaging; the heavy prepare (demosaic, flow upsample) runs
    on device inside the train step via prepare_frames."""
    frames = jnp.asarray(batch["n"])
    flows = jnp.asarray(batch["flow"]) if "flow" in batch else None
    return frames, flows
