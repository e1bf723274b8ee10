"""Recurrent denoising engine: the framework's heart.

Functional re-design of the reference recurrentModel (reference:
models/recurrent_model.py:38-538).  The recurrence state is an explicit
pytree carried by the caller (or by ``lax.scan`` in streaming inference)
instead of mutable attributes + forward hooks:

    state = init_state(cfg, noisy_frames)       # from the first frames
    outs, state = unrolled_forward(...)          # training (TD unrollings)
    den, state = inference_step(...)             # one frame at a time
    dens = scan_video(...)                       # whole clip, O(1) memory

Layouts: frames are stacked on a leading time axis ([B, T, H, W, C]) rather
than channel-concatenated; flows are [B, TD, D+fD, H, W, 2].

Recurrence modes (reference README feature matrix, SURVEY §2.3):
* non-recurrent (patch_depth == model_patch_depth -> 1 unrolling)
* frame recurrent (carry denoised frames)
* frame + feature recurrent (carry the 48-ch feature map too)
* optional future frame(s), optional no-warp / raw-warp / prev-noisy
  ablations, raw-domain ground truth.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rvdd_tpu.ops.bayer import remosaic
from rvdd_tpu.ops.demosaic import hamilton_adams, hamilton_adams_planar
from rvdd_tpu.ops.metrics import psnr
from rvdd_tpu.ops.warp import warp, flow_upsample_2x


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Static configuration of the recurrence (hashable; jit-friendly)."""

    model_patch_depth: int = 2  # D+1: prev frames + current
    patch_depth: int = 5  # frames per training sample
    future_patch_depth: int = 0  # fD
    input_nc: int = 3  # per-frame channels the net sees (3 RGB / 4 raw)
    output_nc: int = 3
    no_warp: bool = False
    no_predemosaic: bool = False
    warp_raw: bool = False
    prev_noisy_frame: bool = False
    feature_rec: bool = False
    raw_gt: bool = False
    lambda_l1: float = 100.0
    #: 'xla' (differentiable, any backend), 'shift' (differentiable,
    #: displacement-banded — the TPU training path: the XLA warp's
    #: backward is a per-pixel scatter that XLA:TPU serializes), or
    #: 'pallas' (TPU inference kernel, ~x3-50 faster at full-frame sizes)
    warp_impl: str = "xla"
    #: dtype of the carried recurrence state ('float32' | 'bfloat16');
    #: bfloat16 halves warp traffic in the fast inference mode
    state_dtype: str = "float32"
    #: 'xla' (flax apply, any backend) or 'fused' (Pallas fused conv-chain
    #: forward for supported ConvUNet configs, TPU inference fast path)
    net_impl: str = "xla"
    #: fused-path numerics preset (models/fast_unet.py:FUSED_PRECISIONS):
    #: 'fast' (bf16 storage, 1-pass MXU dots), 'mixed' (fp32 storage,
    #: manual 3-pass bf16_3x dots — the feat-future parity preset),
    #: 'accurate' (fp32 storage, 6-pass HIGHEST dots, exact).  Must be a
    #: concrete preset name here; 'auto' is resolved by the Options layer
    #: (config.resolve_fused_precision / fast_unet.resolve_fused_precision).
    fused_precision: str = "fast"
    #: residual radius of the 'shift' warp's banded sweep (pixels each
    #: side of the band/global mean; taps beyond it clamp to the window
    #: edge).  8 is conservative for TV-L1 video flows; 5 trades ~2x less
    #: warp work for clamping only on pathological fields.
    shift_warp_radius: int = 8
    #: rematerialize each unrolling in the training backward
    #: (jax.checkpoint around `step`): exact same gradients, activation
    #: memory drops from O(unrollings * net) to O(net) at ~1 extra
    #: forward per unrolling.  Required for the ConvNeXt flagship's
    #: production train config on a 16 GB chip (the 4-unrolling backward
    #: holds ~4x24 block activations otherwise).
    remat: bool = False

    @property
    def d(self) -> int:  # number of previous frames fed to the net
        return self.model_patch_depth - 1

    @property
    def train_unrollings(self) -> int:
        return self.patch_depth - self.model_patch_depth + 1

    @property
    def network_input_nc(self) -> int:
        return (self.model_patch_depth + self.future_patch_depth) * self.input_nc

    @property
    def gt_nc(self) -> int:
        return 4 if (self.raw_gt and not self.no_predemosaic) else self.input_nc


class RecurrentState(NamedTuple):
    """Carried across frames: ring buffer of D previous (denoised) frames and
    (optionally) D warped feature maps."""

    lastden: jnp.ndarray  # [B, D, H, W, C]
    feat: Optional[jnp.ndarray]  # [B, D, H, W, F] or None


def prepare_frames(cfg: EngineConfig, raw_frames: jnp.ndarray, flows: Optional[jnp.ndarray]):
    """Model-input preprocessing (reference: recurrent_model.py:105-135).

    raw_frames: [B, T, h, w, 4] packed raw in [-1, 1].
    flows:      [B, TD, D+fD, h, w, 2] or None.
    Returns (frames, flows) in the domain the net consumes: demosaicked
    full-res RGB with x2-scaled flows unless no_predemosaic.
    """
    if cfg.no_predemosaic:
        return raw_frames, flows
    b, t, h, w, _ = raw_frames.shape
    # per-frame (not batched over T): inference steps with carried state
    # never read frames[:, :d], and XLA can only dead-code-eliminate the
    # unused demosaics when they are separate ops (concat+slice simplifies
    # to the used operand; half a batched op cannot be DCE'd)
    if cfg.net_impl == "fused" and not cfg.warp_raw:
        # fused inference consumes row-major planar frames; the
        # phase-resolved demosaic emits them directly (bit-identical to
        # hamilton_adams, ~2x less traffic, no pack/transpose copies).
        # Unpadded (lanes = 2w) so the image width stays recoverable from
        # the shape; the consumers' lane pad to WL is one fused op.
        rgb = jnp.stack(
            [hamilton_adams_planar(raw_frames[:, i]) for i in range(t)],
            axis=1,
        )  # [B, T, 2h, 3, 2w]
    else:
        rgb = jnp.stack(
            [hamilton_adams(raw_frames[:, i]) for i in range(t)], axis=1
        )
    if flows is not None and not cfg.warp_raw:
        bt, td, dd, fh, fw, _ = flows.shape
        flows = flow_upsample_2x(flows.reshape(bt * td * dd, fh, fw, 2))
        flows = flows.reshape(bt, td, dd, 2 * fh, 2 * fw, 2)
    return rgb, flows


def _warp(cfg: EngineConfig, x: jnp.ndarray, flow: jnp.ndarray):
    if cfg.warp_impl == "pallas":
        from rvdd_tpu.ops.pallas.warp_pallas import warp_bicubic_pallas

        return warp_bicubic_pallas(x, flow)[0]
    if cfg.warp_impl == "shift":
        # training path on TPU: same numerics, scatter-free backward
        from rvdd_tpu.ops.warp_shift import warp_shift

        r = cfg.shift_warp_radius
        return warp_shift(x, flow, radius_v=r, radius_h=r)[0]
    return warp(x, flow, "bicubic")[0]


def _warp_frame(cfg: EngineConfig, frame: jnp.ndarray, flow: Optional[jnp.ndarray]):
    """Warp one frame to the current time (reference:
    recurrent_model.py:137-159)."""
    if cfg.no_warp or flow is None:
        return frame
    if (not cfg.no_predemosaic) and cfg.warp_raw:
        raw = remosaic(frame)
        return hamilton_adams(_warp(cfg, raw, flow))
    return _warp(cfg, frame, flow)


def _planar_wl(w: int) -> int:
    # the fused net's three resolution levels share one lane schedule
    return -(-(w + 1) // 512) * 512


def _is_planar_frame(x: jnp.ndarray) -> bool:
    """[H, C<=4, WL>=8] planar vs [H, W>=8, C<=4] NHWC (trailing dims)."""
    return x.shape[-1] >= 8 and x.shape[-2] <= 4


def _frame_to_planar(x: jnp.ndarray, wl: int, c_to: int, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[H, W, C] (NHWC) or [H, C, WL] (planar) -> [H, c_to, WL]."""
    if _is_planar_frame(x):
        h, c, w0 = x.shape
        p = jnp.pad(x, ((0, 0), (0, c_to - c), (0, wl - w0)))
        return p.astype(dtype)
    h, w, c = x.shape
    p = jnp.transpose(x, (0, 2, 1))
    p = jnp.pad(p, ((0, 0), (0, c_to - c), (0, wl - w)))
    return p.astype(dtype)


def _edge_pad_planar(x3: jnp.ndarray, w: int) -> jnp.ndarray:
    """[..., C, WL] -> [..., C, WL + STATE_LANE_EXTRA] with edge-replicated
    margins (the pre-padded layout the warp kernel consumes directly)."""
    from rvdd_tpu.ops.pallas.warp_rowmajor import (
        STATE_LANE_EXTRA,
        STATE_PAD_LEFT,
    )

    wl = x3.shape[-1]
    lt = wl + STATE_LANE_EXTRA
    left = jnp.broadcast_to(x3[..., :1], x3.shape[:-1] + (STATE_PAD_LEFT,))
    right = jnp.broadcast_to(
        x3[..., w - 1 : w], x3.shape[:-1] + (lt - STATE_PAD_LEFT - w,)
    )
    return jnp.concatenate([left, x3[..., :w], right], axis=-1)


def _fused_state_c(cfg: EngineConfig) -> int:
    # fused planar state row-block: [den 3 | pad 5 | feat 48?]
    return 8 + (48 if cfg.feature_rec else 0)


def _fused_band_dtype(cfg: EngineConfig):
    from rvdd_tpu.models.fast_unet import get_fused_precision, glue_dtype

    return glue_dtype(get_fused_precision(cfg.fused_precision))


def _fused_state_dtype(cfg: EngineConfig):
    """Recurrence-carry storage.  bf16 carry rounding feeds back through
    the recurrence and accumulates over a clip (drift); float32 (the
    default) writes the carry rounding-free (fast_forward_planar runs the
    state-emitting chain with fp32 bands) for ~2% extra HBM traffic."""
    if cfg.state_dtype == "float32":
        return jnp.float32
    return _fused_band_dtype(cfg)


def _init_state_planar(cfg: EngineConfig, frames: jnp.ndarray) -> RecurrentState:
    f0 = frames[:, 0]
    if _is_planar_frame(f0[0]):
        b, h, _, w = f0.shape
    else:
        b, h, w, _ = f0.shape
    wl = _planar_wl(w)
    cf = _fused_state_c(cfg)
    bd = _fused_state_dtype(cfg)
    prev = jax.vmap(lambda f: _frame_to_planar(f, wl, cf, bd))(f0)
    prev = _edge_pad_planar(prev, w)  # pre-padded state lane layout
    return RecurrentState(prev.reshape(b, h * cf, prev.shape[-1]), None)


def init_state(cfg: EngineConfig, frames: jnp.ndarray, nil_feat=None) -> RecurrentState:
    """Initial recurrence: previous noisy frames, zero features
    (reference: recurrent_model.py:233-245)."""
    if cfg.net_impl == "fused":
        if cfg.d != 1:
            raise NotImplementedError("net_impl='fused' requires model_patch_depth=2")
        return _init_state_planar(cfg, frames)
    sd = jnp.bfloat16 if cfg.state_dtype == "bfloat16" else jnp.float32
    lastden = frames[:, : cfg.d].astype(sd)
    feat = None
    if cfg.feature_rec:
        if nil_feat is None:
            raise ValueError("feature_rec requires nil_feat [B, H, W, F]")
        feat = jnp.broadcast_to(
            nil_feat[:, None].astype(sd),
            (nil_feat.shape[0], cfg.d, *nil_feat.shape[1:]),
        )
    return RecurrentState(lastden, feat)


def step(
    cfg: EngineConfig,
    net,
    params,
    state: RecurrentState,
    cur: jnp.ndarray,  # [B, H, W, C] current noisy frame
    future: Optional[jnp.ndarray],  # [B, fD, H, W, C] future noisy frames
    flows: Optional[jnp.ndarray],  # [B, D+fD, H, W, 2] flows to current time
    packed=None,  # fused path: pre-packed params (fused_pack), else packed here
) -> Tuple[jnp.ndarray, RecurrentState]:
    """One denoising step (= one unrolling).

    Returns (denoised [B, H, W, C_out], next state).
    """
    if cfg.net_impl == "fused":
        return _fast_planar_step(cfg, net, params, state, cur, future, flows, packed)
    d = cfg.d
    sd = jnp.bfloat16 if cfg.state_dtype == "bfloat16" else jnp.float32
    cur = cur.astype(sd)
    inputs = []
    feat_parts = []
    fuse = (
        cfg.feature_rec
        and not cfg.no_warp
        and not cfg.warp_raw
        and cfg.warp_impl in ("pallas", "shift")
    )
    for b in range(d):
        fl = flows[:, b] if flows is not None else None
        if fuse:
            # one kernel launch warps the previous frame and its feature
            # map together (same flow) — saves a tile sweep per step
            c = state.lastden.shape[-1]
            both = jnp.concatenate([state.lastden[:, b], state.feat[:, b]], axis=-1)
            warped = _warp(cfg, both, fl)
            inputs.append(warped[..., :c])
            feat_parts.append(warped[..., c:])
            continue
        inputs.append(_warp_frame(cfg, state.lastden[:, b], fl))
        if cfg.feature_rec and not cfg.no_warp:
            feat_parts.append(_warp(cfg, state.feat[:, b], fl))
        elif cfg.feature_rec:
            feat_parts.append(state.feat[:, b])
    inputs.append(cur)
    for b in range(cfg.future_patch_depth):
        fl = flows[:, d + b] if flows is not None else None
        inputs.append(_warp_frame(cfg, future[:, b].astype(sd), fl))

    netinput = jnp.concatenate(inputs, axis=-1)
    feat_in = jnp.concatenate(feat_parts, axis=-1) if cfg.feature_rec else None
    denoised, new_feat = net.apply({"params": params}, netinput, feat_in)

    # the --prev_noisy_frame ablation stores the current *noisy* frame
    # instead of the denoised one (reference: recurrent_model.py:335-336)
    store = (cur if cfg.prev_noisy_frame else denoised).astype(sd)
    lastden = jnp.concatenate([state.lastden[:, 1:], store[:, None]], axis=1)
    feat = None
    if cfg.feature_rec:
        feat = jnp.concatenate(
            [state.feat[:, 1:], new_feat.astype(sd)[:, None]], axis=1
        )
    return denoised, RecurrentState(lastden, feat)


def _fused_impl(net):
    """(fast_forward_planar, pack_fast_params, supports_fast_path) for net."""
    from rvdd_tpu.models.convnext_unet import ConvNeXtUNet

    if isinstance(net, ConvNeXtUNet):
        from rvdd_tpu.models.fast_convnext import (
            fast_forward_planar_cnx,
            pack_fast_cnx,
            supports_fast_path_cnx,
        )

        return fast_forward_planar_cnx, pack_fast_cnx, supports_fast_path_cnx
    from rvdd_tpu.models.fast_unet import (
        fast_forward_planar,
        pack_fast_params,
        supports_fast_path,
    )

    return fast_forward_planar, pack_fast_params, supports_fast_path


def fused_pack(cfg: EngineConfig, net, params):
    """One-time weight repack for the fused path; pass the result to
    step/inference_step/scan_video so the repack isn't re-traced per step."""
    _, pack, _ = _fused_impl(net)
    return pack(params, cfg.feature_rec, cfg.network_input_nc)


def _fast_planar_step(
    cfg: EngineConfig,
    net,
    params,
    state: RecurrentState,
    cur: jnp.ndarray,  # [B, H, W, 3]
    future,  # [B, fD, H, W, 3] or None
    flows,  # [B, D+fD, H, W, 2] or None
    packed=None,
) -> Tuple[jnp.ndarray, RecurrentState]:
    """TPU fast path: the whole step stays in row-major planar layout —
    the fused recurrence state ([den | pad | feat] channel blocks) is warped
    by the row-major Pallas kernel and feeds the fused-conv-chain net
    directly; only the 3-channel current frame and output cross layouts.
    Semantics match the generic step (bf16 fast-inference tolerance)."""
    from rvdd_tpu.models.fast_unet import from_planar
    from rvdd_tpu.ops.pallas.warp_rowmajor import warp_planar_pallas

    if cfg.d != 1 or cfg.warp_raw or cfg.no_predemosaic or cfg.output_nc != 3:
        raise NotImplementedError(
            "net_impl='fused' supports model_patch_depth=2, RGB pre-demosaic,"
            " frame-domain warping, output_nc=3"
        )
    if _is_planar_frame(cur[0]):
        b, h, _, w = cur.shape  # planar [B, H, 3, 2w]
    else:
        b, h, w, _ = cur.shape
    fast_forward_planar, pack_fast_params, supports_fast_path = _fused_impl(net)
    if not supports_fast_path(net, h, w):
        raise ValueError(
            f"net_impl='fused': no fast path for {type(net).__name__} at {h}x{w}"
        )
    wl = _planar_wl(w)
    cf = _fused_state_c(cfg)
    bd = _fused_band_dtype(cfg)
    sd = _fused_state_dtype(cfg)
    in_nc = cfg.network_input_nc
    in_pad = -(-in_nc // 8) * 8
    if packed is None:
        packed = pack_fast_params(params, cfg.feature_rec, in_nc)

    from rvdd_tpu.ops.pallas.warp_rowmajor import STATE_PAD_LEFT

    dens = []
    fused_next = []
    for bi in range(b):
        # state is pre-padded [(H*cf), WL + STATE_LANE_EXTRA] with
        # edge-replicated lane margins (written by the dec2 kernel emit)
        fused = state.lastden[bi]
        if cfg.no_warp or flows is None:
            # slice the image region back out and re-zero the pad lanes
            # (the chains assume zeros beyond the image width)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 1, wl), 2)
            warped = (
                fused.reshape(h, cf, -1)[:, :, STATE_PAD_LEFT:STATE_PAD_LEFT + wl]
                * (lanes < w).astype(bd)
            ).reshape(h * cf, wl)
        elif cfg.warp_impl == "xla":
            # diagnostic/exactness path: XLA bicubic warp of the planar
            # state (isolates the Pallas warp kernel's band/clamp
            # approximations from the conv chains in quality attribution)
            from rvdd_tpu.ops.warp import warp as warp_xla

            img = jnp.transpose(
                fused.reshape(h, cf, -1)[:, :, STATE_PAD_LEFT:STATE_PAD_LEFT + w],
                (0, 2, 1),
            )
            wimg = warp_xla(img[None], flows[bi, None, 0], "bicubic")[0][0]
            warped = jnp.pad(
                jnp.transpose(wimg, (0, 2, 1)), ((0, 0), (0, 0), (0, wl - w))
            ).astype(bd).reshape(h * cf, wl)
        else:
            # the window rounds to the band dtype the net consumes anyway:
            # the fp32 carry stays rounding-free in HBM for the recurrence
            # feedback, and the warp runs at bf16-window speed (the fp32
            # window costs +5.6 ms/frame at 1080p for no extra precision in
            # what reaches the conv chains)
            warped = warp_planar_pallas(
                fused, flows[bi, 0], h_img=h, w_img=w, out_dtype=bd,
                prepadded=True, win_dtype=bd,
            )
        w3 = warped.reshape(h, cf, wl)
        curp = _frame_to_planar(cur[bi], wl, 3, bd)
        parts = [w3[:, :3], curp]
        for k in range(cfg.future_patch_depth):
            fp = _frame_to_planar(future[bi, k], wl, 8, bd)
            if not cfg.no_warp and flows is not None:
                fp = warp_planar_pallas(
                    fp.reshape(h * 8, wl), flows[bi, 1 + k], h_img=h, w_img=w,
                    out_dtype=bd,
                ).reshape(h, 8, wl)
            parts.append(fp[:, :3])
        if in_pad > in_nc:
            parts.append(jnp.zeros((h, in_pad - in_nc, wl), bd))
        xp = jnp.concatenate(parts, axis=1).reshape(h * in_pad, wl)

        aux = warped if cfg.feature_rec else None
        # the net writes the next recurrence state [den 3 | pad 5 | feat 48?]
        # directly (combined kernel emit) — no post-step state concat
        state3, _ = fast_forward_planar(
            net, packed, xp, aux, h, w,
            aux_channels=(8, 48) if cfg.feature_rec else None,
            precision=cfg.fused_precision,
            combine_state=True,
            state_dtype=sd,
        )
        # state3: [H, cf, WL + STATE_LANE_EXTRA], image at STATE_PAD_LEFT
        den = jnp.transpose(
            state3[:, :3, STATE_PAD_LEFT : STATE_PAD_LEFT + w], (0, 2, 1)
        )
        dens.append(den.astype(jnp.float32))

        if cfg.prev_noisy_frame:
            # ablation: carry the noisy current frame instead of the output
            blocks = [curp.astype(sd), jnp.zeros((h, 5, wl), sd)]
            if cfg.feature_rec:
                blocks.append(
                    state3[:, 8:, STATE_PAD_LEFT : STATE_PAD_LEFT + wl]
                    .astype(sd)
                )
            nxt = _edge_pad_planar(jnp.concatenate(blocks, axis=1), w)
            fused_next.append(nxt.reshape(h * cf, -1).astype(sd))
        else:
            fused_next.append(state3.reshape(h * cf, -1).astype(sd))

    return jnp.stack(dens), RecurrentState(jnp.stack(fused_next), None)


def unrolled_forward(
    cfg: EngineConfig,
    net,
    params,
    frames: jnp.ndarray,  # [B, T, H, W, C] prepared (demosaicked) noisy frames
    flows: Optional[jnp.ndarray],  # [B, TD, D+fD, H, W, 2] prepared flows
    unrollings: int,
    nil_feat=None,
) -> jnp.ndarray:
    """Training forward: run ``unrollings`` steps, return all outputs
    [B, TD_active, H, W, C_out] (reference: recurrent_model.py:161-349)."""
    d = cfg.d
    state = init_state(cfg, frames, nil_feat)
    packed = fused_pack(cfg, net, params) if cfg.net_impl == "fused" else None
    if cfg.remat:
        step_fn = jax.checkpoint(
            lambda params, state, cur, future, fl: step(
                cfg, net, params, state, cur, future, fl, packed
            )
        )
    outs = []
    for a in range(unrollings):
        cur = frames[:, a + d]
        future = (
            frames[:, a + d + 1 : a + d + 1 + cfg.future_patch_depth]
            if cfg.future_patch_depth
            else None
        )
        fl = flows[:, a] if flows is not None else None
        if cfg.remat:
            den, state = step_fn(params, state, cur, future, fl)
        else:
            den, state = step(cfg, net, params, state, cur, future, fl, packed)
        outs.append(den)
    return jnp.stack(outs, axis=1)


def inference_step(
    cfg: EngineConfig,
    net,
    params,
    state: Optional[RecurrentState],
    frames: jnp.ndarray,  # [B, D+1+fD, H, W, C] window ending at current frame
    flows: Optional[jnp.ndarray],  # [B, D+fD, H, W, 2]
    nil_feat=None,
    packed=None,
) -> Tuple[jnp.ndarray, RecurrentState]:
    """Single-frame inference with carried state.

    Pass ``state=None`` on the first frame of a video (recurrence resets to
    the noisy previous frames; reference: recurrent_model.py:233-245 and the
    FirstOfVideo flag at validate.py:76-77).
    """
    d = cfg.d
    if state is None:
        state = init_state(cfg, frames, nil_feat)
    cur = frames[:, d]
    future = frames[:, d + 1 :] if cfg.future_patch_depth else None
    return step(cfg, net, params, state, cur, future, flows, packed)


def scan_video(
    cfg: EngineConfig,
    net,
    params,
    frames: jnp.ndarray,  # [T, B, H, W, C] prepared frames of one clip
    flows: Optional[jnp.ndarray],  # [T, B, D+fD, H, W, 2] flows to each frame
    nil_feat=None,
) -> jnp.ndarray:
    """Stream a whole clip under one jit with O(1) state (lax.scan over
    time).  Frame t uses the window [t-D, t+fD] clamped at the clip edges;
    the first D frames reuse the reference's missing-flow = zero-flow rule
    (reference: data/infer4rec_dataset.py:198-200).
    """
    t_total = frames.shape[0]
    d, fd = cfg.d, cfg.future_patch_depth
    # pack fused weights once OUTSIDE the scan body (the repack must not
    # rely on XLA loop-invariant code motion to stay out of the loop)
    packed = fused_pack(cfg, net, params) if cfg.net_impl == "fused" else None

    # pad so every frame has a full window: replicate first/last frames,
    # zero flows at the edges (= reference behaviour for missing flows).
    # The window is sliced INSIDE the scan body (dynamic_slice on the
    # padded clip), so peak memory is O(clip + one window), not
    # (D+1+fD) x clip as a materialized windows stack would be.
    win_t = d + 1 + fd
    pad_front = jnp.repeat(frames[:1], d, axis=0)
    pad_back = jnp.repeat(frames[-1:], fd, axis=0) if fd else frames[:0]
    padded = jnp.concatenate([pad_front, frames, pad_back], axis=0)

    state0 = init_state(cfg, jnp.swapaxes(padded[:win_t], 0, 1), nil_feat)

    def body(state, inp):
        t, fl = inp
        win = jax.lax.dynamic_slice_in_dim(padded, t, win_t, axis=0)
        win = jnp.swapaxes(win, 0, 1)  # [B, D+1+fD, ...]
        den, state = inference_step(
            cfg, net, params, state, win, fl, nil_feat, packed
        )
        return state, den

    ts = jnp.arange(t_total, dtype=jnp.int32)
    if flows is None:
        _, dens = jax.lax.scan(lambda s, t: body(s, (t, None)), state0, ts)
    else:
        _, dens = jax.lax.scan(body, state0, (ts, flows))
    return dens  # [T, B, H, W, C_out]


def compute_window_flows(cfg: EngineConfig, raw_window: jnp.ndarray, flow_params=None):
    """On-device TV-L1 flows for one inference window (no disk cache).

    raw_window: [B, D+1+fD, h, w, 4] packed raw (any affine range — the
    solver normalizes jointly).  Returns [B, D+fD, h, w, 2] flows to the
    current frame, matching the offline cache's convention
    (reference: data/base_dataset.py:134-249).  The reference cannot do
    this: its flow lives in an offline CPU precompute.
    """
    from rvdd_tpu.ops.tvl1 import TVL1Params, to_gray, tvl1_flow

    params = flow_params or TVL1Params()
    d, fd = cfg.d, cfg.future_patch_depth
    b = raw_window.shape[0]
    gray = to_gray(raw_window.reshape((-1,) + raw_window.shape[2:]))
    gray = gray.reshape(raw_window.shape[:2] + gray.shape[1:])

    outs = []
    for bi in range(b):
        cur = gray[bi, d]
        per = [tvl1_flow(cur, gray[bi, k], params) for k in range(d)]
        per += [tvl1_flow(cur, gray[bi, d + 1 + k], params) for k in range(fd)]
        outs.append(jnp.stack(per))
    return jnp.stack(outs)


def compute_losses(
    cfg: EngineConfig,
    outputs: jnp.ndarray,  # [B, A, H, W, C_out] unrolling outputs
    gt: jnp.ndarray,  # [B, T, H', W', C_gt]
    weights: jnp.ndarray,  # [A] unrolling loss weights
):
    """Weighted L1 + PSNR over unrolling outputs (reference:
    recurrent_model.py:473-510)."""
    d = cfg.d
    a_total = outputs.shape[1]
    l1s = []
    psnrs = []
    for a in range(a_total):
        den = outputs[:, a]
        target = gt[:, a + d]
        if cfg.raw_gt and not cfg.no_predemosaic:
            den = remosaic(den)
        l1s.append(jnp.mean(jnp.abs(den - target)) * cfg.lambda_l1)
        psnrs.append(psnr(den, target, 2.0))
    loss_l1 = jnp.sum(weights * jnp.stack(l1s))
    loss_psnr = jnp.sum(weights * jnp.stack(psnrs))
    return {"L1": loss_l1, "PSNR": loss_psnr, "Denoiser": loss_l1}
