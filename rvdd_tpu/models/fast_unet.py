"""TPU fast-path forward for ConvUNet: fused Pallas conv chains + planar glue.

Equivalent to ``ConvUNet.apply`` for the released configurations
(fixed_features, depth=4, convmax down, bilinear up, relu, no norm) but
~4x faster at 1080p: the full- and half-resolution levels run as fused
Pallas conv-chain kernels (ops/pallas/conv_pallas.py) on row-major planar
``[(H*C), WL]`` activations, the cheap quarter/eighth-resolution middle runs
in XLA, and pool/upsample/pad glue stays planar (no NHWC round trips).

Numerics: bf16 convs (fast inference mode), exact zero-padding and
align_corners=False bilinear semantics incl. edge replication — parity with
the XLA path is tested to bf16 tolerance in tests/test_fast_unet.py.

Replaces (functionally): reference networks/unet.py UNet_FixedFeatures(+feat)
forward (reference: networks/unet.py:595-825) on the inference fast path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from rvdd_tpu.models.unet import ConvUNet
from rvdd_tpu.ops.pallas.conv_pallas import (
    fused_conv_chain,
    lane_width,
    pack_weight,
)

#: fused-path numerics presets: band storage dtype, MXU passes, GELU flavor
#: (gelu_exact only affects the ConvNeXt kernel).  'fast' is the bf16
#: throughput mode; 'accurate' stores fp32 bands and runs 3-pass MXU dots
#: (~fp32) for reference-parity outputs at reduced speed; 'mixed' keeps
#: 1-pass bf16 dots but removes every storage/glue rounding.
#:
#: weight_dtype selects the weight representation per chain/layer:
#: None = band dtype; 'split' = w_hi + w_lo bf16 pair contracted in two
#: 1-pass MXU dots (rounding-free weights, 2x MXU on that layer); a dict
#: maps chain name -> value, a tuple gives per-layer values.  Error
#: attribution on the realistic-regime val set (tools/fused_quality.py
#: --interpret, textured ~41 dB set) showed the output chain's last two
#: layers carry ~2/3 of the fused-path error power: splitting just
#: [post0, head] moves convunet+feat from -0.100 dB to -0.037 dB for
#: ~10% extra MXU work on one of six chains.
FUSED_PRECISIONS = {
    "fast": dict(
        band_dtype=jnp.bfloat16, mxu_precision="default", gelu_exact=False,
        weight_dtype={"dec2": (None, None, None, "split", "split")},
    ),
    # fp32 band/weight storage contracted with 3-pass bf16_3x dots
    # (Precision.HIGH): ~fp32 operand fidelity at 3 MXU passes vs
    # HIGHEST's 6.  (fp32 storage with DEFAULT dots would be pointless on
    # real hardware: the MXU re-rounds operands to bf16 at the dot, so
    # the store-side rounding it avoids is re-applied.)  This is the
    # parity preset for the convunet+feat-future exception (PARITY.md).
    "mixed": dict(band_dtype=jnp.float32, mxu_precision="high", gelu_exact=True),
    "accurate": dict(band_dtype=jnp.float32, mxu_precision="highest", gelu_exact=True),
    # every layer split (max weight fidelity at bf16 bandwidth, ~2x MXU)
    "wsplit": dict(band_dtype=jnp.bfloat16, mxu_precision="default",
                   gelu_exact=False, weight_dtype="split"),
    # attribution-only: fp32 weights (6-pass on real MXU — use for error
    # decomposition in interpret mode, not production)
    "wf32": dict(band_dtype=jnp.bfloat16, mxu_precision="highest",
                 gelu_exact=False, weight_dtype=jnp.float32),
}

#: chain names accepted by hybrid presets (fast_forward_planar wnames +
#: 'middle' for the eighth-res XLA core + 'glue' for everything between
#: chains: planar input/feat conversion, warp windows, pools, upsamples)
HYBRID_CHAINS = ("A", "B", "C", "middle", "dec0", "dec1", "dec2", "glue")


def get_fused_precision(name: str) -> dict:
    """Resolve a FUSED_PRECISIONS key, including dynamic per-chain hybrids.

    ``hybrid:<c1>+<c2>+...`` (chains from HYBRID_CHAINS) runs the named
    chains with the ``mixed`` numerics — fp32 band storage contracted by
    3-pass bf16_3x (``high``) dots — while every other chain keeps the
    ``fast`` preset's bf16 bands / 1-pass dots (incl. its selective dec2
    weight split when dec2 itself stays fast).  This is the
    variant-tuned middle ground between ``fast`` and ``mixed`` for nets
    whose bf16 error concentrates in a subset of chains."""
    if name.startswith("hybrid:"):
        chains = tuple(name[len("hybrid:"):].split("+"))
        bad = [c for c in chains if c not in HYBRID_CHAINS]
        if bad:
            raise ValueError(f"unknown hybrid chains {bad}; pick from {HYBRID_CHAINS}")
        wd = None if "dec2" in chains else {
            "dec2": (None, None, None, "split", "split")}
        return dict(
            band_dtype={c: jnp.float32 for c in chains},
            mxu_precision={c: "high" for c in chains if c != "glue"},
            gelu_exact=False,
            weight_dtype=wd,
        )
    return FUSED_PRECISIONS[name]


def glue_dtype(prec: dict):
    """Inter-chain ('glue') storage dtype for a resolved preset: planar
    input/feat conversion, warp windows, pools, lane upsamples.  Scalar
    presets use their band dtype; per-chain dicts default the glue to
    bf16 unless the hybrid names 'glue' explicitly."""
    bd = prec["band_dtype"]
    if isinstance(bd, dict):
        return bd.get("glue", jnp.bfloat16)
    return bd


def resolve_fused_precision(
    name: str, *, arch: str, feature_rec: bool, future: bool
) -> str:
    """Resolve the 'auto' fused-precision preset: the fastest preset
    measured within the 0.05 dB parity budget for the variant (PARITY.md
    fused table).  Every fused variant takes 'fast' except the
    convunet+feat-future net, whose bf16 error recirculates on the
    full-resolution recurrence cycle (carry -> warp -> chain A -> skip0
    -> chain dec2 -> carry; -0.30 dB under 'fast', PARITY.md round-5
    attribution).  Closing just that cycle in fp32 — the
    'hybrid:glue+A+dec2' preset — measures -0.002/-0.004 dB while the
    five low-res chains keep the fast bf16/1-pass numerics (the all-fp32
    'mixed' ladder rung costs 2x)."""
    if name != "auto":
        return name
    if arch.startswith("convunet") and feature_rec and future:
        return "hybrid:glue+A+dec2"
    return "fast"


def supports_fast_path(net: ConvUNet, h: int, w: int) -> bool:
    return (
        isinstance(net, ConvUNet)
        and net.fixed_features
        and net.filters == 48  # the packing hardcodes 48-ch splits/feat
        and net.depth == 4
        and net.bottleneck_depth == 2
        and net.post_depth == 2
        and net.n_blocks_encoder == 2
        and net.n_blocks_decoder == 2
        and net.downsampling_mode == "convmax"
        and net.upsampling_mode == "bilinear"
        and net.activation == "relu"
        and net.normalization in (None, "none")
        and not net.bottleneck_dilation
        and not net.residual
        and net.use_bias
        and h % 8 == 0
        and w % 8 == 0
        and h >= 32
        and w >= 32
    )


# ---------------------------------------------------------------- planar glue


def to_planar(x: jnp.ndarray, wl: int, c_pad: int = 0, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[H, W, C] -> [(H*(C+c_pad)), WL] with zero lane/channel pad."""
    h, w, c = x.shape
    p = jnp.transpose(x, (0, 2, 1))  # [H, C, W]
    p = jnp.pad(p, ((0, 0), (0, c_pad), (0, wl - w)))
    return p.reshape(h * (c + c_pad), wl).astype(dtype)


def from_planar(p: jnp.ndarray, h: int, w: int, c: Optional[int] = None) -> jnp.ndarray:
    """[(H*C), WL] -> [H, W, c or C]."""
    cp = p.shape[0] // h
    x = p.reshape(h, cp, -1)[:, : (c or cp), :w]
    return jnp.transpose(x, (0, 2, 1))


def maxpool2x2_planar(p: jnp.ndarray, h: int) -> jnp.ndarray:
    """2x2 max pool on [(H*C), WL] -> [(H/2*C), WL/2].  Zero pad lanes stay
    zero (activations are post-relu, >= 0)."""
    c = p.shape[0] // h
    wl = p.shape[1]
    x = p.reshape(h // 2, 2, c, wl)
    x = jnp.maximum(x[:, 0], x[:, 1])  # rows
    x = jnp.maximum(x[..., 0::2], x[..., 1::2])  # lanes
    return x.reshape(h // 2 * c, wl // 2)


def lanepool2x_planar(p: jnp.ndarray) -> jnp.ndarray:
    """Lane half of the 2x2 max pool ([(H/2*C), WL] -> [.., WL/2]); the row
    half runs inside the chain kernel (pool_rows emit)."""
    return jnp.maximum(p[..., 0::2], p[..., 1::2])


def lane_upsample2x_planar(p: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Column-direction half of the bilinear 2x upsample:
    [(H*C), WL] -> [(H*C), 2WL], rows unchanged.  The row direction runs
    inside the dec chain kernels (upsample_input mode) — Mosaic has no cheap
    lane interleave, XLA does."""
    c = p.shape[0] // h
    wl = p.shape[1]
    x = p.reshape(h, c, wl)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, wl), 2)
    edge = jax.lax.dynamic_slice_in_dim(x, w - 1, 1, axis=2)
    x = jnp.where(col == w, edge, x)
    left = jnp.concatenate([x[..., :1], x[..., :-1]], axis=2)
    right = jnp.concatenate([x[..., 1:], x[..., -1:]], axis=2)
    lanes2 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * wl), 2)
    mask = (lanes2 < 2 * w).astype(x.dtype)
    even = 0.75 * x + 0.25 * left
    odd = 0.75 * x + 0.25 * right
    x = jnp.stack([even, odd], axis=-1).reshape(h, c, 2 * wl) * mask
    return x.reshape(h * c, 2 * wl)


def upsample2x_planar(p: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear 2x (torch align_corners=False semantics incl. edge
    replication) on [(H*C), WL] -> [(2H*C), 2WL]; image width w -> 2w,
    lanes beyond 2w zeroed."""
    c = p.shape[0] // h
    wl = p.shape[1]
    x = p.reshape(h, c, wl).astype(jnp.bfloat16)  # 0.75/0.25 are bf16-exact

    # columns: clamp-replicate the lane after the image edge so the
    # interpolation at output lane 2w-1 sees the edge value, not the zero pad
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, wl), 2)
    edge = jax.lax.dynamic_slice_in_dim(x, w - 1, 1, axis=2)
    x = jnp.where(col == w, edge, x)
    left = jnp.concatenate([x[..., :1], x[..., :-1]], axis=2)
    right = jnp.concatenate([x[..., 1:], x[..., -1:]], axis=2)
    # fold the pad-lane mask into the interpolation weights so the whole
    # upsample is one fused elementwise pass per interleave
    lanes2 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * wl), 2)
    mask = (lanes2 < 2 * w).astype(jnp.bfloat16)
    even = 0.75 * x + 0.25 * left
    odd = 0.75 * x + 0.25 * right
    x = jnp.stack([even, odd], axis=-1).reshape(h, c, 2 * wl) * mask

    up = jnp.concatenate([x[:1], x[:-1]], axis=0)
    dn = jnp.concatenate([x[1:], x[-1:]], axis=0)
    even_r = 0.75 * x + 0.25 * up
    odd_r = 0.75 * x + 0.25 * dn
    return jnp.stack([even_r, odd_r], axis=1).reshape(2 * h * c, 2 * wl)


# ------------------------------------------------------------------ XLA middle


def _conv(p, x, act=True, dil=1):
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        (1, 1),
        [(dil, dil)] * 2,
        rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["bias"].astype(x.dtype)
    return jnp.maximum(y, 0.0) if act else y


def _middle8(params, d2, mxu_precision="default"):
    """Eighth-res core in XLA NHWC: enc3 -> bottleneck (residual sum);
    input/output [1, H/8, W/8, 48].  Too small for the chain kernels (H/8
    has no multiple-of-8 tile divisor in general) and cheap enough not to
    matter."""
    if mxu_precision != "default":
        with jax.default_matmul_precision(
            "high" if mxu_precision == "high" else "highest"
        ):
            return _middle8_body(params, d2)
    return _middle8_body(params, d2)


def _middle8_body(params, d2):
    h = _conv(params["enc_conv3"]["conv0"], d2)
    skip3 = _conv(params["enc_conv3"]["conv1"], h)

    d = skip3
    s = d
    for i in range(2):
        d = _conv(params[f"bottleneck{i}"], d)
        s = s + d
    return s


# -------------------------------------------------------------- weight packing


def pack_fast_params(params, feature_rec: bool, in_nc: int):
    """One-time conversion of the flax ConvUNet params pytree into the
    packed matrices the fused kernels consume."""
    f32 = jnp.float32

    def w(p):
        return p["kernel"].astype(f32)

    def b(p):
        return p["bias"].astype(f32)

    def pad_cin(k, to):
        return jnp.pad(k, ((0, 0), (0, 0), (0, to - k.shape[2]), (0, 0)))

    def swap_concat(k, first):
        # reference concatenates [skip, d]; the kernel slab is [conv-out,
        # aux], so move the conv-input block first
        return jnp.concatenate([k[:, :, first:], k[:, :, :first]], axis=2)

    packed = {}
    in_pad = -(-in_nc // 8) * 8
    if feature_rec:
        # chain A: pre (linear) -> concat feat -> enc0 c0, c1 -> down0
        packed["A"] = dict(
            ws=(
                pack_weight(pad_cin(w(params["pre"]), in_pad)),
                pack_weight(w(params["enc_conv0"]["conv0"]), cin_split=48),
                pack_weight(w(params["enc_conv0"]["conv1"])),
                pack_weight(w(params["enc_down0"])),
            ),
            bs=(b(params["pre"]), b(params["enc_conv0"]["conv0"]),
                b(params["enc_conv0"]["conv1"]), b(params["enc_down0"])),
            acts=("none", "relu", "relu", "none"),
            ks=(3, 3, 3, 3),
            emit=(2, 3),
            pool=(3,),
        )
    else:
        packed["A"] = dict(
            ws=(
                pack_weight(pad_cin(w(params["enc_conv0"]["conv0"]), in_pad)),
                pack_weight(w(params["enc_conv0"]["conv1"])),
                pack_weight(w(params["enc_down0"])),
            ),
            bs=(b(params["enc_conv0"]["conv0"]), b(params["enc_conv0"]["conv1"]),
                b(params["enc_down0"])),
            acts=("relu", "relu", "none"),
            ks=(3, 3, 3),
            emit=(1, 2),
            pool=(2,),
        )
    packed["B"] = dict(
        ws=(
            pack_weight(w(params["enc_conv1"]["conv0"])),
            pack_weight(w(params["enc_conv1"]["conv1"])),
            pack_weight(w(params["enc_down1"])),
        ),
        bs=(b(params["enc_conv1"]["conv0"]), b(params["enc_conv1"]["conv1"]),
            b(params["enc_down1"])),
        acts=("relu", "relu", "none"),
        ks=(3, 3, 3),
        emit=(1, 2),
        pool=(2,),
    )
    packed["C"] = dict(
        ws=(
            pack_weight(w(params["enc_conv2"]["conv0"])),
            pack_weight(w(params["enc_conv2"]["conv1"])),
            pack_weight(w(params["enc_down2"])),
        ),
        bs=(b(params["enc_conv2"]["conv0"]), b(params["enc_conv2"]["conv1"]),
            b(params["enc_down2"])),
        acts=("relu", "relu", "none"),
        ks=(3, 3, 3),
        emit=(1, 2),
        pool=(2,),
    )
    packed["dec0"] = dict(
        ws=(
            pack_weight(w(params["dec_up0"])),
            pack_weight(swap_concat(w(params["dec_conv0"]["conv0"]), 48), cin_split=48),
            pack_weight(w(params["dec_conv0"]["conv1"])),
        ),
        bs=(b(params["dec_up0"]), b(params["dec_conv0"]["conv0"]),
            b(params["dec_conv0"]["conv1"])),
        acts=("relu", "relu", "relu"),
        ks=(3, 3, 3),
        emit=(2,),
    )
    packed["dec1"] = dict(
        ws=(
            pack_weight(w(params["dec_up1"])),
            pack_weight(swap_concat(w(params["dec_conv1"]["conv0"]), 48), cin_split=48),
            pack_weight(w(params["dec_conv1"]["conv1"])),
        ),
        bs=(b(params["dec_up1"]), b(params["dec_conv1"]["conv0"]),
            b(params["dec_conv1"]["conv1"])),
        acts=("relu", "relu", "relu"),
        ks=(3, 3, 3),
        emit=(2,),
    )
    head_k = params["post_final"]["kernel"].astype(f32).reshape(
        params["post_final"]["kernel"].shape[-2], -1
    )  # [48, out]
    out_nc = head_k.shape[-1]
    out_pad = -(-out_nc // 8) * 8
    head_w = jnp.pad(jnp.transpose(head_k, (1, 0)), ((0, out_pad - out_nc), (0, 0)))
    head_b = jnp.pad(b(params["post_final"]), (0, out_pad - out_nc))
    packed["dec2"] = dict(
        ws=(
            pack_weight(w(params["dec_up2"])),
            pack_weight(swap_concat(w(params["dec_conv2"]["conv0"]), 48), cin_split=48),
            pack_weight(w(params["dec_conv2"]["conv1"])),
            pack_weight(w(params["post0"])),
            head_w,
        ),
        bs=(b(params["dec_up2"]), b(params["dec_conv2"]["conv0"]),
            b(params["dec_conv2"]["conv1"]), b(params["post0"]), head_b),
        acts=("relu", "relu", "relu", "relu", "none"),
        ks=(3, 3, 3, 3, 1),
        emit=(3, 4),
    )
    packed["out_nc"] = out_nc
    packed["in_pad"] = in_pad
    packed["params_mid"] = {
        k: jax.tree_util.tree_map(lambda a: a.astype(f32), params[k])
        for k in ("enc_conv3", "bottleneck0", "bottleneck1")
    }
    return packed


# ------------------------------------------------------------------- forward


def convunet_fast_forward(
    net: ConvUNet,
    packed,
    x: jnp.ndarray,  # [B, H, W, in_nc]
    feat: Optional[jnp.ndarray] = None,  # [B, H, W, 48]
    interpret: bool = False,
    precision: str = "fast",
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Fast forward; returns (y [B,H,W,out_nc] f32, new_feat or None)."""
    b, h, w, _ = x.shape
    # the three resolution levels share one lane schedule (wl, wl/2, wl/4),
    # so the full-res lane count must be a 512-multiple
    wl = -(-(w + 1) // 512) * 512
    outs = []
    feats = []
    for bi in range(b):
        y, nf = _fast_forward_one(
            net, packed, x[bi], feat[bi] if feat is not None else None,
            h, w, wl, interpret, precision,
        )
        outs.append(y)
        feats.append(nf)
    y = jnp.stack(outs)
    nf = jnp.stack(feats) if net.feature_rec else None
    return y, nf


def _chain(packed_chain, x, aux, h, w, interpret, aux_channels=None,
           upsample_input=False, prec=None, emit=None, combine=None,
           wname=None, out_dtype=None):
    prec = prec or FUSED_PRECISIONS["fast"]
    wd = prec.get("weight_dtype")
    if isinstance(wd, dict):  # per-chain override (selective weight split)
        wd = wd.get(wname)
    bdt = prec["band_dtype"]
    if isinstance(bdt, dict):  # per-chain band storage override
        bdt = bdt.get(wname, jnp.bfloat16)
    mp = prec["mxu_precision"]
    if isinstance(mp, dict):  # per-chain dot-precision override (hybrid)
        mp = mp.get(wname, "default")
    return fused_conv_chain(
        x,
        packed_chain["ws"],
        packed_chain["bs"],
        packed_chain["acts"],
        packed_chain["ks"],
        h_img=h,
        w_img=w,
        aux=aux,
        emit=emit if emit is not None else packed_chain["emit"],
        combine=combine,
        pool_rows=() if combine is not None else packed_chain.get("pool", ()),
        aux_channels=aux_channels,
        upsample_input=upsample_input,
        out_dtype=out_dtype or bdt,
        band_dtype=bdt,
        mxu_precision=mp,
        weight_dtype=wd,
        interpret=interpret,
    )


def fast_forward_planar(
    net, packed, xp, aux, h, w, interpret=False, aux_channels=None,
    precision="fast", combine_state=False, state_dtype=None,
):
    """Planar core: xp [(H*in_pad), WL] -> (out [(H*out_pad), WL],
    feat [(H*48), WL] or None).  aux: recurrent features, either
    [(H*48), WL] or a wider planar tensor with aux_channels=(offset, 48).
    precision: FUSED_PRECISIONS key.  combine_state=True returns instead
    ([H, cf, WL] recurrence-state buffer, None) written by the kernel.
    state_dtype=float32 runs the state-emitting chain with fp32 bands so
    the recurrence carry is written rounding-free: bf16 carry rounding
    feeds back through the recurrence and accumulates over a clip
    (drift), while per-frame input rounding does not."""
    wl = xp.shape[-1]
    assert wl % 512 == 0, "planar lane count must be a 512-multiple"
    prec = get_fused_precision(precision)
    bd = glue_dtype(prec)
    mid_mp = prec["mxu_precision"]
    if isinstance(mid_mp, dict):
        mid_mp = mid_mp.get("middle", "default")

    skip0, d0pre = _chain(
        packed["A"], xp, aux, h, w, interpret, aux_channels, prec=prec,
        wname="A",
    )
    d0 = lanepool2x_planar(d0pre)  # rows already pooled in-kernel

    skip1, d1pre = _chain(packed["B"], d0, None, h // 2, w // 2, interpret,
                          prec=prec, wname="B")
    d1 = lanepool2x_planar(d1pre)

    # quarter res is still worth fusing (the 3x3 convs at H/4 x W/4 cost
    # ~0.7-1.2 ms each as XLA NHWC convs vs ~0.1 ms fused); only the
    # eighth-res core stays XLA
    skip2, d2pre = _chain(packed["C"], d1, None, h // 4, w // 4, interpret,
                          prec=prec, wname="C")
    d2 = lanepool2x_planar(d2pre)

    # hybrid presets that include 'middle' run the eighth-res core on fp32
    # operands (the bands chain C emits are already fp32 when C is hybrid)
    mid_bd = jnp.float32 if mid_mp != "default" else bd
    d2_nhwc = from_planar(d2, h // 8, w // 8)[None].astype(mid_bd)
    m8 = _middle8(packed["params_mid"], d2_nhwc, mid_mp)[0]

    # the dec chains upsample rows inside the kernel; lanes are upsampled by
    # the cheap lower-res XLA pass (no full-res HBM round trip)
    m8_lanes = lane_upsample2x_planar(
        to_planar(m8, wl // 8, dtype=bd), h // 8, w // 8
    )
    (dec0,) = _chain(
        packed["dec0"], m8_lanes, skip2, h // 4, w // 4,
        interpret, upsample_input=True, prec=prec, wname="dec0",
    )
    m_lanes = lane_upsample2x_planar(dec0, h // 4, w // 4)
    (dec1,) = _chain(
        packed["dec1"], m_lanes, skip1, h // 2, w // 2,
        interpret, upsample_input=True, prec=prec, wname="dec1",
    )
    dec1_lanes = lane_upsample2x_planar(dec1, h // 2, w // 2)
    if combine_state:
        # one [H, cf, WL + STATE_LANE_EXTRA] buffer in the recurrence-state
        # layout [den 3 | pad 5 | feat 48?] with edge-replicated lane
        # margins: the head slab's 5 pad channels are written zero, the
        # engine's state concat disappears, and the next frame's warp
        # consumes the buffer without any XLA edge-pad pre-pass
        from rvdd_tpu.ops.pallas.warp_rowmajor import (
            STATE_LANE_EXTRA,
            STATE_PAD_LEFT,
        )

        if net.feature_rec:
            cmb = (56, ((4, 0), (3, 8)), STATE_PAD_LEFT, wl + STATE_LANE_EXTRA)
            em = (3, 4)
        else:
            cmb = (8, ((4, 0),), STATE_PAD_LEFT, wl + STATE_LANE_EXTRA)
            em = (4,)
        # fp32 carry (state_dtype): the kernel dual-writes the combined
        # state from the fp32 accumulator, so only the output dtype changes
        # — bands stay in the preset's storage
        (state3,) = _chain(
            packed["dec2"], dec1_lanes, skip0, h, w, interpret,
            upsample_input=True, prec=prec, emit=em, combine=cmb,
            wname="dec2", out_dtype=state_dtype,
        )
        return state3, None
    new_feat, out = _chain(
        packed["dec2"], dec1_lanes, skip0, h, w, interpret,
        upsample_input=True, prec=prec, wname="dec2",
    )
    return out, (new_feat if net.feature_rec else None)


def _fast_forward_one(net, packed, x, feat, h, w, wl, interpret, precision="fast"):
    bd = glue_dtype(get_fused_precision(precision))
    xp = to_planar(x, wl, c_pad=packed["in_pad"] - x.shape[-1], dtype=bd)
    auxp = to_planar(feat, wl, dtype=bd) if net.feature_rec else None
    out, new_feat = fast_forward_planar(
        net, packed, xp, auxp, h, w, interpret, precision=precision
    )
    y = from_planar(out, h, w, c=packed["out_nc"]).astype(jnp.float32)
    nf = (
        from_planar(new_feat, h, w).astype(jnp.float32)
        if net.feature_rec
        else None
    )
    return y, nf
