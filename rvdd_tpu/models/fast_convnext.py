"""TPU fast-path forward for ConvNeXtUNet ('newunet'): fused block chains.

Mirrors models/fast_unet.py for the ConvNeXt architecture (reference:
networks/new_unet.py:207-430): full- and half-resolution levels run as
fused Pallas ConvNeXt-block chains (ops/pallas/convnext_pallas.py) on
row-major planar activations, the quarter/eighth middle runs the flax
modules in XLA, pooling stays planar, and decoder upsampling
(align_corners=True here, unlike convunet) is split into an MXU matmul
lane resize plus in-kernel row interpolation.

Numerics: bf16 + tanh-approx GELU — the documented fast-inference mode
(the exact erf path stays on XLA for validation parity).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from rvdd_tpu.models.convnext_unet import ConvNeXtUNet, NConvNeXtBlock, ConvNeXtBlock
from rvdd_tpu.models.fast_unet import (
    FUSED_PRECISIONS,
    from_planar,
    maxpool2x2_planar,
    to_planar,
)
from rvdd_tpu.ops.pallas.convnext_pallas import fused_convnext_chain, pack_block

F = 48


def supports_fast_path_cnx(net: ConvNeXtUNet, h: int, w: int) -> bool:
    return (
        isinstance(net, ConvNeXtUNet)
        and net.filters == F
        and net.kernel_size == 7
        and net.depth == 4
        and net.n_blocks_encoder == 2
        and net.n_blocks_decoder == 2
        and net.n_blocks_bottleneck == 2
        and net.n_blocks_postprocessing == 2
        and net.downsampling_mode == "maxpool"
        and net.upsampling_mode == "bilinear"
        and net.fusion_mode == "cat"
        and h % 8 == 0
        and w % 8 == 0
        and h >= 64
        and w >= 64
    )


def lane_resize2x_ac(p: jnp.ndarray, w_lo: int, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[(R), WL_lo] -> [(R), 2*WL_lo] bilinear align_corners=True in the lane
    direction, as one MXU matmul with a constant resize matrix."""
    wl_lo = p.shape[-1]
    wl = 2 * wl_lo
    w_out = 2 * w_lo
    m = np.zeros((wl_lo, wl), np.float32)
    for k in range(w_out):
        src = k * (w_lo - 1) / (w_out - 1)
        j0 = int(np.floor(src))
        t = src - j0
        m[j0, k] += 1.0 - t
        if j0 + 1 < w_lo:
            m[j0 + 1, k] += t
    mm = jnp.asarray(m).astype(dtype)
    prec = "default" if dtype == jnp.bfloat16 else "high"
    with jax.default_matmul_precision(prec):
        return (p.astype(dtype) @ mm).astype(dtype)


def pack_fast_cnx(params, feature_rec: bool, in_nc: int):
    in_pad = -(-in_nc // 8) * 8
    packed = {"in_pad": in_pad}

    def blk(path, cin):
        p = params
        for k in path:
            p = p[k]
        return pack_block(p, cin)

    chains = {}
    # chain A: pre block (feat variant) + enc0 x2 (block0 takes 96 via proj)
    if feature_rec:
        items = [blk(("pre", "block0"), in_pad),
                 blk(("enc_conv0", "block0"), 2 * F),
                 blk(("enc_conv0", "block1"), F)]
    else:
        items = [blk(("enc_conv0", "block0"), in_pad),
                 blk(("enc_conv0", "block1"), F)]
    chains["A"] = dict(
        blocks=tuple(tuple(a) for a, _ in items),
        hps=tuple(hp for _, hp in items),
        emit=(len(items) - 1,),
    )
    # chain B: enc_down0 + enc1 x2 (all 48-in)
    items = [blk(("enc_down0",), F), blk(("enc_conv1", "block0"), F),
             blk(("enc_conv1", "block1"), F)]
    chains["B"] = dict(
        blocks=tuple(tuple(a) for a, _ in items),
        hps=tuple(hp for _, hp in items),
        emit=(2,),
    )
    # chain C (quarter res): enc_down1 + enc2 x2
    items = [blk(("enc_down1",), F), blk(("enc_conv2", "block0"), F),
             blk(("enc_conv2", "block1"), F)]
    chains["C"] = dict(
        blocks=tuple(tuple(a) for a, _ in items),
        hps=tuple(hp for _, hp in items),
        emit=(2,),
    )
    # dec0 chain (quarter res): dec_up0 + [skip2] dec_conv0 x2 (block0 proj)
    items = [blk(("dec_up0",), F), blk(("dec_conv0", "block0"), 2 * F),
             blk(("dec_conv0", "block1"), F)]
    chains["dec0"] = dict(
        blocks=tuple(tuple(a) for a, _ in items),
        hps=tuple(hp for _, hp in items),
        emit=(2,),
    )
    # dec1 chain (half res): dec_up1 + [skip1] dec_conv1 x2 (block0 proj 96)
    items = [blk(("dec_up1",), F), blk(("dec_conv1", "block0"), 2 * F),
             blk(("dec_conv1", "block1"), F)]
    chains["dec1"] = dict(
        blocks=tuple(tuple(a) for a, _ in items),
        hps=tuple(hp for _, hp in items),
        emit=(2,),
    )
    # dec2 chain (full res): dec_up2 + [skip0] dec_conv2 x2 + post x2 + head
    items = [blk(("dec_up2",), F), blk(("dec_conv2", "block0"), 2 * F),
             blk(("dec_conv2", "block1"), F), blk(("post", "block0"), F),
             blk(("post", "block1"), F)]
    head_k = params["post_final"]["kernel"].astype(jnp.float32).reshape(F, -1)
    out_nc = head_k.shape[-1]
    out_pad = -(-out_nc // 8) * 8
    head_w = jnp.pad(jnp.transpose(head_k, (1, 0)), ((0, out_pad - out_nc), (0, 0)))
    head_b = jnp.pad(
        params["post_final"]["bias"].astype(jnp.float32), (0, out_pad - out_nc)
    )
    chains["dec2"] = dict(
        blocks=tuple(tuple(a) for a, _ in items),
        hps=tuple(hp for _, hp in items),
        emit=(4,),
        tail=((head_w, head_b),),
        tail_couts=(out_pad,),
    )
    packed["chains"] = chains
    packed["out_nc"] = out_nc
    packed["out_pad"] = out_pad
    packed["params_mid"] = {
        k: jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), params[k])
        for k in (
            # quarter-level params kept for the small-image XLA fallback
            "enc_down1", "enc_conv2", "enc_down2", "enc_conv3", "bottleneck",
            "dec_up0", "dec_conv0",
        )
    }
    return packed


def _quarter_tileable(hq: int) -> bool:
    """True when the quarter-res ConvNeXt chains (3 blocks, halo 9) have a
    feasible row tile at height hq."""
    return any(
        hq % t == 0
        for t in (72, 60, 54, 48, 40, 36, 32, 30, 24, 20, 18, 16, 12)
        if t > 9
    )


def _middle_quarter_xla(net, params_mid, d1, precision="fast"):
    """Small-image fallback: the whole quarter/eighth section with the flax
    modules (XLA), as before the quarter level moved into fused chains."""
    if precision != "fast":
        with jax.default_matmul_precision("high"):
            return _middle_quarter_xla_body(net, params_mid, d1, precision)
    return _middle_quarter_xla_body(net, params_mid, d1, precision)


def _middle_quarter_xla_body(net, params_mid, d1, precision):
    from rvdd_tpu.ops.resize import maxpool2x2, upsample2x_bilinear
    from rvdd_tpu.models.unet import zero_pad_to

    dt = jnp.bfloat16 if precision == "fast" else jnp.float32
    fa = precision == "fast"

    def block(name, cin, x):
        return ConvNeXtBlock(cin, F, 7, net.layerscale_init, dt, fa).apply(
            {"params": params_mid[name]}, x
        )

    def nblock(name, cin, n, x):
        return NConvNeXtBlock(cin, F, n, 7, net.layerscale_init, dt, fa).apply(
            {"params": params_mid[name]}, x
        )

    h = block("enc_down1", F, d1)
    skip2 = nblock("enc_conv2", F, 2, h)
    h = maxpool2x2(skip2)
    h = block("enc_down2", F, h)
    h = nblock("enc_conv3", F, 2, h)
    h = nblock("bottleneck", F, 2, h)
    h = upsample2x_bilinear(h, align_corners=True)
    h = block("dec_up0", F, h)
    h = zero_pad_to(h, skip2.shape[-3], skip2.shape[-2])
    h = jnp.concatenate([h, skip2], axis=-1)
    return nblock("dec_conv0", 2 * F, 2, h)


def _middle8_cnx(net, params_mid, d2, precision="fast"):
    """Eighth-res core with the flax modules (XLA): enc_down2 -> enc3 ->
    bottleneck; input/output [1, H/8, W/8, 48].  The quarter-res blocks run
    as fused chains (XLA ConvNeXt blocks at [1,270,480,48] cost ~1 ms
    each)."""
    if precision != "fast":
        with jax.default_matmul_precision("high"):
            return _middle8_cnx_body(net, params_mid, d2, precision)
    return _middle8_cnx_body(net, params_mid, d2, precision)


def _middle8_cnx_body(net, params_mid, d2, precision):
    dt = jnp.bfloat16 if precision == "fast" else jnp.float32
    fa = precision == "fast"  # tanh GELU only in the fast mode

    def block(name, cin, x):
        return ConvNeXtBlock(cin, F, 7, net.layerscale_init, dt, fa).apply(
            {"params": params_mid[name]}, x
        )

    def nblock(name, cin, n, x):
        return NConvNeXtBlock(cin, F, n, 7, net.layerscale_init, dt, fa).apply(
            {"params": params_mid[name]}, x
        )

    h = block("enc_down2", F, d2)
    h = nblock("enc_conv3", F, 2, h)
    return nblock("bottleneck", F, 2, h)


# Depthwise-engine knobs for the fused chains, in one place so HW sweeps
# (tools/cnx_chain_bench.py --sweep3/--attrib) can flip the production
# default: 'mxu' = im2col dense dot over a 49-plane shifted stack;
# 'mxu2' = dy-contraction dot over a 7x smaller unshifted stack + dx
# rotate-adds (same MACs, ~7x less stack-build traffic).
# Round-4 HW sweep (tools/cnx_chain_bench.py --sweep3, differential
# timing): the 2-block full-res chain measures 5.96 ms with
# mxu2/rows=12/group=8 vs 9.28 ms with the old mxu/rows=8/group=16.
DW_KNOBS = dict(dw_impl="mxu2", dw_rows=12, dw_group=8)


def _chain(ch, x, aux, h, w, interpret, aux_channels=None, upsample=False,
           tile_h=0, prec=None, combine=None, out_dtype=None):
    prec = prec or FUSED_PRECISIONS["fast"]
    return fused_convnext_chain(
        x,
        ch["blocks"],
        ch["hps"],
        h_img=h,
        w_img=w,
        aux=aux,
        emit=ch["emit"],
        combine=combine,
        tail=ch.get("tail", ()),
        tail_couts=ch.get("tail_couts", ()),
        aux_channels=aux_channels,
        upsample_input=upsample,
        tile_h=tile_h,
        out_dtype=out_dtype or prec["band_dtype"],
        band_dtype=prec["band_dtype"],
        # the ConvNeXt kernel has no manual bf16_3x path (the conv-chain
        # kernel's 'high'); ride Mosaic's HIGHEST instead — this kernel
        # measures -0.002 dB under 'fast', so no preset needs 'high' here
        mxu_precision=(
            "highest" if prec["mxu_precision"] == "high"
            else prec["mxu_precision"]
        ),
        gelu_exact=prec["gelu_exact"],
        interpret=interpret,
        **DW_KNOBS,
    )


def fast_forward_planar_cnx(
    net, packed, xp, aux, h, w, interpret=False, aux_channels=None,
    precision="fast", combine_state=False, state_dtype=None,
):
    """Planar core: xp [(H*in_pad), WL] -> (out [(H*out_pad), WL],
    feat [(H*48), WL] or None).  precision: FUSED_PRECISIONS key.
    combine_state=True instead returns the pre-padded [H, cf,
    WL + STATE_LANE_EXTRA] recurrence-state buffer ([den | pad | feat],
    edge-replicated lane margins) written directly by the dec2 chain
    kernel."""
    wl = xp.shape[-1]
    assert wl % 512 == 0
    ch = packed["chains"]
    if precision.startswith("hybrid:"):
        raise ValueError(
            "per-chain hybrid presets are a ConvUNet feature (its chains "
            "are named A/B/C/middle/dec0-2); the ConvNeXt fused path "
            "measures -0.011 dB under plain 'fast' (PARITY.md) and needs "
            "no hybrid — pick fast/mixed/accurate"
        )
    prec = FUSED_PRECISIONS[precision]
    bd = prec["band_dtype"]

    (skip0,) = _chain(ch["A"], xp, aux, h, w, interpret, aux_channels,
                      prec=prec)
    d0 = maxpool2x2_planar(skip0, h)
    (skip1,) = _chain(ch["B"], d0, None, h // 2, w // 2, interpret, prec=prec)
    d1 = maxpool2x2_planar(skip1, h // 2)

    if _quarter_tileable(h // 4):
        (skip2,) = _chain(ch["C"], d1, None, h // 4, w // 4, interpret,
                          prec=prec)
        d2 = maxpool2x2_planar(skip2, h // 4)

        d2_nhwc = from_planar(d2, h // 8, w // 8)[None].astype(bd)
        m8 = _middle8_cnx(net, packed["params_mid"], d2_nhwc, precision)[0]

        m8_lanes = lane_resize2x_ac(
            to_planar(m8, wl // 8, dtype=bd), w // 8, bd
        )
        (dec0,) = _chain(
            ch["dec0"], m8_lanes, skip2, h // 4, w // 4, interpret,
            upsample=True, prec=prec,
        )
        m_lanes = lane_resize2x_ac(dec0, w // 4, bd)
    else:
        # small images: no feasible quarter-res row tile (3-block halo 9)
        d1_nhwc = from_planar(d1, h // 4, w // 4)[None].astype(bd)
        m = _middle_quarter_xla(net, packed["params_mid"], d1_nhwc, precision)[0]
        m_lanes = lane_resize2x_ac(to_planar(m, wl // 4, dtype=bd), w // 4, bd)
    (dec1,) = _chain(
        ch["dec1"], m_lanes, skip1, h // 2, w // 2, interpret, upsample=True,
        prec=prec,
    )
    dec1_lanes = lane_resize2x_ac(dec1, w // 2, bd)
    if combine_state:
        from rvdd_tpu.ops.pallas.warp_rowmajor import (
            STATE_LANE_EXTRA,
            STATE_PAD_LEFT,
        )

        cf = 56 if net.feature_rec else 8
        # fp32 recurrence carry: the kernel dual-writes the state buffer
        # from the f32 block output/tail accumulator, so only the output
        # dtype changes — bands stay in the preset's storage.  (The old
        # approach flipped the whole 5-block chain to fp32 bands, which
        # at 1080p exceeded every feasible VMEM row tile and fell back to
        # a single 1080-row tile that cannot compile.)
        (state3,) = _chain(
            ch["dec2"], dec1_lanes, skip0, h, w, interpret,
            aux_channels=None, upsample=True, prec=prec,
            combine=(cf, STATE_PAD_LEFT, wl + STATE_LANE_EXTRA),
            out_dtype=state_dtype,
        )
        return state3, None
    feat_p, out = _chain(
        ch["dec2"], dec1_lanes, skip0, h, w, interpret,
        aux_channels=None, upsample=True, prec=prec,
    )
    return out, (feat_p if net.feature_rec else None)


def convnext_fast_forward(
    net: ConvNeXtUNet,
    packed,
    x: jnp.ndarray,  # [B, H, W, in_nc]
    feat: Optional[jnp.ndarray] = None,
    interpret: bool = False,
    precision: str = "fast",
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """NHWC wrapper (tests); the engine uses fast_forward_planar_cnx."""
    b, h, w, _ = x.shape
    wl = -(-(w + 1) // 512) * 512
    from rvdd_tpu.models.fast_unet import get_fused_precision, glue_dtype

    bd = glue_dtype(get_fused_precision(precision))
    outs, feats = [], []
    for bi in range(b):
        xp = to_planar(x[bi], wl, c_pad=packed["in_pad"] - x.shape[-1], dtype=bd)
        auxp = to_planar(feat[bi], wl, dtype=bd) if net.feature_rec else None
        o, f = fast_forward_planar_cnx(net, packed, xp, auxp, h, w, interpret,
                                       precision=precision)
        outs.append(from_planar(o, h, w, c=packed["out_nc"]).astype(jnp.float32))
        feats.append(
            from_planar(f, h, w).astype(jnp.float32) if f is not None else None
        )
    y = jnp.stack(outs)
    nf = jnp.stack(feats) if net.feature_rec else None
    return y, nf
