"""Fused conv-chain kernel parity vs the XLA conv path (interpret mode on
CPU; real-kernel runs are covered by the TPU benchmark drives)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rvdd_tpu.ops.pallas.conv_pallas import (
    fused_conv_chain,
    lane_width,
    pack_weight,
)

def to_planar(x_nhwc, wl):
    """[1, H, W, C] -> [(H*C), WL] with zero lane padding."""
    _, h, w, c = x_nhwc.shape
    p = jnp.transpose(x_nhwc[0], (0, 2, 1))  # [H, C, W]
    p = jnp.pad(p, ((0, 0), (0, 0), (0, wl - w)))
    return p.reshape(h * c, wl)


def from_planar(p, h, w):
    c = p.shape[0] // h
    return jnp.transpose(p.reshape(h, c, -1)[:, :, :w], (0, 2, 1))[None]


def ref_conv(x, w, b, act, ks):
    pad = "SAME" if ks == 3 else "VALID"
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    return jnp.maximum(y, 0.0) if act == "relu" else y


def run_case(h, w, chans, acts, ks, aux_c=0, emit=None, tile_h=0, seed=0):
    rng = np.random.default_rng(seed)
    wl = lane_width(w)
    x = jnp.asarray(rng.standard_normal((1, h, w, chans[0])).astype(np.float32))
    aux = (
        jnp.asarray(rng.standard_normal((1, h, w, aux_c)).astype(np.float32))
        if aux_c
        else None
    )
    ws, bs, packed = [], [], []
    cin = chans[0]
    for l in range(len(chans) - 1):
        full_cin = cin + (aux_c if l == 1 and aux_c else 0)
        wt = jnp.asarray(
            (rng.standard_normal((ks[l], ks[l], full_cin, chans[l + 1])) * 0.2).astype(
                np.float32
            )
        )
        bt = jnp.asarray((rng.standard_normal(chans[l + 1]) * 0.1).astype(np.float32))
        ws.append(wt)
        bs.append(bt)
        packed.append(
            pack_weight(wt, cin if (l == 1 and aux_c) else None)
            if ks[l] == 3
            else wt.reshape(full_cin, chans[l + 1]).T
        )
        cin = chans[l + 1]

    # reference chain in fp32 XLA
    hcur = x
    refs = []
    for l in range(len(ws)):
        if l == 1 and aux_c:
            hcur = jnp.concatenate([hcur, aux], axis=-1)
        hcur = ref_conv(hcur, ws[l], bs[l], acts[l], ks[l])
        refs.append(hcur)

    emit = emit or (len(ws) - 1,)
    outs = fused_conv_chain(
        to_planar(x, wl).astype(jnp.bfloat16),
        tuple(packed),
        tuple(bs),
        tuple(acts),
        tuple(ks),
        h_img=h,
        w_img=w,
        aux=to_planar(aux, wl).astype(jnp.bfloat16) if aux_c else None,
        emit=tuple(emit),
        tile_h=tile_h,
        out_dtype=jnp.float32,
        interpret=True,
    )
    for out, l in zip(outs, emit):
        got = np.asarray(from_planar(out, h, w))
        want = np.asarray(refs[l])
        # bf16 inputs/weights: tolerance scales with K
        np.testing.assert_allclose(got, want, atol=0.15, rtol=0.05)


def test_single_conv():
    run_case(16, 40, (8, 8), ("relu",), (3,))


def test_chain_relu_multi_emit():
    run_case(24, 100, (8, 16, 8, 8), ("relu", "relu", "none"), (3, 3, 3),
             emit=(1, 2), tile_h=8)


def test_aux_concat_chain():
    # layer 0 linear -> concat aux -> two relu convs (the +feat pattern)
    run_case(16, 64, (8, 8, 8, 8), ("none", "relu", "relu"), (3, 3, 3),
             aux_c=8, tile_h=8)


def test_final_1x1():
    run_case(16, 64, (8, 8, 8), ("relu", "none"), (3, 1), tile_h=8)


def test_single_tile_grid():
    run_case(8, 40, (8, 8), ("relu",), (3,), tile_h=8)


def test_three_pass_high_precision():
    """mxu_precision='high' = manual bf16_3x (bf16 hi+lo weight pairs, the
    fp32 pattern split at dot time, three DEFAULT-precision passes): with
    fp32 bands the chain must track the fp32 XLA reference to ~1e-3 abs —
    two orders tighter than the plain bf16 path's 0.15 envelope."""
    h, w = 16, 64
    chans, acts, ks = (8, 16, 8), ("relu", "none"), (3, 3)
    rng = np.random.default_rng(7)
    wl = lane_width(w)
    x = jnp.asarray(rng.standard_normal((1, h, w, chans[0])).astype(np.float32))
    ws, bs, packed = [], [], []
    cin = chans[0]
    for l in range(len(chans) - 1):
        wt = jnp.asarray(
            (rng.standard_normal((ks[l], ks[l], cin, chans[l + 1])) * 0.2)
            .astype(np.float32)
        )
        bt = jnp.asarray((rng.standard_normal(chans[l + 1]) * 0.1).astype(np.float32))
        ws.append(wt)
        bs.append(bt)
        packed.append(pack_weight(wt))
        cin = chans[l + 1]
    hcur = x
    for l in range(len(ws)):
        hcur = ref_conv(hcur, ws[l], bs[l], acts[l], ks[l])
    want = np.asarray(hcur)

    (got,) = fused_conv_chain(
        to_planar(x, wl),  # fp32 in, fp32 bands
        tuple(packed), tuple(bs), tuple(acts), tuple(ks),
        h_img=h, w_img=w, tile_h=8,
        band_dtype=jnp.float32, mxu_precision="high",
        out_dtype=jnp.float32, interpret=True,
    )
    got = np.asarray(from_planar(got, h, w))
    np.testing.assert_allclose(got, want, atol=1.5e-3, rtol=1e-3)


@pytest.mark.parametrize("h,w", [(16, 64), (24, 100)])
def test_upsample_input(h, w):
    """upsample_input mode == XLA planar upsample -> chain."""
    from rvdd_tpu.models.fast_unet import upsample2x_planar

    rng = np.random.default_rng(3)
    wl = lane_width(w)
    assert wl % 2 == 0
    h2, w2 = h // 2, w // 2
    xlo = jnp.asarray(rng.standard_normal((1, h2, w2, 8)).astype(np.float32))
    wt = jnp.asarray((rng.standard_normal((3, 3, 8, 8)) * 0.2).astype(np.float32))
    bt = jnp.asarray((rng.standard_normal(8) * 0.1).astype(np.float32))

    from rvdd_tpu.models.fast_unet import lane_upsample2x_planar

    xlo_p = to_planar(xlo, wl // 2)
    up_ref = upsample2x_planar(xlo_p.astype(jnp.bfloat16), h2, w2)
    (want,) = fused_conv_chain(
        up_ref, (pack_weight(wt),), (bt,), ("relu",), (3,),
        h_img=h, w_img=w, tile_h=8, out_dtype=jnp.float32, interpret=True,
    )
    x_lanes = lane_upsample2x_planar(xlo_p.astype(jnp.bfloat16), h2, w2)
    (got,) = fused_conv_chain(
        x_lanes, (pack_weight(wt),), (bt,), ("relu",), (3,),
        h_img=h, w_img=w, tile_h=8, out_dtype=jnp.float32,
        upsample_input=True, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=0.05, rtol=0.05
    )


def test_weight_split_recovers_weight_rounding():
    """weight_dtype='split' (w_hi + w_lo bf16 pair, two MXU passes) must be
    much closer to the fp32 reference than bf16-rounded weights when the
    input is exactly representable in bf16."""
    rng = np.random.default_rng(7)
    h, w, c = 16, 64, 8
    wl = lane_width(w)
    x = jnp.asarray(
        rng.standard_normal((1, h, w, c)).astype(np.float32)
    ).astype(jnp.bfloat16)
    wt = jnp.asarray((rng.standard_normal((3, 3, c, c)) * 0.2).astype(np.float32))
    bt = jnp.asarray((rng.standard_normal(c) * 0.1).astype(np.float32))

    # quantize the exact reference to bf16: the kernel's band store rounds
    # every output to bf16 regardless of weight fidelity, so the comparison
    # must factor that common floor out to see the weight-rounding term
    want = ref_conv(x.astype(jnp.float32), wt, bt, "none", 3)
    want = want.astype(jnp.bfloat16).astype(jnp.float32)

    def run(weight_dtype):
        (out,) = fused_conv_chain(
            to_planar(x, wl),
            (pack_weight(wt),),
            (bt,),
            ("none",),
            (3,),
            h_img=h,
            w_img=w,
            tile_h=8,
            out_dtype=jnp.float32,
            weight_dtype=weight_dtype,
            interpret=True,
        )
        return np.abs(np.asarray(from_planar(out, h, w)) - np.asarray(want)).mean()

    # mean error: split weights agree with the bf16-quantized exact output
    # up to rounding-boundary ties, bf16 weights miss by ~1 ulp everywhere
    err_bf16 = run(None)
    err_split = run("split")
    err_tuple = run(("split",))  # per-layer form
    assert err_split < err_bf16 / 4, (err_split, err_bf16)
    assert err_tuple == err_split
