"""Fused ConvNeXt block-chain kernel parity vs the flax path
(interpret mode on CPU; tanh-GELU fast-activation mode on both sides)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rvdd_tpu.models.convnext_unet import ConvNeXtBlock
from rvdd_tpu.ops.pallas.convnext_pallas import fused_convnext_chain, pack_block
from rvdd_tpu.ops.pallas.conv_pallas import lane_width

def to_planar(x, wl):
    _, h, w, c = x.shape
    p = jnp.transpose(x[0], (0, 2, 1))
    p = jnp.pad(p, ((0, 0), (0, 0), (0, wl - w)))
    return p.reshape(h * c, wl).astype(jnp.bfloat16)


def from_planar(p, h, w, c=None):
    cp = p.shape[0] // h
    return jnp.transpose(p.reshape(h, cp, -1)[:, : (c or cp), :w], (0, 2, 1))[None]


def make_block(key, cin):
    blk = ConvNeXtBlock(cin, 48, fast_act=True)
    params = blk.init(key, jnp.zeros((1, 16, 16, cin)))["params"]
    # non-trivial layerscale/ln values
    return blk, params


def run_chain_ref(blocks, x, aux=None):
    h = x
    for j, (blk, params) in enumerate(blocks):
        if j == 1 and aux is not None:
            h = jnp.concatenate([h, aux], axis=-1)
        h, = (blk.apply({"params": params}, h),)
    return h


def check(got_p, want, h, w, c=48, tol=0.1):
    got = np.asarray(from_planar(got_p, h, w, c))
    want = np.asarray(want)
    scale = want.std() + 1e-6
    err = np.abs(got - want).max() / scale
    assert err < tol, f"normalized max err {err}"


@pytest.mark.slow
def test_single_block_no_proj():
    rng = np.random.default_rng(0)
    h, w = 16, 40
    wl = lane_width(w)
    x = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 48)).astype(np.float32))
    blk, params = make_block(jax.random.PRNGKey(1), 48)
    want = blk.apply({"params": params}, x)
    arrs, hp = pack_block(params, 48)
    (got,) = fused_convnext_chain(
        to_planar(x, wl), (tuple(arrs),), (hp,), h_img=h, w_img=w,
        tile_h=8, out_dtype=jnp.float32, interpret=True,
    )
    check(got, want, h, w)


# only the production config (mxu dw, group 16, vpu LN) stays in the fast
# subset; the alternates are ablation knobs
@pytest.mark.parametrize(
    "dw_impl,dw_group,ln_impl",
    [("mxu2", 16, "vpu"),
     pytest.param("mxu", 16, "vpu", marks=pytest.mark.slow),
     pytest.param("mxu", 48, "vpu", marks=pytest.mark.slow),
     pytest.param("mxu2", 48, "vpu", marks=pytest.mark.slow),
     pytest.param("mxu", 16, "mxu", marks=pytest.mark.slow),
     pytest.param("vpu", 16, "vpu", marks=pytest.mark.slow)],
)
def test_block_with_proj(dw_impl, dw_group, ln_impl):
    rng = np.random.default_rng(1)
    h, w = 16, 40
    wl = lane_width(w)
    x = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 16)).astype(np.float32))
    blk, params = make_block(jax.random.PRNGKey(2), 16)
    want = blk.apply({"params": params}, x)
    arrs, hp = pack_block(params, 16)
    (got,) = fused_convnext_chain(
        to_planar(x, wl), (tuple(arrs),), (hp,), h_img=h, w_img=w,
        tile_h=8, out_dtype=jnp.float32, dw_impl=dw_impl, dw_group=dw_group,
        ln_impl=ln_impl, interpret=True,
    )
    check(got, want, h, w)


@pytest.mark.slow
def test_chain_aux_and_tail():
    """pre-block -> concat aux -> proj block -> block -> 1x1 head
    (the newunet+feat pattern), multi-emit."""
    rng = np.random.default_rng(2)
    h, w = 16, 40
    wl = lane_width(w)
    x = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 16)).astype(np.float32))
    aux = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 48)).astype(np.float32))
    b0 = make_block(jax.random.PRNGKey(3), 16)
    b1 = make_block(jax.random.PRNGKey(4), 96)
    b2 = make_block(jax.random.PRNGKey(5), 48)
    hw = jnp.asarray((rng.standard_normal((8, 48)) * 0.2).astype(np.float32))
    hb = jnp.asarray((rng.standard_normal(8) * 0.1).astype(np.float32))

    want_band = run_chain_ref([b0, b1, b2], x, aux)
    want_head = jnp.einsum("bhwc,oc->bhwo", want_band, hw) + hb

    packed, hps = [], []
    for (blk, params), cin in ((b0, 16), (b1, 96), (b2, 48)):
        arrs, hp = pack_block(params, cin)
        packed.append(tuple(arrs))
        hps.append(hp)

    band, head = fused_convnext_chain(
        to_planar(x, wl), tuple(packed), tuple(hps), h_img=h, w_img=w,
        aux=to_planar(aux, wl), emit=(2,), tail=((hw, hb),),
        tail_couts=(8,), tile_h=16, out_dtype=jnp.float32, interpret=True,
    )
    check(band, want_band, h, w)
    check(head, want_head, h, w, c=8, tol=0.12)
