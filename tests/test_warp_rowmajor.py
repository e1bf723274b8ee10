"""Row-major warp kernel (v3) parity vs the XLA bicubic warp
(interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rvdd_tpu.ops.warp import warp
from rvdd_tpu.ops.pallas.warp_rowmajor import warp_planar_pallas

def planar(x):  # [1, H, W, C] -> [(H*C), WL]
    _, h, w, c = x.shape
    wl = -(-(w + 1) // 128) * 128
    p = jnp.transpose(x[0], (0, 2, 1))
    p = jnp.pad(p, ((0, 0), (0, 0), (0, wl - w)))
    return p.reshape(h * c, wl), wl


def unplanar(p, h, w):
    c = p.shape[0] // h
    return jnp.transpose(p.reshape(h, c, -1)[:, :, :w], (0, 2, 1))[None]


def run(flow_np, h=24, w=100, c=8, seed=0, **kw):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-1, 1, (1, h, w, c)).astype(np.float32))
    fl = jnp.asarray(flow_np.astype(np.float32))[None]
    ref, _ = warp(x, fl, "bicubic")

    xp, wl = planar(x)
    got = warp_planar_pallas(
        xp.astype(jnp.bfloat16), fl[0], h_img=h, w_img=w, max_disp=16,
        tile_h=8, out_dtype=jnp.float32, interpret=True, **kw
    )
    got = unplanar(got, h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2)


def test_zero_flow():
    run(np.zeros((24, 100, 2)))


def test_constant_flow():
    fl = np.zeros((24, 100, 2))
    fl[..., 0] = 7.3
    fl[..., 1] = -2.6
    run(fl)


def test_smooth_flow():
    yy, xx = np.mgrid[0:24, 0:100]
    fl = np.stack([3.0 + 1.5 * np.sin(xx / 40), -2.0 + np.cos(yy / 10)], -1)
    run(fl)


def test_border_clamp():
    # flow pushing taps outside the frame: border padding semantics
    fl = np.zeros((24, 100, 2))
    fl[..., 0] = -14.0
    fl[..., 1] = 12.0
    run(fl)


def test_multi_group():
    yy, xx = np.mgrid[0:24, 0:100]
    fl = np.stack([2.0 + xx * 0.01, 1.0 - yy * 0.02], -1)
    run(fl, c=16)
