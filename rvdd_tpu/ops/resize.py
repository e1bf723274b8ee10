"""Spatial resampling primitives with torch-parity semantics (NHWC).

Covers the resize flavours the networks and flow pipeline need:

* bilinear with align_corners True (ConvNeXt decoder up, flow upsample;
  reference: networks/new_unet.py:144-149, util/flow_utils.py:159-174),
* bilinear with align_corners False (convunet decoder up; torch
  ``nn.Upsample(mode='bilinear')`` default, reference: networks/unet.py:113-118),
* nearest (optional upsampling mode),
* 2x2 max/avg pooling with floor semantics (encoder downsampling).

All are separable gathers along H then W; the gather indices are static so
XLA lowers them to cheap dynamic-slice-free selects/concats.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _axis_indices(in_size: int, out_size: int, align_corners: bool):
    """Source taps (i0, i1) and lerp weight t for one axis (numpy, static)."""
    if out_size == 1:
        src = np.zeros((1,), np.float64)
    elif align_corners:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * in_size / out_size - 0.5
        src = np.maximum(src, 0.0)  # torch clamps negative source indices
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    t = (src - i0).astype(np.float32)
    return i0, i1, t


def _up2x_nac_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """x2 bilinear upsample along one axis, align_corners=False.

    The source positions (i+0.5)/2-0.5 form a fixed 2-phase pattern:
    out[2k] = 0.25 x[k-1] + 0.75 x[k], out[2k+1] = 0.75 x[k] + 0.25 x[k+1]
    (edges clamped) — pure shifts, no gather, fuses into neighbours.
    """
    x = jnp.moveaxis(x, axis, 0)
    prev = jnp.concatenate([x[:1], x[:-1]], axis=0)
    nxt = jnp.concatenate([x[1:], x[-1:]], axis=0)
    even = 0.25 * prev + 0.75 * x
    odd = 0.75 * x + 0.25 * nxt
    out = jnp.stack([even, odd], axis=1).reshape((2 * x.shape[0],) + x.shape[1:])
    return jnp.moveaxis(out, 0, axis)


def resize_bilinear(
    x: jnp.ndarray, out_h: int, out_w: int, align_corners: bool = False
) -> jnp.ndarray:
    """Bilinear resize of [..., H, W, C] to [..., out_h, out_w, C]."""
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    if not align_corners and out_h == 2 * h and out_w == 2 * w:
        # hot path (convunet decoder): gather-free 2-phase stencil
        return _up2x_nac_axis(_up2x_nac_axis(x, -3), -2)
    def lerp_rows(a, in_size, out_size):
        # interpolate along axis -3: contiguous whole-row gathers (the
        # same gather along axis -2 would fetch millions of C-wide rows)
        i0, i1, t = _axis_indices(in_size, out_size, align_corners)
        t = t[:, None, None]
        return a[..., i0, :, :] * (1.0 - t) + a[..., i1, :, :] * t

    x = lerp_rows(x, h, out_h)
    x = jnp.swapaxes(x, -3, -2)
    x = lerp_rows(x, w, out_w)
    return jnp.swapaxes(x, -3, -2)


def upsample2x_bilinear(x: jnp.ndarray, align_corners: bool = False) -> jnp.ndarray:
    h, w = x.shape[-3], x.shape[-2]
    return resize_bilinear(x, 2 * h, 2 * w, align_corners)


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest x2 upsample (torch nn.Upsample(mode='nearest'))."""
    x = jnp.repeat(x, 2, axis=-3)
    return jnp.repeat(x, 2, axis=-2)


def maxpool2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 max pool with floor semantics (torch nn.MaxPool2d(2))."""
    *lead, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    x = x[..., : 2 * h2, : 2 * w2, :]
    x = x.reshape(*lead, h2, 2, w2, 2, c)
    return jnp.max(jnp.max(x, axis=-2), axis=-3)


def avgpool2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 average pool with floor semantics."""
    *lead, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    x = x[..., : 2 * h2, : 2 * w2, :]
    x = x.reshape(*lead, h2, 2, w2, 2, c)
    return jnp.mean(jnp.mean(x, axis=-2), axis=-3)
