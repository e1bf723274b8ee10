"""Differentiable displacement-banded bicubic warp (the TPU training path).

The generic XLA warp (ops/warp.py) is exact but reverse-mode AD of its
block gather is a scatter-add over per-pixel 4x4 windows, which XLA:TPU
serializes per index — the production train step measured ~67 s because of
it.  This module computes the same torch ``grid_sample(bicubic, border,
align_corners=True)`` numerics (reference: util/flow_utils.py:70-102) as

    dynamic slices (base displacement) + static lane shifts (residual
    sweep) + elementwise FMAs,

so autodiff produces only ``dynamic_update_slice`` / pad transposes — no
scatter.  The structure mirrors the inference Pallas kernel
(ops/pallas/warp_rowmajor.py) in pure XLA:

* the **global mean horizontal displacement** is absorbed into one dynamic
  column slice of an edge-replicated padded copy; the per-pixel horizontal
  residual sweeps a static window of ``2*radius_h + 4`` lane shifts;
* the **per-band mean vertical displacement** (8-row bands) is absorbed
  into each band's window slice start; the vertical tap sweep covers the
  window's ``rows_win = band + 2*radius_v + 4`` rows;
* per-tap border clamping is exact: absolute tap indices are clipped to
  the image *before* being folded into per-offset weight planes, which is
  identical to torch's border padding for bicubic.

Approximation (same class as the Pallas kernel's, documented there):
per-pixel residuals beyond the radius clamp to the window edge.  For TV-L1
video flows the residuals are a few pixels and nothing clamps; when the
window covers the whole image (``rows_win == H``) the vertical pass is
exact for any flow, and the horizontal pass is exact whenever
``|u - round(mean(u))| <= radius_h - 2``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from rvdd_tpu.ops.warp import cubic_kernel


def _warp_shift_one(
    x: jnp.ndarray,  # [H, W, C]
    flow: jnp.ndarray,  # [H, W, 2]
    radius_v: int,
    radius_h: int,
    max_base: int,
    band_rows: int,
):
    h, w, c = x.shape
    u = flow[..., 0].astype(jnp.float32)
    v = flow[..., 1].astype(jnp.float32)

    rb = min(band_rows, h)
    while h % rb:
        rb -= 1
    nb = h // rb
    rows_win = min(rb + 2 * radius_v + 4, h)
    nh = 2 * radius_h + 4

    # --- vertical: per-band base displacement -> window slice starts
    vb = jnp.round(jnp.mean(v.reshape(nb, -1), axis=1))
    vb = jnp.clip(vb, -max_base, max_base).astype(jnp.int32)
    band0 = jnp.arange(nb, dtype=jnp.int32) * rb
    win_start = jnp.clip(band0 + vb - (radius_v + 1), 0, h - rows_win)

    # vertical tap weights folded into per-window-row planes:
    # wv[j, r, c] = sum_k wy_k(r,c) * [window_row_of_tap_k(r,c) == j]
    rows = jnp.arange(h, dtype=jnp.float32)[:, None]
    gy = rows + v
    iy = jnp.floor(gy)
    wy = cubic_kernel(gy - iy)
    iy = iy.astype(jnp.int32)
    ws_row = jnp.repeat(win_start, rb)[:, None]  # [H, 1]
    rel = [
        jnp.clip(jnp.clip(iy - 1 + k, 0, h - 1) - ws_row, 0, rows_win - 1)
        for k in range(4)
    ]
    wv = jnp.stack(
        [sum(wy[k] * (rel[k] == j) for k in range(4)) for j in range(rows_win)]
    )  # [rows_win, H, W]

    # --- horizontal: global base displacement -> one dynamic column slice
    qx = jnp.round(jnp.mean(u))
    qx = jnp.clip(qx, -max_base, max_base).astype(jnp.int32)
    pad_w = max_base + radius_h + 3
    xp = jnp.concatenate(
        [
            jnp.broadcast_to(x[:, :1], (h, pad_w, c)),
            x,
            jnp.broadcast_to(x[:, w - 1 : w], (h, pad_w, c)),
        ],
        axis=1,
    )
    # x_al[:, j] = x_border[j + qx - radius_h - 1]  (absolute, border-clipped)
    x_al = lax.dynamic_slice_in_dim(
        xp, pad_w + qx - (radius_h + 1), w + nh, axis=1
    )

    # horizontal tap weights folded into per-lane-offset planes:
    # wh[o, r, c] = sum_k wx_k(r,c) * [lane_offset_of_tap_k(r,c) == o]
    cols = jnp.arange(w, dtype=jnp.float32)[None, :]
    gx = cols + u
    ix = jnp.floor(gx)
    wx = cubic_kernel(gx - ix)
    ix = ix.astype(jnp.int32)
    coli = jnp.arange(w, dtype=jnp.int32)[None, :]
    off = [
        jnp.clip(
            jnp.clip(ix - 1 + k, 0, w - 1) - qx + radius_h + 1 - coli,
            0,
            nh - 1,
        )
        for k in range(4)
    ]
    wh = jnp.stack(
        [sum(wx[k] * (off[k] == o) for k in range(4)) for o in range(nh)]
    )  # [nh, H, W]

    # --- band windows: vmapped dynamic row slice (transpose: nb contiguous
    # block adds, not a per-pixel scatter)
    wins = jax.vmap(
        lambda s: lax.dynamic_slice_in_dim(x_al, s, rows_win, axis=0)
    )(win_start)  # [nb, rows_win, w+nh, C]

    wv_b = wv.reshape(rows_win, nb, rb, w)  # scan axis leading
    wh_b = wh.reshape(nh, nb, rb, w)
    wins_t = jnp.swapaxes(wins, 0, 1)  # [rows_win, nb, w+nh, C]

    def body(acc, inp):
        row, wvj = inp  # [nb, w+nh, C], [nb, rb, w]
        for o in range(nh):
            wgt = (wvj * wh_b[o]).astype(x.dtype)  # [nb, rb, w]
            seg = row[:, o : o + w]  # [nb, w, C] static lane shift
            acc = acc + wgt[..., None] * seg[:, None]
        return acc, None

    acc0 = jnp.zeros((nb, rb, w, c), x.dtype)
    acc, _ = lax.scan(body, acc0, (wins_t, wv_b))
    return acc.reshape(h, w, c)


def _clamp_fraction_one(
    flow: jnp.ndarray,  # [H, W, 2]
    radius_v: int,
    radius_h: int,
    max_base: int,
    band_rows: int,
):
    """Fraction of pixels with at least one nonzero-weight bicubic tap that
    the banded sweep would clamp to the window edge (telemetry for the
    training path's approximation envelope; mirrors the index math of
    ``_warp_shift_one`` exactly)."""
    h, w = flow.shape[0], flow.shape[1]
    u = flow[..., 0].astype(jnp.float32)
    v = flow[..., 1].astype(jnp.float32)

    rb = min(band_rows, h)
    while h % rb:
        rb -= 1
    nb = h // rb
    rows_win = min(rb + 2 * radius_v + 4, h)
    nh = 2 * radius_h + 4

    vb = jnp.round(jnp.mean(v.reshape(nb, -1), axis=1))
    vb = jnp.clip(vb, -max_base, max_base).astype(jnp.int32)
    band0 = jnp.arange(nb, dtype=jnp.int32) * rb
    win_start = jnp.clip(band0 + vb - (radius_v + 1), 0, h - rows_win)
    ws_row = jnp.repeat(win_start, rb)[:, None]

    rows = jnp.arange(h, dtype=jnp.float32)[:, None]
    gy = rows + v
    iy = jnp.floor(gy)
    wy = cubic_kernel(gy - iy)
    iy = iy.astype(jnp.int32)
    v_clamped = jnp.zeros((h, w), bool)
    for k in range(4):
        rel = jnp.clip(iy - 1 + k, 0, h - 1) - ws_row
        out = (rel < 0) | (rel > rows_win - 1)
        v_clamped |= out & (wy[k] != 0.0)

    qx = jnp.clip(jnp.round(jnp.mean(u)), -max_base, max_base).astype(jnp.int32)
    cols = jnp.arange(w, dtype=jnp.float32)[None, :]
    gx = cols + u
    ix = jnp.floor(gx)
    wx = cubic_kernel(gx - ix)
    ix = ix.astype(jnp.int32)
    coli = jnp.arange(w, dtype=jnp.int32)[None, :]
    h_clamped = jnp.zeros((h, w), bool)
    for k in range(4):
        off = jnp.clip(ix - 1 + k, 0, w - 1) - qx + radius_h + 1 - coli
        out = (off < 0) | (off > nh - 1)
        h_clamped |= out & (wx[k] != 0.0)

    return jnp.mean((v_clamped | h_clamped).astype(jnp.float32))


def clamp_fraction(
    flow: jnp.ndarray,  # [..., H, W, 2] any leading batch axes
    radius_v: int = 8,
    radius_h: int = 8,
    max_base: int = 48,
    band_rows: int = 8,
) -> jnp.ndarray:
    """Mean fraction of pixels whose warp would be approximated (clamped)
    by ``warp_shift`` under the given sweep geometry.  Zero for TV-L1 video
    flows; nonzero means the training gradients are silently wrong for
    those pixels and the radius should be raised (ops/warp_shift.py:26-31)."""
    f2 = flow.reshape((-1,) + flow.shape[-3:])
    fr = jax.vmap(
        lambda f: _clamp_fraction_one(f, radius_v, radius_h, max_base, band_rows)
    )(f2)
    return jnp.mean(fr)


@partial(
    jax.jit,
    static_argnames=("radius_v", "radius_h", "max_base", "band_rows"),
)
def warp_shift(
    x: jnp.ndarray,  # [B, H, W, C]
    flow: jnp.ndarray,  # [B, H, W, 2]
    radius_v: int = 8,
    radius_h: int = 8,
    max_base: int = 48,
    band_rows: int = 8,
):
    """Warp ``x`` by ``flow`` with grid_sample-bicubic numerics; returns
    ``(warped, mask)`` like ops/warp.py:warp (mask = in-bounds source)."""
    b, h, wd, _ = x.shape
    gx = jnp.arange(wd, dtype=x.dtype)[None, None, :] + flow[..., 0]
    gy = jnp.arange(h, dtype=x.dtype)[None, :, None] + flow[..., 1]
    mask = (
        (gx >= 0.0) & (gx <= wd - 1.0) & (gy >= 0.0) & (gy <= h - 1.0)
    ).astype(x.dtype)[..., None]
    outs = [
        _warp_shift_one(x[i], flow[i], radius_v, radius_h, max_base, band_rows)
        for i in range(b)
    ]
    return jnp.stack(outs), mask
