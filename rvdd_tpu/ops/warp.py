"""Differentiable flow warping with exact torch ``grid_sample`` semantics.

The released RVDD weights were trained with
``grid_sample(mode='bicubic', padding_mode='border', align_corners=True)``
(reference: util/flow_utils.py:70-102), so for checkpoint parity this module
reproduces those numerics exactly:

* bicubic = Keys cubic convolution with A = -0.75 (the torch convention; the
  reference C library's Catmull-Rom A = -0.5 is only used inside TV-L1),
* the fractional position is taken from the *unclipped* source coordinate,
  while each of the 4x4 taps is clamped to the image border individually
  (this is how torch implements border padding for bicubic),
* bilinear/nearest clip the source coordinate first (torch's behaviour for
  those modes).

Flow convention: ``flow[..., 0]`` = horizontal displacement u (pixels),
``flow[..., 1]`` = vertical displacement v.  ``warp(x, flow)`` samples
``x`` at ``(col + u, row + v)`` — i.e. pulls frame ``x`` toward the frame
the flow was computed *from*.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def cubic_kernel(t: jnp.ndarray, a: float = -0.75):
    """Keys cubic convolution weights for taps at offsets (-1, 0, 1, 2).

    ``t`` is the fractional position in [0, 1). Returns 4 weight arrays.
    """
    # |d| <= 1:  (a+2)|d|^3 - (a+3)|d|^2 + 1
    # 1 < |d| < 2:  a|d|^3 - 5a|d|^2 + 8a|d| - 4a
    d0 = t + 1.0
    d3 = 2.0 - t
    w0 = ((a * d0 - 5.0 * a) * d0 + 8.0 * a) * d0 - 4.0 * a
    w1 = ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0
    u = 1.0 - t
    w2 = ((a + 2.0) * u - (a + 3.0)) * u * u + 1.0
    w3 = ((a * d3 - 5.0 * a) * d3 + 8.0 * a) * d3 - 4.0 * a
    return w0, w1, w2, w3


def _gather2d(xf: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray, w: int):
    """Gather pixels from flattened image xf [B, H*W, C] at integer (iy, ix).

    iy/ix are [B, H, W] int32. Returns [B, H, W, C].
    """
    b, hw, c = xf.shape
    idx = (iy * w + ix).reshape(b, -1, 1)
    out = jnp.take_along_axis(xf, idx, axis=1)
    return out.reshape(b, iy.shape[1], iy.shape[2], c)


def _remap_weights(i0, w4, size):
    """Fold torch's per-tap clamping into weights on a contiguous window.

    The 4 taps clip(i0-1+j, 0, size-1) always lie inside the 4-wide window
    starting at s = clip(i0-1, 0, size-4); re-express the tap weights as
    weights over window offsets 0..3 (duplicated edge taps sum up).
    Returns (s, w_rel[4]).
    """
    s = jnp.clip(i0 - 1, 0, size - 4)
    w_rel = []
    offs = [jnp.clip(i0 - 1 + j, 0, size - 1) - s for j in range(4)]
    for k in range(4):
        acc = 0.0
        for j in range(4):
            acc = acc + w4[j] * (offs[j] == k)
        w_rel.append(acc)
    return s, jnp.stack(w_rel, axis=-1)


def _bicubic_block_gather(x: jnp.ndarray, sy, sx, wy_rel, wx_rel, rows_per_chunk: int):
    """Weighted 4x4-neighborhood sampling via contiguous block gathers.

    x: [H, W, C]; sy/sx: [H', W'] int32 window starts; w*_rel: [H', W', 4].
    Gathering each pixel's 4x4xC block as ONE gather (slice_sizes) is the
    TPU-friendly form — per-element flat gathers are ~50x slower.  Chunked
    over output rows to bound the [n, 4, 4, C] intermediate.
    """
    hh, ww = sy.shape
    c = x.shape[-1]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    starts = jnp.stack([sy, sx], axis=-1).reshape(hh * ww, 2)
    wy_f = wy_rel.reshape(hh * ww, 4)
    wx_f = wx_rel.reshape(hh * ww, 4)

    n = hh * ww
    chunk = max(rows_per_chunk * ww, 1)
    pad = (-n) % chunk
    if pad:
        starts = jnp.pad(starts, ((0, pad), (0, 0)))
        wy_f = jnp.pad(wy_f, ((0, pad), (0, 0)))
        wx_f = jnp.pad(wx_f, ((0, pad), (0, 0)))

    def one_chunk(args):
        st, wyc, wxc = args
        blocks = jax.lax.gather(
            x, st, dnums, slice_sizes=(4, 4, c), mode="clip"
        )  # [chunk, 4, 4, C]
        rows = jnp.einsum("nijc,ni->njc", blocks, wyc)
        return jnp.einsum("njc,nj->nc", rows, wxc)

    nchunks = (n + pad) // chunk
    out = jax.lax.map(
        one_chunk,
        (
            starts.reshape(nchunks, chunk, 2),
            wy_f.reshape(nchunks, chunk, 4),
            wx_f.reshape(nchunks, chunk, 4),
        ),
    )
    return out.reshape((n + pad), c)[:n].reshape(hh, ww, c)


@partial(jax.jit, static_argnames=("interp",))
def warp(x: jnp.ndarray, flow: jnp.ndarray, interp: str = "bicubic"):
    """Warp ``x`` [B, H, W, C] by ``flow`` [B, H, W, 2].

    Returns ``(warped, mask)`` where ``mask`` [B, H, W, 1] is 1.0 where the
    source position fell inside the image (reference:
    util/flow_utils.py:95-102).
    """
    b, h, wd, c = x.shape
    gx = jnp.arange(wd, dtype=x.dtype)[None, None, :] + flow[..., 0]
    gy = jnp.arange(h, dtype=x.dtype)[None, :, None] + flow[..., 1]

    mask = (
        (gx >= 0.0) & (gx <= wd - 1.0) & (gy >= 0.0) & (gy <= h - 1.0)
    ).astype(x.dtype)[..., None]

    xf = x.reshape(b, h * wd, c)

    if interp == "bicubic":
        ix = jnp.floor(gx)
        iy = jnp.floor(gy)
        wx = jnp.stack(cubic_kernel(gx - ix), axis=-1)
        wy = jnp.stack(cubic_kernel(gy - iy), axis=-1)
        ix = ix.astype(jnp.int32)
        iy = iy.astype(jnp.int32)
        if jax.default_backend() == "cpu":
            # 16 flat single-element gathers: on CPU the strided block
            # gather below (and its scatter-add transpose) is ~1000x
            # slower; numerics are identical (per-tap border clamp,
            # weights from the unclipped fraction)
            out = 0.0
            for j in range(4):
                iyj = jnp.clip(iy - 1 + j, 0, h - 1)
                for i in range(4):
                    ixi = jnp.clip(ix - 1 + i, 0, wd - 1)
                    v = _gather2d(xf, iyj, ixi, wd)
                    out = out + v * (wy[..., j] * wx[..., i])[..., None]
            return out, mask
        sy, wy_rel = _remap_weights(iy, [wy[..., j] for j in range(4)], h)
        sx, wx_rel = _remap_weights(ix, [wx[..., i] for i in range(4)], wd)
        # ~16 output rows per gather chunk keeps the [n,4,4,C] intermediate
        # under ~100 MB at 1080p/48ch
        rows = max(1, (2 << 20) // max(wd * c, 1))
        outs = [
            _bicubic_block_gather(x[i], sy[i], sx[i], wy_rel[i], wx_rel[i], rows)
            for i in range(b)
        ]
        return jnp.stack(outs), mask

    if interp == "bilinear":
        cgx = jnp.clip(gx, 0.0, wd - 1.0)
        cgy = jnp.clip(gy, 0.0, h - 1.0)
        ix0 = jnp.floor(cgx).astype(jnp.int32)
        iy0 = jnp.floor(cgy).astype(jnp.int32)
        tx = (cgx - ix0)[..., None]
        ty = (cgy - iy0)[..., None]
        ix1 = jnp.minimum(ix0 + 1, wd - 1)
        iy1 = jnp.minimum(iy0 + 1, h - 1)
        v00 = _gather2d(xf, iy0, ix0, wd)
        v01 = _gather2d(xf, iy0, ix1, wd)
        v10 = _gather2d(xf, iy1, ix0, wd)
        v11 = _gather2d(xf, iy1, ix1, wd)
        top = v00 * (1.0 - tx) + v01 * tx
        bot = v10 * (1.0 - tx) + v11 * tx
        return top * (1.0 - ty) + bot * ty, mask

    if interp == "nearest":
        ix0 = jnp.clip(jnp.round(gx), 0, wd - 1).astype(jnp.int32)
        iy0 = jnp.clip(jnp.round(gy), 0, h - 1).astype(jnp.int32)
        return _gather2d(xf, iy0, ix0, wd), mask

    raise ValueError(f"unknown interpolation '{interp}'")


def warp_bicubic(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Convenience wrapper returning only the warped image."""
    return warp(x, flow, "bicubic")[0]


def flow_upsample_2x(flow: jnp.ndarray) -> jnp.ndarray:
    """Upsample a flow field x2 spatially and scale the vectors by 2.

    Used when flows are computed on half-res packed raw but applied to
    full-res demosaicked RGB (reference: util/flow_utils.py:159-174 with
    multiply_by=2 at models/recurrent_model.py:129).  Bilinear with
    align_corners=True, matching torch F.interpolate.
    """
    import numpy as np

    from rvdd_tpu.ops.resize import _axis_indices, resize_bilinear

    h, w = flow.shape[-3], flow.shape[-2]
    c = flow.shape[-1]
    if flow.ndim >= 3 and c <= 4:
        # fast path: C is tiny, so the generic resize (C on the lane axis +
        # two transposes) wastes 126/128 lanes and measures ~7 ms at 1080p.
        # Keep [.., H, W*C] interleaved on lanes: rows are a static
        # gather+lerp.  For columns, each output column k reads input
        # columns j0(k), j1(k) with 2*j0(k)-k and 2*j1(k)-k bounded in
        # [-2, 2], so after duplicating every input column (rep), the
        # column lerp is <=5 static lane shifts with per-column weight
        # vectors — pure VPU work (a [W*C, 2W*C] constant matmul here
        # wastes ~W x the useful FLOPs and measured 4 ms at 1080p).
        lead = flow.shape[:-3]
        x = flow.reshape(lead + (h, w * c)).astype(jnp.float32)
        i0, i1, t = _axis_indices(h, 2 * h, True)
        tj = jnp.asarray(t)[:, None]
        x = x[..., i0, :] * (1.0 - tj) + x[..., i1, :] * tj
        j0, j1, tw = _axis_indices(w, 2 * w, True)
        rep = jnp.broadcast_to(
            x[..., :, None, :].reshape(lead + (2 * h, w, 1, c)),
            lead + (2 * h, w, 2, c),
        ).reshape(lead + (2 * h, 2 * w * c))
        shift_w: dict = {}
        for k in range(2 * w):
            for j, wk in ((j0[k], 1.0 - tw[k]), (j1[k], tw[k])):
                s = int(2 * j - k)
                vec = shift_w.setdefault(s, np.zeros(2 * w * c, np.float32))
                vec[k * c : (k + 1) * c] += wk
        pad = max(max(abs(s) for s in shift_w), 1) * c
        repp = jnp.pad(rep, [(0, 0)] * (rep.ndim - 1) + [(pad, pad)])
        out = None
        for s, vec in sorted(shift_w.items()):
            seg = jax.lax.slice_in_dim(
                repp, pad + s * c, pad + s * c + 2 * w * c, axis=rep.ndim - 1
            )
            term = seg * jnp.asarray(vec)
            out = term if out is None else out + term
        return (2.0 * out).reshape(lead + (2 * h, 2 * w, c))
    return resize_bilinear(flow, 2 * h, 2 * w, align_corners=True) * 2.0
