"""Pallas TPU kernel: flow warping with bicubic (torch grid_sample) numerics.

Why a kernel: XLA lowers per-pixel gathers on TPU to ~60M rows/s — a 1080p
48-channel feature warp costs ~2 s.  The VPU has no vector gather at all,
so this kernel reformulates the warp as a *displacement-bounded shift
accumulation*:

    out(p) = sum_{j,i} wy_j(p) wx_i(p) * x[cy_j(p), cx_i(p)]
           = sum_{d,e}  W_de(p) * window[p + (d, e)]

where (d, e) ranges over the integer displacements actually present in the
tile (data-dependent ``fori_loop`` bounds — TV-L1 flows are smooth, so this
is a handful of iterations) and ``W_de = (sum_j wy_j [dy_j = d]) * (sum_i
wx_i [dx_i = e])`` folds the 4x4 bicubic taps into separable per-shift
masks.  Performance structure:

* channels are processed in groups of K as one [K, wh, ww] window — one
  roll serves K channels,
* tiles span the full row by default: narrow tiles pay the x-halo and the
  lane-roll wraparound repeatedly (64x512 tiles are ~4x slower than
  64x1920 at 1080p),
* the (d, e) sweep uses two *incremental* rolls (shift by one per
  iteration) instead of per-iteration dynamic rotates,
* shifts with all-zero weights (box corners) are skipped,
* each tile DMAs its haloed window HBM->VMEM once per channel group.

Semantics match rvdd_tpu.ops.warp.warp(..., 'bicubic') (torch grid_sample,
border padding, align_corners=True) for displacements up to ``max_disp``;
larger displacements are clamped (the reference masks those pixels as
invalid anyway).  Forward-only: training uses the shift warp (ops/warp_shift.py; patch-sized
inputs, differentiable).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rvdd_tpu.ops.warp import cubic_kernel


def _warp_kernel(
    # grid: (tiles_h, tiles_w, C // K); channel-group g innermost
    u_ref,  # [TH, TW] VMEM u-plane block (cached across g)
    v_ref,  # [TH, TW] VMEM v-plane block
    x_ref,  # [Cp, Hp, Wp] in ANY/HBM (manual DMA)
    out_ref,  # [K, TH, TW] VMEM block of the output planes
    win_ref,  # scratch VMEM [K, TH + 2Py, TW + 2Px]
    sem,  # DMA semaphore
    *,
    th: int,
    tw: int,
    kc: int,
    pad_y: int,
    pad_x: int,
    max_disp: int,
    h: int,
    w: int,
    coeff_a: float,
    skip_empty: bool,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    g = pl.program_id(2)

    copy = pltpu.make_async_copy(
        x_ref.at[
            pl.ds(g * kc, kc),
            pl.ds(i * th, th + 2 * pad_y),
            pl.ds(j * tw, tw + 2 * pad_x),
        ],
        win_ref,
        sem,
    )
    copy.start()

    y0 = i * th
    x0 = j * tw
    rows = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) + y0
    cols = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + x0

    u = jnp.clip(u_ref[:, :], -1.0 * max_disp, 1.0 * max_disp)
    v = jnp.clip(v_ref[:, :], -1.0 * max_disp, 1.0 * max_disp)
    gy = rows.astype(jnp.float32) + v
    gx = cols.astype(jnp.float32) + u
    iy = jnp.floor(gy)
    ix = jnp.floor(gx)
    wy = cubic_kernel(gy - iy, coeff_a)
    wx = cubic_kernel(gx - ix, coeff_a)
    iy = iy.astype(jnp.int32)
    ix = ix.astype(jnp.int32)

    # integer tap displacements relative to the output pixel (clamped taps,
    # monotone in tap index)
    dys = [jnp.clip(iy - 1 + k, 0, h - 1) - rows for k in range(4)]
    dxs = [jnp.clip(ix - 1 + k, 0, w - 1) - cols for k in range(4)]
    dmin = jnp.min(dys[0])
    dmax = jnp.max(dys[3])
    emin = jnp.min(dxs[0])
    emax = jnp.max(dxs[3])

    copy.wait()
    wh = th + 2 * pad_y
    ww = tw + 2 * pad_x
    # bf16 windows halve the HBM traffic, but Mosaic's dynamic rotate is
    # 32-bit only — convert once per tile before the shift sweep
    winf = win_ref[:, :, :].astype(jnp.float32)

    def d_body(d, acc):
        wd = (
            wy[0] * (dys[0] == d)
            + wy[1] * (dys[1] == d)
            + wy[2] * (dys[2] == d)
            + wy[3] * (dys[3] == d)
        )

        def active(acc):
            # slice to the tile height before sweeping lanes: the e-loop
            # carry is then [K, th, ww] instead of the full window
            rows_d = pltpu.roll(winf, wh - (pad_y + d) % wh, 1)[:, :th, :]
            rows_e0 = pltpu.roll(rows_d, ww - (pad_x + emin) % ww, 2)

            def e_body(e, ecarry):
                acc_in, rows_e = ecarry
                we = (
                    wx[0] * (dxs[0] == e)
                    + wx[1] * (dxs[1] == e)
                    + wx[2] * (dxs[2] == e)
                    + wx[3] * (dxs[3] == e)
                )

                def add(a):
                    return a + (wd * we)[None] * rows_e[:, :, :tw]

                if skip_empty:
                    acc_out = jax.lax.cond(
                        jnp.any(we != 0.0), add, lambda a: a, acc_in
                    )
                else:
                    acc_out = add(acc_in)
                # advance the lane shift by one (static roll)
                return (acc_out, pltpu.roll(rows_e, ww - 1, 2))

            acc, _ = jax.lax.fori_loop(emin, emax + 1, e_body, (acc, rows_e0))
            return acc

        if skip_empty:
            return jax.lax.cond(jnp.any(wd != 0.0), active, lambda a: a, acc)
        return active(acc)

    acc0 = jnp.zeros((kc, th, tw), jnp.float32)
    acc = jax.lax.fori_loop(dmin, dmax + 1, d_body, acc0)
    out_ref[:, :, :] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_disp", "tile_h", "tile_w", "group", "coeff_a", "zero_outside", "skip_empty"
    ),
)
def warp_bicubic_pallas(
    x: jnp.ndarray,  # [B, H, W, C]
    flow: jnp.ndarray,  # [B, H, W, 2]
    max_disp: int = 48,
    tile_h: int = 64,
    tile_w: int = 2048,
    group: int = 8,
    coeff_a: float = -0.75,
    zero_outside: bool = False,
    skip_empty: bool = False,
):
    """Bicubic flow warp on TPU via the shift-accumulation kernel.

    coeff_a selects the cubic convolution family: -0.75 = torch grid_sample
    (the model path), -0.5 = Catmull-Rom (the TV-L1 solver's C numerics).
    zero_outside=True reproduces bicubic_interpolation_warp(border_out=true):
    a pixel is zeroed whenever any of its 4x4 taps left the image.
    skip_empty predicates each shift on having nonzero weight — measured
    NET NEGATIVE for realistic flows (lax.cond blocks Mosaic pipelining:
    57 -> 38 ms without it at 1080p/48ch); enable only for flow fields with
    extreme outliers that blow up the displacement bounding box.

    Returns (warped [B, H, W, C], mask [B, H, W, 1]).
    """
    b, h, w, c = x.shape
    # dynamic rotates need natively-tiled register shapes:
    # (8, 128) for f32, (16, 128) for bf16
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    pad_y = -(-(max_disp + 3) // sub) * sub
    pad_x = -(-(max_disp + 3) // 64) * 64  # 2*pad_x keeps lanes 128-aligned

    # mask arithmetic stays fp32 (bf16 cannot represent pixel indices)
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :] + flow[..., 0].astype(jnp.float32)
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None] + flow[..., 1].astype(jnp.float32)
    mask = (
        (gx >= 0.0) & (gx <= w - 1.0) & (gy >= 0.0) & (gy <= h - 1.0)
    ).astype(x.dtype)[..., None]

    th = min(tile_h, -(-h // sub) * sub)
    tw = min(tile_w, -(-w // 128) * 128)
    hp = -(-h // th) * th
    wp = -(-w // tw) * tw
    kc = min(group, c)
    cp = -(-c // kc) * kc

    # planar channel-first layout, edge padding = border-clamped taps
    xp = jnp.moveaxis(x, -1, 1)  # [B, C, H, W]
    xp = jnp.pad(
        xp,
        ((0, 0), (0, cp - c), (pad_y, pad_y + hp - h), (pad_x, pad_x + wp - w)),
        mode="edge",
    )
    flp = jnp.pad(flow, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    up = flp[..., 0]
    vp = flp[..., 1]

    kern = functools.partial(
        _warp_kernel,
        th=th,
        tw=tw,
        kc=kc,
        pad_y=pad_y,
        pad_x=pad_x,
        max_disp=max_disp,
        h=h,
        w=w,
        coeff_a=coeff_a,
        skip_empty=skip_empty,
    )
    grid = (hp // th, wp // tw, cp // kc)

    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((th, tw), lambda i, j, g: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw), lambda i, j, g: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (kc, th, tw), lambda i, j, g: (g, i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((cp, hp, wp), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((kc, th + 2 * pad_y, tw + 2 * pad_x), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )

    outs = []
    for bi in range(b):
        o = call(up[bi], vp[bi], xp[bi])
        outs.append(jnp.moveaxis(o[:c, :h, :w], 0, -1))
    out = jnp.stack(outs)
    if zero_outside:
        # C-solver boundary rule: zero wherever the 4x4 stencil clamps
        inside = (
            (gx >= 1.0) & (gx < w - 2.0) & (gy >= 1.0) & (gy < h - 2.0)
        ).astype(out.dtype)[..., None]
        out = out * inside
    return out, mask
