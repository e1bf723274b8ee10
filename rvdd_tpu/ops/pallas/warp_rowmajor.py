"""Pallas TPU bicubic flow-warp v3: row-major planar layout, slice-based taps.

Replaces warp_pallas.py on the fused inference path.  The v2 kernel's cost
was dominated by dynamic rotates of the full f32 window per displacement
step (measured: 25 ms at 1080p/51ch even for zero flow, 49 ms for realistic
pans).  This kernel eliminates rotates entirely:

* activations use the same row-major planar layout as the fused conv
  chains, ``[H, C, W]`` (C on sublanes, W on lanes) — a vertical tap shift
  is a *dynamic slice on the untiled leading row axis*, which is free
  addressing, not data movement;
* the per-tile mean vertical displacement is absorbed into the window DMA
  offset, and the global mean horizontal displacement into a one-pass XLA
  pre-alignment, so the in-kernel sweep only covers the residual;
* the horizontal residual sweep is STATIC (e in [-E, E]), so every shifted
  read is a static lane slice folded into the FMA — no rolls;
* per-pixel tap weights (4 bicubic taps each axis, displacement-bucketed)
  are precomputed once per row tile into VMEM scratch and shared across all
  channel groups (v2 recomputed them per group);
* accumulators live in registers per (8-row x 512-lane) chunk.

Semantics: torch grid_sample bicubic, border padding, align_corners=True
(matches ops/warp.py:warp and the v2 kernel; reference:
util/flow_utils.py:70-102).  Approximations, both documented at the call
sites: displacements clamp to +-max_disp (as v2); the *horizontal residual*
relative to the global mean clamps to +-e_halo and the *vertical residual*
relative to the tile mean to a d_max-row band — for TV-L1 video flows these
clamp nothing (residuals are a few pixels); pathological flow fields
degrade gracefully to edge-of-band taps.  Forward-only; training uses the
XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rvdd_tpu.ops.warp import cubic_kernel

#: lane geometry of the pre-padded planar state layout: producers (the dec2
#: chain kernel / engine helpers) store [128 edge-replicated lanes | image |
#: edge-replicated tail], so the warp needs no XLA slice+concat pre-pass.
#: 128 >= l0 + max_disp and the total stays lane-tile aligned.
STATE_PAD_LEFT = 128
STATE_LANE_EXTRA = 256


def _warp_kernel(
    # grid: (n_tiles, n_groups), g inner
    ubar_ref,  # SMEM [1] i32
    win_start_ref,  # SMEM [n_tiles] i32
    u_ref,  # VMEM [th, wl] f32 block (residual u)
    v_ref,  # VMEM [th, wl] f32 block
    x_ref,  # ANY [h, C, wlp] bf16 (pre-aligned)
    out_ref,  # VMEM [th, K, wl] block
    wd_ref,  # scratch [d_max, th, wl] f32
    we_ref,  # scratch [2E+1, th, wl] f32
    dsc_ref,  # scratch SMEM [2 + 2*n_rc*n_lc] i32: tile dmin/n_d + per-chunk
    win_ref,  # scratch [rows_win, K, wlp] bf16
    sem,
    *,
    th: int,
    wl: int,
    wlp: int,
    l0: int,
    e_halo: int,
    d_max: int,
    rows_win: int,
    h_img: int,
    w_img: int,
    kc: int,
    rc: int,
    tc: int,
    max_disp: int,
    coeff_a: float,
    debug_skip: str = "",
):
    i = pl.program_id(0)
    g = pl.program_id(1)
    n_tiles = pl.num_programs(0)
    n_groups = pl.num_programs(1)
    seq = i * n_groups + g
    slot = jax.lax.rem(seq, 2)

    # the window scratch carries th fringe rows on each side: the d-loop
    # bounds are tile-wide, so a chunk's slice start can precede its own
    # valid range — fringe rows are read with zero weight, and must be
    # zeroed once so 0 * garbage can't produce NaN
    @pl.when((i == 0) & (g == 0))
    def _zero_fringe():
        for s in range(2):
            win_ref[s, 0:th] = jnp.zeros((th, kc, wlp), win_ref.dtype)
            win_ref[s, th + rows_win : 2 * th + rows_win] = jnp.zeros(
                (th, kc, wlp), win_ref.dtype
            )

    def win_copy(ti, gi, sl):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(win_start_ref[ti], rows_win), pl.ds(gi * kc, kc), :],
            win_ref.at[sl, pl.ds(th, rows_win)],
            sem.at[sl],
        )

    # double-buffered window pipeline: the copy for THIS (tile, group) was
    # started one grid step ago (or in the prologue); start the NEXT step's
    # copy into the other slot before blocking, so the DMA engine streams
    # continuously instead of exposing its latency 105x per frame
    if debug_skip != "nodma":
        @pl.when(seq == 0)
        def _prologue():
            win_copy(i, g, slot).start()

        @pl.when(seq < n_tiles * n_groups - 1)
        def _start_next():
            wrap = g + 1 == n_groups
            g_n = jnp.where(wrap, 0, g + 1)
            i_n = jnp.where(wrap, i + 1, i)
            win_copy(i_n, g_n, 1 - slot).start()

    if debug_skip == "mask":
        # timing attribution: skip the weight/mask build; emit deterministic
        # bounds so the sweep loops run a representative trip count
        @pl.when(g == 0)
        def _stub_bounds():
            dsc_ref[0] = -2
            dsc_ref[1] = jnp.int32(min(5, d_max))
            n_lc = wl // tc
            n_rc = th // rc
            for rj in range(n_rc):
                for lc in range(n_lc):
                    k2 = 2 + 2 * (rj * n_lc + lc)
                    dsc_ref[k2] = -2
                    dsc_ref[k2 + 1] = jnp.int32(min(5, d_max))

    build_masks = debug_skip != "mask"

    @pl.when(g == 0 if build_masks else g < 0)
    def _build_masks():
        rows = jax.lax.broadcasted_iota(jnp.int32, (th, wl), 0) + i * th
        cols = jax.lax.broadcasted_iota(jnp.int32, (th, wl), 1)
        rowsf = rows.astype(jnp.float32)
        colsf = cols.astype(jnp.float32)

        v = jnp.clip(v_ref[:, :], -1.0 * max_disp, 1.0 * max_disp)
        gy = rowsf + v
        iy = jnp.floor(gy)
        wy = cubic_kernel(gy - iy, coeff_a)
        iy = iy.astype(jnp.int32)

        # vertical taps: window-relative displacement, clamped to the DMA'd
        # window and to a d_max-row band around the tile minimum
        ws = win_start_ref[i]
        lo = ws - rows
        hi = lo + rows_win - 1
        dys = [
            jnp.clip(jnp.clip(iy - 1 + k, 0, h_img - 1) - rows, lo, hi)
            for k in range(4)
        ]
        # the displacement box must ignore the zero lane padding of the flow
        # planes, or it widens to the union with displacement 0
        valid = cols < w_img
        dlo_all = jnp.where(valid, dys[0], 2**30)
        dhi_all = jnp.where(valid, dys[3], -(2**30))
        dmin = jnp.min(dlo_all)
        dmax = jnp.max(dhi_all)
        n_d = jnp.minimum(dmax - dmin + 1, d_max)
        dsc_ref[0] = dmin
        dsc_ref[1] = n_d
        dys = [jnp.clip(d, dmin, dmin + n_d - 1) for d in dys]
        # per-(row-chunk, lane-chunk) displacement bounds: v varies across
        # the tile, so the tile-wide band oversweeps — each rc x tc chunk
        # only iterates its own [dmin_c, dmax_c] (clamped into the tile
        # band, so the wd planes built below cover it)
        n_lc = wl // tc
        n_rc = th // rc
        for rj in range(n_rc):
            for lc in range(n_lc):
                sub_lo = dlo_all[rj * rc : (rj + 1) * rc, lc * tc : (lc + 1) * tc]
                sub_hi = dhi_all[rj * rc : (rj + 1) * rc, lc * tc : (lc + 1) * tc]
                dmin_c = jnp.clip(jnp.min(sub_lo), dmin, dmin + n_d - 1)
                dmax_c = jnp.clip(jnp.max(sub_hi), dmin, dmin + n_d - 1)
                k2 = 2 + 2 * (rj * n_lc + lc)
                dsc_ref[k2] = dmin_c
                dsc_ref[k2 + 1] = dmax_c - dmin_c + 1

        def d_plane(dd, _):
            d = dmin + dd
            plane = (
                wy[0] * (dys[0] == d)
                + wy[1] * (dys[1] == d)
                + wy[2] * (dys[2] == d)
                + wy[3] * (dys[3] == d)
            )
            wd_ref[pl.ds(dd, 1)] = plane[None]
            return 0

        jax.lax.fori_loop(0, n_d, d_plane, 0)

        # horizontal taps in pre-aligned lane coordinates: residual around
        # lane offset l0, clamped to +-e_halo
        ub = ubar_ref[0]
        u = jnp.clip(
            u_ref[:, :],
            -1.0 * max_disp - ub.astype(jnp.float32),
            1.0 * max_disp - ub.astype(jnp.float32),
        )
        gx = colsf + u
        ix = jnp.floor(gx)
        wx = cubic_kernel(gx - ix, coeff_a)
        ix = ix.astype(jnp.int32) + ub  # global integer column
        exs = [
            jnp.clip(
                jnp.clip(ix - 1 + k, 0, w_img - 1) - ub + l0 - cols,
                l0 - e_halo,
                l0 + e_halo,
            )
            for k in range(4)
        ]
        for ee in range(2 * e_halo + 1):
            e = l0 - e_halo + ee
            plane = (
                wx[0] * (exs[0] == e)
                + wx[1] * (exs[1] == e)
                + wx[2] * (exs[2] == e)
                + wx[3] * (exs[3] == e)
            )
            we_ref[ee : ee + 1] = plane[None]

    if debug_skip != "nodma":
        win_copy(i, g, slot).wait()

    dmin = dsc_ref[0]
    n_lc = wl // tc
    n_rc = th // rc

    for lc in range(n_lc):
        lane0 = lc * tc

        def rc_body(rj, _):
            r0 = pl.multiple_of(rj * rc, rc)
            # window row of output row G = i*th + r0 + rr is
            # (G - win_start) + d; base for rr=0:
            base = i * th + r0 - win_start_ref[i]
            k2 = 2 + 2 * (rj * n_lc + lc)
            dmin_c = dsc_ref[k2]
            nd_c = dsc_ref[k2 + 1]

            def d_body(dj, acc):
                # +th: fringe offset of the window scratch.  Load only the
                # 128-aligned [lane0, lane0+tc+128) slice the e-sweep can
                # touch (l0 +- e_halo stays inside because l0 + e_halo <=
                # 128), not the full wlp width, and convert to f32 once —
                # the per-ee slice+convert of the full row was ~4x the
                # useful VMEM/convert traffic.
                rows_d = win_ref[
                    slot, pl.ds(base + dmin_c + dj + th, rc), :,
                    lane0 : lane0 + tc + 128,
                ]  # [rc, K, tc+128]
                rows_f = rows_d.astype(jnp.float32)
                wd = wd_ref[
                    pl.ds(dmin_c - dmin + dj, 1), pl.ds(r0, rc), lane0 : lane0 + tc
                ][0]
                if debug_skip == "fma":
                    return acc + rows_f[:, :, l0 : l0 + tc]
                # NOTE: a per-iteration lax.cond skip of unused displacements
                # was measured NET NEGATIVE (realistic flow 19 -> 37 ms):
                # conds block Mosaic pipelining. The adaptive e_halo switch
                # in the wrapper handles sweep narrowing instead.
                for ee in range(2 * e_halo + 1):
                    we = we_ref[ee, pl.ds(r0, rc), lane0 : lane0 + tc]
                    # column c of the tile reads pre-aligned lane c + e,
                    # e = l0 - e_halo + ee (matching the we plane)
                    o = l0 - e_halo + ee
                    seg = rows_f[:, :, o : o + tc]
                    acc = acc + (wd * we)[:, None, :] * seg
                return acc

            if debug_skip in ("dloop", "nodma"):
                acc = win_ref[
                    slot, pl.ds(base + th, rc), :, l0 : l0 + tc
                ].astype(jnp.float32)
            else:
                acc = jax.lax.fori_loop(
                    0, nd_c, d_body, jnp.zeros((rc, kc, tc), jnp.float32)
                )
            if lane0 + tc > w_img:  # zero the pad lanes at the right edge
                lanes = (
                    jax.lax.broadcasted_iota(jnp.int32, (1, 1, tc), 2) + lane0
                )
                acc = acc * (lanes < w_img)
            out_ref[pl.ds(r0, rc), :, lane0 : lane0 + tc] = acc.astype(
                out_ref.dtype
            )
            return 0

        jax.lax.fori_loop(0, n_rc, rc_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "h_img", "w_img", "max_disp", "e_halo", "d_max", "tile_h", "group",
        "tile_c", "coeff_a", "out_dtype", "interpret", "prepadded",
        "win_dtype", "debug_skip",
    ),
)
def warp_planar_pallas(
    x: jnp.ndarray,  # [(H*C), WL] bf16/f32 planar row-major
    flow: jnp.ndarray,  # [H, W, 2] f32 (u, v)
    h_img: int,
    w_img: int,
    max_disp: int = 48,
    e_halo: int = 8,
    d_max: int = 16,
    tile_h: int = 72,
    group: int = 8,
    tile_c: int = 512,
    coeff_a: float = -0.75,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    prepadded: bool = False,
    win_dtype=None,
    debug_skip: str = "",
) -> jnp.ndarray:
    """Bicubic warp of planar x by flow; returns [(H*C), WL] out_dtype.

    prepadded: x is [(H*C), WL + STATE_LANE_EXTRA] with edge-replicated
    margins already in place (STATE_PAD_LEFT lanes left) — skips the XLA
    edge-pad pre-pass (a full HBM round trip per call)."""
    if debug_skip:
        # timing-attribution stubs produce garbage output by design; keep
        # them unreachable from production call sites (tools set the env)
        import os

        assert os.environ.get("RVDD_DEBUG_SKIP"), (
            "debug_skip is a profiling aid that skips compute stages; set "
            "RVDD_DEBUG_SKIP=1 to acknowledge (tools/warp_attrib.py does)"
        )
    hc, wl = x.shape
    if prepadded:
        wl = wl - STATE_LANE_EXTRA
    assert hc % h_img == 0
    c = hc // h_img
    assert c % 8 == 0, "planar channel count must divide by 8"
    kc = min(group, c)
    assert c % kc == 0
    th = tile_h
    while h_img % th:
        th -= 8
    assert th >= 8 and h_img % th == 0
    rc = 8
    # largest 128-multiple divisor of wl that is <= tile_c (min() alone
    # fails for lane counts like 640 that are 128- but not tile_c-multiples)
    tc = next(
        (t for t in range(min(tile_c, wl) // 128 * 128, 0, -128) if wl % t == 0),
        None,
    )
    if tc is None:
        raise ValueError(
            f"warp_planar_pallas: lane width {wl} has no 128-multiple divisor"
            " <= tile_c (planar lane counts must be 128-multiples;"
            " see conv_pallas.lane_width)"
        )
    n_tiles = h_img // th
    l0 = 64
    wlp = wl + 128
    # the window only needs to cover the d_max-row displacement band around
    # the tile mean (per-pixel taps clamp into the window anyway); a
    # max_disp-sized halo would make the DMA 2.4x larger for nothing
    pad_y = d_max + 3
    rows_win = min(th + 2 * pad_y, h_img)

    # window dtype defaults to the input dtype (fp32 in = exact fp32 taps);
    # win_dtype=bfloat16 overrides it for a fast warp of an fp32 carry: the
    # HBM copy of the state stays rounding-free for the recurrence feedback
    # (engine._fused_state_dtype), while the warp's window rounds to bf16 —
    # a per-frame *input* rounding, the same class the bf16 conv bands
    # already impose, which does not accumulate across frames.  Measured:
    # fp32 windows cost +5.6 ms at 1080p/56ch vs bf16 windows.
    if win_dtype is None:
        win_dtype = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
    x3 = x.reshape(h_img, c, -1).astype(win_dtype)

    u = jnp.clip(flow[..., 0], -max_disp, max_disp)
    v = jnp.clip(flow[..., 1], -max_disp, max_disp)
    ubar = jnp.round(jnp.mean(u)).astype(jnp.int32)
    u_res = jnp.pad(u - ubar.astype(jnp.float32), ((0, 0), (0, wl - w_img)))
    v_pl = jnp.pad(v, ((0, 0), (0, wl - w_img)))

    # horizontal pre-alignment: x_pre[:, :, cpre] = x_edge[cpre - l0 + ubar]
    if prepadded:
        # margins already edge-replicated by the producer; only the dynamic
        # global-mean shift remains
        assert STATE_PAD_LEFT - l0 - max_disp >= 0  # dyn slice start >= 0
        assert STATE_PAD_LEFT - l0 + max_disp + wlp <= wl + STATE_LANE_EXTRA
        x_pre = jax.lax.dynamic_slice_in_dim(
            x3, STATE_PAD_LEFT - l0 + ubar, wlp, axis=2
        )
    else:
        left = jnp.repeat(x3[:, :, :1], l0 + max_disp, axis=2)
        right = jnp.repeat(
            x3[:, :, w_img - 1 : w_img], wlp + max_disp - l0 - w_img, axis=2
        )
        xpad = jnp.concatenate([left, x3[:, :, :w_img], right], axis=2)
        x_pre = jax.lax.dynamic_slice_in_dim(
            xpad, max_disp + ubar, wlp, axis=2
        )

    # per-tile mean vertical displacement -> window DMA offset
    vbar = jnp.round(jnp.mean(v.reshape(n_tiles, -1), axis=1)).astype(jnp.int32)
    starts = jnp.arange(n_tiles, dtype=jnp.int32) * th + vbar - pad_y
    win_start = jnp.clip(starts, 0, h_img - rows_win)

    def call(eh):
        kern = functools.partial(
            _warp_kernel,
            th=th, wl=wl, wlp=wlp, l0=l0, e_halo=eh, d_max=d_max,
            rows_win=rows_win, h_img=h_img, w_img=w_img, kc=kc, rc=rc, tc=tc,
            max_disp=max_disp, coeff_a=coeff_a, debug_skip=debug_skip,
        )
        return pl.pallas_call(
            kern,
            grid=(n_tiles, c // kc),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((th, wl), lambda i, g: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((th, wl), lambda i, g: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (th, kc, wl), lambda i, g: (i, g, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((h_img, c, wl), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((d_max, th, wl), jnp.float32),
                pltpu.VMEM((2 * eh + 1, th, wl), jnp.float32),
                pltpu.SMEM((2 + 2 * (th // rc) * (wl // tc),), jnp.int32),
                pltpu.VMEM((2, rows_win + 2 * th, kc, wlp), win_dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            ubar.reshape(1),
            win_start,
            u_res,
            v_pl,
            x_pre,
        )

    # adaptive sweep width: the per-pixel lane displacements are exact up to
    # +-e_halo of the global mean; pick the narrowest kernel that covers this
    # flow's residual (XLA-level switch — in-kernel conds kill pipelining)
    halos = sorted({h for h in (2, 4, e_halo) if h <= e_halo})
    if len(halos) == 1 or interpret:
        out = call(e_halo)
    else:
        fu = jnp.floor(u_res[:, :w_img])
        e_need = jnp.maximum(jnp.max(fu) + 2.0, -(jnp.min(fu) - 1.0))
        idx = sum(
            (e_need > jnp.float32(h)).astype(jnp.int32) for h in halos[:-1]
        )
        out = jax.lax.switch(idx, [lambda e=e: call(e) for e in halos])
    return out.reshape(hc, wl)
