"""Pallas TPU fused ConvNeXt-block chains for the 'newunet' fast path.

A ConvNeXt block (reference: networks/new_unet.py:74-103) is
    proj?(1x1) -> [dw7x7 -> channel-LN -> 1x1 x4 expand -> GELU -> 1x1]
    * layerscale + residual.
The XLA path pays a full HBM round trip per stage (measured 236 ms forward
at 1080p).  This kernel runs whole chains of blocks on a VMEM row band in
the same row-major planar layout as conv_pallas.py:

* 1x1 convs are per-row MXU dots [Cout, Cin] @ [Cin, WL] (out-channels on
  the fine-granularity M dimension);
* the depthwise 7x7 runs on the VPU as 49 lane-shifted FMAs per row with
  per-channel [48, 1] tap weights broadcast over lanes;
* channel LayerNorm is a sublane reduction;
* GELU uses the tanh approximation (the documented fast-inference mode;
  the exact-erf reference path stays on XLA).

Zero-padding semantics are preserved the same way as conv_pallas.py: band
lanes >= W and rows outside the image are re-zeroed after every block, so
the depthwise taps read true zeros at borders (torch Conv2d padding=3).

Supports: a second input (recurrent features) concatenated to block 0's
output, multi-emit, and align_corners=True row upsampling of a half-res
input (the decoder path; lanes are pre-upsampled by an XLA matmul resize).
Forward-only; training uses the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F = 48  # the architecture's constant width


def _erf(x):
    """Polynomial erf (Abramowitz-Stegun 7.1.26, max abs err 1.5e-7):
    Mosaic has no erf lowering, and exact-GELU parity needs better than the
    tanh approximation (~1e-3 abs err)."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_erf(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def pack_block(p, cin: int):
    """Flax ConvNeXtBlock params -> flat packed arrays for the kernel.

    Returns (arrays, has_proj): arrays =
      [proj_w?, proj_b?, dwT, dw_b, ln_g, ln_b, pw1, pw1_b, pw2, pw2_b, ls]
    """
    f32 = jnp.float32
    out = []
    has_proj = "proj" in p
    if has_proj:
        k = p["proj"]["kernel"].astype(f32).reshape(-1, F)  # [cin, 48]
        if k.shape[0] < cin:  # zero-pad the input-channel dim
            k = jnp.pad(k, ((0, cin - k.shape[0]), (0, 0)))
        out.append(jnp.transpose(k, (1, 0)))  # [48, cin]
        out.append(p["proj"]["bias"].astype(f32).reshape(F, 1))
    dwk = p["dw"]["kernel"].astype(f32)  # [7, 7, 1, 48]
    out.append(jnp.transpose(dwk.reshape(49, F), (1, 0)))  # [48, 49]
    out.append(p["dw"]["bias"].astype(f32).reshape(F, 1))
    out.append(p["ln"]["weight"].astype(f32).reshape(F, 1))
    out.append(p["ln"]["bias"].astype(f32).reshape(F, 1))
    out.append(jnp.transpose(p["pw1"]["kernel"].astype(f32).reshape(F, 4 * F), (1, 0)))
    out.append(p["pw1"]["bias"].astype(f32).reshape(4 * F, 1))
    out.append(jnp.transpose(p["pw2"]["kernel"].astype(f32).reshape(4 * F, F), (1, 0)))
    out.append(p["pw2"]["bias"].astype(f32).reshape(F, 1))
    out.append(p["layerscale"]["layerscale"].astype(f32).reshape(F, 1))
    return out, has_proj


def _cnx_kernel(
    *refs,
    th: int,
    wl: int,
    w_img: int,
    h_img: int,
    n_blocks: int,
    has_proj: Sequence[bool],
    cins: Sequence[int],
    emit: Sequence[int],
    combine,  # None | (total_c, pad_l, lane_total): single combined output
    aux_c: int,
    aux_off: int,
    n_tiles: int,
    upsample_input: bool,
    ksize: int,
    n_tail: int,  # trailing 1x1 head layers (w [cout, 48], b) appended
    tail_couts: Sequence[int],
    out_dtype,
    band_dtype,
    precision,
    gelu_exact: bool,
    dw_engine: str,  # 'vpu' | 'mxu' | 'mxu2'
    dw_rows: int,
    dw_group: int,
    ln_impl: str,
    debug_skip: tuple,
):
    r_half = ksize // 2
    n_in = 2 if aux_c else 1
    x_ref = refs[0]
    aux_ref = refs[1] if aux_c else None
    pos = n_in
    block_refs = []
    for b in range(n_blocks):
        n = (11 if has_proj[b] else 9)
        block_refs.append(refs[pos : pos + n])
        pos += n
    tail_refs = refs[pos : pos + 2 * n_tail]
    pos += 2 * n_tail
    n_outs = 1 if combine else (len(emit) + n_tail)
    out_refs = refs[pos : pos + n_outs]
    dw_mxu = dw_engine in ("mxu", "mxu2")
    scratch = list(refs[pos + n_outs :])
    win_x = scratch.pop(0)
    win_lo = scratch.pop(0) if upsample_input else None
    win_aux = scratch.pop(0) if aux_c else None
    sem = scratch.pop()
    pat = scratch.pop() if dw_mxu else None
    bands = scratch

    i = pl.program_id(0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, wl), 1)
    lane_mask = (lanes < w_img).astype(jnp.float32)

    # ---- input band ---------------------------------------------------
    # halos[b] = rows of context needed each side before block b
    halos = [0] * (n_blocks + 1)
    for b in range(n_blocks - 1, -1, -1):
        halos[b] = halos[b + 1] + r_half

    cx = cins[0]
    if upsample_input:
        h_lo = (h_img + 1) // 2
        h0 = halos[0]
        rows = th + 2 * h0
        rows_lo = min(th // 2 + h0 + 2, h_lo)
        low_start = jnp.maximum(
            jnp.minimum((i * th - h0) * (h_lo - 1) // (2 * h_lo - 1) - 1, h_lo - rows_lo),
            0,
        )
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(low_start, rows_lo)], win_lo, sem)
        cp.start()
        cp.wait()

        scale = (h_lo - 1.0) / (2.0 * h_lo - 1.0)  # align_corners=True, x2

        def build_row(r, carry):
            g = i * th - h0 + r
            src = jnp.clip(g.astype(jnp.float32) * scale, 0.0, h_lo - 1.0)
            j0 = jnp.floor(src).astype(jnp.int32)
            t = src - j0.astype(jnp.float32)
            j1 = jnp.minimum(j0 + 1, h_lo - 1)
            a = win_lo[pl.ds(j0 - low_start, 1)][0].astype(jnp.float32)
            bn = win_lo[pl.ds(j1 - low_start, 1)][0].astype(jnp.float32)
            row = (1.0 - t) * a + t * bn
            in_img = ((g >= 0) & (g < h_img)).astype(jnp.float32)
            win_x[pl.ds(pl.multiple_of(r * cx, 8), cx), :] = (
                row * in_img
            ).astype(band_dtype)
            return carry

        jax.lax.fori_loop(0, rows, build_row, 0)
    else:
        rows = th + 2 * halos[0]

        def dma(src_lo, n, dst_lo):
            cp = pltpu.make_async_copy(
                x_ref.at[pl.ds(src_lo * cx, n * cx)],
                win_x.at[pl.ds(dst_lo * cx, n * cx)],
                sem,
            )
            cp.start()
            cp.wait()

        h0 = halos[0]
        if n_tiles == 1:
            win_x[: h0 * cx] = jnp.zeros((h0 * cx, wl), band_dtype)
            win_x[(h0 + th) * cx :] = jnp.zeros((h0 * cx, wl), band_dtype)
            dma(0, th, h0)
        else:

            @pl.when(i == 0)
            def _():
                win_x[: h0 * cx] = jnp.zeros((h0 * cx, wl), band_dtype)
                dma(0, th + h0, h0)

            @pl.when(i == n_tiles - 1)
            def _():
                win_x[(h0 + th) * cx :] = jnp.zeros((h0 * cx, wl), band_dtype)
                dma(i * th - h0, th + h0, 0)

            @pl.when((i > 0) & (i < n_tiles - 1))
            def _():
                dma(i * th - h0, rows, 0)

    if aux_c:
        h1 = halos[1]
        rows_a = th + 2 * h1

        def dma_a(src_lo, n, dst_lo):
            cp = pltpu.make_async_copy(
                aux_ref.at[pl.ds(src_lo, n), pl.ds(aux_off, aux_c), :],
                win_aux.at[pl.ds(dst_lo, n)],
                sem,
            )
            cp.start()
            cp.wait()

        if n_tiles == 1:
            win_aux[0:h1] = jnp.zeros((h1, aux_c, wl), band_dtype)
            win_aux[h1 + th : rows_a] = jnp.zeros((h1, aux_c, wl), band_dtype)
            dma_a(0, th, h1)
        else:

            @pl.when(i == 0)
            def _():
                win_aux[0:h1] = jnp.zeros((h1, aux_c, wl), band_dtype)
                dma_a(0, th + h1, h1)

            @pl.when(i == n_tiles - 1)
            def _():
                win_aux[h1 + th : rows_a] = jnp.zeros((h1, aux_c, wl), band_dtype)
                dma_a(i * th - h1, th + h1, 0)

            @pl.when((i > 0) & (i < n_tiles - 1))
            def _():
                dma_a(i * th - h1, rows_a, 0)

    # ---- blocks -------------------------------------------------------
    in_band = win_x
    in_c = cx
    emit_idx = 0
    for b in range(n_blocks):
        prefs = list(block_refs[b])
        if has_proj[b]:
            proj_w = prefs.pop(0)[:, :]
            proj_b = prefs.pop(0)[:, :]
        else:
            proj_w = None
        dwT = prefs[0][:, :]
        dw_b = prefs[1][:, :]
        ln_g = prefs[2][:, :]
        ln_b = prefs[3][:, :]
        pw1 = prefs[4][:, :]
        pw1_b = prefs[5][:, :]
        pw2 = prefs[6][:, :]
        pw2_b = prefs[7][:, :]
        ls = prefs[8][:, :]

        h_in = halos[b]
        h_out = halos[b + 1]
        rows_in = th + 2 * h_in
        rows_out = th + 2 * h_out
        aux_here = aux_c if (b == 1 and aux_c) else 0
        band_in = in_band
        out_band = bands[b]

        # proj pass (1x1) over the whole input band into the shared proj
        # scratch (bands layout: [block outputs x n_blocks] + [proj band])
        pband = bands[n_blocks] if proj_w is not None else None
        if proj_w is not None:

            def proj_row(r, carry, *, band_in=band_in, in_c=in_c,
                         aux_here=aux_here, proj_w=proj_w, proj_b=proj_b,
                         h_in=h_in):
                xrow = band_in[pl.ds(pl.multiple_of(r * in_c, 8), in_c), :]
                if aux_here:
                    arow = win_aux[pl.ds(r, 1)].reshape(aux_here, wl)
                    xrow = jnp.concatenate([xrow, arow], axis=0)
                y = jax.lax.dot_general(
                    proj_w, xrow, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                ) + proj_b
                # zero-pad semantics: halo rows outside the image must stay
                # zero (the bias would otherwise leak into the dw borders)
                g = i * th + r - h_in
                in_img = ((g >= 0) & (g < h_img)).astype(jnp.float32)
                pband[pl.ds(pl.multiple_of(r * F, 8), F), :] = (
                    y * (lane_mask * in_img)
                ).astype(band_dtype)
                return carry

            jax.lax.fori_loop(0, rows_in, proj_row, 0)
            src_band = pband
        else:
            src_band = band_in

        # recurrence-state feat emit: dual-write the block output straight
        # from the f32 value BEFORE the band cast (bf16 carry rounding
        # feeds back through the recurrence; band rounding does not) —
        # mirrors conv_pallas's combined emit.  This also keeps the fp32
        # carry VMEM-free: the old approach ran the whole chain with fp32
        # bands, which at 1080p exceeded every feasible row tile.
        dual_state = (b in emit) and combine is not None and combine[0] > 8

        def state_write(y, r, *, h_out=h_out):
            rr = r - h_out  # row within the tile's state block

            @pl.when((rr >= 0) & (rr < th))
            def _():
                out_refs[0][
                    pl.ds(rr, 1), 8 : 8 + F, combine[1] : combine[1] + wl
                ] = y[None].astype(out_refs[0].dtype)

        def finish_row(acc, r, *, src_band=src_band, ln_g=ln_g, ln_b=ln_b,
                       pw1=pw1, pw1_b=pw1_b, pw2=pw2, pw2_b=pw2_b, ls=ls,
                       h_out=h_out, out_band=out_band):
            # channel LayerNorm (biased variance, eps 1e-6)
            u = jnp.mean(acc, axis=0, keepdims=True)
            d = acc - u
            s2 = jnp.mean(d * d, axis=0, keepdims=True)
            hn = d * jax.lax.rsqrt(s2 + 1e-6)
            hn = hn * ln_g + ln_b
            h1 = jax.lax.dot_general(
                pw1, hn.astype(band_dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                # pin the MXU precision per fused-precision mode so a global
                # jax_default_matmul_precision (the exact-parity mode) can't
                # force an unsupported fp32-contract on bf16 operands
                precision=precision,
            ) + pw1_b
            h1 = _gelu_erf(h1) if gelu_exact else jax.nn.gelu(h1, approximate=True)
            h2 = jax.lax.dot_general(
                pw2, h1.astype(band_dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            ) + pw2_b
            xc = src_band[
                pl.ds(pl.multiple_of((r + r_half) * F, 8), F), :
            ].astype(jnp.float32)
            y = xc + ls * h2
            g = i * th + r - h_out
            in_img = ((g >= 0) & (g < h_img)).astype(jnp.float32)
            y = y * (lane_mask * in_img)
            out_band[pl.ds(pl.multiple_of(r * F, 8), F), :] = y.astype(
                band_dtype
            )
            if dual_state:
                state_write(y, r)

        if dw_mxu:
            # depthwise 7x7 as an im2col MXU dot: build a dy-major stack of
            # lane-shifted planes shared by dw_rows output rows (7-row
            # overlap between consecutive outputs), then one
            # [48, 49*48] @ [49*48, WL] dot per row.  dwT here is the
            # channel-block-diagonal dense matrix (see wrapper).  The dense
            # dot does 48x redundant FLOPs but the MXU runs it much faster
            # than the 49-FMA VPU sweep, and the stack amortizes the lane
            # shifts (70 planes per 4 rows vs 196).  LN/GELU/pw run ONCE per
            # group on the lane-concatenated [*, rb*WL] batch: per-op issue
            # overhead dominates the per-row cost (measured), so batching
            # rows on lanes divides it by rb.
            rb = min(dw_rows, rows_out)
            n_groups = -(-rows_out // rb)
            n_dy = rb + ksize - 1

            def block_group(gi, carry, *, src_band=src_band, dwd=dwT,
                            dw_b=dw_b, ln_g=ln_g, ln_b=ln_b, pw1=pw1,
                            pw1_b=pw1_b, pw2=pw2, pw2_b=pw2_b, ls=ls,
                            h_out=h_out, out_band=out_band,
                            rows_out=rows_out, rb=rb, n_dy=n_dy):
                # clamp the last group so it overlaps instead of overrunning
                # (rewrites are idempotent: rows are pure fns of src_band)
                r0 = jnp.minimum(gi * rb, rows_out - rb)
                # group-major stack: row (cg * n_dy*ksize + t) * gw + c,
                # so each channel group's planes are t-contiguous and the
                # per-group dense dot contracts K = 49*gw only (the dense
                # dw dot's redundancy is gw x, not 48x)
                gw = dw_group
                n_cg = F // gw
                tpg = n_dy * ksize  # planes per group
                if "pat" in debug_skip:
                    pass
                elif dw_engine == "mxu2":
                    # unshifted stack, cg-major/dy-inner: 7x fewer plane
                    # builds than 'mxu' (no rotated copies; the dx shifts
                    # are applied to the dy-contracted dot result instead)
                    for dy in range(n_dy):
                        row = src_band[
                            pl.ds(pl.multiple_of((r0 + dy) * F, 8), F), :
                        ]
                        if n_cg == 1:
                            pat[dy * F : (dy + 1) * F, :] = row
                        else:
                            for cg in range(n_cg):
                                pat[
                                    (cg * n_dy + dy) * gw
                                    : (cg * n_dy + dy + 1) * gw, :
                                ] = row[cg * gw : (cg + 1) * gw]
                else:
                    for dy in range(n_dy):
                        row = src_band[
                            pl.ds(pl.multiple_of((r0 + dy) * F, 8), F), :
                        ]
                        for dx in range(ksize):
                            t = dy * ksize + dx
                            sft = dx - r_half
                            if sft == 0:
                                seg = row
                            else:
                                seg = jnp.concatenate(
                                    [row[:, sft:], row[:, :sft]], axis=1
                                )
                            for cg in range(n_cg):
                                pat[
                                    (cg * tpg + t) * gw : (cg * tpg + t + 1) * gw, :
                                ] = seg[cg * gw : (cg + 1) * gw]
                # inter-op storage dtype: f32 measured faster than bf16
                # (the extra casts outweigh the VPU-stream bandwidth saved)
                it = jnp.float32
                if "dw" in debug_skip:
                    acc = jnp.broadcast_to(
                        dw_b.astype(it), (F, rb * wl)
                    ) + pat[:F, :1]
                elif dw_engine == "mxu2":
                    # dy-contraction on the MXU: per (j, cg) one
                    # [7gw, 7gw] @ [7gw, wl] dot over the unshifted dy
                    # window yields s[(dx, c)] = sum_dy w[c,dy,dx]*row;
                    # then 7 lane-rotate+adds fold the dx axis.  Same MAC
                    # count as 'mxu' (49*gw*F*wl per row), 7x less operand
                    # streaming and no shifted stack build.
                    dws = []
                    for j in range(rb):
                        per_cg = []
                        for cg in range(n_cg):
                            s = jax.lax.dot_general(
                                dwd[cg * ksize * gw : (cg + 1) * ksize * gw, :],
                                pat[
                                    (cg * n_dy + j) * gw
                                    : (cg * n_dy + j + ksize) * gw,
                                    :,
                                ],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=precision,
                            )
                            a = None
                            for dx in range(ksize):
                                sft = dx - r_half
                                seg = s[dx * gw : (dx + 1) * gw, :]
                                if sft != 0:
                                    seg = jnp.concatenate(
                                        [seg[:, sft:], seg[:, :sft]], axis=1
                                    )
                                a = seg if a is None else a + seg
                            per_cg.append(a)
                        dws.append(
                            per_cg[0] if n_cg == 1
                            else jnp.concatenate(per_cg, axis=0)
                        )
                    acc = (jnp.concatenate(dws, axis=1) + dw_b).astype(it)
                else:
                    dws = [
                        jnp.concatenate(
                            [
                                jax.lax.dot_general(
                                    dwd[cg * gw : (cg + 1) * gw, :],
                                    pat[
                                        (cg * tpg + j * ksize) * gw
                                        : (cg * tpg + (j + ksize) * ksize) * gw,
                                        :,
                                    ],
                                    (((1,), (0,)), ((), ())),
                                    # Mosaic matmul accumulators must be
                                    # 32-bit; storage casts happen after
                                    preferred_element_type=jnp.float32,
                                    precision=precision,
                                )
                                for cg in range(n_cg)
                            ],
                            axis=0,
                        )
                        for j in range(rb)
                    ]
                    acc = (jnp.concatenate(dws, axis=1) + dw_b).astype(it)
                if "ln" in debug_skip:
                    hn = acc
                elif ln_impl == "mxu":
                    # channel stats as ones-dots (sublane reductions are
                    # slow on the VPU); E[x^2]-u^2 form, fast mode only
                    ones = jnp.full((8, F), 1.0 / F, band_dtype)
                    ab = acc.astype(band_dtype)
                    u = jax.lax.dot_general(
                        ones, ab, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )[:1]
                    ex2 = jax.lax.dot_general(
                        ones, (acc * acc).astype(band_dtype),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )[:1]
                    s2 = jnp.maximum(ex2 - u * u, 0.0)
                    hn = ((acc.astype(jnp.float32) - u)
                          * jax.lax.rsqrt(s2 + 1e-6))
                    hn = (hn * ln_g + ln_b).astype(it)
                else:
                    # channel LayerNorm (biased variance, eps 1e-6); stats
                    # accumulate in f32 regardless of storage dtype
                    a32 = acc.astype(jnp.float32)
                    u = jnp.mean(a32, axis=0, keepdims=True)
                    d = a32 - u
                    s2 = jnp.mean(d * d, axis=0, keepdims=True)
                    hn = d * jax.lax.rsqrt(s2 + 1e-6)
                    hn = (hn * ln_g + ln_b).astype(it)
                if "pw" in debug_skip:
                    h2 = hn
                else:
                    h1 = (jax.lax.dot_general(
                        pw1, hn.astype(band_dtype), (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    ) + pw1_b).astype(it)
                    if "gelu" not in debug_skip:
                        h1 = _gelu_erf(h1) if gelu_exact else jax.nn.gelu(
                            h1, approximate=True
                        )
                    h2 = (jax.lax.dot_general(
                        pw2, h1.astype(band_dtype), (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    ) + pw2_b).astype(it)
                for j in range(rb):
                    r = r0 + j
                    xc = src_band[
                        pl.ds(pl.multiple_of((r + r_half) * F, 8), F), :
                    ]
                    y = xc.astype(it) + (ls.astype(it)
                                         * h2[:, j * wl : (j + 1) * wl])
                    g = i * th + r - h_out
                    in_img = ((g >= 0) & (g < h_img)).astype(it)
                    y = y * (lane_mask.astype(it) * in_img)
                    out_band[pl.ds(pl.multiple_of(r * F, 8), F), :] = (
                        y.astype(band_dtype)
                    )
                    if dual_state:
                        state_write(y, r)
                return carry

            jax.lax.fori_loop(0, n_groups, block_group, 0)
        else:

            def block_row(r, carry, *, src_band=src_band, dwT=dwT,
                          dw_b=dw_b, finish_row=finish_row):
                # depthwise 7x7: 49 lane-shifted FMAs (f32 accumulate)
                acc = jnp.broadcast_to(dw_b, (F, wl)).astype(jnp.float32)
                for dy in range(ksize):
                    row = src_band[
                        pl.ds(pl.multiple_of((r + dy) * F, 8), F), :
                    ]
                    for dx in range(ksize):
                        t = dy * ksize + dx
                        sft = dx - r_half
                        if sft == 0:
                            seg = row
                        else:
                            seg = jnp.concatenate(
                                [row[:, sft:], row[:, :sft]], axis=1
                            )
                        acc = acc + dwT[:, t : t + 1] * seg.astype(jnp.float32)
                finish_row(acc, r)
                return carry

            jax.lax.fori_loop(0, rows_out, block_row, 0)

        if b in emit and combine:
            # recurrence-state feat emit handled row-wise by state_write
            # (dual-written from the f32 block output before the band cast)
            pass
        elif b in emit:
            out_refs[emit_idx][:, :] = out_band[
                h_out * F : (h_out + th) * F, :
            ].astype(out_refs[emit_idx].dtype)
            emit_idx += 1

        in_band = out_band
        in_c = F

    # trailing 1x1 head (e.g. post_final 48 -> out)
    if n_tail:
        for tl in range(n_tail):
            tw = tail_refs[2 * tl][:, :]
            tb = tail_refs[2 * tl + 1][:, :]
            cout = tail_couts[tl]
            out_ref = out_refs[0] if combine else out_refs[emit_idx]
            emit_idx += 1
            pad_l = combine[1] if combine else 0

            def tail_row(r, carry, *, tw=tw, tb=tb, cout=cout,
                         out_ref=out_ref, in_band=in_band, pad_l=pad_l):
                xrow = in_band[pl.ds(pl.multiple_of(r * F, 8), F), :]
                y = jax.lax.dot_general(
                    tw, xrow, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                ) + tb
                y = y * lane_mask
                if combine:
                    out_ref[pl.ds(r, 1), 0:cout, pad_l : pad_l + wl] = (
                        y.astype(out_ref.dtype)[None]
                    )
                else:
                    out_ref[pl.ds(pl.multiple_of(r * cout, 8), cout), :] = (
                        y.astype(out_ref.dtype)
                    )
                return carry

            jax.lax.fori_loop(0, th, tail_row, 0)

    if combine:
        # edge-replicate the lane margins of the whole state buffer once
        tc_, pad_l, lane_total = combine
        edge_l = out_refs[0][:, :, pad_l : pad_l + 1]
        out_refs[0][:, :, 0:pad_l] = jnp.broadcast_to(
            edge_l, (th, tc_, pad_l)
        )
        edge_r = out_refs[0][:, :, pad_l + w_img - 1 : pad_l + w_img]
        out_refs[0][:, :, pad_l + w_img : lane_total] = jnp.broadcast_to(
            edge_r, (th, tc_, lane_total - pad_l - w_img)
        )


PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,  # fp32 operands: 3-pass bf16 (~fp32)
    "highest": jax.lax.Precision.HIGHEST,
}


@functools.partial(
    jax.jit,
    static_argnames=(
        "h_img", "w_img", "emit", "combine", "tile_h", "out_dtype", "aux_channels",
        "upsample_input", "ksize", "tail_couts", "has_proj", "band_dtype",
        "mxu_precision", "gelu_exact", "dw_impl", "dw_rows", "dw_group",
        "ln_impl", "debug_skip", "interpret",
    ),
)
def fused_convnext_chain(
    x: jnp.ndarray,  # [(H*Cx), WL] bf16 (or [(H/2*Cx), WL] with upsample)
    blocks,  # tuple of tuples of packed arrays (pack_block)
    has_proj,  # tuple of bool (static via blocks structure)
    h_img: int,
    w_img: int,
    aux: Optional[jnp.ndarray] = None,
    emit: Sequence[int] = (),
    combine=None,  # (total_c, pad_l, lane_total): single pre-padded
    #   recurrence-state output [head tail at ch 0 | emitted block at ch 8]
    tail=(),  # ((w [cout,48], b [cout]), ...) trailing 1x1 head layers
    tile_h: int = 0,
    out_dtype=jnp.bfloat16,
    aux_channels=None,
    upsample_input: bool = False,
    ksize: int = 7,
    tail_couts=(),
    band_dtype=jnp.bfloat16,  # inter-stage activation storage precision
    mxu_precision: str = "default",  # 'default' (1-pass bf16) | 'high'
    gelu_exact: bool = False,  # erf GELU (reference) vs tanh approximation
    dw_impl: str = "mxu",  # depthwise engine: 'mxu' (im2col dot) |
    #   'mxu2' (dy-dot over an unshifted stack + dx rotate-adds) | 'vpu'
    dw_rows: int = 8,  # output rows sharing one patch stack (mxu mode)
    dw_group: int = 16,  # channels per dw dense dot (K = 49*group)
    ln_impl: str = "vpu",  # LayerNorm stats: 'vpu' sublane reduce | 'mxu'
    debug_skip: tuple = (),  # profiling aid: skip {'dw','ln','gelu','pw'}
    interpret: bool = False,
):
    """Run a fused chain of ConvNeXt blocks; returns one array per emit
    (+ one per tail layer)."""
    if debug_skip:
        # timing-attribution stubs produce garbage output by design; keep
        # them unreachable from production call sites (tools set the env)
        import os

        assert os.environ.get("RVDD_DEBUG_SKIP"), (
            "debug_skip is a profiling aid that skips compute stages; set "
            "RVDD_DEBUG_SKIP=1 to acknowledge (tools/cnx_chain_bench.py "
            "--attrib does)"
        )
    nb = len(blocks)
    emit = tuple(emit) if emit else (nb - 1,)
    wl = x.shape[-1]
    if upsample_input:
        h_lo = (h_img + 1) // 2
        assert x.shape[0] % h_lo == 0
        cx = x.shape[0] // h_lo
        x = x.reshape(h_lo, cx, wl)
    else:
        assert x.shape[0] % h_img == 0
        cx = x.shape[0] // h_img
    assert cx % 8 == 0

    if aux is not None:
        aux_full = aux.shape[0] // h_img
        aux_off, aux_c = aux_channels if aux_channels else (0, aux_full)
        aux = aux.reshape(h_img, aux_full, wl)
    else:
        aux_off, aux_c = 0, 0

    cins = []
    cin = cx
    for b in range(nb):
        cins.append(cin)
        cin = F

    halos = [0] * (nb + 1)
    for b in range(nb - 1, -1, -1):
        halos[b] = halos[b + 1] + ksize // 2

    auto_tile = tile_h <= 0
    if auto_tile:
        # pick (tile, dw_rows) jointly: feasibility = band scratch +
        # double-buffered outputs + the live f32 group intermediates
        # (acc/hn/h1/h2 at [48/48/192/48, dw_rows*wl] — they surface as
        # register-spill VMEM, ~20M at dw_rows=8, and OOM if ignored);
        # preference = least per-output-row work (halo overhead) scaled by
        # the measured per-row cost of the dw_rows grouping.
        budget = 118 * 1024 * 1024

        def est(t, rows):
            bands = sum((t + 2 * halos[b + 1]) * F for b in range(nb))
            bands += (t + 2 * halos[0]) * cx
            if upsample_input:
                bands += (t // 2 + halos[0] + 2) * cx
            if any(has_proj):
                bands += (t + 2 * max(halos[b] for b in range(nb) if has_proj[b])) * F
            if aux_c:
                bands += (t + 2 * halos[1]) * aux_c
            if dw_impl == "mxu":
                bands += (rows + ksize - 1) * ksize * F
            elif dw_impl == "mxu2":
                bands += (rows + ksize - 1) * F  # unshifted stack
            outs = 2 * t * (F * len(emit) + sum(tail_couts))
            vm = (
                bands * jnp.dtype(band_dtype).itemsize
                + outs * jnp.dtype(out_dtype).itemsize
            ) * wl
            if dw_impl in ("mxu", "mxu2"):
                vm += (3 * F + 4 * F) * rows * wl * 4  # f32 intermediates
            return vm

        rowcost = {8: 0.93, 4: 1.0, 2: 1.12}
        best = None
        cands = tuple(r for r in (8, 4, 2) if r <= dw_rows) or (2,)
        for rows in cands if dw_impl in ("mxu", "mxu2") else (1,):
            for t in (72, 60, 54, 48, 40, 36, 32, 30, 24, 20, 18, 16, 12, 8):
                if h_img % t or t <= halos[0] or est(t, rows) >= budget:
                    continue
                bandrows = sum(t + 2 * halos[b + 1] for b in range(nb))
                cost = bandrows / t * rowcost.get(rows, 1.0)
                if best is None or cost < best[0]:
                    best = (cost, t, rows)
        import os as _os

        if best is None and _os.environ.get("RVDD_DEBUG_TILER"):
            for t in (72, 60, 54, 48, 40, 36, 32, 30, 24, 20, 18, 16, 12, 8):
                print(f"[tiler-cand] t={t} div={h_img % t == 0} "
                      f"gt_halo={t > halos[0]} est2={est(t, 2) / 1e6:.0f}MB")
        if best is None:
            tile_h, dw_rows = h_img, 2
        else:
            _, tile_h, dw_rows = best
            if dw_impl not in ("mxu", "mxu2"):
                dw_rows = 1
        if _os.environ.get("RVDD_DEBUG_TILER"):
            print(
                f"[tiler] h={h_img} w={w_img} nb={nb} cx={cx} emit={emit} "
                f"combine={combine is not None} ups={upsample_input} "
                f"aux_c={aux_c} tails={len(tail_couts)} halo0={halos[0]} "
                f"-> tile_h={tile_h} dw_rows={dw_rows} "
                f"est={est(tile_h, dw_rows) / 1e6 if auto_tile else -1:.0f}MB"
            )
    assert h_img % tile_h == 0 and tile_h > halos[0]
    n_tiles = h_img // tile_h

    kern = functools.partial(
        _cnx_kernel,
        th=tile_h, wl=wl, w_img=w_img, h_img=h_img, n_blocks=nb,
        has_proj=tuple(has_proj), cins=tuple(cins), emit=emit,
        combine=combine,
        aux_c=aux_c, aux_off=aux_off, n_tiles=n_tiles,
        upsample_input=upsample_input, ksize=ksize, n_tail=len(tail),
        tail_couts=tuple(tail_couts), out_dtype=out_dtype,
        band_dtype=band_dtype, precision=PRECISIONS[mxu_precision],
        gelu_exact=gelu_exact, dw_engine=dw_impl, dw_rows=dw_rows,
        dw_group=dw_group, ln_impl=ln_impl, debug_skip=tuple(debug_skip),
    )

    if dw_impl == "mxu":
        # expand each [48, 49] per-channel tap matrix into per-group
        # block-diagonal dense matrices [48, 49*g]:
        # dwd[cg_base + c, t*g + c2] = dwT[cg_base + c, t] iff c2 == c
        # (matching the group-major patch-stack plane order)
        assert F % dw_group == 0
        g = dw_group
        eye = jnp.eye(g, dtype=jnp.float32)
        nbs = []
        for blk, hp in zip(blocks, has_proj):
            blk = list(blk)
            di = 2 if hp else 0
            d3 = blk[di].reshape(F // g, g, ksize * ksize)
            blk[di] = (
                d3[:, :, :, None] * eye[None, :, None, :]
            ).reshape(F, ksize * ksize * g)
            nbs.append(tuple(blk))
        blocks = tuple(nbs)
    elif dw_impl == "mxu2":
        # W2 per channel group: [7g, 7g] with
        # W2[dx*g + c, dy*g + c'] = taps[cg*g + c, dy*7 + dx] iff c' == c,
        # stacked over groups along rows -> [n_cg*7g, 7g]
        assert F % dw_group == 0
        g = dw_group
        eye = jnp.eye(g, dtype=jnp.float32)
        nbs = []
        for blk, hp in zip(blocks, has_proj):
            blk = list(blk)
            di = 2 if hp else 0
            d4 = blk[di].reshape(F // g, g, ksize, ksize)  # [cg, c, dy, dx]
            w2 = (
                d4.transpose(0, 3, 1, 2)[:, :, :, :, None]
                * eye[None, None, :, None, :]
            )  # [cg, dx, c, dy, c']
            blk[di] = w2.reshape(F // g * ksize * g, ksize * g)
            nbs.append(tuple(blk))
        blocks = tuple(nbs)

    x = x.astype(band_dtype)
    if aux is not None:
        aux = aux.astype(band_dtype)
    in_arrays = [x] + ([aux] if aux is not None else [])
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)] * len(in_arrays)
    flat_params = []
    for blk in blocks:
        flat_params.extend(blk)
    for (tw, tb) in tail:
        flat_params.append(tw)
        flat_params.append(tb.reshape(-1, 1))
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(flat_params)

    out_specs = []
    out_shapes = []
    if combine is not None:
        tc_, _, lt_ = combine
        out_specs.append(
            pl.BlockSpec(
                (tile_h, tc_, lt_), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shapes.append(jax.ShapeDtypeStruct((h_img, tc_, lt_), out_dtype))
    else:
        for _ in emit:
            out_specs.append(
                pl.BlockSpec((tile_h * F, wl), lambda i: (i, 0), memory_space=pltpu.VMEM)
            )
            out_shapes.append(jax.ShapeDtypeStruct((h_img * F, wl), out_dtype))
        for co in tail_couts:
            out_specs.append(
                pl.BlockSpec((tile_h * co, wl), lambda i: (i, 0), memory_space=pltpu.VMEM)
            )
            out_shapes.append(jax.ShapeDtypeStruct((h_img * co, wl), out_dtype))

    scratch = [pltpu.VMEM(((tile_h + 2 * halos[0]) * cx, wl), band_dtype)]
    if upsample_input:
        rows_lo = min(tile_h // 2 + halos[0] + 2, h_lo)
        scratch.append(pltpu.VMEM((rows_lo, cx, wl), band_dtype))
    if aux_c:
        scratch.append(
            pltpu.VMEM((tile_h + 2 * halos[1], aux_c, wl), band_dtype)
        )
    for b in range(nb):
        scratch.append(
            pltpu.VMEM(((tile_h + 2 * halos[b + 1]) * F, wl), band_dtype)
        )
    # shared proj band (sized for the largest proj input band)
    if any(has_proj):
        mx = max(tile_h + 2 * halos[b] for b in range(nb) if has_proj[b])
        scratch.append(pltpu.VMEM((mx * F, wl), band_dtype))
    if dw_impl == "mxu":
        scratch.append(
            pltpu.VMEM(((dw_rows + ksize - 1) * ksize * F, wl), band_dtype)
        )
    elif dw_impl == "mxu2":
        scratch.append(
            pltpu.VMEM(((dw_rows + ksize - 1) * F, wl), band_dtype)
        )
    scratch.append(pltpu.SemaphoreType.DMA)

    flat_params = [
        (p.astype(band_dtype) if p.ndim == 2 and p.shape[-1] > 1 and p.shape[-1] != 49 else p.astype(jnp.float32))
        for p in flat_params
    ]

    outs = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*in_arrays, *flat_params)
    return outs
