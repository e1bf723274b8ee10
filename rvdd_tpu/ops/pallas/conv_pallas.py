"""Pallas TPU fused conv-chain kernel for the 48-channel U-Net hot path.

Why.  XLA's conv at 1080p/48ch is HBM-bound through its 48->128 lane-padded
NHWC layout: measured 21 TF/s = exactly that layout's bandwidth bound
(tools/mm_bench.py), so the U-Net forward costs 87 ms.  Two measured facts
unlock a much faster design (tools/mxu_m_bench.py):

* the MXU streams LHS rows at sublane granularity — a [48, K]@[K, 2048]
  dot runs at 70-92% of peak, so out-channels can sit on M with NO
  128-padding penalty;
* VPU copies run at 8-18 TB/s, so building the 9-tap im2col row slab in
  registers is cheap.

Design.  Activations live in the row-major channel-interleaved planar
layout ``[(H*C), WL]`` — W on lanes (no padding at 128-multiples), one
row-block of C sublanes per image row.  A whole chain of 3x3 convs
(conv -> act -> conv -> ...) runs per row-band tile with intermediates in
VMEM, so inter-conv activations never touch HBM.  Per output row:

    slab  = band[r*C : (r+3)*C]                  # [3C, WL], free reshape
    pat   = [slab>>1 ; slab ; slab<<1]            # [9C, WL], 2 lane shifts
    out_r = act(W[Cout, 9C] @ pat + b) * mask     # one MXU dot

``mask`` zeroes lanes >= W and rows outside the image, which reproduces
zero-padding semantics (torch Conv2d padding=1) exactly: padding lanes/rows
stay zero after every layer, so border taps read true zeros.

Supports: a second input concatenated after layer 0 (the U-Net feature
recurrence / skip fusion), multiple emitted layers (skip connections), a
trailing 1x1 conv (the output head), relu/none activations.

Replaces (functionally): the convolutions of reference networks/unet.py
NConvBlock/UpConv/PostConvs (reference: networks/unet.py:26-147,521-588) on
the inference fast path.  Forward-only; training uses the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def lane_width(w: int) -> int:
    """Smallest 128-multiple with at least one zero lane after the image
    (the im2col lane shifts wrap, so lane WL-1 must stay zero)."""
    return -(-(w + 1) // 128) * 128


def pack_weight(w: jnp.ndarray, cin_split: Optional[int] = None) -> jnp.ndarray:
    """[3, 3, Cin, Cout] HWIO -> [Cout, 9*Cin] matching the kernel's patch
    order: (dy, dx, ci) — HWIO's natural flattening.

    cin_split is accepted for API compatibility but no longer needed: the
    kernel builds each (dy, dx) patch piece as [conv channels ; aux
    channels], which is exactly the weight's cin order when the graph
    concatenates the aux tensor after the conv output.
    """
    kh, kw, cin, cout = w.shape
    return jnp.transpose(w.reshape(kh * kw * cin, cout), (1, 0))


def _chain_kernel(
    *refs,
    th: int,
    wl: int,
    w_img: int,
    h_img: int,
    halos: Sequence[int],  # h_l: extra rows each side of the band at layer l
    chans: Sequence[int],  # per-layer (cin, cout, ksize, act)
    layer_specs: Sequence[tuple],
    emit: Sequence[int],
    pool_rows: Sequence[int],
    combine: Optional[tuple],  # (total_c, {layer: ch_off}) -> one 3D output
    aux_c: int,
    aux_off: int,
    n_tiles: int,
    upsample_input: bool,
    out_dtype,
    band_dtype,
    weight_split,
    precision,
    three_pass: bool = False,
):
    nl = len(layer_specs)
    n_in = 2 if aux_c else 1
    x_ref = refs[0]
    aux_ref = refs[1] if aux_c else None
    w_refs = refs[n_in : n_in + nl]
    b_refs = refs[n_in + nl : n_in + 2 * nl]
    n_outs = 1 if combine else len(emit)
    out_refs = refs[n_in + 2 * nl : n_in + 2 * nl + n_outs]
    scratch = list(refs[n_in + 2 * nl + n_outs :])
    win_x = scratch.pop(0)
    win_lo = scratch.pop(0) if upsample_input else None
    win_aux = scratch.pop(0) if aux_c else None
    bands = scratch[:-1]
    sem = scratch[-1]

    i = pl.program_id(0)

    cx = layer_specs[0][0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, wl), 1)
    lane_mask = (lanes < w_img).astype(jnp.float32)

    def dma_in(dst_ref, src_ref, c, h_halo):
        """Copy the tile's row band [i*th - h_halo, i*th + th + h_halo) of a
        [(H*c), WL] HBM ref into VMEM, zero-filling rows outside the image."""
        rows = th + 2 * h_halo
        if n_tiles == 1:
            dst_ref[: h_halo * c] = jnp.zeros((h_halo * c, wl), dst_ref.dtype)
            dst_ref[(h_halo + th) * c :] = jnp.zeros((h_halo * c, wl), dst_ref.dtype)
            cp = pltpu.make_async_copy(
                src_ref.at[pl.ds(0, th * c)],
                dst_ref.at[pl.ds(h_halo * c, th * c)],
                sem,
            )
            cp.start()
            cp.wait()
            return

        @pl.when(i == 0)
        def _():
            dst_ref[: h_halo * c] = jnp.zeros((h_halo * c, wl), dst_ref.dtype)
            cp = pltpu.make_async_copy(
                src_ref.at[pl.ds(0, (th + h_halo) * c)],
                dst_ref.at[pl.ds(h_halo * c, (th + h_halo) * c)],
                sem,
            )
            cp.start()
            cp.wait()

        @pl.when(i == n_tiles - 1)
        def _():
            dst_ref[(th + h_halo) * c :] = jnp.zeros((h_halo * c, wl), dst_ref.dtype)
            cp = pltpu.make_async_copy(
                src_ref.at[pl.ds((i * th - h_halo) * c, (th + h_halo) * c)],
                dst_ref.at[pl.ds(0, (th + h_halo) * c)],
                sem,
            )
            cp.start()
            cp.wait()

        @pl.when((i > 0) & (i < n_tiles - 1))
        def _():
            cp = pltpu.make_async_copy(
                src_ref.at[pl.ds((i * th - h_halo) * c, rows * c)],
                dst_ref.at[pl.ds(0, rows * c)],
                sem,
            )
            cp.start()
            cp.wait()

    def dma_in3(dst_ref, src_ref, c, c_off, h_halo):
        """Rank-3 variant: src [H, Cfull, WL] channel-sliced at c_off; dst
        scratch [rows, c, WL]."""
        rows = th + 2 * h_halo

        def cp(src_lo, n, dst_lo):
            copy = pltpu.make_async_copy(
                src_ref.at[pl.ds(src_lo, n), pl.ds(c_off, c), :],
                dst_ref.at[pl.ds(dst_lo, n)],
                sem,
            )
            copy.start()
            copy.wait()

        if n_tiles == 1:
            dst_ref[0:h_halo] = jnp.zeros((h_halo, c, wl), dst_ref.dtype)
            dst_ref[h_halo + th : rows] = jnp.zeros((h_halo, c, wl), dst_ref.dtype)
            cp(0, th, h_halo)
            return

        @pl.when(i == 0)
        def _():
            dst_ref[0:h_halo] = jnp.zeros((h_halo, c, wl), dst_ref.dtype)
            cp(0, th + h_halo, h_halo)

        @pl.when(i == n_tiles - 1)
        def _():
            dst_ref[th + h_halo : rows] = jnp.zeros((h_halo, c, wl), dst_ref.dtype)
            cp(i * th - h_halo, th + h_halo, 0)

        @pl.when((i > 0) & (i < n_tiles - 1))
        def _():
            cp(i * th - h_halo, rows, 0)

    if upsample_input:
        # x is the lane-upsampled half-ROW-resolution tensor [H/2, Cx, WL]
        # (the lane direction is upsampled in XLA — Mosaic has no cheap lane
        # interleave); the kernel does the row direction: torch
        # align_corners=False out[2j] = .75 low[j] + .25 low[j-1],
        # out[2j+1] = .75 low[j] + .25 low[j+1], edge-replicated.
        h_lo = (h_img + 1) // 2
        h0 = halos[0]
        rows = th + 2 * h0
        rows_lo = min(th // 2 + h0 + 2, h_lo)
        low_start = jnp.maximum(
            jnp.minimum((i * th - h0 - 1) // 2, h_lo - rows_lo), 0
        )
        cp = pltpu.make_async_copy(
            x_ref.at[pl.ds(low_start, rows_lo)], win_lo, sem
        )
        cp.start()
        cp.wait()

        def build_row(r, carry):
            g = i * th - h0 + r
            j = g // 2
            odd = g - 2 * j  # 0 or 1
            jn = jnp.clip(j + 2 * odd - 1, 0, h_lo - 1)
            a = win_lo[pl.ds(jnp.clip(j, 0, h_lo - 1) - low_start, 1)][0]
            bn = win_lo[pl.ds(jn - low_start, 1)][0]
            row = 0.75 * a.astype(jnp.float32) + 0.25 * bn.astype(jnp.float32)
            in_img = ((g >= 0) & (g < h_img)).astype(jnp.float32)
            row = row * in_img
            win_x[pl.ds(pl.multiple_of(r * cx, 8), cx), :] = row.astype(
                band_dtype
            )
            return carry

        jax.lax.fori_loop(0, rows, build_row, 0)
    else:
        dma_in(win_x, x_ref, cx, halos[0])
    if aux_c:
        dma_in3(win_aux, aux_ref, aux_c, aux_off, halos[1])

    def row_slice(ref, r, c, k):
        """[k*c, WL] value at dynamic row r of a [(rows*c), WL] band ref."""
        return ref[pl.ds(pl.multiple_of(r * c, 8), k * c), :]

    def row_slice3(ref, r, c, k):
        """[k*c, WL] value at dynamic row r of a [rows, c, WL] band ref."""
        return ref[pl.ds(r, k)].reshape(k * c, wl)

    in_band = win_x
    in_c = cx
    emit_idx = 0
    for l, (cin, cout, ks, act) in enumerate(layer_specs):
        h_in = halos[l]
        h_out = h_in - (ks // 2)
        rows_out = th + 2 * h_out
        wm = w_refs[l][:, :]
        bias = b_refs[l][:, :].astype(jnp.float32)  # [cout, 1]
        out_band = bands[l]
        aux_here = aux_c if l == 1 and aux_c else 0
        band_in = in_band  # capture for the closure
        comb_off = combine[1][l] if (combine and l in emit) else None

        def emit_y(y, r, *, bias, act, cout, out_band, h_out,
                   comb_off=comb_off):
            y = y + bias
            if act == "relu":
                y = jnp.maximum(y, 0.0)
            # zero-padding semantics fused into the store: kill lanes >= W
            # (bias/relu garbage + im2col lane wrap) and rows outside the
            # image (the edge tiles' halo fringe)
            g = i * th + r - h_out
            in_img = ((g >= 0) & (g < h_img)).astype(jnp.float32)
            y = y * (lane_mask * in_img)
            out_band[pl.ds(pl.multiple_of(r * cout, 8), cout), :] = (
                y.astype(band_dtype)
            )
            if comb_off is not None:
                # combined recurrence-state emit straight from the fp32
                # accumulator: the carry is written rounding-free even with
                # bf16 bands (bf16 carry rounding feeds back through the
                # recurrence and accumulates over a clip)
                rr = r - h_out

                @pl.when((rr >= 0) & (rr < th))
                def _():
                    ys = y[None].astype(out_refs[0].dtype)
                    if len(combine) == 2:
                        out_refs[0][pl.ds(rr, 1), comb_off : comb_off + cout, :] = ys
                    else:
                        pad_l = combine[2]
                        out_refs[0][
                            pl.ds(rr, 1), comb_off : comb_off + cout,
                            pad_l : pad_l + wl,
                        ] = ys

        def dot1(wm, pat):
            if _EMULATE_BF16_DOT:
                # test-only (tools/fused_quality.py experiments): model the
                # real MXU's DEFAULT-precision operand rounding when the
                # interpreter would otherwise compute fp32 dots exactly
                wm = wm.astype(jnp.bfloat16).astype(jnp.float32)
                pat = pat.astype(jnp.bfloat16).astype(jnp.float32)
            if wm.dtype != pat.dtype:
                pat = pat.astype(wm.dtype)
            return jax.lax.dot_general(
                wm, pat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                # pin the MXU precision per fused-precision mode so a global
                # jax_default_matmul_precision (the exact-parity mode) can't
                # force an unsupported fp32-contract on bf16 operands
                precision=precision,
            )

        def dot(wm, pat, *, _split=weight_split[l]):
            if _split and three_pass:
                # manual bf16_3x (Precision.HIGH semantics without relying
                # on Mosaic supporting HIGH in-kernel): weights arrive as a
                # packed bf16 hi+lo pair, the fp32 pattern is split here,
                # and the lo*lo term (~2^-16 relative) is dropped — three
                # DEFAULT-precision MXU passes recover ~fp32 fidelity
                half = wm.shape[0] // 2
                pf = pat.astype(jnp.float32)
                # mantissa-truncation split (see _split below: an
                # astype-based round-trip is elidable under
                # --xla_allow_excess_precision, zeroing the lo term)
                pbits = jax.lax.bitcast_convert_type(pf, jnp.uint32)
                p_hi_f = jax.lax.bitcast_convert_type(
                    pbits & jnp.uint32(0xFFFF0000), jnp.float32
                )
                p_hi = p_hi_f.astype(jnp.bfloat16)
                p_lo = (pf - p_hi_f).astype(jnp.bfloat16)
                return (
                    dot1(wm[:half], p_hi)
                    + dot1(wm[:half], p_lo)
                    + dot1(wm[half:], p_hi)
                )
            if _split:
                # w = w_hi + w_lo (bf16 pair, stacked on the cout axis):
                # two 1-pass dots recover ~16 mantissa bits of the weights
                half = wm.shape[0] // 2
                return dot1(wm[:half], pat) + dot1(wm[half:], pat)
            return dot1(wm, pat)

        if ks == 3:
            # two output rows per iteration share a dy-major patch stack:
            # pat4 rows = (dy 0..3, dx -1..1, ci); row r contracts rows
            # [0, 9C), row r+1 rows [3C, 12C) — a 33% patch-build saving
            c_full = in_c + aux_here

            def row_body2(rr, carry, *, band_in=band_in, in_c=in_c,
                          aux_here=aux_here, wm=wm, bias=bias, act=act,
                          cout=cout, out_band=out_band, h_out=h_out,
                          c_full=c_full):
                r = pl.multiple_of(rr * 2, 2)
                pieces = []
                for dy in range(4):
                    base = row_slice(band_in, r + dy, in_c, 1)
                    if aux_here:
                        base = jnp.concatenate(
                            [base, row_slice3(win_aux, r + dy, aux_here, 1)],
                            axis=0,
                        )
                    pieces.append(
                        jnp.concatenate([base[:, -1:], base[:, :-1]], axis=1)
                    )
                    pieces.append(base)
                    pieces.append(
                        jnp.concatenate([base[:, 1:], base[:, :1]], axis=1)
                    )
                pat4 = jnp.concatenate(pieces, axis=0)  # [12*C_full, wl]
                y0 = dot(wm, pat4[: 9 * c_full])
                emit_y(y0, r, bias=bias, act=act, cout=cout,
                       out_band=out_band, h_out=h_out)
                y1 = dot(wm, pat4[3 * c_full :])
                emit_y(y1, r + 1, bias=bias, act=act, cout=cout,
                       out_band=out_band, h_out=h_out)
                return carry

            jax.lax.fori_loop(0, rows_out // 2, row_body2, 0)
            if rows_out % 2:  # odd tail row
                r = rows_out - 1
                pieces = []
                for dy in range(3):
                    base = row_slice(band_in, r + dy, in_c, 1)
                    if aux_here:
                        base = jnp.concatenate(
                            [base, row_slice3(win_aux, r + dy, aux_here, 1)],
                            axis=0,
                        )
                    pieces.append(
                        jnp.concatenate([base[:, -1:], base[:, :-1]], axis=1)
                    )
                    pieces.append(base)
                    pieces.append(
                        jnp.concatenate([base[:, 1:], base[:, :1]], axis=1)
                    )
                emit_y(dot(wm, jnp.concatenate(pieces, axis=0)), r, bias=bias,
                       act=act, cout=cout, out_band=out_band, h_out=h_out)
        else:  # 1x1

            def row_body1(r, carry, *, band_in=band_in, in_c=in_c,
                          aux_here=aux_here, wm=wm, bias=bias, act=act,
                          cout=cout, out_band=out_band, h_out=h_out):
                pat = row_slice(band_in, r, in_c, 1)
                if aux_here:
                    pat = jnp.concatenate(
                        [pat, row_slice3(win_aux, r, aux_here, 1)], axis=0
                    )
                emit_y(dot(wm, pat), r, bias=bias, act=act, cout=cout,
                       out_band=out_band, h_out=h_out)
                return carry

            jax.lax.fori_loop(0, rows_out, row_body1, 0)

        if l in emit and combine:
            # interior rows were written by emit_y straight from the fp32
            # accumulator; with lane geometry (pad_left, lane_total), only
            # the edge-replicated lane margins remain so the buffer is
            # directly consumable by the warp kernel's pre-aligned window
            # DMA (no XLA pre-pass)
            if len(combine) > 2:
                off = combine[1][l]
                pad_l, lane_total = combine[2], combine[3]
                edge_l = out_refs[0][:, off : off + cout, pad_l : pad_l + 1]
                out_refs[0][:, off : off + cout, :pad_l] = jnp.broadcast_to(
                    edge_l, (th, cout, pad_l)
                )
                edge_r = out_refs[0][
                    :, off : off + cout, pad_l + w_img - 1 : pad_l + w_img
                ]
                out_refs[0][
                    :, off : off + cout, pad_l + w_img : lane_total
                ] = jnp.broadcast_to(
                    edge_r, (th, cout, lane_total - pad_l - w_img)
                )
        elif l in emit:
            src = out_band[h_out * cout : (h_out + th) * cout, :]
            if l in pool_rows:
                # row half of the 2x2 maxpool fused into the emit write:
                # halves the HBM write and kills the XLA row-regroup copy
                # (the lane half stays outside — Mosaic has no cheap
                # strided lane slice)
                v = src.reshape(th // 2, 2, cout, wl)
                src = jnp.maximum(v[:, 0], v[:, 1]).reshape(
                    th // 2 * cout, wl
                )
            out_refs[emit_idx][:, :] = src.astype(out_refs[emit_idx].dtype)
            emit_idx += 1

        in_band = out_band
        in_c = cout


#: test-only trace-time switch (see dot1): emulate the MXU's bf16 operand
#: rounding in interpret mode, where fp32 dots are otherwise exact
_EMULATE_BF16_DOT = False

PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,  # fp32 operands: 3-pass bf16 (~fp32)
    "highest": jax.lax.Precision.HIGHEST,
}


@functools.partial(
    jax.jit,
    static_argnames=(
        "acts", "kernel_sizes", "emit", "pool_rows", "combine", "h_img", "w_img", "tile_h",
        "out_dtype", "aux_channels", "upsample_input", "band_dtype",
        "mxu_precision", "weight_dtype", "interpret",
    ),
)
def fused_conv_chain(
    x: jnp.ndarray,  # [(H*Cx), WL] planar row-major; lanes >= W zero
    weights: Sequence[jnp.ndarray],  # packed [Cout, K*K*Cin] (pack_weight)
    biases: Sequence[jnp.ndarray],  # [Cout] each
    acts: Sequence[str],
    kernel_sizes: Sequence[int],
    h_img: int,
    w_img: int,
    aux: Optional[jnp.ndarray] = None,  # [(H*Ca), WL], joins layer-1 input
    emit: Sequence[int] = (),
    pool_rows: Sequence[int] = (),  # emit layers written row-pooled (2x1 max)
    combine: Optional[tuple] = None,  # (total_c, ((layer, ch_off), ...)):
    #   all emit layers write into ONE [(H*total_c), WL] buffer
    tile_h: int = 0,
    out_dtype=jnp.bfloat16,
    aux_channels=None,  # (offset, n): read n channels at offset from aux's
    #                     row blocks (aux then holds [(H*Cfull), WL])
    upsample_input: bool = False,  # x is [(H/2*Cx), WL/2]; the kernel
    #                     bilinearly upsamples it into the layer-0 band
    band_dtype=jnp.bfloat16,  # inter-layer activation storage precision
    mxu_precision: str = "default",  # MXU passes: 'default' (1-pass bf16)
    #                     or 'high' (manual bf16_3x: weights packed as bf16
    #                     hi+lo pairs, pattern split at dot time, 3 DEFAULT
    #                     passes — ~fp32 fidelity without Mosaic HIGH)
    weight_dtype=None,  # None -> band_dtype; 'split' -> bf16 hi+lo pair
    #                     (two 1-pass dots, rounding-free weights); or a dtype
    interpret: bool = False,
):
    """Run a fused chain of convs; returns one [(H*Cout_l), WL] per emit."""
    nl = len(weights)
    emit = tuple(emit) if emit else (nl - 1,)
    pool_rows = tuple(pool_rows)
    assert all(l in emit for l in pool_rows)
    if combine is not None:
        combine = (combine[0], dict(combine[1])) + tuple(combine[2:])
        assert not pool_rows and all(l in combine[1] for l in emit)
    if upsample_input:
        h_lo = (h_img + 1) // 2
        wl = x.shape[-1]  # lanes already at full resolution
        assert x.shape[0] % h_lo == 0
        cx = x.shape[0] // h_lo
        x = x.reshape(h_lo, cx, wl)
    else:
        wl = x.shape[-1]
        assert x.shape[0] % h_img == 0
        cx = x.shape[0] // h_img
    aux_full = (aux.shape[0] // h_img) if aux is not None else 0
    if aux is not None:
        aux_off, aux_c = aux_channels if aux_channels else (0, aux_full)
        aux = aux.reshape(h_img, aux_full, wl)
    else:
        aux_off, aux_c = 0, 0
    # HBM refs are (8, 128)-tiled: every DMA row-block offset (row * C) must
    # be a sublane multiple, so all planar channel counts must divide by 8.
    # Callers zero-pad (e.g. RGB input 6 -> 8, output head 3 -> 8).
    assert cx % 8 == 0 and aux_c % 8 == 0, (cx, aux_c)
    for wt in weights:
        assert wt.shape[0] % 8 == 0, f"cout {wt.shape[0]} must divide by 8"

    # per-layer channel/kernel bookkeeping
    layer_specs = []
    cin = cx
    for l in range(nl):
        cout = weights[l].shape[0]
        ks = kernel_sizes[l]
        full_cin = weights[l].shape[1] // (ks * ks)
        layer_specs.append((cin, cout, ks, acts[l]))
        assert full_cin == cin + (aux_c if l == 1 and aux_c else 0), (
            f"layer {l}: weight cin {full_cin} != band {cin} + aux {aux_c}"
        )
        cin = cout

    # halo schedule: h_l = rows of context needed each side before layer l
    halos = [0] * (nl + 1)
    for l in range(nl - 1, -1, -1):
        halos[l] = halos[l + 1] + kernel_sizes[l] // 2

    if tile_h <= 0:
        # largest tile whose band scratch fits the VMEM budget
        budget = 88 * 1024 * 1024

        def est(t):
            rows = (t + 2 * halos[0]) * cx
            if upsample_input:
                rows += (t // 2 + halos[0] + 2) * cx
            if aux_c:
                rows += (t + 2 * halos[1]) * aux_c
            for l in range(nl):
                rows += (t + 2 * halos[l + 1]) * layer_specs[l][1]
            rows += 2 * t * sum(layer_specs[l][1] for l in emit)
            return rows * wl * jnp.dtype(band_dtype).itemsize

        tile_h = next(
            (
                t
                for t in (72, 60, 54, 48, 40, 36, 32, 30, 24, 20, 18, 16, 12, 8)
                if h_img % t == 0 and t > halos[0] and est(t) < budget
                and (not pool_rows or t % 2 == 0)
            ),
            0,
        )
        if tile_h == 0:
            tile_h = h_img  # single tile
    assert h_img % tile_h == 0 and tile_h > halos[0]
    assert not pool_rows or tile_h % 2 == 0
    n_tiles = h_img // tile_h

    # weight_dtype: None/dtype applies to every layer; 'split' every layer;
    # a tuple gives per-layer values (selective split)
    three_pass = mxu_precision == "high"
    if three_pass:
        # manual bf16_3x: every layer's weights become a packed bf16 hi+lo
        # pair and the kernel splits the (fp32) pattern operand at dot time
        # — three DEFAULT-precision passes, no reliance on Mosaic lowering
        # lax.Precision.HIGH inside the kernel
        weight_dtype = "split"
    wd_l = (
        tuple(weight_dtype)
        if isinstance(weight_dtype, tuple)
        else (weight_dtype,) * nl
    )

    kern = functools.partial(
        _chain_kernel,
        th=tile_h,
        wl=wl,
        w_img=w_img,
        h_img=h_img,
        halos=tuple(halos),
        chans=(),
        layer_specs=tuple(layer_specs),
        emit=emit,
        pool_rows=pool_rows,
        combine=combine,
        aux_c=aux_c,
        aux_off=aux_off,
        n_tiles=n_tiles,
        upsample_input=upsample_input,
        out_dtype=out_dtype,
        band_dtype=band_dtype,
        weight_split=tuple(wd == "split" for wd in wd_l),
        precision=PRECISIONS["default" if three_pass else mxu_precision],
        three_pass=three_pass,
    )

    x = x.astype(band_dtype)
    if aux is not None:
        aux = aux.astype(band_dtype)
    in_arrays = [x] + ([aux] if aux is not None else [])
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)] * len(in_arrays)
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * nl)

    out_specs = []
    out_shapes = []
    if combine is not None:
        tc_ = combine[0]
        lt_ = combine[3] if len(combine) > 2 else wl
        out_specs.append(
            pl.BlockSpec(
                (tile_h, tc_, lt_), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        )
        out_shapes.append(jax.ShapeDtypeStruct((h_img, tc_, lt_), out_dtype))
    for l in (() if combine is not None else emit):
        cout = layer_specs[l][1]
        rows_o = (tile_h // 2) if l in pool_rows else tile_h
        h_o = (h_img // 2) if l in pool_rows else h_img
        out_specs.append(
            pl.BlockSpec((rows_o * cout, wl), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((h_o * cout, wl), out_dtype)
        )

    scratch = [
        pltpu.VMEM(((tile_h + 2 * halos[0]) * cx, wl), band_dtype),
    ]
    if upsample_input:
        rows_lo = min(tile_h // 2 + halos[0] + 2, h_lo)
        scratch.append(pltpu.VMEM((rows_lo, cx, wl), band_dtype))
    if aux_c:
        scratch.append(
            pltpu.VMEM((tile_h + 2 * halos[1], aux_c, wl), band_dtype)
        )
    for l in range(nl):
        rows = tile_h + 2 * halos[l + 1]
        scratch.append(pltpu.VMEM((rows * layer_specs[l][1], wl), band_dtype))
    scratch.append(pltpu.SemaphoreType.DMA)

    def _split(w):
        # hi/lo via mantissa-bit truncation, NOT via astype(bf16): under
        # --xla_allow_excess_precision (set on TPU toolchains) XLA keeps
        # the f32->bf16->f32 round-trip in f32, so `lo = w - hi` folds to
        # ZERO and the split silently degenerates to 1-pass bf16 weights.
        # Measured on-chip before this fix: convunet+feat fast delta
        # -0.088 dB = exactly the no-split attribution value (-0.100 /
        # -0.037 with the split, PARITY.md).  Bit masking can't be elided.
        wf = w.astype(jnp.float32)
        bits = jax.lax.bitcast_convert_type(wf, jnp.uint32)
        hi_f = jax.lax.bitcast_convert_type(
            bits & jnp.uint32(0xFFFF0000), jnp.float32
        )
        hi = hi_f.astype(jnp.bfloat16)  # exact: mantissa already truncated
        lo = (wf - hi_f).astype(jnp.bfloat16)
        return jnp.concatenate([hi, lo], axis=0)

    wms = [
        _split(w) if wd == "split" else w.astype(wd or band_dtype)
        for w, wd in zip(weights, wd_l)
    ]
    bms = [b.reshape(-1, 1).astype(jnp.float32) for b in biases]

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
    )(*in_arrays, *wms, *bms)
    return outs
