"""Hamilton-Adams demosaicing as pure JAX stencil ops (GBRG).

Behavioural equivalent of the reference fixed-weight-conv implementation
(reference: util/Hamilton_Adam_demo.py).  Instead of materializing 5x5/3x3
convolutions, each tap is an edge-padded shift; XLA fuses the whole pipeline
into a handful of elementwise VPU passes, which is faster on TPU than
gathering conv patches for 1-channel images.

The function is differentiable and is used both for pre-demosaicing the
network input and inside ``remosaic``-domain losses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rvdd_tpu.ops.bayer import bayer_masks, green_row_masks, pack_cfa


def _shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """x sampled at (y+dy, x+dx) over the last two axes, edge replication.

    Matches torch ReplicationPad2d + conv tap semantics used by the
    reference (util/Hamilton_Adam_demo.py:21-38).
    """
    pad_y = max(abs(dy), 0)
    pad_x = max(abs(dx), 0)
    if pad_y == 0 and pad_x == 0:
        return x
    pads = [(0, 0)] * (x.ndim - 2) + [(pad_y, pad_y), (pad_x, pad_x)]
    xp = jnp.pad(x, pads, mode="edge")
    h, w = x.shape[-2], x.shape[-1]
    return xp[..., pad_y + dy : pad_y + dy + h, pad_x + dx : pad_x + dx + w]


def _interp_green(cfa: jnp.ndarray, mask_g: jnp.ndarray) -> jnp.ndarray:
    """Gradient-adaptive green interpolation (HA 'algorithm 1').

    reference: util/Hamilton_Adam_demo.py:123-142.
    """
    kh = 0.5 * (_shift(cfa, 0, -1) + _shift(cfa, 0, 1))
    kv = 0.5 * (_shift(cfa, -1, 0) + _shift(cfa, 1, 0))
    dh = _shift(cfa, 0, -2) - 2.0 * cfa + _shift(cfa, 0, 2)
    dv = _shift(cfa, -2, 0) - 2.0 * cfa + _shift(cfa, 2, 0)
    diffh = _shift(cfa, 0, -1) - _shift(cfa, 0, 1)
    diffv = _shift(cfa, -1, 0) - _shift(cfa, 1, 0)

    rawh = kh - dh / 4.0
    rawv = kv - dv / 4.0
    clh = jnp.abs(diffh) + jnp.abs(dh)
    clv = jnp.abs(diffv) + jnp.abs(dv)

    # sign-based select keeps the exact tie behaviour of the reference:
    # CLh > CLv -> vertical, CLh < CLv -> horizontal, tie -> average.
    s = jnp.sign(clh - clv)
    green = (1.0 + s) * rawv / 2.0 + (1.0 - s) * rawh / 2.0
    return green * (1.0 - mask_g) + cfa * mask_g


def _interp_chroma(
    green: jnp.ndarray,
    chan: jnp.ndarray,
    mask_ochan: jnp.ndarray,
    mask_row: jnp.ndarray,
    mask_col: jnp.ndarray,
) -> jnp.ndarray:
    """R or B channel interpolation (HA 'algorithm 2').

    reference: util/Hamilton_Adam_demo.py:145-172.  ``chan`` is the CFA
    masked to the channel's own sites; ``mask_ochan`` marks the opposite
    chroma's sites (diagonal interpolation there); ``mask_row``/``mask_col``
    mark green sites needing horizontal/vertical interpolation.
    """
    kh = 0.5 * (_shift(chan, 0, -1) + _shift(chan, 0, 1))
    kv = 0.5 * (_shift(chan, -1, 0) + _shift(chan, 1, 0))
    kp = 0.5 * (_shift(chan, -1, -1) + _shift(chan, 1, 1))
    kn = 0.5 * (_shift(chan, -1, 1) + _shift(chan, 1, -1))
    diffp = _shift(chan, 1, 1) - _shift(chan, -1, -1)
    diffn = _shift(chan, 1, -1) - _shift(chan, -1, 1)

    dh_g = 0.25 * _shift(green, 0, -1) - 0.5 * green + 0.25 * _shift(green, 0, 1)
    dv_g = 0.25 * _shift(green, -1, 0) - 0.5 * green + 0.25 * _shift(green, 1, 0)
    dp_g = _shift(green, -1, -1) - 2.0 * green + _shift(green, 1, 1)
    dn_g = _shift(green, -1, 1) - 2.0 * green + _shift(green, 1, -1)

    ch = mask_row * (kh - dh_g)
    cv = mask_col * (kv - dv_g)
    cp = mask_ochan * (kp - dp_g / 4.0)
    cn = mask_ochan * (kn - dn_g / 4.0)
    clp = mask_ochan * (jnp.abs(diffp) + jnp.abs(dp_g))
    cln = mask_ochan * (jnp.abs(diffn) + jnp.abs(dn_g))

    s = jnp.sign(clp - cln)
    diag = (1.0 + s) * cn / 2.0 + (1.0 - s) * cp / 2.0
    return diag + ch + cv + chan


def _cshift(x: jnp.ndarray, s: int, axis: int) -> jnp.ndarray:
    """Shift x by s along axis with edge replication (half-res grid)."""
    if s == 0:
        return x
    n = x.shape[axis]
    lo = jnp.take(x, jnp.clip(jnp.arange(n) + s, 0, n - 1), axis=axis)
    return lo


def _replace_edge(x: jnp.ndarray, edge: jnp.ndarray, axis: int, last: bool):
    """Replace the first (or last) slice of x along axis with edge."""
    n = x.shape[axis]
    if last:
        body = jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)
        return jnp.concatenate([body, edge], axis=axis)
    body = jax.lax.slice_in_dim(x, 1, n, axis=axis)
    return jnp.concatenate([edge, body], axis=axis)


def _mtap(planes, y: int, x: int) -> jnp.ndarray:
    """Mosaic value at full-res offset (y, x) from a site's 2x2 cell origin.

    ``planes`` maps (row parity, col parity) -> half-res plane [..., H, W].
    Reproduces the reference's ReplicationPad2d clamp on the FULL-RES grid:
    a clamp by one full-res pixel lands on the opposite parity plane, which
    plain half-res edge replication gets wrong; those border rows/cols are
    patched explicitly (two-step col-then-row resolution handles corners).
    """

    def col_resolve(p0, p1, xx):
        p = p1 if (xx & 1) else p0
        a = _cshift(p, xx >> 1, -1)
        if xx == -1:
            a = _replace_edge(a, jax.lax.slice_in_dim(p0, 0, 1, axis=-1), -1, False)
        elif xx == 2:
            w = p1.shape[-1]
            a = _replace_edge(
                a, jax.lax.slice_in_dim(p1, w - 1, w, axis=-1), -1, True
            )
        return a

    qy = y & 1
    a = col_resolve(planes[(qy, 0)], planes[(qy, 1)], x)
    a = _cshift(a, y >> 1, -2)
    if y == -1:
        e = col_resolve(planes[(0, 0)], planes[(0, 1)], x)
        a = _replace_edge(a, jax.lax.slice_in_dim(e, 0, 1, axis=-2), -2, False)
    elif y == 2:
        e = col_resolve(planes[(1, 0)], planes[(1, 1)], x)
        h = e.shape[-2]
        a = _replace_edge(
            a, jax.lax.slice_in_dim(e, h - 1, h, axis=-2), -2, True
        )
    return a


def _ctap(chan: jnp.ndarray, cy: int, cx: int, a: int, b: int) -> jnp.ndarray:
    """Masked-channel tap chan[i+a, j+b] with the mosaic clamp semantics.

    ``chan`` holds the channel's own sites (parity (cy, cx)); off-grid
    full-res clamps land on the opposite parity, where the reference's
    masked mosaic is ZERO — so a border clamp replicates only when the
    clamped edge has the channel's parity (top/left edges are parity 0,
    bottom/right are parity 1).
    """
    out = chan
    for axis, s, parity in ((-2, a, cy), (-1, b, cx)):
        if s == 0:
            continue
        out = _cshift(out, s, axis)
        n = out.shape[axis]
        if s < 0 and parity == 1:  # clamp to top/left edge (parity 0) -> 0
            zero = jnp.zeros_like(jax.lax.slice_in_dim(out, 0, 1, axis=axis))
            out = _replace_edge(out, zero, axis, False)
        elif s > 0 and parity == 0:  # clamp to bottom/right (parity 1) -> 0
            zero = jnp.zeros_like(jax.lax.slice_in_dim(out, 0, 1, axis=axis))
            out = _replace_edge(out, zero, axis, True)
    return out


def _green_phase(planes, py: int, px: int) -> jnp.ndarray:
    """Interpolated green at the (py, px) chroma sites (HA algorithm 1),
    phase-resolved on the half-res planes."""
    t = lambda dy, dx: _mtap(planes, py + dy, px + dx)
    base = planes[(py, px)]
    th_m, th_p = t(0, -1), t(0, 1)
    tv_m, tv_p = t(-1, 0), t(1, 0)
    kh = 0.5 * (th_m + th_p)
    kv = 0.5 * (tv_m + tv_p)
    dh = t(0, -2) - 2.0 * base + t(0, 2)
    dv = t(-2, 0) - 2.0 * base + t(2, 0)
    rawh = kh - dh / 4.0
    rawv = kv - dv / 4.0
    clh = jnp.abs(th_m - th_p) + jnp.abs(dh)
    clv = jnp.abs(tv_m - tv_p) + jnp.abs(dv)
    s = jnp.sign(clh - clv)
    return (1.0 + s) * rawv / 2.0 + (1.0 - s) * rawh / 2.0


def _interleave(a: jnp.ndarray, b: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Interleave two equally-shaped arrays along axis (a first)."""
    pos = a.ndim + axis if axis < 0 else axis
    st = jnp.stack([a, b], axis=pos + 1)  # new axis right after `axis`
    shape = list(a.shape)
    shape[pos] *= 2
    return st.reshape(shape)


def hamilton_adams_planar(raw4: jnp.ndarray, wl: int = 0) -> jnp.ndarray:
    """Phase-resolved Hamilton-Adams: packed GBRG [..., H, W, 4] -> planar
    row-major RGB [..., 2H, 3, WL or 2W].

    Bit-identical to :func:`hamilton_adams` (same formulas instantiated per
    Bayer phase, incl. the full-res border-clamp parity flips), but runs on
    half-res planes with no full-res mosaic materialization, no NHWC
    round-trip and no output transpose — ~2x less memory traffic, built for
    the fused planar inference path.
    """
    g0, b, r, g2 = (raw4[..., k] for k in range(4))
    planes = {(0, 0): g0, (0, 1): b, (1, 0): r, (1, 1): g2}

    gb = _green_phase(planes, 0, 1)  # green at B sites
    gr = _green_phase(planes, 1, 0)  # green at R sites
    gpl = {(0, 0): g0, (0, 1): gb, (1, 0): gr, (1, 1): g2}
    gt = lambda y, x: _mtap(gpl, y, x)
    rt = lambda a_, b_: _ctap(r, 1, 0, a_, b_)
    bt = lambda a_, b_: _ctap(b, 0, 1, a_, b_)

    # red at G2 sites (phase (1,1)): horizontal
    red11 = 0.5 * (r + rt(0, 1)) - (
        0.25 * gr - 0.5 * g2 + 0.25 * gt(1, 2)
    )
    # red at G0 sites (phase (0,0)): vertical
    red00 = 0.5 * (rt(-1, 0) + r) - (
        0.25 * gt(-1, 0) - 0.5 * g0 + 0.25 * gr
    )
    # red at B sites (phase (0,1)): diagonal select
    kp = 0.5 * (rt(-1, 0) + rt(0, 1))
    kn = 0.5 * (rt(-1, 1) + r)
    diffp = rt(0, 1) - rt(-1, 0)
    diffn = r - rt(-1, 1)
    dp_g = gt(-1, 0) - 2.0 * gb + gt(1, 2)
    dn_g = gt(-1, 2) - 2.0 * gb + gr
    cp = kp - dp_g / 4.0
    cn = kn - dn_g / 4.0
    s = jnp.sign((jnp.abs(diffp) + jnp.abs(dp_g)) - (jnp.abs(diffn) + jnp.abs(dn_g)))
    red01 = (1.0 + s) * cn / 2.0 + (1.0 - s) * cp / 2.0

    # blue at G0 sites (phase (0,0)): horizontal
    blue00 = 0.5 * (bt(0, -1) + b) - (
        0.25 * gt(0, -1) - 0.5 * g0 + 0.25 * gb
    )
    # blue at G2 sites (phase (1,1)): vertical
    blue11 = 0.5 * (b + bt(1, 0)) - (
        0.25 * gb - 0.5 * g2 + 0.25 * gt(2, 1)
    )
    # blue at R sites (phase (1,0)): diagonal select
    kp = 0.5 * (bt(0, -1) + bt(1, 0))
    kn = 0.5 * (b + bt(1, -1))
    diffp = bt(1, 0) - bt(0, -1)
    diffn = bt(1, -1) - b
    dp_g = gt(0, -1) - 2.0 * gr + gt(2, 1)
    dn_g = gb - 2.0 * gr + gt(2, -1)
    cp = kp - dp_g / 4.0
    cn = kn - dn_g / 4.0
    s = jnp.sign((jnp.abs(diffp) + jnp.abs(dp_g)) - (jnp.abs(diffn) + jnp.abs(dn_g)))
    blue10 = (1.0 + s) * cn / 2.0 + (1.0 - s) * cp / 2.0

    def assemble(p00, p01, p10, p11):
        even = _interleave(p00, p01, -1)  # [..., H, 2W]
        odd = _interleave(p10, p11, -1)
        return _interleave(even, odd, -2)  # [..., 2H, 2W]

    red = assemble(red00, red01, r, red11)
    green = assemble(g0, gb, gr, g2)
    blue = assemble(blue00, b, blue10, blue11)
    out = jnp.stack([red, green, blue], axis=-2)  # [..., 2H, 3, 2W]
    if wl and wl > out.shape[-1]:
        pads = [(0, 0)] * (out.ndim - 1) + [(0, wl - out.shape[-1])]
        out = jnp.pad(out, pads)
    return out


def hamilton_adams(raw4: jnp.ndarray) -> jnp.ndarray:
    """Demosaic packed GBRG raw [..., H, W, 4] -> linear RGB [..., 2H, 2W, 3].

    Differentiable; equivalent of HamiltonAdam.forward (reference:
    util/Hamilton_Adam_demo.py:249-289) with the 'gbrg' pattern the models
    are hard-wired to (reference: models/recurrent_model.py:99).
    """
    cfa = pack_cfa(raw4)
    hh, ww = cfa.shape[-2], cfa.shape[-1]
    dtype = cfa.dtype
    mask_r, mask_g, mask_b = bayer_masks(hh, ww, dtype)
    mask_gr, mask_gb = green_row_masks(hh, ww, dtype)

    green = _interp_green(cfa, mask_g)
    red = _interp_chroma(green, cfa * mask_r, mask_b, mask_gr, mask_gb)
    blue = _interp_chroma(green, cfa * mask_b, mask_r, mask_gb, mask_gr)
    return jnp.stack([red, green, blue], axis=-1)
