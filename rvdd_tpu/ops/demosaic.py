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
