"""Bayer CFA layout utilities (single source of truth for the GBRG packing).

The whole framework uses the packed-raw convention of the reference dataset
generator (reference: dataset/generate_raw_from_RGB.py:86-96): a GBRG mosaic
of a 2H x 2W sensor frame is stored as a half-resolution 4-channel image with
channel order

    ch0 = G  (rows 0::2, cols 0::2)
    ch1 = B  (rows 0::2, cols 1::2)
    ch2 = R  (rows 1::2, cols 0::2)
    ch3 = G2 (rows 1::2, cols 1::2)

All arrays are NHWC.
"""

from __future__ import annotations

import jax.numpy as jnp

#: Bayer pattern of the framework ('gbrg'); kept as data so that the pattern
#: shows up in one place only.
PATTERN = "gbrg"


def pack_cfa(raw4: jnp.ndarray) -> jnp.ndarray:
    """Scatter a packed [..., H, W, 4] raw image into a [..., 2H, 2W] CFA.

    Equivalent of the reference HamiltonAdam.pack_in_one
    (reference: util/Hamilton_Adam_demo.py:226-234), NHWC layout.
    """
    *lead, h, w, c = raw4.shape
    assert c == 4, f"packed raw must have 4 channels, got {c}"
    # interleave: out[..., 2i+di, 2j+dj] = raw4[..., i, j, 2*di+dj]
    x = raw4.reshape(*lead, h, w, 2, 2)
    x = jnp.swapaxes(x, -3, -2)  # [..., h, 2, w, 2]
    return x.reshape(*lead, 2 * h, 2 * w)


def unpack_cfa(cfa: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_cfa`: [..., 2H, 2W] -> [..., H, W, 4]."""
    *lead, hh, ww = cfa.shape
    h, w = hh // 2, ww // 2
    x = cfa.reshape(*lead, h, 2, w, 2)
    x = jnp.swapaxes(x, -3, -2)  # [..., h, w, 2, 2]
    return x.reshape(*lead, h, w, 4)


def remosaic(rgb: jnp.ndarray) -> jnp.ndarray:
    """Subsample a full-res [..., 2H, 2W, 3] RGB image back to packed raw.

    Equivalent of HamiltonAdam.remosaick (reference:
    util/Hamilton_Adam_demo.py:237-246): takes the channel that the GBRG CFA
    would have observed at each photosite.
    """
    g = rgb[..., 0::2, 0::2, 1]
    b = rgb[..., 0::2, 1::2, 2]
    r = rgb[..., 1::2, 0::2, 0]
    g2 = rgb[..., 1::2, 1::2, 1]
    return jnp.stack([g, b, r, g2], axis=-1)


def bayer_masks(hh: int, ww: int, dtype=jnp.float32):
    """Per-color site masks for a 2H x 2W GBRG CFA.

    Returns (mask_r, mask_g, mask_b), each [hh, ww] with 1.0 at the sites
    where that color was sampled (reference: util/Hamilton_Adam_demo.py
    mosaic_bayer_mask, 201-224, for pattern 'gbrg').
    """
    ri = jnp.arange(hh)[:, None]
    ci = jnp.arange(ww)[None, :]
    odd_r = (ri % 2).astype(dtype)
    odd_c = (ci % 2).astype(dtype)
    even_r, even_c = 1.0 - odd_r, 1.0 - odd_c
    mask_g = even_r * even_c + odd_r * odd_c
    mask_b = even_r * odd_c
    mask_r = odd_r * even_c
    return mask_r, mask_g, mask_b


def green_row_masks(hh: int, ww: int, dtype=jnp.float32):
    """Masks of green sites split by row type for the R/B interpolation.

    For 'gbrg': maskGb = greens on blue rows (even/even), maskGr = greens on
    red rows (odd/odd) (reference: util/Hamilton_Adam_demo.py:190-192).
    """
    ri = jnp.arange(hh)[:, None]
    ci = jnp.arange(ww)[None, :]
    odd_r = (ri % 2).astype(dtype)
    odd_c = (ci % 2).astype(dtype)
    mask_gb = (1.0 - odd_r) * (1.0 - odd_c)
    mask_gr = odd_r * odd_c
    return mask_gr, mask_gb
