"""Value-range transforms between storage, network, and display domains.

The network domain is [-1, 1] (reference: library.py:55-69, transforms T/iT);
images on disk are 12-bit by default and normalized by 2**bits - 1 on load
(reference: library.py:117-129, options/base_options.py:43).
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_bitdepth(img, bit_depth: int = 12):
    """Disk values -> [0, 1] (divide by 2**bit_depth - 1)."""
    return jnp.asarray(img, jnp.float32) / (2.0 ** float(bit_depth) - 1.0)


def to_net(x):
    """[0, 1] image -> network domain [-1, 1] (transform 'T')."""
    return 2.0 * x - 1.0


def from_net(x):
    """network domain [-1, 1] -> [0, 1] image (transform 'iT')."""
    return (x + 1.0) / 2.0
