"""Quality metrics: PSNR (linear / arbitrary peak) and sRGB-domain SSIM.

reference: util/util.py:9-20 (PSNR with max_val), dataset/fwd_ppipe.py:79-86
(sRGB PSNR/SSIM scoring protocol).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def psnr(x, y, max_val: float = 2.0):
    """10*log10(max_val^2 / MSE) over all elements (jittable).

    max_val defaults to 2.0 because the training/validation metric is
    computed in the [-1, 1] network domain (reference:
    models/recurrent_model.py:503,524).
    """
    mse = jnp.mean((x - y) ** 2)
    return 10.0 * jnp.log10(max_val * max_val / mse)


def psnr_srgb(img1: np.ndarray, img2: np.ndarray) -> float:
    """PSNR between two 8-bit sRGB images (numpy, offline scoring).

    Matches the scoring harness convention of normalizing by 255 first
    (reference: dataset/fwd_ppipe.py:79-84).
    """
    x = (np.asarray(img1, np.float64) / 255.0 - np.asarray(img2, np.float64) / 255.0).ravel()
    return float(10.0 * np.log10(1.0 / np.mean(x**2)))


def ssim_srgb(img1: np.ndarray, img2: np.ndarray, data_range: float = 255.0) -> float:
    """Mean SSIM between two images, channels averaged.

    Re-implementation of the standard Wang et al. SSIM with the defaults the
    scikit-image call in the scoring harness uses (gaussian_weights=False,
    7x7 uniform window, K1=0.01, K2=0.03; reference: dataset/fwd_ppipe.py:86).
    """
    x = np.asarray(img1, np.float64)
    y = np.asarray(img2, np.float64)
    if x.ndim == 2:
        x = x[..., None]
        y = y[..., None]
    win = 7
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    def _filt(a):
        # uniform 7x7 filter, valid region only
        from scipy.ndimage import uniform_filter

        return uniform_filter(a, size=(win, win, 1))

    mu_x = _filt(x)
    mu_y = _filt(y)
    mu_xx = _filt(x * x)
    mu_yy = _filt(y * y)
    mu_xy = _filt(x * y)
    # unbiased (n/(n-1)) covariance normalization, as in scikit-image
    n = win * win
    cov_norm = n / (n - 1.0)
    vx = cov_norm * (mu_xx - mu_x * mu_x)
    vy = cov_norm * (mu_yy - mu_y * mu_y)
    vxy = cov_norm * (mu_xy - mu_x * mu_y)
    s = ((2 * mu_x * mu_y + c1) * (2 * vxy + c2)) / (
        (mu_x**2 + mu_y**2 + c1) * (vx + vy + c2)
    )
    pad = (win - 1) // 2
    s = s[pad:-pad, pad:-pad, :]
    return float(s.mean())
