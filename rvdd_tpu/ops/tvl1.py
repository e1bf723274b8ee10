"""On-device TV-L1 optical flow (Zach-Pock-Bischof duality scheme).

TPU-native replacement for the reference's offline CPU flow precompute
(reference: libBridge.cpp:44-163 -> 3rdparty/tvl1flow/tvl1flow_lib.c).  The
whole multiscale solver is a single jittable function: pyramid construction,
per-scale duality iterations (``lax.while_loop`` with per-sample freezing so
the early-exit semantics survive ``vmap``), and Catmull-Rom flow upsampling
between scales.  Numerics follow the C implementation closely (same
normalization, Gaussian presmoothing, stencils and boundary rules) so flows
match the ones the released checkpoints were trained with.

Differences from the C code, by design:
* fixed iteration budget per scale with per-pixel-field convergence freeze
  instead of data-dependent loop trip counts (XLA-friendly),
* float32 throughout (the C smoothing uses double internally).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class TVL1Params(NamedTuple):
    """Solver parameters; defaults match libBridge.cpp:27-36."""

    tau: float = 0.25
    lambda_: float = 0.15
    theta: float = 0.3
    nscales: int = 100
    fscale: int = 0
    zfactor: float = 0.5
    nwarps: int = 5
    epsilon: float = 0.01
    max_iterations: int = 300


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """[H, W, C] -> [H, W] grayscale with the bridge's conventions.

    RGB uses the ITU-R 709 luma of skimage.rgb2gray, packed raw uses the
    channel mean (reference: library.py:162-170).
    """
    if img.ndim == 2:
        return img
    c = img.shape[-1]
    if c == 1:
        return img[..., 0]
    if c == 3:
        w = jnp.array([0.2125, 0.7154, 0.0721], img.dtype)
        return img @ w
    return jnp.mean(img, axis=-1)


def _gaussian_kernel(sigma: float) -> np.ndarray:
    """1-D half-kernel B[0..size-1], normalized like mask.c:234-246."""
    size = int(5.0 * sigma) + 1
    j = np.arange(size, dtype=np.float64)
    b = np.exp(-j * j / (2.0 * sigma * sigma)) / (sigma * math.sqrt(2.0 * math.pi))
    b /= 2.0 * b.sum() - b[0]
    return b


def _smooth_axis(x: jnp.ndarray, b: np.ndarray, axis: int) -> jnp.ndarray:
    """Separable Gaussian pass along one axis with the C boundary rule:
    'reflect' on the low side, 'symmetric' on the high side
    (mask.c:264-268)."""
    size = len(b)
    x = jnp.moveaxis(x, axis, 0)
    left = x[size - 1 : 0 : -1]
    right = x[-1 : -size : -1]
    xp = jnp.concatenate([left, x, right], axis=0)
    n = x.shape[0]
    out = b[0] * x
    for j in range(1, size):
        lo = xp[size - 1 - j : size - 1 - j + n]
        hi = xp[size - 1 + j : size - 1 + j + n]
        out = out + b[j] * (lo + hi)
    return jnp.moveaxis(out, 0, axis)


def gaussian_smooth(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """In-place-style 2-D Gaussian smoothing (rows then columns)."""
    b = _gaussian_kernel(sigma)
    img = _smooth_axis(img, b, -1)
    return _smooth_axis(img, b, -2)


def _catmull_axis_weights(in_size: int, out_size: int):
    """Static taps/weights for Catmull-Rom (A=-0.5) resampling of one axis
    at source coords i_out / (out/in) with Neumann clamping
    (bicubic_interpolation.c:100-128, zoom.c:85-109)."""
    factor = out_size / in_size
    src = np.arange(out_size, dtype=np.float64) / factor
    x = np.floor(src).astype(np.int64)  # coords are >= 0 so trunc == floor
    t = src - x
    taps = np.stack([x - 1, x, x + 1, x + 2], 0).clip(0, in_size - 1)
    # Catmull-Rom weights: v1 + 0.5*t*(v2-v0 + t*(2v0-5v1+4v2-v3 + t*(3(v1-v2)+v3-v0)))
    w0 = 0.5 * (-t + 2.0 * t**2 - t**3)
    w1 = 1.0 + 0.5 * (-5.0 * t**2 + 3.0 * t**3)
    w2 = 0.5 * (t + 4.0 * t**2 - 3.0 * t**3)
    w3 = 0.5 * (-(t**2) + t**3)
    w = np.stack([w0, w1, w2, w3], 0)
    return taps, w.astype(np.float32)


def _catmull_resize(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Separable Catmull-Rom resize of [H, W] used for pyramid zoom."""
    h, w = img.shape[-2], img.shape[-1]
    taps, wts = _catmull_axis_weights(h, out_h)
    rows = sum(wts[k][:, None] * img[..., taps[k], :] for k in range(4))
    taps, wts = _catmull_axis_weights(w, out_w)
    return sum(wts[k] * rows[..., :, taps[k]] for k in range(4))


def _zoom_size(n: int, factor: float) -> int:
    return int(n * factor + 0.5)  # zoom.c:22-34


def _zoom_out(img: jnp.ndarray, factor: float) -> jnp.ndarray:
    """Gaussian presmooth + Catmull-Rom subsample (zoom.c:41-77)."""
    h, w = img.shape[-2], img.shape[-1]
    oh, ow = _zoom_size(h, factor), _zoom_size(w, factor)
    sigma = 0.6 * math.sqrt(1.0 / (factor * factor) - 1.0)
    sm = gaussian_smooth(img, sigma)
    if abs(factor - 0.5) < 1e-12:
        # source coords are exactly 2*i -> plain stride-2 subsampling
        return sm[..., 0 : 2 * oh : 2, 0 : 2 * ow : 2]
    # general case: sample at i/factor
    taps_h, w_h = _catmull_axis_weights_src(h, oh, 1.0 / factor)
    rows = sum(w_h[k][:, None] * sm[..., taps_h[k], :] for k in range(4))
    taps_w, w_w = _catmull_axis_weights_src(w, ow, 1.0 / factor)
    return sum(w_w[k] * rows[..., :, taps_w[k]] for k in range(4))


def _catmull_axis_weights_src(in_size: int, out_size: int, step: float):
    """Like _catmull_axis_weights but with explicit source step."""
    src = np.arange(out_size, dtype=np.float64) * step
    x = np.floor(src).astype(np.int64)
    t = src - x
    taps = np.stack([x - 1, x, x + 1, x + 2], 0).clip(0, in_size - 1)
    w0 = 0.5 * (-t + 2.0 * t**2 - t**3)
    w1 = 1.0 + 0.5 * (-5.0 * t**2 + 3.0 * t**3)
    w2 = 0.5 * (t + 4.0 * t**2 - 3.0 * t**3)
    w3 = 0.5 * (-(t**2) + t**3)
    return taps, np.stack([w0, w1, w2, w3], 0).astype(np.float32)


def _warp_catmull_zero(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Warp [H, W] image at (x+u, y+v), Catmull-Rom, zero outside.

    Matches bicubic_interpolation_warp(..., border_out=true): a pixel is
    zeroed whenever any of its 4x4 taps needed clamping
    (bicubic_interpolation.c:136-232).  For non-negative coords the stencil
    stays inside iff 1 <= coord < n-2.

    On TPU, sufficiently large levels route through the Pallas
    shift-accumulation kernel (XLA's per-pixel gathers dominate the solver
    otherwise); small pyramid levels keep the gather form.
    """
    h, w = img.shape
    if jax.default_backend() not in ("cpu",) and h * w >= 64 * 128:
        from rvdd_tpu.ops.pallas.warp_pallas import warp_bicubic_pallas

        flow = jnp.stack([u, v], axis=-1)[None]
        out, _ = warp_bicubic_pallas(
            img[None, :, :, None], flow, max_disp=64, group=1,
            coeff_a=-0.5, zero_outside=True,
        )
        return out[0, :, :, 0]
    h, w = img.shape
    gx = jnp.arange(w, dtype=img.dtype)[None, :] + u
    gy = jnp.arange(h, dtype=img.dtype)[:, None] + v

    out_of_range = (gx < 1.0) | (gx >= w - 2.0) | (gy < 1.0) | (gy >= h - 2.0)

    # safe coords for the gather (result masked to 0 anyway where invalid)
    gxc = jnp.clip(gx, 0.0, w - 1.0)
    gyc = jnp.clip(gy, 0.0, h - 1.0)
    ix = jnp.floor(gxc)
    iy = jnp.floor(gyc)
    tx = gxc - ix
    ty = gyc - iy

    def cr_weights(t):
        w0 = 0.5 * (-t + 2.0 * t**2 - t**3)
        w1 = 1.0 + 0.5 * (-5.0 * t**2 + 3.0 * t**3)
        w2 = 0.5 * (t + 4.0 * t**2 - 3.0 * t**3)
        w3 = 0.5 * (-(t**2) + t**3)
        return (w0, w1, w2, w3)

    wx = cr_weights(tx)
    wy = cr_weights(ty)
    ixi = ix.astype(jnp.int32)
    iyi = iy.astype(jnp.int32)
    flat = img.reshape(-1)
    out = jnp.zeros_like(img)
    for j in range(4):
        cy = jnp.clip(iyi + (j - 1), 0, h - 1)
        row = jnp.zeros_like(img)
        for i in range(4):
            cx = jnp.clip(ixi + (i - 1), 0, w - 1)
            row = row + wx[i] * flat[cy * w + cx]
        out = out + wy[j] * row
    return jnp.where(out_of_range, 0.0, out)


# --- stencils with the exact boundary rules of mask.c ----------------------


def _centered_gradient(f: jnp.ndarray):
    """mask.c:149-206: central differences, one-sided*0.5 at borders."""
    fp = jnp.pad(f, ((1, 1), (1, 1)), mode="edge")
    dx = 0.5 * (fp[1:-1, 2:] - fp[1:-1, :-2])
    dy = 0.5 * (fp[2:, 1:-1] - fp[:-2, 1:-1])
    return dx, dy


def _forward_gradient(f: jnp.ndarray):
    """mask.c:98-141: forward differences, zero at the last row/column."""
    fx = jnp.pad(f[:, 1:] - f[:, :-1], ((0, 0), (0, 1)))
    fy = jnp.pad(f[1:, :] - f[:-1, :], ((0, 1), (0, 0)))
    return fx, fy


def _divergence(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """mask.c:40-89: adjoint of the forward gradient (backward diffs with
    v at the first row/col and -v at the last)."""
    d1 = jnp.concatenate(
        [v1[:, :1], v1[:, 1:-1] - v1[:, :-2], -v1[:, -2:-1]], axis=1
    )
    d2 = jnp.concatenate(
        [v2[:1, :], v2[1:-1, :] - v2[:-2, :], -v2[-2:-1, :]], axis=0
    )
    return d1 + d2


# ---------------------------------------------------------------------------
# single-scale solver
# ---------------------------------------------------------------------------


def _tvl1_single_scale(i0, i1, u1, u2, p: TVL1Params):
    """One scale of the duality iteration (tvl1flow_lib.c:91-273)."""
    l_t = p.lambda_ * p.theta
    taut = p.tau / p.theta
    grad_is_zero = 1e-10
    i1x, i1y = _centered_gradient(i1)
    size = i0.size

    def warp_stage(carry, _):
        u1, u2, p11, p12, p21, p22 = carry
        i1w = _warp_catmull_zero(i1, u1, u2)
        i1wx = _warp_catmull_zero(i1x, u1, u2)
        i1wy = _warp_catmull_zero(i1y, u1, u2)
        grad = i1wx * i1wx + i1wy * i1wy
        rho_c = i1w - i1wx * u1 - i1wy * u2 - i0

        def cond(st):
            _, _, _, _, _, _, err, n = st
            return (err > p.epsilon * p.epsilon) & (n < p.max_iterations)

        def body(st):
            u1, u2, p11, p12, p21, p22, _, n = st
            rho = rho_c + i1wx * u1 + i1wy * u2
            neg = rho < -l_t * grad
            pos = rho > l_t * grad
            fi = jnp.where(grad < grad_is_zero, 0.0, -rho / jnp.maximum(grad, grad_is_zero))
            d1 = jnp.where(neg, l_t * i1wx, jnp.where(pos, -l_t * i1wx, fi * i1wx))
            d2 = jnp.where(neg, l_t * i1wy, jnp.where(pos, -l_t * i1wy, fi * i1wy))
            v1 = u1 + d1
            v2 = u2 + d2

            div_p1 = _divergence(p11, p12)
            div_p2 = _divergence(p21, p22)
            u1n = v1 + p.theta * div_p1
            u2n = v2 + p.theta * div_p2
            err = (jnp.sum((u1n - u1) ** 2) + jnp.sum((u2n - u2) ** 2)) / size

            u1x, u1y = _forward_gradient(u1n)
            u2x, u2y = _forward_gradient(u2n)
            g1 = jnp.hypot(u1x, u1y)
            g2 = jnp.hypot(u2x, u2y)
            ng1 = 1.0 + taut * g1
            ng2 = 1.0 + taut * g2
            p11n = (p11 + taut * u1x) / ng1
            p12n = (p12 + taut * u1y) / ng1
            p21n = (p21 + taut * u2x) / ng2
            p22n = (p22 + taut * u2y) / ng2
            return (u1n, u2n, p11n, p12n, p21n, p22n, err, n + 1)

        init = (u1, u2, p11, p12, p21, p22, jnp.inf, jnp.int32(0))
        u1, u2, p11, p12, p21, p22, _, _ = jax.lax.while_loop(cond, body, init)
        return (u1, u2, p11, p12, p21, p22), None

    z = jnp.zeros_like(u1)
    carry = (u1, u2, z, z, z, z)
    carry, _ = jax.lax.scan(warp_stage, carry, None, length=p.nwarps)
    return carry[0], carry[1]


# ---------------------------------------------------------------------------
# multiscale driver
# ---------------------------------------------------------------------------


def _num_scales(nx: int, ny: int, p: TVL1Params) -> int:
    """Scale count so the coarsest level is >= 16px (libBridge.cpp:131-138)."""
    n = int(1 + math.log(math.hypot(nx, ny) / 16.0) / math.log(1.0 / p.zfactor))
    return max(1, min(p.nscales, n))


@partial(jax.jit, static_argnames=("params",))
def tvl1_flow(i0: jnp.ndarray, i1: jnp.ndarray, params: TVL1Params = TVL1Params()):
    """Multiscale TV-L1 flow: finds u with i1(x + u) ~= i0(x).

    i0, i1: [H, W] grayscale (any range; jointly normalized to [0, 255]
    like tvl1flow_lib.c:301-335).  Returns flow [H, W, 2] with (u, v).
    """
    i0 = jnp.asarray(i0, jnp.float32)
    i1 = jnp.asarray(i1, jnp.float32)
    ny, nx = i0.shape
    p = params
    nscales = _num_scales(nx, ny, p)

    # joint [0,255] normalization
    mx = jnp.maximum(jnp.max(i0), jnp.max(i1))
    mn = jnp.minimum(jnp.min(i0), jnp.min(i1))
    den = mx - mn
    scale = jnp.where(den > 0, 255.0 / den, 1.0)
    off = jnp.where(den > 0, mn, 0.0)
    i0 = (i0 - off) * scale
    i1 = (i1 - off) * scale

    i0 = gaussian_smooth(i0, 0.8)  # PRESMOOTHING_SIGMA
    i1 = gaussian_smooth(i1, 0.8)

    # build pyramid (shapes static per level)
    pyr0 = [i0]
    pyr1 = [i1]
    sizes = [(ny, nx)]
    for _ in range(1, nscales):
        pyr0.append(_zoom_out(pyr0[-1], p.zfactor))
        pyr1.append(_zoom_out(pyr1[-1], p.zfactor))
        sizes.append(pyr0[-1].shape)

    h, w = sizes[-1]
    u1 = jnp.zeros((h, w), jnp.float32)
    u2 = jnp.zeros((h, w), jnp.float32)
    for s in range(nscales - 1, -1, -1):
        if s >= p.fscale:
            u1, u2 = _tvl1_single_scale(pyr0[s], pyr1[s], u1, u2, p)
        if s == 0:
            break
        oh, ow = sizes[s - 1]
        u1 = _catmull_resize(u1, oh, ow) * (1.0 / p.zfactor)
        u2 = _catmull_resize(u2, oh, ow) * (1.0 / p.zfactor)
    return jnp.stack([u1, u2], axis=-1)


def tvl1_flow_pair(src: jnp.ndarray, ref: jnp.ndarray, params: TVL1Params = TVL1Params()):
    """Flow that warps ``src`` onto ``ref`` (both [H, W, C] or [H, W]).

    Mirrors compute_flow(img1, img2) in the reference
    (util/flow_utils.py:126-134): the returned flow, applied to ``src`` with
    :func:`rvdd_tpu.ops.warp.warp`, aligns it with ``ref``.
    """
    return tvl1_flow(to_gray(ref), to_gray(src), params)
