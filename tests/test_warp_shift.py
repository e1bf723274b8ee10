"""The displacement-banded shift warp (ops/warp_shift.py) — the TPU
training path — must reproduce the exact XLA warp's numerics (torch
grid_sample bicubic/border/align_corners; reference:
util/flow_utils.py:70-102) in BOTH directions: reverse-mode AD through it
is what the production train step differentiates (the exact warp's
scatter-add backward measures 67 s/step on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rvdd_tpu.ops.warp import warp
from rvdd_tpu.ops.warp_shift import warp_shift


def _smooth_flow(rng, b, h, w, base_range=12.0, local=2.0):
    """Global translation + smooth local field — the TV-L1 flow regime."""
    base = rng.uniform(-base_range, base_range, size=(b, 1, 1, 2))
    loc = rng.normal(size=(b, 4, 4, 2)) * local
    locf = jax.image.resize(jnp.asarray(loc, jnp.float32), (b, h, w, 2), "cubic")
    return jnp.asarray(base, jnp.float32) + locf


def test_forward_matches_exact_warp():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 24, 26, 3)).astype(np.float32))
    flow = _smooth_flow(rng, 1, 24, 26)
    ref, mref = warp(x, flow, "bicubic")
    got, mgot = warp_shift(x, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)
    np.testing.assert_array_equal(np.asarray(mgot), np.asarray(mref))


@pytest.mark.slow
def test_forward_matches_banded_tall():
    """H > band + window: per-band vertical bases actually engage."""
    rng = np.random.default_rng(1)
    h, w = 64, 40
    x = jnp.asarray(rng.normal(size=(2, h, w, 4)).astype(np.float32))
    # vertically varying flow: each band absorbs a different base
    ramp = jnp.linspace(-10.0, 10.0, h)[None, :, None]
    flow = _smooth_flow(rng, 2, h, w, base_range=4.0)
    flow = flow.at[..., 1].add(ramp)
    ref, _ = warp(x, flow, "bicubic")
    got, _ = warp_shift(x, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_pathological_flows_stay_finite():
    """Residuals far beyond the radius must clamp to the window edge
    (graceful degradation, like the Pallas kernel), never NaN/inf."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 24, 26, 3)).astype(np.float32))
    flow = jnp.asarray(
        rng.uniform(-100, 100, size=(1, 24, 26, 2)).astype(np.float32))
    out, mask = warp_shift(x, flow)
    assert bool(jnp.all(jnp.isfinite(out)))
    # values stay inside the source range (every tap weight sums to 1 over
    # a convex-ish cubic kernel; edge folding preserves the sum)
    assert float(jnp.abs(out).max()) <= float(jnp.abs(x).max()) * 2.5


@pytest.mark.slow
def test_radius_knob_still_exact_within_budget():
    """shift_warp_radius=5 (the fast training knob) stays exact while the
    per-pixel residual fits the halved sweep."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 24, 26, 3)).astype(np.float32))
    flow = _smooth_flow(rng, 1, 24, 26, base_range=10.0, local=0.8)
    ref, _ = warp(x, flow, "bicubic")
    got, _ = warp_shift(x, flow, radius_v=5, radius_h=5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


@pytest.mark.slow
def test_gradient_matches_exact_warp():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 24, 26, 5)).astype(np.float32))
    flow = _smooth_flow(rng, 1, 24, 26)
    g = jnp.asarray(rng.normal(size=(1, 24, 26, 5)).astype(np.float32))
    gr = jax.grad(lambda xx: jnp.sum(warp(xx, flow, "bicubic")[0] * g))(x)
    gs = jax.grad(lambda xx: jnp.sum(warp_shift(xx, flow)[0] * g))(x)
    scale = float(jnp.abs(gr).max())
    assert float(jnp.abs(gr - gs).max()) <= 2e-6 * max(scale, 1.0)


@pytest.mark.slow
def test_engine_training_forward_and_grads_shift_vs_xla():
    """unrolled_forward with warp_impl='shift' (production TPU training)
    must match warp_impl='xla' (the golden-pinned path) through the full
    differentiable graph: demosaic -> warps -> net -> unrolled loss."""
    import dataclasses

    from rvdd_tpu.models import build_network
    from rvdd_tpu.models.factory import init_network
    from rvdd_tpu.recurrent.engine import (
        EngineConfig, compute_losses, prepare_frames, unrolled_forward,
    )

    base = EngineConfig(
        model_patch_depth=2, patch_depth=4, future_patch_depth=0,
        feature_rec=True, warp_impl="xla", net_impl="xla",
    )
    net = build_network(
        "convunet-mode=fixedfeatures+feat-depth=2-filters=8",
        base.network_input_nc, 3, True,
    )
    params = init_network(
        net, jax.random.PRNGKey(0), (1, 32, 32, base.network_input_nc)
    )
    rng = np.random.default_rng(3)
    td = base.train_unrollings
    frames = jnp.asarray(
        rng.uniform(-1, 1, (1, base.patch_depth, 16, 16, 4)).astype(np.float32))
    flows = _smooth_flow(rng, td * base.d, 16, 16, base_range=3.0, local=1.0)
    flows = flows.reshape(1, td, base.d, 16, 16, 2)
    gt = jnp.asarray(
        rng.uniform(-1, 1, (1, base.patch_depth, 32, 32, 3)).astype(np.float32))
    weights = jnp.full((td,), 1.0 / td, jnp.float32)

    def loss(cfg, p):
        fr, fl = prepare_frames(cfg, frames, flows)
        nil = net.nil_features(1, fr.shape[2], fr.shape[3], fr.dtype)
        outs = unrolled_forward(cfg, net, p, fr, fl, td, nil)
        return compute_losses(cfg, outs, gt, weights)["Denoiser"]

    shift_cfg = dataclasses.replace(base, warp_impl="shift")
    l_x, g_x = jax.value_and_grad(lambda p: loss(base, p))(params)
    l_s, g_s = jax.value_and_grad(lambda p: loss(shift_cfg, p))(params)
    np.testing.assert_allclose(float(l_s), float(l_x), rtol=1e-6)
    for (pa, va), (pb, vb) in zip(
        jax.tree_util.tree_flatten_with_path(g_x)[0],
        jax.tree_util.tree_flatten_with_path(g_s)[0],
    ):
        assert pa == pb
        scale = max(float(jnp.abs(va).max()), 1e-3)
        assert float(jnp.abs(va - vb).max()) <= 1e-5 * scale, pa


def test_clamp_fraction_telemetry():
    """clamp_fraction is 0 exactly when the sweep is exact (TV-L1-regime
    flows), positive on fast motion, and where it reports 0 the shift warp
    matches the exact warp (the telemetry's 'exact' claim is sound)."""
    from rvdd_tpu.ops.warp_shift import clamp_fraction

    rng = np.random.default_rng(7)
    h, w = 24, 26
    x = jnp.asarray(rng.normal(size=(1, h, w, 3)).astype(np.float32))

    smooth = _smooth_flow(rng, 1, h, w, base_range=6.0, local=1.5)
    assert float(clamp_fraction(smooth)) == 0.0
    ref, _ = warp(x, smooth, "bicubic")
    got, _ = warp_shift(x, smooth)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)

    # fast motion: local residuals far beyond the radius
    fast = jnp.asarray(
        rng.uniform(-40, 40, size=(1, h, w, 2)).astype(np.float32))
    assert float(clamp_fraction(fast)) > 0.1

    # halved radius flags flows the full radius absorbs
    mid = _smooth_flow(rng, 1, h, w, base_range=2.0, local=3.5)
    full = float(clamp_fraction(mid, radius_v=8, radius_h=8))
    half = float(clamp_fraction(mid, radius_v=3, radius_h=3))
    assert half >= full
