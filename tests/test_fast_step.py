"""Planar fused inference step (warp v3 + fused conv chains) vs the generic
XLA step (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rvdd_tpu.models import build_network
from rvdd_tpu.models.factory import init_network
from rvdd_tpu.recurrent.engine import EngineConfig, inference_step

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _interpret(pallas_interpret):
    yield


@pytest.mark.parametrize("feat_rec,fd", [(True, 0), (False, 0), (True, 1)])
def test_fast_step_matches_generic(feat_rec, fd):
    h = w = 32
    in_nc = (2 + fd) * 3
    arch = "convunet-mode=" + ("fixedfeatures+feat" if feat_rec else "fixedfeatures")
    net = build_network(arch, in_nc, 3, feat_rec)
    params = init_network(net, jax.random.PRNGKey(0), (1, h, w, in_nc))

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(-1, 1, (1, 2 + fd, h, w, 3)).astype(np.float32))
    yy, xx = np.mgrid[0:h, 0:w]
    fl = np.stack([1.5 + np.sin(xx / 20), -0.8 + 0.5 * np.cos(yy / 9)], -1)
    flows = jnp.asarray(
        np.broadcast_to(fl, (1, 1 + fd, h, w, 2)).astype(np.float32).copy()
    )

    cfg_ref = EngineConfig(
        model_patch_depth=2, patch_depth=2 + fd, future_patch_depth=fd,
        feature_rec=feat_rec,
    )
    nil = net.nil_features(1, h, w) if feat_rec else None
    want, wstate = inference_step(cfg_ref, net, params, None, frames, flows, nil)

    cfg_fast = EngineConfig(
        model_patch_depth=2, patch_depth=2 + fd, future_patch_depth=fd,
        feature_rec=feat_rec, net_impl="fused", state_dtype="bfloat16",
    )
    got, fstate = inference_step(cfg_fast, net, params, None, frames, flows, nil)

    scale = float(jnp.std(want)) + 1e-6
    err = float(jnp.max(jnp.abs(got - want))) / scale
    assert err < 0.2, f"normalized max err {err}"

    # second step: recurrence carried through the planar state
    want2, _ = inference_step(cfg_ref, net, params, wstate, frames, flows, nil)
    got2, _ = inference_step(cfg_fast, net, params, fstate, frames, flows, nil)
    err2 = float(jnp.max(jnp.abs(got2 - want2))) / (float(jnp.std(want2)) + 1e-6)
    assert err2 < 0.3, f"step-2 normalized max err {err2}"


def test_fast_step_mixed_preset_near_exact():
    """The full fused step under 'mixed' (fp32 bands, manual 3-pass dots,
    fp32 warp/state) must track the exact XLA step to ~1e-3 normalized —
    two orders tighter than 'fast''s 0.2 envelope.  This is the engine-level
    guard for the feat-future parity preset (net-level: minigolden)."""
    h = w = 32
    fd = 1
    in_nc = (2 + fd) * 3
    net = build_network("convunet-mode=fixedfeatures+feat", in_nc, 3, True)
    params = init_network(net, jax.random.PRNGKey(0), (1, h, w, in_nc))
    rng = np.random.default_rng(11)
    frames = jnp.asarray(rng.uniform(-1, 1, (1, 2 + fd, h, w, 3)).astype(np.float32))
    yy, xx = np.mgrid[0:h, 0:w]
    fl = np.stack([1.2 + np.sin(xx / 15), -0.7 + 0.5 * np.cos(yy / 8)], -1)
    flows = jnp.asarray(
        np.broadcast_to(fl, (1, 1 + fd, h, w, 2)).astype(np.float32).copy()
    )
    cfg_ref = EngineConfig(
        model_patch_depth=2, patch_depth=2 + fd, future_patch_depth=fd,
        feature_rec=True,
    )
    nil = net.nil_features(1, h, w)
    want, wstate = inference_step(cfg_ref, net, params, None, frames, flows, nil)

    cfg_mixed = EngineConfig(
        model_patch_depth=2, patch_depth=2 + fd, future_patch_depth=fd,
        feature_rec=True, net_impl="fused", fused_precision="mixed",
    )
    got, mstate = inference_step(cfg_mixed, net, params, None, frames, flows, nil)
    scale = float(jnp.std(want)) + 1e-6
    err = float(jnp.max(jnp.abs(got - want))) / scale
    assert err < 2e-3, f"mixed-preset normalized max err {err}"

    want2, _ = inference_step(cfg_ref, net, params, wstate, frames, flows, nil)
    got2, _ = inference_step(cfg_mixed, net, params, mstate, frames, flows, nil)
    err2 = float(jnp.max(jnp.abs(got2 - want2))) / (float(jnp.std(want2)) + 1e-6)
    assert err2 < 3e-3, f"mixed-preset step-2 normalized max err {err2}"


def test_fast_step_batched_streams_match_singles():
    """The --streams path: a batched fused step (B=2, per-sample Python
    loop in _fast_planar_step) must produce exactly what two independent
    B=1 steps produce, state carry included."""
    h = w = 32
    net = build_network("convunet-mode=fixedfeatures+feat", 6, 3, True)
    params = init_network(net, jax.random.PRNGKey(0), (1, h, w, 6))
    rng = np.random.default_rng(5)
    frames = jnp.asarray(rng.uniform(-1, 1, (2, 2, h, w, 3)).astype(np.float32))
    yy, xx = np.mgrid[0:h, 0:w]
    fl = np.stack(
        [np.stack([1.5 + np.sin(xx / 17), -0.6 + 0.4 * np.cos(yy / 11)], -1),
         np.stack([-2.1 + 0.3 * np.cos(xx / 13), 0.9 + np.sin(yy / 7)], -1)]
    )
    flows = jnp.asarray(fl[:, None].astype(np.float32))  # [2, 1, h, w, 2]

    cfg = EngineConfig(
        model_patch_depth=2, patch_depth=2, feature_rec=True,
        net_impl="fused", state_dtype="bfloat16",
    )
    nil = net.nil_features(2, h, w)
    den_b, state_b = inference_step(cfg, net, params, None, frames, flows, nil)
    den2_b, _ = inference_step(cfg, net, params, state_b, frames, flows, nil)

    nil1 = net.nil_features(1, h, w)
    for bi in range(2):
        den_s, state_s = inference_step(
            cfg, net, params, None, frames[bi : bi + 1], flows[bi : bi + 1], nil1
        )
        np.testing.assert_array_equal(np.asarray(den_b[bi]), np.asarray(den_s[0]))
        den2_s, _ = inference_step(
            cfg, net, params, state_s, frames[bi : bi + 1], flows[bi : bi + 1],
            nil1,
        )
        np.testing.assert_array_equal(np.asarray(den2_b[bi]), np.asarray(den2_s[0]))


@pytest.mark.parametrize("feat_rec,fd,state_dtype",
                         [(True, 1, "bfloat16"), (True, 1, "float32")])
def test_fast_step_convnext_matches_generic(feat_rec, fd, state_dtype):
    """Flagship ConvNeXt+feat+future fused engine step (combine-state dec2
    emit) vs the generic XLA step.  h=64 is the fast path's minimum.

    state_dtype='float32' pins the production configuration's row-wise fp32
    state dual-write (convnext_pallas state_write with out_dtype=float32) —
    the carry path the on-chip PARITY numbers ride."""
    h = w = 64
    in_nc = (2 + fd) * 3
    net_ref = build_network("newunet-mode=feat", in_nc, 3, feat_rec)
    params = init_network(net_ref, jax.random.PRNGKey(0), (1, h, w, in_nc))
    net_fast = build_network(
        "newunet-mode=feat", in_nc, 3, feat_rec, fast_act=True,
        dtype=jnp.bfloat16,
    )

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(-1, 1, (1, 2 + fd, h, w, 3)).astype(np.float32)
    )
    yy, xx = np.mgrid[0:h, 0:w]
    fl = np.stack([1.5 + np.sin(xx / 20), -0.8 + 0.5 * np.cos(yy / 9)], -1)
    flows = jnp.asarray(
        np.broadcast_to(fl, (1, 1 + fd, h, w, 2)).astype(np.float32).copy()
    )

    cfg_ref = EngineConfig(
        model_patch_depth=2, patch_depth=2 + fd, future_patch_depth=fd,
        feature_rec=feat_rec,
    )
    nil = net_ref.nil_features(1, h, w)
    want, wstate = inference_step(cfg_ref, net_ref, params, None, frames, flows, nil)

    cfg_fast = EngineConfig(
        model_patch_depth=2, patch_depth=2 + fd, future_patch_depth=fd,
        feature_rec=feat_rec, net_impl="fused", state_dtype=state_dtype,
    )
    got, fstate = inference_step(
        cfg_fast, net_fast, params, None, frames, flows, nil
    )

    scale = float(jnp.std(want)) + 1e-6
    err = float(jnp.max(jnp.abs(got - want))) / scale
    assert err < 0.2, f"normalized max err {err}"

    # second step: recurrence carried through the combined planar state
    want2, _ = inference_step(cfg_ref, net_ref, params, wstate, frames, flows, nil)
    got2, _ = inference_step(cfg_fast, net_fast, params, fstate, frames, flows, nil)
    err2 = float(jnp.max(jnp.abs(got2 - want2))) / (float(jnp.std(want2)) + 1e-6)
    assert err2 < 0.3, f"step-2 normalized max err {err2}"
