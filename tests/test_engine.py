"""Recurrent engine behaviour tests (shape/semantics; full-pipeline parity
against the reference model is covered by the validation CLI tests)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rvdd_tpu.models import build_network, init_network
from rvdd_tpu.recurrent import (
    EngineConfig,
    prepare_frames,
    unrolled_forward,
    inference_step,
    scan_video,
    compute_losses,
)
from rvdd_tpu.recurrent.schedules import unroll_weights


@pytest.fixture(scope="module")
def small_setup():
    cfg = EngineConfig(
        model_patch_depth=2, patch_depth=4, future_patch_depth=1, feature_rec=True
    )
    net = build_network("newunet-mode=feat", cfg.network_input_nc, 3)
    params = init_network(net, jax.random.PRNGKey(0), (1, 16, 16, cfg.network_input_nc))
    return cfg, net, params


@pytest.mark.slow
def test_train_forward_shapes(small_setup):
    cfg, net, params = small_setup
    rng = np.random.default_rng(0)
    b, t = 2, cfg.patch_depth + cfg.future_patch_depth
    raw = jnp.asarray(rng.uniform(-1, 1, (b, t, 8, 8, 4)).astype(np.float32))
    td = cfg.train_unrollings
    flows = jnp.asarray(
        rng.uniform(-1, 1, (b, td, cfg.d + cfg.future_patch_depth, 8, 8, 2)).astype(np.float32)
    )
    frames, flows = jax.jit(lambda r, f: prepare_frames(cfg, r, f))(raw, flows)
    assert frames.shape == (b, t, 16, 16, 3)
    assert flows.shape == (b, td, 2, 16, 16, 2)
    nil = net.nil_features(b, 16, 16)
    outs = jax.jit(
        lambda p, fr, fl, ni: unrolled_forward(cfg, net, p, fr, fl, td, ni)
    )(params, frames, flows, nil)
    assert outs.shape == (b, td, 16, 16, 3)

    gt = jnp.asarray(rng.uniform(-1, 1, (b, t, 16, 16, 3)).astype(np.float32))
    w = jnp.asarray(unroll_weights("all", cfg.patch_depth - 1, 50))
    # weights length = patch_depth-1 = td here (model_patch_depth=2)
    losses = compute_losses(cfg, outs, gt, w)
    assert np.isfinite(float(losses["L1"]))
    assert np.isfinite(float(losses["PSNR"]))


@pytest.mark.slow
def test_inference_state_carry(small_setup):
    cfg, net, params = small_setup
    rng = np.random.default_rng(1)
    b = 1
    win = cfg.d + 1 + cfg.future_patch_depth
    raw = jnp.asarray(rng.uniform(-1, 1, (b, win, 8, 8, 4)).astype(np.float32))
    flows = jnp.asarray(rng.uniform(-1, 1, (b, win - 1, 8, 8, 2)).astype(np.float32))
    frames, flows2 = jax.jit(lambda r, f: prepare_frames(cfg, r, f))(raw, flows[:, None])
    nil = net.nil_features(b, 16, 16)
    first = jax.jit(
        lambda p, fr, fl, ni: inference_step(cfg, net, p, None, fr, fl, ni)
    )
    carry = jax.jit(
        lambda p, st, fr, fl, ni: inference_step(cfg, net, p, st, fr, fl, ni)
    )
    den1, state = first(params, frames, flows2[:, 0], nil)
    assert den1.shape == (b, 16, 16, 3)
    den2, state2 = carry(params, state, frames, flows2[:, 0], nil)
    # same inputs, different recurrence state -> different output
    assert not np.allclose(np.asarray(den1), np.asarray(den2))
    assert state2.lastden.shape == state.lastden.shape


@pytest.mark.slow
def test_scan_video_matches_stepwise():
    """Streamed scan must agree with the per-frame python loop."""
    cfg = EngineConfig(model_patch_depth=2, patch_depth=2, future_patch_depth=0)
    net = build_network("convunet-mode=fixedfeatures", cfg.network_input_nc, 3)
    params = init_network(net, jax.random.PRNGKey(1), (1, 16, 16, cfg.network_input_nc))
    rng = np.random.default_rng(2)
    t, b = 5, 1
    frames = jnp.asarray(rng.uniform(-1, 1, (t, b, 16, 16, 3)).astype(np.float32))
    flows = jnp.asarray(rng.uniform(-1, 1, (t, b, 1, 16, 16, 2)).astype(np.float32) * 0.5)

    dens = np.asarray(
        jax.jit(lambda p, fr, fl: scan_video(cfg, net, p, fr, fl))(params, frames, flows)
    )

    first = jax.jit(lambda p, w, fl: inference_step(cfg, net, p, None, w, fl))
    carry = jax.jit(lambda p, st, w, fl: inference_step(cfg, net, p, st, w, fl))
    state = None
    outs = []
    for i in range(t):
        prev = frames[max(i - 1, 0)]
        win = jnp.stack([prev, frames[i]], axis=1)
        if state is None:
            den, state = first(params, win, flows[i])
        else:
            den, state = carry(params, state, win, flows[i])
        outs.append(np.asarray(den))
    outs = np.stack(outs)
    np.testing.assert_allclose(dens, outs, atol=1e-5)
