"""The optimizer actually optimizes: overfit one tiny clip.

Checkpoint/LR tests assert epoch *mechanics*; test_gradients.py pins the
gradient *values* against torch.  This test closes the remaining gap —
that N real train steps through the full differentiable path (demosaic,
flow-upsample, bicubic warps, unrolled recurrence, weighted L1; reference
training loop: models/recurrent_model.py:473-538) reduce the loss and
raise train PSNR by a calibrated margin.  A sign/scale bug anywhere in a
custom VJP or the optimizer wiring fails this immediately.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rvdd_tpu.models import build_network
from rvdd_tpu.models.factory import init_network
from rvdd_tpu.ops.bayer import remosaic
from rvdd_tpu.recurrent.engine import EngineConfig
from rvdd_tpu.training.train_state import (
    create_train_state,
    make_train_step,
    set_learning_rate,
)


@pytest.mark.slow
def test_train_step_overfits_tiny_clip():
    cfg = EngineConfig(
        model_patch_depth=2, patch_depth=4, feature_rec=True, warp_impl="xla"
    )
    net = build_network(
        "convunet-mode=fixedfeatures+feat-filters=12",
        cfg.network_input_nc, 3, True,
    )
    h, w = 16, 16  # raw half-res -> 32x32 RGB
    params = init_network(
        net, jax.random.PRNGKey(0), (1, 2 * h, 2 * w, cfg.network_input_nc)
    )
    state, tx = create_train_state(params, "adamw")
    state = set_learning_rate(state, 2e-3)
    step = make_train_step(cfg, net, tx, donate=False)

    # one physically-consistent clip: a static textured scene, raw frames =
    # CFA subsampling of the GT + per-frame noise, zero flow (aligned)
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0 : 2 * h, 0 : 2 * w]
    gt1 = np.stack(
        [
            0.6 * np.sin(xx / 3 + k) * np.cos(yy / 4 - k / 2)
            + 0.2 * np.sin((xx + yy) / 7)
            for k in range(3)
        ],
        axis=-1,
    ).astype(np.float32)
    T = cfg.patch_depth
    gt = jnp.asarray(np.broadcast_to(gt1, (1, T, 2 * h, 2 * w, 3)).copy())
    raw_clean = remosaic(jnp.asarray(gt1))
    raw = jnp.asarray(
        np.asarray(raw_clean)[None, None]
        + rng.normal(0, 0.08, (1, T, h, w, 4)).astype(np.float32)
    )
    flows = jnp.zeros((1, cfg.train_unrollings, cfg.d, h, w, 2), jnp.float32)
    weights = jnp.full((cfg.train_unrollings,), 1.0 / cfg.train_unrollings)

    state, first = step(state, raw, flows, gt, weights)
    losses = first
    for _ in range(79):
        state, losses = step(state, raw, flows, gt, weights)

    l0, l1 = float(first["Denoiser"]), float(losses["Denoiser"])
    p0, p1 = float(first["PSNR"]), float(losses["PSNR"])
    # calibrated on this seed/config: measured l1/l0 ~ 0.007 (1350 -> 9.3),
    # p1-p0 ~ +37.7 dB (-14.1 -> +23.6); thresholds leave a wide margin
    # while still catching any non-learning run
    assert np.isfinite(l1) and l1 < 0.2 * l0, (l0, l1)
    assert p1 - p0 > 10.0, (p0, p1)
