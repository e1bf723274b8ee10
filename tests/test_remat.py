"""EngineConfig.remat: per-unrolling jax.checkpoint in the training
backward must be an exact memory/compute trade — identical loss and
identical gradients to the non-remat graph.  (The flagship ConvNeXt
4-unrolling backward needs it to fit 16 GB HBM; bench.py --train enables
it for convnext models.)"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rvdd_tpu.models import build_network
from rvdd_tpu.models.factory import init_network
from rvdd_tpu.recurrent.engine import (
    EngineConfig,
    compute_losses,
    prepare_frames,
    unrolled_forward,
)


def _loss_fn(cfg, net, params, raw, flows, gt, weights):
    frames, flows = prepare_frames(cfg, raw, flows)
    nil_feat = None
    if cfg.feature_rec:
        b, _, h, w, _ = frames.shape
        nil_feat = net.nil_features(b, h, w, frames.dtype)
    outs = unrolled_forward(
        cfg, net, params, frames, flows, weights.shape[0], nil_feat
    )
    return compute_losses(cfg, outs, gt, weights)["Denoiser"]


@pytest.mark.slow  # two full unrolled-grad compiles (~30 s on this host)
def test_remat_grads_identical():
    base = EngineConfig(
        model_patch_depth=2, patch_depth=4, future_patch_depth=1,
        feature_rec=True, warp_impl="xla", net_impl="xla",
    )
    arch = "newunet-mode=feat-filters=8"
    net = build_network(arch, base.network_input_nc, 3, True)
    params = init_network(
        net, jax.random.PRNGKey(0), (1, 32, 32, base.network_input_nc)
    )
    rng = np.random.default_rng(0)
    td = base.train_unrollings
    raw = jnp.asarray(rng.uniform(-1, 1, (1, 5, 16, 16, 4)).astype(np.float32))
    flows = jnp.asarray(
        (rng.standard_normal((1, td, 2, 16, 16, 2)) * 0.5).astype(np.float32)
    )
    gt = jnp.asarray(rng.uniform(-1, 1, (1, 5, 32, 32, 3)).astype(np.float32))
    weights = jnp.full((td,), 1.0 / td, jnp.float32)

    def grads_for(cfg):
        gf = jax.jit(jax.value_and_grad(
            lambda p: _loss_fn(cfg, net, p, raw, flows, gt, weights)))
        return gf(params)

    loss0, g0 = grads_for(base)
    loss1, g1 = grads_for(
        __import__("dataclasses").replace(base, remat=True))
    # same math; XLA fuses the remat graph differently, so identity only
    # holds to float32 rounding (observed max ulp-level differences)
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-6)
    gscale = max(
        float(jnp.max(jnp.abs(v))) for v in jax.tree_util.tree_leaves(g0)
    )
    for (p0, a), (p1, b) in zip(
        jax.tree_util.tree_flatten_with_path(g0)[0],
        jax.tree_util.tree_flatten_with_path(g1)[0],
    ):
        assert p0 == p1
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5 * gscale, rtol=1e-5
        )
