"""Sharded-inference equivalence for the PRODUCTION architectures.

test_round3.py pins the data x spatial mesh semantics on a toy depth-2 /
8-filter net; these two slow tests re-pin it on the real serving configs:

* the 48-filter convunet+feat (the bench headline net) — 3x3 convs, so a
  1-row halo exchange per conv layer on the 'space' axis;
* the ConvNeXt flagship (newunet-mode=feat, feat+future) — 7x7 depthwise
  convs whose 3-row halo is 3x wider than anything the toy test or the
  driver dryrun exercises, plus the future-frame warp.

Reference parity target: the sharded serving path must be bit-comparable
(2e-5) to single-device inference (reference runs single-GPU only:
validate.py:54-114 — the mesh scale-out is this framework's extension).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rvdd_tpu.models import build_network
from rvdd_tpu.models.factory import init_network
from rvdd_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from rvdd_tpu.recurrent.engine import EngineConfig, inference_step, prepare_frames


def _run_case(arch, feat, fd, h, w, seed):
    cfg = EngineConfig(
        model_patch_depth=2,
        patch_depth=2 + fd,
        future_patch_depth=fd,
        feature_rec=feat,
        warp_impl="xla",
    )
    net = build_network(arch, cfg.network_input_nc, 3, feat)
    b = 4
    params = init_network(
        net, jax.random.PRNGKey(seed), (1, 2 * h, 2 * w, cfg.network_input_nc)
    )
    rng = np.random.default_rng(seed)
    raw = jnp.asarray(
        rng.uniform(-1, 1, (b, 2 + fd, h, w, 4)).astype(np.float32)
    )
    yy, xx = np.mgrid[0 : 2 * h, 0 : 2 * w]
    fl = np.stack([1.1 + np.sin(xx / 19), -0.5 + 0.4 * np.cos(yy / 13)], -1)
    flows = jnp.asarray(
        np.broadcast_to(fl[::2, ::2] / 2, (b, 1, 1 + fd, h, w, 2))
        .astype(np.float32)
        .copy()
    )

    def step(params, raw, flows):
        frames, flows2 = prepare_frames(cfg, raw, flows)
        nil = (
            net.nil_features(frames.shape[0], 2 * h, 2 * w) if feat else None
        )
        den, _ = inference_step(cfg, net, params, None, frames, flows2[:, 0], nil)
        return den

    want = np.asarray(jax.jit(step)(params, raw, flows))

    mesh = make_mesh("data2xspace2")
    with mesh:
        raw_s = shard_batch(mesh, raw, spatial_axis=-3)
        flows_s = shard_batch(mesh, flows, spatial_axis=-3)
        params_r = replicate(mesh, params)
        got = np.asarray(jax.jit(step)(params_r, raw_s, flows_s))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@pytest.mark.slow
def test_sharded_production_convunet_feat():
    """48-filter convunet+feat: the bench headline serving config."""
    _run_case(
        "convunet-mode=fixedfeatures+feat", True, 0, h=32, w=64, seed=7
    )


@pytest.mark.slow
def test_sharded_production_convnext_flagship():
    """ConvNeXt flagship (feat+future): 7x7 depthwise = 3-row spatial halo."""
    _run_case("newunet-mode=feat", True, 1, h=32, w=64, seed=11)
