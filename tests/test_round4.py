"""Round-4 additions: online-flow validation presets and bench plumbing."""

import numpy as np
import jax.numpy as jnp
import pytest

from rvdd_tpu.config import Options
from rvdd_tpu.models import build_network
from rvdd_tpu.models.factory import init_network
from rvdd_tpu.training.loop import _val_step


@pytest.mark.parametrize("preset", ["default", "fast"])
def test_val_step_online_flow_presets(preset):
    """--online_flow validation computes TV-L1 inside the jitted step;
    both solver presets must produce a finite PSNR on a tiny clip (the
    fast preset is the bench.py --fast_flow configuration whose PSNR
    delta BENCH.md records)."""
    opt = Options(
        netDenoiser="convunet-mode=fixedfeatures-filters=8-depth=2",
        online_flow=True, flow_preset=preset, patch_depth=5,
    )
    opt.isTrain = False
    opt = opt.finalize() if hasattr(opt, "finalize") else opt
    cfg = opt.engine_config()
    net = build_network(opt.netDenoiser, cfg.network_input_nc, 3, False)
    params = init_network(
        net, __import__("jax").random.PRNGKey(0),
        (1, 32, 32, cfg.network_input_nc),
    )
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(-1, 1, (1, 2, 16, 16, 4)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    den, state, losses = _val_step(
        params, None, frames, None, gt, None,
        cfg=cfg, net=net, online_flow=True, flow_preset=preset,
    )
    assert den.shape == (1, 32, 32, 3)
    assert np.isfinite(float(losses["PSNR"]))
