"""Per-chain hybrid fused-precision presets ('hybrid:<chains>').

The hybrid preset runs the named chains with the `mixed` numerics (fp32
bands, 3-pass bf16_3x dots) and every other chain with the `fast`
numerics (bf16 bands, 1-pass dots) — the variant-tuned middle ground
between the two (models/fast_unet.py:get_fused_precision).  Interpret
mode on CPU: exact kernel semantics incl. band-storage rounding.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rvdd_tpu.models import build_network
from rvdd_tpu.models.factory import init_network
from rvdd_tpu.models.fast_unet import get_fused_precision
from rvdd_tpu.recurrent.engine import EngineConfig, inference_step

pytestmark = pytest.mark.slow


def test_get_fused_precision_hybrid_parsing():
    p = get_fused_precision("hybrid:A+dec2")
    assert p["band_dtype"] == {"A": jnp.float32, "dec2": jnp.float32}
    assert p["mxu_precision"] == {"A": "high", "dec2": "high"}
    # dec2 inside the hybrid set: the 3-pass dots subsume the selective
    # weight split, so no weight_dtype override remains
    assert p["weight_dtype"] is None
    # dec2 outside the set keeps the fast preset's selective split
    p2 = get_fused_precision("hybrid:B+C")
    assert p2["weight_dtype"] == {"dec2": (None, None, None, "split", "split")}
    with pytest.raises(ValueError):
        get_fused_precision("hybrid:nochain")


@pytest.mark.usefixtures("pallas_interpret")
def test_hybrid_step_between_fast_and_mixed():
    """hybrid:A+dec2 on the feat-future engine: runs end-to-end through
    the planar state path and lands between `fast`'s 0.2 envelope and
    `mixed`'s 2e-3 — the fp32 full-res chains must visibly tighten the
    error vs `fast` on the same inputs."""
    h = w = 32
    fd = 1
    in_nc = (2 + fd) * 3
    net = build_network("convunet-mode=fixedfeatures+feat", in_nc, 3, True)
    params = init_network(net, jax.random.PRNGKey(0), (1, h, w, in_nc))
    rng = np.random.default_rng(7)
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
    want, _ = inference_step(cfg_ref, net, params, None, frames, flows, nil)
    scale = float(jnp.std(want)) + 1e-6

    errs = {}
    for preset in ("fast", "hybrid:A+dec2"):
        cfg = EngineConfig(
            model_patch_depth=2, patch_depth=2 + fd, future_patch_depth=fd,
            feature_rec=True, net_impl="fused", fused_precision=preset,
        )
        got, _ = inference_step(cfg, net, params, None, frames, flows, nil)
        errs[preset] = float(jnp.max(jnp.abs(got - want))) / scale

    assert errs["hybrid:A+dec2"] < 0.05, errs
    # strictly tighter than the all-bf16 fast path on the same inputs
    assert errs["hybrid:A+dec2"] < errs["fast"], errs
