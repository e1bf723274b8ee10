"""Fast-path ConvUNet forward (fused Pallas chains) vs the flax XLA path
(interpret mode on CPU; bf16 tolerance)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rvdd_tpu.models import build_network
from rvdd_tpu.models.factory import init_network
from rvdd_tpu.models.fast_unet import (
    convunet_fast_forward,
    pack_fast_params,
    supports_fast_path,
)

# both variants slow: the fast-suite gate for the fused path is
# tests/test_fused_minigolden.py (real released weights, tighter envelope)
@pytest.mark.slow
@pytest.mark.parametrize("feat_rec", [False, True])
def test_fast_forward_parity(feat_rec):
    h = w = 32
    in_nc = 6
    arch = "convunet-mode=" + ("fixedfeatures+feat" if feat_rec else "fixedfeatures")
    net = build_network(arch, in_nc, 3, feat_rec)
    assert supports_fast_path(net, h, w)
    params = init_network(net, jax.random.PRNGKey(0), (1, h, w, in_nc))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (1, h, w, in_nc)).astype(np.float32))
    feat = (
        jnp.asarray(rng.uniform(-1, 1, (1, h, w, 48)).astype(np.float32))
        if feat_rec
        else None
    )

    want_y, want_f = net.apply({"params": params}, x, feat)

    packed = pack_fast_params(params, feat_rec, in_nc)
    got_y, got_f = convunet_fast_forward(net, packed, x, feat, interpret=True)

    assert got_y.shape == want_y.shape
    scale = float(jnp.std(want_y)) + 1e-6
    err = float(jnp.max(jnp.abs(got_y - want_y))) / scale
    assert err < 0.15, f"normalized max err {err}"
    if feat_rec:
        fscale = float(jnp.std(want_f)) + 1e-6
        ferr = float(jnp.max(jnp.abs(got_f - want_f))) / fscale
        assert ferr < 0.15, f"feat normalized max err {ferr}"


def test_supports_fast_path_gates():
    net = build_network("convunet-mode=fixedfeatures-upsampling_mode=nearest", 6, 3, False)
    assert not supports_fast_path(net, 32, 32)
    net = build_network("convunet-mode=fixedfeatures", 6, 3, False)
    assert not supports_fast_path(net, 30, 32)  # h % 8 != 0
