"""Fast-path ConvNeXtUNet forward (fused block chains) vs the flax XLA path
(interpret mode on CPU; fast-activation mode on both sides)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rvdd_tpu.models import build_network
from rvdd_tpu.models.factory import init_network
from rvdd_tpu.models.fast_convnext import (
    convnext_fast_forward,
    pack_fast_cnx,
    supports_fast_path_cnx,
)

pytestmark = pytest.mark.slow  # full-net interpret runs take minutes


@pytest.mark.parametrize("feat_rec,in_nc", [(True, 9), (False, 6)])
def test_fast_forward_parity(feat_rec, in_nc):
    h = w = 64
    arch = "newunet-mode=feat" if feat_rec else "newunet"
    net = build_network(arch, in_nc, 3, feat_rec, fast_act=True)
    assert supports_fast_path_cnx(net, h, w)
    params = init_network(net, jax.random.PRNGKey(0), (1, h, w, in_nc))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (1, h, w, in_nc)).astype(np.float32))
    feat = (
        jnp.asarray(rng.uniform(-1, 1, (1, h, w, 48)).astype(np.float32))
        if feat_rec
        else None
    )

    want_y, want_f = net.apply({"params": params}, x, feat)

    packed = pack_fast_cnx(params, feat_rec, in_nc)
    got_y, got_f = convnext_fast_forward(net, packed, x, feat, interpret=True)

    assert got_y.shape == want_y.shape
    scale = float(jnp.std(want_y)) + 1e-6
    err = float(jnp.max(jnp.abs(got_y - want_y))) / scale
    assert err < 0.08, f"normalized max err {err}"
    if feat_rec:
        fscale = float(jnp.std(want_f)) + 1e-6
        ferr = float(jnp.max(jnp.abs(got_f - want_f))) / fscale
        assert ferr < 0.08, f"feat normalized max err {ferr}"
