"""Ablation-surface options of ConvUNet: transposedconv<k> upsampling,
instance normalization, bottleneck dilation (reference: networks/unet.py
120-147, 350-351, 448-463)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rvdd_tpu.models import build_network
from rvdd_tpu.models.factory import init_network

@pytest.mark.parametrize(
    "k",
    [2, pytest.param(3, marks=pytest.mark.slow), pytest.param(4, marks=pytest.mark.slow)],
)
def test_transposedconv_matches_torch(k):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    ch = 8
    x = rng.standard_normal((1, 10, 12, ch)).astype(np.float32)
    w = (rng.standard_normal((k, k, ch, ch)) * 0.3).astype(np.float32)
    b = rng.standard_normal(ch).astype(np.float32)

    p = (k - 1) // 2
    tconv = torch.nn.ConvTranspose2d(ch, ch, k, stride=2, padding=p)
    with torch.no_grad():
        # torch weight layout [in, out, kh, kw]
        tconv.weight.copy_(torch.from_numpy(np.transpose(w, (2, 3, 0, 1))))
        tconv.bias.copy_(torch.from_numpy(b))
        want = tconv(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    want = np.transpose(want, (0, 2, 3, 1))

    y = jax.lax.conv_general_dilated(
        jnp.asarray(x),
        jnp.asarray(w)[::-1, ::-1],
        window_strides=(1, 1),
        padding=[(k - 1 - p, k - 1 - p)] * 2,
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(b)
    assert y.shape == want.shape
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-4)


@pytest.mark.parametrize(
    "arch",
    [
        # op-level torch-parity tests cover the pieces in the fast set;
        # the full-forward sweep is slow-suite
        pytest.param(
            "convunet-mode=fixedfeatures-normalization=instance",
            marks=pytest.mark.slow,
        ),
        pytest.param(
            "convunet-mode=fixedfeatures-upsampling_mode=transposedconv4",
            marks=pytest.mark.slow,
        ),
        pytest.param(
            "convunet-mode=fixedfeatures-upsampling_mode=transposedconv3",
            marks=pytest.mark.slow,
        ),
        pytest.param(
            "convunet-mode=fixedfeatures-bottleneck_dilation=true",
            marks=pytest.mark.slow,
        ),
    ],
)
def test_ablation_forward_shapes(arch):
    net = build_network(arch, 6, 3, False)
    params = init_network(net, jax.random.PRNGKey(0), (1, 32, 32, 6))
    y, _ = net.apply({"params": params}, jnp.zeros((1, 32, 32, 6)), None)
    assert y.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_instance_norm_matches_torch():
    torch = pytest.importorskip("torch")
    from rvdd_tpu.models.unet import _normalize

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 9, 7, 5)).astype(np.float32)
    want = (
        torch.nn.InstanceNorm2d(5)(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    got = np.asarray(_normalize(jnp.asarray(x), "instance"))
    np.testing.assert_allclose(got, want, atol=1e-5)
