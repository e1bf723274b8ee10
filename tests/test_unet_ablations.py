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


def test_batch_norm_matches_torch_and_trains():
    """normalization=batch: per-channel (N,H,W) batch stats + learnable
    affine (the BatchNorm2d corner the reference names in its docstring,
    networks/unet.py:297, but whose CLI path raises TypeError; we use batch
    stats in train and eval, track_running_stats=False semantics)."""
    torch = pytest.importorskip("torch")

    net = build_network(
        "convunet-mode=fixedfeatures-normalization=batch-filters=8-depth=2", 6, 3, False
    )
    params = init_network(net, jax.random.PRNGKey(0), (2, 16, 16, 6))
    leaves = {"/".join(str(k) for k in p): v
              for p, v in jax.tree_util.tree_leaves_with_path(params)}
    assert any("bn_scale" in k for k in leaves), sorted(leaves)[:5]

    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 16, 16, 6)),
                    jnp.float32)
    y, _ = jax.jit(lambda p, x: net.apply({"params": p}, x, None))(params, x)
    assert y.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(y)).all()

    # gradient flows through the affine params (the ablation is trainable)
    def loss(p):
        out, _ = net.apply({"params": p}, x, None)
        return jnp.mean(out**2)

    g = jax.jit(jax.grad(loss))(params)
    gmax = max(
        float(jnp.max(jnp.abs(v)))
        for p, v in jax.tree_util.tree_leaves_with_path(g)
        if "bn_scale" in "/".join(str(k) for k in p)
    )
    assert gmax > 0

    # numerics match torch BatchNorm2d (training mode, affine identity)
    import flax.linen as fnn

    from rvdd_tpu.models.unet import _normalize

    class _Host(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            return _normalize(x, "batch", self, "t")

    xb = np.random.default_rng(3).standard_normal((4, 5, 6, 3)).astype(np.float32)
    host = _Host()
    p = host.init(jax.random.PRNGKey(0), jnp.asarray(xb))
    got = np.asarray(host.apply(p, jnp.asarray(xb)))
    bn = torch.nn.BatchNorm2d(3)
    bn.train()
    want = (
        bn(torch.from_numpy(np.transpose(xb, (0, 3, 1, 2))))
        .detach().numpy().transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_reinit_covers_transposed_conv_leaves():
    """--init_type reinit reaches the transposedconv upsample params too:
    reinit_convs suffix-matches 'kernel'/'bias', so up_transposed{i}_kernel
    follows the same policy as every other conv (reference applies
    init_weights to all Conv* modules: networks/__init__.py init_net)."""
    from rvdd_tpu.models import build_network
    from rvdd_tpu.models.factory import init_network

    net = build_network(
        "convunet-mode=fixedfeatures-upsampling_mode=transposedconv4-filters=8-depth=2",
        6, 3, False,
    )
    params = init_network(net, jax.random.PRNGKey(0), (1, 8, 8, 6),
                          init_type="normal")
    flat = {
        "/".join(str(getattr(p, "key", p)) for p in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    tks = [k for k in flat if "up_transposed" in k and k.endswith("kernel")]
    tbs = [k for k in flat if "up_transposed" in k and k.endswith("bias")]
    assert tks and tbs, sorted(flat)
    for k in tks:
        # the 'normal' policy draws N(0, 0.02); lecun_normal on a (4,4,8,8)
        # kernel would have std ~ 1/sqrt(128) ~ 0.088 — distinguishable
        std = flat[k].std()
        assert 0.01 < std < 0.03, (k, std)
    for k in tbs:
        assert np.all(flat[k] == 0), k
