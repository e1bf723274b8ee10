"""Parity tests for the core ops against reference-executed goldens."""

import numpy as np
import jax.numpy as jnp
import pytest

from rvdd_tpu.ops import (
    pack_cfa,
    unpack_cfa,
    remosaic,
    hamilton_adams,
    warp,
    flow_upsample_2x,
    upsample2x_bilinear,
    maxpool2x2,
    avgpool2x2,
    psnr,
    to_net,
    from_net,
)
from rvdd_tpu.ops.resize import upsample2x_nearest


def nchw_to_nhwc(x):
    return np.moveaxis(x, 1, -1)


def nhwc_to_nchw(x):
    return np.moveaxis(x, -1, 1)


class TestBayer:
    def test_pack_unpack_roundtrip(self, rng):
        raw = rng.standard_normal((2, 8, 10, 4)).astype(np.float32)
        cfa = pack_cfa(jnp.asarray(raw))
        assert cfa.shape == (2, 16, 20)
        back = unpack_cfa(cfa)
        np.testing.assert_array_equal(np.asarray(back), raw)

    def test_pack_layout(self, rng):
        raw = rng.standard_normal((1, 2, 2, 4)).astype(np.float32)
        cfa = np.asarray(pack_cfa(jnp.asarray(raw)))[0]
        assert cfa[0, 0] == raw[0, 0, 0, 0]  # g
        assert cfa[0, 1] == raw[0, 0, 0, 1]  # b
        assert cfa[1, 0] == raw[0, 0, 0, 2]  # r
        assert cfa[1, 1] == raw[0, 0, 0, 3]  # g2

    def test_remosaic_golden(self, golden):
        g = golden("hamilton_adams")
        rgb = nchw_to_nhwc(g["rgb"])
        out = np.asarray(remosaic(jnp.asarray(rgb)))
        np.testing.assert_allclose(out, nchw_to_nhwc(g["remosaic"]), atol=1e-6)


class TestHamiltonAdams:
    def test_golden(self, golden):
        g = golden("hamilton_adams")
        raw = nchw_to_nhwc(g["raw"])
        out = np.asarray(hamilton_adams(jnp.asarray(raw)))
        np.testing.assert_allclose(out, nchw_to_nhwc(g["rgb"]), atol=2e-5)

    @pytest.mark.slow
    def test_multiframe(self, golden):
        g = golden("hamilton_adams_multiframe")
        raw = g["raw"]  # [1, 8, H, W] = two packed frames channel-stacked
        b, c8, h, w = raw.shape
        frames = nchw_to_nhwc(raw.reshape(b * 2, 4, h, w))
        out = np.asarray(hamilton_adams(jnp.asarray(frames)))
        ref = nchw_to_nhwc(g["rgb"].reshape(b * 2, 3, 2 * h, 2 * w))
        np.testing.assert_allclose(out, ref, atol=2e-5)

    @pytest.mark.slow
    def test_constant_image_interior(self):
        # borders differ because the masked chroma channels replicate a
        # masked (zero) sample — the reference does the same.
        raw = jnp.full((1, 8, 8, 4), 0.25, jnp.float32)
        out = np.asarray(hamilton_adams(raw))
        np.testing.assert_allclose(out[:, 2:-2, 2:-2, :], 0.25, atol=1e-6)


class TestWarp:
    @pytest.mark.parametrize("mode", ["bicubic", "bilinear", "nearest"])
    def test_golden(self, golden, mode):
        g = golden("warp")
        x = jnp.asarray(nchw_to_nhwc(g["x"]))
        flow = jnp.asarray(nchw_to_nhwc(g["flow"]))
        out, mask = warp(x, flow, mode)
        np.testing.assert_allclose(
            np.asarray(out), nchw_to_nhwc(g[f"warped_{mode}"]), atol=3e-5
        )
        np.testing.assert_allclose(
            np.asarray(mask)[..., 0], g[f"mask_{mode}"][:, 0], atol=0
        )

    def test_zero_flow_identity(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 9, 11, 2)).astype(np.float32))
        out, mask = warp(x, jnp.zeros((1, 9, 11, 2)), "bicubic")
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)
        assert np.all(np.asarray(mask) == 1.0)

    def test_flow_upsample(self, golden):
        g = golden("warp")
        flow = jnp.asarray(nchw_to_nhwc(g["flow"]))
        up = flow_upsample_2x(flow)
        # the lerp is evaluated W-axis-transposed; fp32 rounding differs
        np.testing.assert_allclose(
            np.asarray(up), nchw_to_nhwc(g["flow_up2"]), atol=1e-4
        )


class TestResize:
    def test_bilinear_align(self, golden):
        g = golden("resize")
        x = jnp.asarray(nchw_to_nhwc(g["x"]))
        np.testing.assert_allclose(
            np.asarray(upsample2x_bilinear(x, align_corners=True)),
            nchw_to_nhwc(g["up_ac"]),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(upsample2x_bilinear(x, align_corners=False)),
            nchw_to_nhwc(g["up_nac"]),
            atol=1e-5,
        )

    def test_nearest(self, golden):
        g = golden("resize")
        x = jnp.asarray(nchw_to_nhwc(g["x"]))
        np.testing.assert_allclose(
            np.asarray(upsample2x_nearest(x)), nchw_to_nhwc(g["up_nn"]), atol=0
        )

    def test_pools(self, golden):
        g = golden("resize")
        x = jnp.asarray(nchw_to_nhwc(g["x"]))
        np.testing.assert_allclose(
            np.asarray(maxpool2x2(x)), nchw_to_nhwc(g["maxpool"]), atol=0
        )
        np.testing.assert_allclose(
            np.asarray(avgpool2x2(x)), nchw_to_nhwc(g["avgpool"]), atol=1e-6
        )


class TestTransformsMetrics:
    def test_roundtrip(self, rng):
        x = rng.uniform(0, 1, (4, 4)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(from_net(to_net(x))), x, atol=1e-7)

    def test_psnr(self):
        x = jnp.zeros((8, 8))
        y = jnp.full((8, 8), 0.1)
        val = float(psnr(x, y, 2.0))
        np.testing.assert_allclose(val, 10 * np.log10(4.0 / 0.01), rtol=1e-5)


@pytest.mark.fast
def test_hamilton_adams_planar_bitexact():
    """Phase-resolved planar HA == mosaic-domain HA, bit for bit, including
    the full-res border-clamp parity flips."""
    from rvdd_tpu.ops.demosaic import hamilton_adams_planar

    rng = np.random.default_rng(7)
    for shape in [(4, 4, 4), (2, 5, 7, 4), (12, 20, 4)]:
        raw = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
        want = jnp.moveaxis(hamilton_adams(raw), -1, -2)
        got = hamilton_adams_planar(raw)
        assert got.shape == want.shape
        assert float(jnp.max(jnp.abs(got - want))) == 0.0
    # wl pad path
    raw = jnp.asarray(rng.uniform(-1, 1, (6, 10, 4)).astype(np.float32))
    got = hamilton_adams_planar(raw, wl=128)
    assert got.shape == (12, 3, 128)
    assert float(jnp.max(jnp.abs(got[..., 20:]))) == 0.0
