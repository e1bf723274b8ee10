"""TV-L1 flow parity against the reference C implementation goldens."""

import numpy as np
import jax.numpy as jnp
import pytest

from rvdd_tpu.ops.tvl1 import tvl1_flow, to_gray, gaussian_smooth, TVL1Params


@pytest.mark.parametrize(
    "case",
    ["tiny", pytest.param("small", marks=pytest.mark.slow)],
)
def test_flow_matches_c_golden(golden, case):
    g = golden("tvl1")
    i0 = g[f"{case}_i0"]
    i1 = g[f"{case}_i1"]
    ref = g[f"{case}_flow"]
    out = np.asarray(tvl1_flow(jnp.asarray(i0), jnp.asarray(i1)))
    # allow a small absolute deviation: float32 vs double smoothing, and the
    # duality iteration early-exit makes tiny drifts possible.
    err = np.abs(out - ref)
    assert np.median(err) < 0.02, f"median abs err {np.median(err)}"
    assert np.mean(err) < 0.05, f"mean abs err {np.mean(err)}"
    # endpoint accuracy: same flow field to within a tenth of a pixel for
    # the vast majority of pixels
    assert np.quantile(err, 0.95) < 0.12, f"p95 err {np.quantile(err, 0.95)}"


def test_to_gray_conventions(rng):
    rgb = rng.uniform(0, 1, (6, 7, 3)).astype(np.float32)
    g = np.asarray(to_gray(jnp.asarray(rgb)))
    np.testing.assert_allclose(g, rgb @ np.array([0.2125, 0.7154, 0.0721]), atol=1e-6)
    raw = rng.uniform(0, 1, (6, 7, 4)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(to_gray(jnp.asarray(raw))), raw.mean(-1), atol=1e-6)


@pytest.mark.slow
def test_odd_sizes_run():
    rng = np.random.default_rng(7)
    i0 = rng.uniform(0, 255, (37, 51)).astype(np.float32)
    i1 = np.roll(i0, 2, axis=1)
    out = np.asarray(tvl1_flow(jnp.asarray(i0), jnp.asarray(i1)))
    assert out.shape == (37, 51, 2)
    assert np.isfinite(out).all()


@pytest.mark.slow
def test_zero_motion_flow_is_small():
    rng = np.random.default_rng(8)
    from scipy.ndimage import gaussian_filter

    img = gaussian_filter(rng.standard_normal((40, 48)), 2.0).astype(np.float32) * 50 + 100
    out = np.asarray(tvl1_flow(jnp.asarray(img), jnp.asarray(img)))
    assert np.abs(out).max() < 0.05
