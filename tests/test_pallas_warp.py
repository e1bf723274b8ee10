"""Pallas warp kernel parity (interpret mode on CPU; exact-kernel runs are
covered by the TPU benchmark drives)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _interpret(pallas_interpret):
    yield


def test_parity_vs_xla():
    from rvdd_tpu.ops.warp import warp
    from rvdd_tpu.ops.pallas.warp_pallas import warp_bicubic_pallas

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 24, 128, 3)).astype(np.float32))
    fl = jnp.asarray((rng.standard_normal((1, 24, 128, 2)) * 3).astype(np.float32))
    ref, mref = warp(x, fl, "bicubic")
    out, m = warp_bicubic_pallas(x, fl, max_disp=16, tile_h=8, tile_w=128, group=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m), np.asarray(mref), atol=0)


def test_clamps_large_displacements():
    """Displacements beyond max_disp are clamped, and those pixels are
    flagged invalid by the mask anyway when they leave the frame."""
    from rvdd_tpu.ops.pallas.warp_pallas import warp_bicubic_pallas

    x = jnp.ones((1, 16, 128, 1), jnp.float32)
    fl = jnp.full((1, 16, 128, 2), 500.0, jnp.float32)
    out, mask = warp_bicubic_pallas(x, fl, max_disp=8, tile_h=8, tile_w=128, group=1)
    assert np.all(np.asarray(mask) == 0.0)
    assert np.isfinite(np.asarray(out)).all()
