"""Unrolling-weight schedule parity against the reference implementation."""

import numpy as np
import pytest

from rvdd_tpu.recurrent.schedules import unroll_weights, active_unrollings

TD = 4  # patch_depth 5 -> weight vector length patch_depth-1


@pytest.mark.parametrize(
    "focus,key",
    [
        ("all", "all"),
        ("ge_1", "ge1"),
        ("gradual04_from20", "gradual04from20"),
        ("graduni04_from20", "graduni04from20"),
    ],
)
def test_schedule_golden(golden, focus, key):
    g = golden("unroll_schedules")
    meta = g[f"{key}_meta"]
    ref = g[f"{key}_w"]
    for row, (epoch, it, length) in enumerate(meta):
        w = unroll_weights(focus, TD, int(epoch), int(it), int(length))
        padded = np.zeros(ref.shape[1], np.float32)
        padded[: len(w)] = w
        np.testing.assert_allclose(padded, ref[row], atol=1e-6, err_msg=f"{focus} e{epoch} i{it}")


def test_active_unrollings():
    assert active_unrollings("gradual04_from20", TD, 19) == 1
    assert active_unrollings("gradual04_from20", TD, 20) == TD
    assert active_unrollings("all", TD, 1) == TD


def test_weights_sum_to_one():
    for e in range(1, 101):
        w = unroll_weights("gradual04_from20", TD, e, 37, 100)
        np.testing.assert_allclose(w.sum(), 1.0, atol=1e-6)
