"""Round-2 additions: ranger/lookahead, val-step jit caching, pad-to-bucket
validation, and whole-clip scan validation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rvdd_tpu.config import Options
from rvdd_tpu.data.io import imwrite
from rvdd_tpu.models import build_network
from rvdd_tpu.models.factory import init_network
from rvdd_tpu.training.train_state import (
    create_train_state,
    lookahead,
    set_learning_rate,
)


def test_ranger_is_radam_plus_lookahead():
    """Lookahead: fast weights walk with the inner optimizer, and every
    sync_period-th step they reset onto the slow-weight interpolation."""
    import optax

    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.full((4,), 0.1)}

    sgd = optax.sgd(learning_rate=1.0)
    tx = lookahead(sgd, sync_period=2, slow_step=0.5)
    state = tx.init(params)
    p = params
    history = []
    for _ in range(4):
        updates, state = tx.update(grads, state, p)
        p = optax.apply_updates(p, updates)
        history.append(float(p["w"][0]))

    # step1: fast = 1 - 0.1 = 0.9 (no sync)
    # step2: fast = 0.8, sync -> slow = 1 + .5*(0.8-1) = 0.9, fast = 0.9
    # step3: fast = 0.8 (no sync)
    # step4: fast = 0.7, sync -> slow = 0.9 + .5*(0.7-0.9) = 0.8
    np.testing.assert_allclose(history, [0.9, 0.9, 0.8, 0.8], atol=1e-6)


def test_ranger_trains_and_lr_settable():
    params = {"w": jnp.ones((3, 3))}
    state, tx = create_train_state(params, optimizer="ranger", beta1=0.95)
    state = set_learning_rate(state, 1e-3)
    grads = {"w": jnp.ones((3, 3))}
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    import optax

    p2 = optax.apply_updates(state.params, updates)
    assert np.all(np.isfinite(np.asarray(p2["w"])))


@pytest.fixture(scope="module")
def val_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("val_tiny")
    rng = np.random.default_rng(1)
    h, w = 20, 28
    base = rng.uniform(300, 3000, (h + 8, w + 8, 4)).astype(np.float32)
    for t in range(4):
        raw = base[t : t + h, t : t + w]
        imwrite(str(root / "noisy" / "000" / f"{t:08d}.tiff"), raw)
        gt = rng.uniform(0, 4095, (2 * h, 2 * w, 3)).astype(np.float32)
        imwrite(str(root / "gt_linear_RGB" / "000" / f"{t:08d}.tiff"), gt)
    return str(root)


def _val_opt(val_root, **over):
    kw = dict(
        val_dataroot=val_root,
        nFolder="noisy",
        gt_linear_RGB_Folder="gt_linear_RGB",
        netDenoiser="convunet-mode=fixedfeatures",
        model_patch_depth=2,
        patch_depth=3,  # recurrent (2 unrollings) so state carries
        no_warp=True,
        val_videos="000",
        warp_impl="xla",
    )
    kw.update(over)
    return Options(**kw).finalize()


def _build(opt):
    cfg = opt.engine_config()
    net = build_network(opt.netDenoiser, cfg.network_input_nc, opt.output_nc)
    params = init_network(net, jax.random.PRNGKey(0), (1, 32, 32, cfg.network_input_nc), None)
    return cfg, net, params


@pytest.mark.slow
def test_validation_jit_cache_survives_calls(val_root):
    """Second compute_validation call must add zero new jit entries."""
    from rvdd_tpu.training import loop as L
    from rvdd_tpu.training.loop import build_validation, compute_validation

    opt = _val_opt(val_root)
    cfg, net, params = _build(opt)
    ds = build_validation(opt)
    r1 = compute_validation(opt, net, params, ds, save_visuals=False)
    n_after_first = L._val_step._cache_size()
    r2 = compute_validation(opt, net, params, ds, save_visuals=False)
    assert L._val_step._cache_size() == n_after_first
    assert r1.keys() == r2.keys()
    np.testing.assert_allclose(r1["Denoiser_valLoss"], r2["Denoiser_valLoss"], rtol=1e-6)


@pytest.mark.slow
def test_val_pad_multiple_buckets_shapes(val_root):
    """Padded validation runs, and frame sizes in the same bucket share one
    jit specialization."""
    from rvdd_tpu.training import loop as L
    from rvdd_tpu.training.loop import build_validation, compute_validation

    opt = _val_opt(val_root, val_pad_multiple=32)
    cfg, net, params = _build(opt)
    before = L._val_step._cache_size()
    ds = build_validation(opt)  # frames are 20x28 -> padded to 32x32
    r = compute_validation(opt, net, params, ds, save_visuals=False)
    assert np.isfinite(r["Denoiser_valLoss"])
    grew = L._val_step._cache_size() - before

    # a second run at a different native size inside the same bucket
    # (crop to 18x26 -> still pads to 32x32) adds no new entries
    opt2 = _val_opt(val_root, val_pad_multiple=32, crop_data="18,26")
    ds2 = build_validation(opt2)
    compute_validation(opt2, net, params, ds2, save_visuals=False)
    assert L._val_step._cache_size() - before == grew


@pytest.mark.slow
def test_scan_validation_close_to_stepwise(val_root):
    """--val_scan scores the same frames; values differ only through the
    denoised-prev start (small for random nets on random data)."""
    from rvdd_tpu.training.loop import (
        build_validation,
        compute_validation,
        compute_validation_scan,
    )

    opt = _val_opt(val_root)
    cfg, net, params = _build(opt)
    ds = build_validation(opt)
    step = compute_validation(opt, net, params, ds, save_visuals=False)
    scan = compute_validation_scan(opt, net, params, ds, save_visuals=False)
    assert step.keys() == scan.keys()
    # same protocol scale: both average over the same number of frames
    assert abs(step["PSNR_valLoss"] - scan["PSNR_valLoss"]) < 3.0
