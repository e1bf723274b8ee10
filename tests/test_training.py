"""Training-loop smoke tests on CPU (tiny synthetic data, no warping)."""

import json
import os

import numpy as np
import pytest

from rvdd_tpu.config import Options
from rvdd_tpu.data.io import imwrite
from rvdd_tpu.training.loop import train
from rvdd_tpu.training.train_state import lr_for_epoch


@pytest.fixture(scope="module")
def tiny_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_tiny")
    rng = np.random.default_rng(0)
    h, w = 24, 32
    for split, seqs in [("train", 1), ("val", 1)]:
        for seq in range(seqs):
            base = rng.uniform(300, 3000, (h + 8, w + 8, 4)).astype(np.float32)
            for t in range(5):
                raw = base[t : t + h, t : t + w]
                imwrite(str(root / split / "noisy" / f"{seq:03d}" / f"{t:08d}.tiff"), raw)
                gt_rgb = rng.uniform(0, 4095, (2 * h, 2 * w, 3)).astype(np.float32)
                imwrite(
                    str(root / split / "gt_linear_RGB" / f"{seq:03d}" / f"{t:08d}.tiff"),
                    gt_rgb,
                )
    return str(root)


@pytest.mark.slow
def test_train_epoch_and_autoresume(tiny_root, tmp_path):
    opt = Options(
        checkpoints_dir=str(tmp_path / "ckpt"),
        dataroot=f"{tiny_root}/train",
        val_dataroot=f"{tiny_root}/val",
        nFolder="noisy",
        gtFolder="gt",
        gt_linear_RGB_Folder="gt_linear_RGB",
        netDenoiser="convunet-mode=fixedfeatures",
        no_warp=True,
        patch_width=16,
        patch_stride=12,
        patch_depth=3,
        frames2load=4,
        batch_size=2,
        niter=1,
        niter_decay=0,
        unroll_focus="all",
        no_val=False,
        val_videos="000",
        print_freq=2,
        suffix="smoke",
    ).finalize()
    train(opt)
    save_dir = opt.save_dir
    assert os.path.isfile(os.path.join(save_dir, "1_net_Denoise.msgpack"))
    assert os.path.isfile(os.path.join(save_dir, "1_optim_Denoise.msgpack"))
    assert os.path.isfile(os.path.join(save_dir, "latest_val_net_Denoise.msgpack"))
    status = json.load(open(os.path.join(save_dir, "status.json")))
    assert status["epoch"] == 1

    # autoresume continues from epoch 2
    opt.autoresume = True
    opt.niter = 2
    train(opt)
    status = json.load(open(os.path.join(save_dir, "status.json")))
    assert status["epoch"] == 2


def test_lr_schedule_matches_reference_shape():
    # flat for niter epochs, then linear decay to (almost) zero
    lrs = [lr_for_epoch(e, 1.0, "linear", 70, 30) for e in range(1, 101)]
    assert all(abs(v - 1.0) < 1e-9 for v in lrs[:70])
    assert lrs[70] < 1.0
    np.testing.assert_allclose(lrs[99], 1.0 / 31.0, rtol=1e-6)


def test_plateau_schedule_matches_reference_quirk():
    """The reference steps ReduceLROnPlateau with the EPOCH NUMBER as the
    metric (base_model.py:128-133), making it a deterministic x0.2-every-6
    decay.  Pin ours against torch driven exactly that way."""
    torch = pytest.importorskip("torch")

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.2, threshold=0.01, patience=5
    )
    want = []
    for epoch in range(1, 31):
        want.append(opt.param_groups[0]["lr"])  # LR in effect during epoch
        sched.step(epoch)  # reference passes the epoch as the metric
    got = [lr_for_epoch(e, 1.0, "plateau", 70, 30) for e in range(1, 31)]
    np.testing.assert_allclose(got, want, rtol=1e-9)
