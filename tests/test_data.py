"""Data layer tests: io round-trips, dataset semantics, flow cache."""

import numpy as np
import pytest

from rvdd_tpu.data.io import imread, imwrite, load_image, list_video_files
from rvdd_tpu.data.flow_cache import FlowCache, flow_filename
from rvdd_tpu.data.datasets import TrainWindowDataset, InferenceDataset


@pytest.fixture(scope="module")
def tiny_root(tmp_path_factory):
    """Synthesize a miniature raw dataset on disk (2 seqs x 6 frames)."""
    root = tmp_path_factory.mktemp("tiny")
    rng = np.random.default_rng(0)
    h, w = 24, 32
    for seq in range(2):
        base = rng.uniform(300, 3000, (h + 8, w + 8, 4)).astype(np.float32)
        for t in range(6):
            raw = base[t : t + h, t : t + w]
            imwrite(str(root / "noisy" / f"{seq:03d}" / f"{t:08d}.tiff"), raw)
            imwrite(str(root / "gt" / f"{seq:03d}" / f"{t:08d}.tiff"), raw)
            gt_rgb = rng.uniform(0, 4095, (2 * h, 2 * w, 3)).astype(np.float32)
            imwrite(str(root / "gt_linear_RGB" / f"{seq:03d}" / f"{t:08d}.tiff"), gt_rgb)
    return str(root)


class TestIO:
    def test_float_tiff_roundtrip(self, tmp_path, rng):
        x = rng.standard_normal((6, 8, 4)).astype(np.float32)
        p = str(tmp_path / "x.tiff")
        imwrite(p, x)
        np.testing.assert_array_equal(imread(p), x)

    def test_load_image_normalization(self, tmp_path):
        x = np.full((4, 4, 1), 4095.0, np.float32)
        p = str(tmp_path / "y.tiff")
        imwrite(p, x)
        np.testing.assert_allclose(load_image(p, 12), 1.0)

    def test_list_video_files_sorted(self, tiny_root):
        files = list_video_files(f"{tiny_root}/noisy/000")
        assert len(files) == 6
        assert files == sorted(files)


class TestFlowCache:
    def test_window_pairs(self):
        fc = FlowCache("/tmp/x", "noisy", persist=False)
        # patch_depth=2, future=1, window at t0=3: past 3->4, future 5->4
        assert fc.window_pairs(3, 2, 1) == [(3, 4), (5, 4)]
        assert fc.window_pairs(0, 3, 0) == [(0, 2), (1, 2)]

    def test_compute_and_persist(self, tiny_root):
        fc = FlowCache(tiny_root, "noisy", persist=True)
        paths = list_video_files(f"{tiny_root}/noisy/000")
        flows = fc.get_flows("000", paths, [(0, 1)])
        assert flows.shape == (1, 24, 32, 2)
        assert np.isfinite(flows).all()
        # second call reads from disk
        import os

        f = flow_filename(fc.seq_dir("000"), "00000000", "00000001")
        assert os.path.isfile(f)
        flows2 = fc.get_flows("000", paths, [(0, 1)])
        np.testing.assert_allclose(flows, flows2, atol=1e-6)


class TestDatasets:
    def test_train_dataset(self, tiny_root):
        ds = TrainWindowDataset(
            tiny_root,
            "gt_linear_RGB",
            "noisy",
            patch_width=16,
            patch_stride=4,
            patch_depth=3,
            model_patch_depth=2,
            future_patch_depth=0,
            frames2load=5,
            flow_cache=FlowCache(tiny_root, "noisy", persist=True),
            seed=0,
        )
        assert len(ds) > 0
        item = ds[0]
        assert item["n"].shape == (3, 16, 16, 4)
        assert item["gt"].shape == (3, 32, 32, 3)
        assert item["flow"].shape == (2, 1, 16, 16, 2)
        assert item["n"].min() >= -1.001 and item["n"].max() <= 1.001
        batch = next(iter(ds.batches(2)))
        assert batch["n"].shape == (2, 3, 16, 16, 4)

    def test_batches_abandoned_early_stops_producer(self, tiny_root):
        """Dropping the batches() iterator mid-epoch must terminate the
        prefetch thread (a plain bounded-queue put would leave it blocked
        forever, assembling batches concurrently with whatever runs next)."""
        import threading

        ds = TrainWindowDataset(
            tiny_root, "gt_linear_RGB", "noisy",
            patch_width=16, patch_stride=4, patch_depth=3,
            model_patch_depth=2, frames2load=5, no_warp=True, seed=0,
        )
        before = threading.active_count()
        it = ds.batches(1, prefetch=1)
        next(it)
        it.close()  # triggers the generator's finally-cleanup
        deadline = 50  # 5s of 0.1s polls
        while threading.active_count() > before and deadline:
            threading.Event().wait(0.1)
            deadline -= 1
        assert threading.active_count() <= before

    def test_train_dataset_reshuffles(self, tiny_root):
        ds = TrainWindowDataset(
            tiny_root, "gt_linear_RGB", "noisy",
            patch_width=16, patch_stride=4, patch_depth=3,
            model_patch_depth=2, frames2load=5, no_warp=True, seed=0,
        )
        order1 = list(ds.indices)
        ds.prepare_epoch()
        assert list(ds.indices) != order1 or len(order1) <= 1

    def test_inference_dataset(self, tiny_root):
        ds = InferenceDataset(
            tiny_root, "gt_linear_RGB", "noisy",
            patch_depth=2, future_patch_depth=0,
            flow_cache=FlowCache(tiny_root, "noisy", persist=True),
        )
        # 2 seqs x (6 - 2 + 1) windows
        assert len(ds) == 10
        first = ds[0]
        assert first["FirstOfVideo"]
        assert not ds[1]["FirstOfVideo"]
        assert first["n"].shape == (2, 24, 32, 4)
        assert first["flow"].shape == (1, 24, 32, 2)

    def test_inference_crop(self, tiny_root):
        ds = InferenceDataset(
            tiny_root, "gt_linear_RGB", "noisy",
            patch_depth=2, no_warp=True, crop_data="16,24",
        )
        item = ds[0]
        assert item["n"].shape == (2, 16, 24, 4)
        assert item["gt"].shape == (2, 32, 48, 3)
