"""Native data-plane (native/librvdd_io.so): build, decode, pool batch.

The pool is the TPU-side equivalent of the reference's DataLoader worker
processes (reference: data/__init__.py:75-80); these tests build the
library with the repo Makefile and check bit-exact agreement with the
imageio path on the dataset formats the framework writes.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE_DIR = os.path.join(ROOT, "native")


@pytest.fixture(scope="module")
def native_lib():
    so = os.path.join(NATIVE_DIR, "librvdd_io.so")
    if not os.path.isfile(so):
        if shutil.which("make") is None or shutil.which("g++") is None:
            pytest.skip("no native toolchain")
        subprocess.run(["make", "-C", NATIVE_DIR], check=True, capture_output=True)
    # (re)load bindings now that the .so exists
    import importlib

    from rvdd_tpu.data import native

    importlib.reload(native)
    if not native.available():
        pytest.skip("librvdd_io.so built but not loadable")
    return native


@pytest.fixture()
def frames(tmp_path):
    from rvdd_tpu.data.io import imwrite

    rng = np.random.default_rng(0)
    paths, arrays = [], []
    for i in range(5):
        a = rng.uniform(0, 4095, (12, 17, 4)).astype(np.float32)
        p = str(tmp_path / f"{i:03d}.tiff")
        imwrite(p, a)
        paths.append(p)
        arrays.append(a)
    return paths, np.stack(arrays)


def test_single_decode_matches_imageio(native_lib, frames):
    paths, arrays = frames
    out = native_lib.read_image(paths[0])
    np.testing.assert_array_equal(out, arrays[0])
    # normalized decode
    out = native_lib.read_image(paths[0], scale=4095.0)
    np.testing.assert_allclose(out, arrays[0] / 4095.0, rtol=1e-6)


def test_uint16_decode(native_lib, tmp_path):
    from rvdd_tpu.data.io import imwrite, load_image

    a = (np.arange(9 * 8 * 3) % 4096).astype(np.uint16).reshape(9, 8, 3)
    p = str(tmp_path / "u16.tiff")
    imwrite(p, a)
    out = native_lib.read_image(p, scale=4095.0)
    np.testing.assert_allclose(out, load_image(p, 12), rtol=1e-6)


def test_pool_batch(native_lib, frames):
    paths, arrays = frames
    loader = native_lib.NativeLoader(workers=3)
    out = loader.read_batch(paths, arrays.shape[1:], scale=4095.0)
    np.testing.assert_allclose(out, arrays / 4095.0, rtol=1e-6)


def test_pool_reports_failures(native_lib, frames, tmp_path):
    paths, arrays = frames
    loader = native_lib.NativeLoader(workers=2)
    bad = paths[:2] + [str(tmp_path / "missing.tiff")]
    with pytest.raises(IOError):
        loader.read_batch(bad, arrays.shape[1:], scale=4095.0)


def test_load_image_stack_uses_pool(native_lib, frames):
    """The shared loader entry point agrees with per-file imageio reads."""
    from rvdd_tpu.data import io as dio

    paths, arrays = frames
    dio._native = None  # force re-probe now that the .so exists
    out = dio.load_image_stack(paths, bit_depth=12)
    assert dio._native  # pool engaged
    np.testing.assert_allclose(out, arrays / 4095.0, rtol=1e-6)
    dio._native = None
