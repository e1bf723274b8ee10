"""Image I/O: float tiff / png read-write and video-folder listing.

Replaces the reference's vendored iio C library (reference:
3rdparty/tvl1flow/iio.c, used from Python via the implicit `iio` module)
with imageio-backed reads; the on-disk formats are interchangeable with
the reference datasets (float32 multi-channel TIFF, uint16 TIFF, PNG).
"""

from __future__ import annotations

import fnmatch
import os
from typing import List

import numpy as np

import imageio.v2 as iio


def imread(path: str) -> np.ndarray:
    img = np.asarray(iio.imread(path))
    if img.ndim == 2:
        img = img[..., None]
    return img


def imwrite(path: str, arr: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    iio.imwrite(path, np.ascontiguousarray(arr))


def load_image(path: str, bit_depth: int = 12) -> np.ndarray:
    """Read and normalize to [0, 1] by 2**bits - 1 (reference:
    library.py:117-129)."""
    return imread(path).astype(np.float32) / (2.0 ** float(bit_depth) - 1.0)


_native = None


def _native_loader(workers: int = 4):
    """Lazily constructed native decode pool (native/librvdd_io.so), or
    None when the library is not built."""
    global _native
    if _native is None:
        try:
            from rvdd_tpu.data import native

            _native = native.NativeLoader(workers) if native.available() else False
        except Exception:
            _native = False
    return _native or None


def load_image_stack(
    paths: List[str], bit_depth: int = 12, workers: int = 4
) -> np.ndarray:
    """Decode a same-shape frame stack -> [N, H, W, C] float32 in [0, 1].

    Uses the native pthread decode pool when built (the TPU-side
    equivalent of the reference's DataLoader worker processes; reference:
    data/__init__.py:75-80) and falls back to per-file imageio reads.
    """
    first = load_image(paths[0], bit_depth)
    if len(paths) == 1:
        return first[None]
    loader = _native_loader(workers) if first.ndim == 3 else None
    if loader is not None:
        try:
            rest = loader.read_batch(
                paths[1:], first.shape, scale=2.0 ** float(bit_depth) - 1.0
            )
            return np.concatenate([first[None], rest])
        except Exception:
            pass  # unsupported TIFF flavor -> python path
    return np.stack([first] + [load_image(p, bit_depth) for p in paths[1:]])


_EXTS = ["*.tiff", "*.tif", "*.png", "*.jpg", "*.jpeg", "*.raw"]


def list_video_files(d: str) -> List[str]:
    """Sorted frame paths in a sequence directory, first matching extension
    wins (reference: library.py:102-115)."""
    files = os.listdir(d)
    for pat in _EXTS:
        hits = sorted(fnmatch.filter(files, pat))
        if hits:
            return [os.path.join(d, p) for p in hits]
    raise FileNotFoundError(f"no frames in {d}")


def list_sequence_dirs(root: str, videos: str | None = None) -> List[str]:
    """Sorted sequence subdirectories, optionally filtered by a comma list."""
    names = None if videos is None else set(videos.split(","))
    out = []
    for e in os.scandir(root):
        if e.name.startswith(".") or not e.is_dir():
            continue
        if names is None or e.name in names:
            out.append(e.path)
    return sorted(out)
