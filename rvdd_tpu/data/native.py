"""ctypes bindings for the native data-plane (native/librvdd_io.so).

Replaces the reference's native IO layer (iio + DataLoader workers) with a
C++ TIFF codec and a pthread prefetch pool.  Falls back to pure Python
(imageio) transparently when the library is not built.

    loader = NativeLoader(workers=4)      # None if unavailable
    batch = loader.read_batch(paths, (h, w, c), scale=4095.0)
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "librvdd_io.so"),
    os.path.join(os.path.dirname(__file__), "librvdd_io.so"),
]


def _load_lib():
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.isfile(p):
            lib = ctypes.cdll.LoadLibrary(p)
            lib.rvdd_read_image.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_float,
            ]
            lib.rvdd_read_image.restype = ctypes.c_int
            lib.rvdd_pool_create.argtypes = [ctypes.c_int]
            lib.rvdd_pool_create.restype = ctypes.c_void_p
            lib.rvdd_pool_destroy.argtypes = [ctypes.c_void_p]
            lib.rvdd_pool_read_batch.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.c_float,
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.rvdd_pool_read_batch.restype = ctypes.c_int
            return lib
    return None


_lib = _load_lib()


def available() -> bool:
    return _lib is not None


def read_image(path: str, scale: float = 0.0) -> Optional[np.ndarray]:
    """Decode one TIFF to float32 HWC (None if unsupported/unavailable)."""
    if _lib is None:
        return None
    cap = 64 << 20  # 64M floats covers 4K x 4ch
    buf = np.empty(cap, np.float32)
    shape = (ctypes.c_int64 * 3)()
    rc = _lib.rvdd_read_image(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap,
        shape,
        ctypes.c_float(scale),
    )
    if rc != 0:
        return None
    h, w, c = shape[0], shape[1], shape[2]
    return buf[: h * w * c].reshape(h, w, c).copy()


class NativeLoader:
    """Threaded batch decoder; each frame lands in a dense output array."""

    def __init__(self, workers: int = 4):
        if _lib is None:
            raise RuntimeError("native loader not built (make -C native)")
        self._pool = _lib.rvdd_pool_create(workers)

    def __del__(self):
        if _lib is not None and getattr(self, "_pool", None):
            _lib.rvdd_pool_destroy(self._pool)
            self._pool = None

    def read_batch(
        self, paths: Sequence[str], frame_shape: Tuple[int, int, int], scale: float = 0.0
    ) -> np.ndarray:
        """Decode len(paths) same-shape frames -> [N, h, w, c] float32."""
        n = len(paths)
        h, w, c = frame_shape
        out = np.empty((n, h, w, c), np.float32)
        statuses = (ctypes.c_int * n)()
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        failures = _lib.rvdd_pool_read_batch(
            self._pool,
            arr,
            n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            h * w * c,
            ctypes.c_float(scale),
            statuses,
        )
        if failures:
            bad = [paths[i] for i in range(n) if statuses[i] != 1]
            raise IOError(f"native loader failed on {bad[:3]} (+{len(bad)-3 if len(bad)>3 else 0})")
        return out
