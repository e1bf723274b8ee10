"""Flow cache: on-device TV-L1 with a reference-compatible disk layout.

The reference lazily materializes a TV-L1 flow cache on first run, one
``<from>_<to>.tif`` per frame pair under
``dataroot/flow/<nFolder>/tvl1/noisyinputs/<seq>/`` (reference:
data/base_dataset.py:134-249, library.py:140-141) — an offline CPU job the
README warns can take "minutes to hours".  Here the flow solver is a jitted
on-device function, so the cache is an *optimization*, not a requirement:
missing flows are computed in batches on the accelerator and optionally
persisted in the same layout (so caches are interchangeable with the
reference's).
"""

from __future__ import annotations

import os
from os.path import basename, isfile, join, splitext
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from rvdd_tpu.data.io import imread, imwrite
from rvdd_tpu.ops.tvl1 import to_gray, tvl1_flow, TVL1Params


def flow_filename(flow_dir: str, from_code: str, to_code: str) -> str:
    return join(flow_dir, f"{from_code}_{to_code}.tif")


def frame_code(path: str) -> str:
    return splitext(basename(path))[0]


class FlowCache:
    """Computes/caches flows between frames of noisy sequences."""

    def __init__(
        self,
        dataroot: str,
        n_folder: str,
        flow_folder: str = "flow",
        method: str = "tvl1",
        persist: bool = True,
        params: TVL1Params = TVL1Params(),
    ):
        self.base = join(dataroot, flow_folder, n_folder, method, "noisyinputs")
        self.persist = persist
        self.params = params
        self._batched = None
        self._batched_shape = None

    def seq_dir(self, seq_name: str) -> str:
        return join(self.base, seq_name)

    def _flow_batch(self, grays0: np.ndarray, grays1: np.ndarray) -> np.ndarray:
        """Compute flows for N pairs with the jitted single-pair solver.

        One compile per image shape; per-pair dispatch keeps the exact
        per-sample early-exit numerics of the C solver (and wrapping the
        multiscale solver in lax.map explodes compile time).
        """
        outs = [
            tvl1_flow(jnp.asarray(g0), jnp.asarray(g1), self.params)
            for g0, g1 in zip(grays0, grays1)
        ]
        return np.stack([np.asarray(o) for o in outs])

    def get_flows(
        self,
        seq_name: str,
        frame_paths: Sequence[str],
        pairs: Sequence[Tuple[int, int]],
        frames: Optional[np.ndarray] = None,
        frame_offset: int = 0,
    ) -> np.ndarray:
        """Flows for (from_idx, to_idx) frame pairs of one sequence.

        ``frames``: optional preloaded [T, H, W, C] stack (raw range);
        otherwise frames are read from ``frame_paths``.  When ``frames`` is
        a window of the video rather than the whole clip, ``frame_offset``
        is the absolute index of ``frames[0]`` (pair indices are absolute).
        Returns [len(pairs), H, W, 2].
        """
        fdir = self.seq_dir(seq_name)
        out: List[Optional[np.ndarray]] = [None] * len(pairs)
        missing = []
        for k, (i, j) in enumerate(pairs):
            f = flow_filename(fdir, frame_code(frame_paths[i]), frame_code(frame_paths[j]))
            if isfile(f):
                out[k] = imread(f).astype(np.float32)
            else:
                missing.append(k)
        if missing:
            def gray(idx):
                img = (
                    frames[idx - frame_offset]
                    if frames is not None
                    else imread(frame_paths[idx]).astype(np.float32)
                )
                return np.asarray(to_gray(jnp.asarray(img)))

            g0 = np.stack([gray(pairs[k][1]) for k in missing])  # I0 = target
            g1 = np.stack([gray(pairs[k][0]) for k in missing])  # I1 = source
            flows = self._flow_batch(g0, g1)
            for n, k in enumerate(missing):
                out[k] = flows[n]
                if self.persist:
                    i, j = pairs[k]
                    os.makedirs(fdir, exist_ok=True)
                    imwrite(
                        flow_filename(
                            fdir, frame_code(frame_paths[i]), frame_code(frame_paths[j])
                        ),
                        flows[n].astype(np.float32),
                    )
        return np.stack(out)

    def window_pairs(self, t0: int, patch_depth: int, future_patch_depth: int):
        """(from, to) indices for one window whose current frame is
        t0 + patch_depth - 1 (reference: data/base_dataset.py:74-132)."""
        cur = t0 + patch_depth - 1
        pairs = [(t0 + n, cur) for n in range(patch_depth - 1)]
        pairs += [(cur + n + 1, cur) for n in range(future_patch_depth)]
        return pairs
