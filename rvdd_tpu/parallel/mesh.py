"""Mesh construction and sharding helpers.

The reference's only parallelism is single-process torch DataParallel
(reference: networks/__init__.py:110-113).  Here the single source of truth
is a ``jax.sharding.Mesh``:

* ``data`` axis: batch data-parallelism — batches are sharded, parameters
  replicated; the gradient all-reduce rides ICI via XLA collectives.
* ``space`` axis (optional, e.g. ``--mesh_shape data2xspace4``): spatial
  sharding of the H dimension for very large frames; convolution halo
  exchanges are inserted by XLA under jit.

These nets are small (0.7-3 M params) so tensor/pipeline parallelism is
deliberately absent; scaling is DP x spatial.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(spec: str = "data", devices=None, batch_size: Optional[int] = None) -> Mesh:
    """Build a mesh from a spec string.

    'data'              -> 1-D mesh over all devices (batch DP)
    'data<N>'           -> 1-D mesh over N devices
    'data<N>xspace<M>'  -> 2-D mesh: N-way batch DP x M-way spatial

    With the auto 'data' spec and a known ``batch_size``, the data axis is
    capped at the largest divisor of the batch that fits the device count —
    mirrors torch DataParallel's silent use of fewer GPUs when the batch is
    small (reference: networks/__init__.py:110-113).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    m = re.fullmatch(r"data(\d*)(?:xspace(\d+))?", spec)
    if not m:
        raise ValueError(f"bad mesh spec '{spec}'")
    n = int(m.group(1)) if m.group(1) else None
    s = int(m.group(2)) if m.group(2) else 1
    if n is None:
        n = len(devices) // s
        if batch_size is not None:
            while n > 1 and batch_size % n:
                n -= 1
    devices = devices[: n * s].reshape(n, s)
    return Mesh(devices, ("data", "space"))


def batch_spec(ndim: int, spatial_axis: Optional[int] = None) -> P:
    """PartitionSpec for an array with leading batch dim; optionally shard a
    spatial dim over 'space'.

    Negative axes count from the end — useful because every batch tensor in
    this framework (frames [B,T,H,W,C], flows [B,TD,D,H,W,2], gt
    [B,T,H,W,C], raw windows [B,win,H,W,4]) carries H at axis -3, so
    ``spatial_axis=-3`` shards the frame height uniformly across leaves."""
    parts = [None] * ndim
    parts[0] = "data"
    if spatial_axis is not None:
        parts[spatial_axis] = "space"
    return P(*parts)


def shard_batch(mesh: Mesh, tree, spatial_axis: Optional[int] = None):
    """Device-put a batch pytree sharded over the 'data' (and optionally
    'space') mesh axes."""

    def put(x):
        spec = batch_spec(x.ndim, spatial_axis if x.ndim >= 4 else None)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
