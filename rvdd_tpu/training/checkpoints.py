"""Checkpoint I/O.

File layout mirrors the reference conventions
('%s_net_%s.pth' % (epoch, name); 'latest', 'latest_val', '0';
reference: models/base_model.py:155-196, train.py:100-120) with msgpack
payloads, and — an improvement over the reference, whose autoresume restarts
Adam moments — the optimizer state is saved alongside the parameters.

Released PyTorch checkpoints load transparently: a ``.pth`` path (or a
``--path2epoch`` prefix resolving to one) goes through the weight
converter (rvdd_tpu.models.convert).
"""

from __future__ import annotations

import json
import os
from os.path import isfile, join
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _net_file(save_dir: str, epoch: str, name: str = "Denoise") -> str:
    return join(save_dir, f"{epoch}_net_{name}.msgpack")


def _opt_file(save_dir: str, epoch: str, name: str = "Denoise") -> str:
    return join(save_dir, f"{epoch}_optim_{name}.msgpack")


def save_checkpoint(save_dir: str, epoch: str, params, opt_state=None) -> None:
    os.makedirs(save_dir, exist_ok=True)
    with open(_net_file(save_dir, epoch), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    if opt_state is not None:
        with open(_opt_file(save_dir, epoch), "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(opt_state)))


def load_checkpoint(
    path_or_dir: str,
    epoch: Optional[str],
    params_template,
    opt_state_template=None,
    net=None,
    example_shape=None,
) -> Tuple[Any, Any]:
    """Load parameters (and optimizer state when present).

    Accepts:
    * (save_dir, epoch) pairs -> msgpack files written by save_checkpoint,
    * a direct ``*.pth`` file or a reference-style path prefix
      (``<prefix>_net_Denoise.pth``) -> converted torch weights.
    """
    # reference-style external prefix: '<path2epoch>_net_Denoise.pth'
    pth_candidates = []
    if epoch is None:
        pth_candidates = [path_or_dir, f"{path_or_dir}_net_Denoise.pth"]
    else:
        pth_candidates = [join(path_or_dir, f"{epoch}_net_Denoise.pth")]
    for c in pth_candidates:
        if c.endswith(".pth") and isfile(c):
            from rvdd_tpu.models.convert import load_torch_checkpoint

            assert net is not None and example_shape is not None
            return load_torch_checkpoint(c, net, example_shape), None

    f = _net_file(path_or_dir, epoch) if epoch is not None else path_or_dir
    with open(f, "rb") as fh:
        params = serialization.from_bytes(params_template, fh.read())
    opt_state = None
    if opt_state_template is not None and epoch is not None:
        of = _opt_file(path_or_dir, epoch)
        if isfile(of):
            with open(of, "rb") as fh:
                opt_state = serialization.from_bytes(opt_state_template, fh.read())
    return params, opt_state


def save_status(save_dir: str, status: dict) -> None:
    os.makedirs(save_dir, exist_ok=True)
    with open(join(save_dir, "status.json"), "w") as f:
        json.dump(status, f)


def load_status(save_dir: str) -> Optional[dict]:
    p = join(save_dir, "status.json")
    if not isfile(p):
        return None
    with open(p) as f:
        return json.load(f)
