"""Network factory: build a model from the CLI architecture string.

Mirrors the reference's string-encoded architecture hyperparameters
(``netDenoiser-arg1=val1-...``; reference: networks/__init__.py:121-198):

* ``convunet`` / ``convunet-mode=fixedfeatures`` / ``...+feat`` ->
  :class:`rvdd_tpu.models.unet.ConvUNet`
* ``newunet`` / ``newunet-mode=feat`` -> :class:`ConvNeXtUNet`

Also provides kaiming initialization matching the reference's default
``--init_type kaiming`` (fan_in, normal, zero bias; reference:
networks/__init__.py:61-96).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from rvdd_tpu.models.unet import ConvUNet
from rvdd_tpu.models.convnext_unet import ConvNeXtUNet


def _convert_value(v: str):
    if v.isnumeric():
        return int(v)
    if v.lower() == "none":
        return None
    low = v.lower()
    if low in ("y", "yes", "t", "true", "on", "1"):
        return True
    if low in ("n", "no", "f", "false", "off", "0"):
        return False
    try:
        return float(v)
    except ValueError:
        return v


def parse_arch(arch: str) -> Tuple[str, Dict[str, Any]]:
    """'name-k1=v1-k2=v2' -> (name, kwargs)."""
    parts = arch.split("-")
    kwargs = {}
    for p in parts[1:]:
        if "=" not in p:
            raise ValueError(f"malformed arch argument '{p}' in '{arch}'")
        k, v = p.split("=", 1)
        kwargs[k] = _convert_value(v)
    return parts[0], kwargs


def build_network(
    arch: str,
    input_nc: int,
    output_nc: int,
    feature_rec: bool = False,
    dtype=None,
    **extra,
) -> nn.Module:
    """Instantiate the denoiser network for an architecture string.

    ``input_nc`` is the full stacked input channel count
    ((model_patch_depth + future_patch_depth) * per-frame channels;
    reference: models/recurrent_model.py:68).
    """
    name, kwargs = parse_arch(arch)
    mode = kwargs.pop("mode", None)

    if "newunet" in name:
        feat = mode == "feat" or feature_rec
        return ConvNeXtUNet(
            in_channels=input_nc, out_channels=output_nc, feature_rec=feat,
            dtype=dtype, **kwargs, **extra
        )

    if "convunet" in name:
        # mode resolution follows get_UNet_cls (reference: networks/unet.py:14-24):
        # absent/'default'/'concat' -> channel-doubling UNet;
        # 'fixedfeatures' (the released nets) -> constant-width;
        # 'fixedfeatures+feat' -> constant-width + feature recurrence.
        feat = feature_rec
        if mode in (None, "default", "concat"):
            fixed = False
        elif mode == "fixedfeatures":
            fixed = True
        elif mode == "fixedfeatures+feat":
            fixed, feat = True, True
        else:
            raise ValueError(f"unknown convunet mode '{mode}'")
        kwargs.setdefault("depth", 4)
        return ConvUNet(
            in_channels=input_nc,
            out_channels=output_nc,
            fixed_features=fixed,
            feature_rec=feat,
            dtype=dtype,
            **kwargs,
            **extra,
        )

    raise NotImplementedError(f"unknown architecture '{arch}'")


def init_network(
    net: nn.Module, key: jax.Array, input_shape, init_type: str = "kaiming"
):
    """Initialize parameters; re-draws conv kernels with the requested policy.

    input_shape: (B, H, W, C) example shape.
    """
    x = jnp.zeros(input_shape, jnp.float32)
    feat = (
        net.nil_features(input_shape[0], input_shape[1], input_shape[2])
        if getattr(net, "feature_rec", False)
        else None
    )
    # jit the init: eager tracing compiles each conv separately, which is
    # painfully slow on small hosts
    params = jax.jit(net.init)(key, x, feat)["params"]
    if init_type is None or init_type == "flax":
        return params
    return reinit_convs(params, key, init_type)


def reinit_convs(params, key: jax.Array, init_type: str = "kaiming", gain: float = 0.02):
    """Apply the reference init policy to every conv kernel / bias leaf."""
    if init_type == "kaiming":
        kinit = jax.nn.initializers.variance_scaling(2.0, "fan_in", "normal")
    elif init_type == "normal":
        kinit = jax.nn.initializers.normal(gain)
    elif init_type == "xavier":
        kinit = jax.nn.initializers.variance_scaling(gain * gain, "fan_avg", "normal")
    elif init_type == "orthogonal":
        kinit = jax.nn.initializers.orthogonal(gain)
    else:
        raise NotImplementedError(f"init_type {init_type}")

    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(key, len(leaves))
    new_leaves = []
    for (path, leaf), k in zip(leaves, keys):
        last = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        # suffix match: ConvUNet's transposed-conv upsample params are named
        # up_transposed{i}_kernel/_bias and must follow the same policy
        if last.endswith("kernel") and leaf.ndim == 4:
            new_leaves.append(kinit(k, leaf.shape, leaf.dtype))
        elif last.endswith("bias"):
            new_leaves.append(jnp.zeros_like(leaf))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
