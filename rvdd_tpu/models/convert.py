"""Convert released PyTorch checkpoints (trained-nets/*.pth) to param pytrees.

The reference ships 20 golden state dicts (reference: trained-nets/, loaded
at models/base_model.py:173-196).  This module maps them onto the Flax
parameter trees of :class:`ConvUNet` / :class:`ConvNeXtUNet`:

* conv weights: torch OIHW -> flax HWIO (``transpose(2, 3, 1, 0)``) — this
  also covers depthwise convs (O=C, I=1 -> HWIO (k, k, 1, C)),
* 1-D tensors (biases, LayerNorm affine, LayerScale) copy through.

torch is only needed to *read* .pth files; the converter can also consume a
pre-extracted ``{name: ndarray}`` mapping.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _w(t):
    a = np.asarray(t, np.float32)
    if a.ndim == 4:
        return a.transpose(2, 3, 1, 0)
    return a


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def _set(tree: dict, path: list[str], kind: str, value):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[kind] = value


def convert_convunet(sd: Dict[str, np.ndarray]) -> dict:
    """Torch state dict of UNet/UNet_FixedFeatures(+feat) -> flax params."""
    params: dict = {}
    used = set()

    def take(key):
        used.add(key + ".weight")
        used.add(key + ".bias")
        return _w(sd[key + ".weight"]), np.asarray(sd[key + ".bias"], np.float32)

    n_enc = len({k.split(".")[1] for k in sd if k.startswith("EncoderConvs.")})
    for i in range(n_enc):
        j = 0
        while f"EncoderConvs.{i}.blocks.{j}.0.weight" in sd:
            k, b = take(f"EncoderConvs.{i}.blocks.{j}.0")
            _set(params, [f"enc_conv{i}", f"conv{j}"], "kernel", k)
            _set(params, [f"enc_conv{i}", f"conv{j}"], "bias", b)
            j += 1
    i = 0
    while f"EncoderDown.{i}.conv.weight" in sd:
        k, b = take(f"EncoderDown.{i}.conv")
        _set(params, [f"enc_down{i}"], "kernel", k)
        _set(params, [f"enc_down{i}"], "bias", b)
        i += 1
    i = 0
    while f"bottleneck.{i}.0.weight" in sd:
        k, b = take(f"bottleneck.{i}.0")
        _set(params, [f"bottleneck{i}"], "kernel", k)
        _set(params, [f"bottleneck{i}"], "bias", b)
        i += 1
    i = 0
    while f"DecoderUp.{i}.up.1.weight" in sd:
        k, b = take(f"DecoderUp.{i}.up.1")
        _set(params, [f"dec_up{i}"], "kernel", k)
        _set(params, [f"dec_up{i}"], "bias", b)
        i += 1
    i = 0
    while f"DecoderConvs.{i}.blocks.0.0.weight" in sd:
        j = 0
        while f"DecoderConvs.{i}.blocks.{j}.0.weight" in sd:
            k, b = take(f"DecoderConvs.{i}.blocks.{j}.0")
            _set(params, [f"dec_conv{i}", f"conv{j}"], "kernel", k)
            _set(params, [f"dec_conv{i}", f"conv{j}"], "bias", b)
            j += 1
        i += 1
    # post convs: Sequential entries 0..post_depth-2 then the final 1x1
    post_ids = sorted(
        {int(k.split(".")[1]) for k in sd if k.startswith("PostConvs.")}
    )
    for i in post_ids[:-1]:
        k, b = take(f"PostConvs.{i}.0")
        _set(params, [f"post{i}"], "kernel", k)
        _set(params, [f"post{i}"], "bias", b)
    k, b = take(f"PostConvs.{post_ids[-1]}")
    _set(params, ["post_final"], "kernel", k)
    _set(params, ["post_final"], "bias", b)

    if "preprocessing_layer.weight" in sd:
        k, b = take("preprocessing_layer")
        _set(params, ["pre"], "kernel", k)
        _set(params, ["pre"], "bias", b)

    leftover = set(sd) - used
    if leftover:
        raise ValueError(f"unconsumed torch keys: {sorted(leftover)[:8]}...")
    return params


_CNX_TOP = {
    "encoder_convs": "enc_conv{}",
    "encoder_downs": "enc_down{}",
    "decoder_ups": "dec_up{}",
    "decoder_convs": "dec_conv{}",
}


def convert_convnext(sd: Dict[str, np.ndarray]) -> dict:
    """Torch state dict of NewUNet(+feat) -> flax params."""
    params: dict = {}

    def put_block(prefix_path: list[str], tkey: str):
        """Map one ConvBlock's tensors given its torch key prefix."""
        sub = {
            "proj": ("proj", "conv"),
            "block.0": ("dw", "conv"),
            "block.1": ("ln", "affine"),
            "block.2": ("pw1", "conv"),
            "block.4": ("pw2", "conv"),
        }
        for tsub, (fname, kind) in sub.items():
            wkey = f"{tkey}.{tsub}.weight"
            if wkey not in sd:
                continue
            if kind == "conv":
                _set(params, prefix_path + [fname], "kernel", _w(sd[wkey]))
                _set(params, prefix_path + [fname], "bias", _w(sd[f"{tkey}.{tsub}.bias"]))
            else:
                _set(params, prefix_path + [fname], "weight", _w(sd[wkey]))
                _set(params, prefix_path + [fname], "bias", _w(sd[f"{tkey}.{tsub}.bias"]))
        ls = f"{tkey}.layerscale.layerscale"
        if ls in sd:
            _set(params, prefix_path + ["layerscale"], "layerscale", _w(sd[ls]))

    for key in sd:
        m = re.match(r"(encoder_convs|decoder_convs)\.(\d+)\.blocks\.(\d+)\.", key)
        if m:
            top = _CNX_TOP[m.group(1)].format(m.group(2))
            put_block([top, f"block{m.group(3)}"], f"{m.group(1)}.{m.group(2)}.blocks.{m.group(3)}")
            continue
        m = re.match(r"(encoder_downs|decoder_ups)\.(\d+)\.postconv\.", key)
        if m:
            top = _CNX_TOP[m.group(1)].format(m.group(2))
            put_block([top], f"{m.group(1)}.{m.group(2)}.postconv")
            continue
        m = re.match(r"bottleneck\.blocks\.(\d+)\.", key)
        if m:
            put_block(["bottleneck", f"block{m.group(1)}"], f"bottleneck.blocks.{m.group(1)}")
            continue
        m = re.match(r"postprocessing\.0\.blocks\.(\d+)\.", key)
        if m:
            put_block(["post", f"block{m.group(1)}"], f"postprocessing.0.blocks.{m.group(1)}")
            continue
        m = re.match(r"preprocessing_layer\.blocks\.(\d+)\.", key)
        if m:
            put_block(["pre", f"block{m.group(1)}"], f"preprocessing_layer.blocks.{m.group(1)}")
            continue
        m = re.match(r"layerscales\.(\d+)\.layerscale", key)
        if m:
            _set(params, [f"fuse_scale{m.group(1)}"], "layerscale", _w(sd[key]))
            continue
        if key == "postprocessing.1.weight":
            _set(params, ["post_final"], "kernel", _w(sd[key]))
            continue
        if key == "postprocessing.1.bias":
            _set(params, ["post_final"], "bias", _w(sd[key]))
            continue

    return params


def convert_torch_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """Dispatch on the state-dict key shape."""
    if any(k.startswith("EncoderConvs.") for k in sd):
        return convert_convunet(sd)
    if any(k.startswith("encoder_convs.") for k in sd):
        return convert_convnext(sd)
    raise ValueError("unrecognized checkpoint family")


def convert_torch_checkpoint(path: str) -> dict:
    return convert_torch_state_dict(load_torch_state_dict(path))


def load_torch_checkpoint(path: str, net, example_shape):
    """Convert a .pth and validate its structure against ``net``.

    Returns flax params whose tree structure matches ``net.init``.
    """
    import jax
    import jax.numpy as jnp

    params = convert_torch_checkpoint(path)
    x = jnp.zeros(example_shape, jnp.float32)
    feat = (
        net.nil_features(example_shape[0], example_shape[1], example_shape[2])
        if getattr(net, "feature_rec", False)
        else None
    )
    ref = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x, feat))["params"]
    ref_paths = {tuple(str(p.key) for p in kp): leaf.shape
                 for kp, leaf in jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_paths = {tuple(str(p.key) for p in kp): leaf.shape
                 for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]}
    if ref_paths != got_paths:
        missing = set(ref_paths) - set(got_paths)
        extra = set(got_paths) - set(ref_paths)
        shapes = {
            k: (ref_paths.get(k), got_paths.get(k))
            for k in set(ref_paths) & set(got_paths)
            if ref_paths[k] != got_paths[k]
        }
        raise ValueError(
            f"checkpoint/net mismatch: missing={sorted(missing)[:6]} "
            f"extra={sorted(extra)[:6]} shape_mismatch={dict(list(shapes.items())[:6])}"
        )
    return jax.tree_util.tree_map(jnp.asarray, params)
