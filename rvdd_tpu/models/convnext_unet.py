"""ConvNeXtUNet family ('newunet'): ConvNeXt-block U-Net with optional
feature recurrence.

Functional re-design of the reference architecture (reference:
networks/new_unet.py:207-430).  Block anatomy: optional 1x1 projection,
then [7x7 depthwise conv -> channel LayerNorm -> 1x1 expand x4 -> GELU
(exact) -> 1x1 project] scaled by a learned per-channel LayerScale and
added residually.  Decoder upsampling is bilinear with align_corners=True.

Like :mod:`rvdd_tpu.models.unet`, feature recurrence is an explicit
``(x, feat) -> (y, new_feat)`` data path instead of a forward hook.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from rvdd_tpu.ops.resize import (
    avgpool2x2,
    maxpool2x2,
    upsample2x_bilinear,
    upsample2x_nearest,
)
from rvdd_tpu.models.unet import zero_pad_to
from rvdd_tpu.ops.fastconv import Conv1x1, DepthwiseConv


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis with biased variance (reference:
    networks/new_unet.py:12-28)."""

    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        u = jnp.mean(x, axis=-1, keepdims=True)
        s = jnp.mean((x - u) ** 2, axis=-1, keepdims=True)
        x = (x - u) / jnp.sqrt(s + self.eps)
        return x * weight + bias


class LayerScale(nn.Module):
    """Learned per-channel residual scaling, init 0.1 (reference:
    networks/new_unet.py:31-46)."""

    features: int
    init: float = 0.1

    @nn.compact
    def __call__(self, x):
        g = self.param(
            "layerscale", lambda k, s: jnp.full(s, self.init, jnp.float32), (self.features,)
        )
        return x * g


class ConvNeXtBlock(nn.Module):
    """proj? -> (dw7x7 -> LN -> 1x1 x4 -> GELU -> 1x1) * layerscale + x."""

    in_features: int
    features: int
    kernel_size: int = 7
    layerscale_init: float = 0.1
    dtype: Any = None
    #: tanh-approx GELU (vs the exact erf the reference uses); fast-mode
    #: only — deviation ~1e-3, about half the activation cost on VPU
    fast_act: bool = False

    @nn.compact
    def __call__(self, x):
        if self.in_features != self.features:
            x = Conv1x1(self.features, dtype=self.dtype, name="proj")(x)
        h = DepthwiseConv(
            self.features, self.kernel_size, dtype=self.dtype, name="dw"
        )(x)
        h = ChannelLayerNorm(self.features, name="ln")(h)
        if self.dtype is not None:
            h = h.astype(self.dtype)
        h = Conv1x1(4 * self.features, dtype=self.dtype, name="pw1")(h)
        h = nn.gelu(h, approximate=self.fast_act)
        h = Conv1x1(self.features, dtype=self.dtype, name="pw2")(h)
        h = LayerScale(self.features, self.layerscale_init, name="layerscale")(h)
        if self.dtype is not None:
            h = h.astype(self.dtype)
        return x + h


class NConvNeXtBlock(nn.Module):
    in_features: int
    features: int
    n_blocks: int = 2
    kernel_size: int = 7
    layerscale_init: float = 0.1
    dtype: Any = None
    fast_act: bool = False

    @nn.compact
    def __call__(self, x):
        for j in range(self.n_blocks):
            x = ConvNeXtBlock(
                self.in_features if j == 0 else self.features,
                self.features,
                self.kernel_size,
                self.layerscale_init,
                self.dtype,
                self.fast_act,
                name=f"block{j}",
            )(x)
        return x


class ConvNeXtUNet(nn.Module):
    """The 'newunet' architecture (ConvNeXtUnet in the paper)."""

    in_channels: int
    out_channels: int
    filters: int = 48
    kernel_size: int = 7
    depth: int = 4
    n_blocks_encoder: int = 2
    n_blocks_decoder: int = 2
    n_blocks_bottleneck: int = 2
    n_blocks_postprocessing: int = 2
    downsampling_mode: str = "maxpool"
    upsampling_mode: str = "bilinear"
    fusion_mode: str = "cat"
    layerscale_init: float = 0.1
    feature_rec: bool = False
    #: computation dtype; None = fp32, jnp.bfloat16 = MXU-native inference
    dtype: Any = None
    fast_act: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, feat: Optional[jnp.ndarray] = None):
        f = self.filters

        def nconv(in_f, n, name):
            return NConvNeXtBlock(
                in_f, f, n, self.kernel_size, self.layerscale_init, self.dtype,
                self.fast_act, name=name
            )

        if self.feature_rec:
            if feat is None:
                raise ValueError("feature-recurrent net needs a feat input")
            y = nconv(self.in_channels, 1, "pre")(x)
            h = jnp.concatenate([y, feat], axis=-1)
            enc0_in = 2 * f
        else:
            h = x
            enc0_in = self.in_channels

        skips = []
        for i in range(self.depth):
            h = nconv(enc0_in if i == 0 else f, self.n_blocks_encoder, f"enc_conv{i}")(h)
            skips.append(h)
            if i < self.depth - 1:
                h = self._downsample(h)
                h = ConvNeXtBlock(
                    f, f, self.kernel_size, self.layerscale_init, self.dtype,
                    self.fast_act, name=f"enc_down{i}",
                )(h)

        h = nconv(f, self.n_blocks_bottleneck, "bottleneck")(h)

        for i in range(self.depth - 1):
            h = self._upsample(h)
            h = ConvNeXtBlock(
                f, f, self.kernel_size, self.layerscale_init, self.dtype,
                self.fast_act, name=f"dec_up{i}",
            )(h)
            skip = skips[-(i + 2)]
            h = zero_pad_to(h, skip.shape[-3], skip.shape[-2])
            if self.fusion_mode == "cat":
                h = jnp.concatenate([h, skip], axis=-1)
                h = nconv(2 * f, self.n_blocks_decoder, f"dec_conv{i}")(h)
            elif self.fusion_mode == "sum":
                h = h + LayerScale(f, self.layerscale_init, name=f"fuse_scale{i}")(skip)
                h = nconv(f, self.n_blocks_decoder, f"dec_conv{i}")(h)
            else:
                raise NotImplementedError(f"fusion_mode {self.fusion_mode}")

        h = nconv(f, self.n_blocks_postprocessing, "post")(h)
        new_feat = h if self.feature_rec else None
        h = Conv1x1(self.out_channels, dtype=self.dtype, name="post_final")(h)
        h = h.astype(jnp.float32)
        if new_feat is not None:
            new_feat = new_feat.astype(jnp.float32)
        return h, new_feat

    def _downsample(self, h):
        if self.downsampling_mode == "maxpool":
            return maxpool2x2(h)
        if self.downsampling_mode == "avgpool":
            return avgpool2x2(h)
        raise NotImplementedError(f"downsampling_mode {self.downsampling_mode}")

    def _upsample(self, h):
        if self.upsampling_mode == "bilinear":
            # torch nn.Upsample(..., align_corners=True) here, unlike convunet
            return upsample2x_bilinear(h, align_corners=True)
        if self.upsampling_mode == "nearest":
            return upsample2x_nearest(h)
        raise NotImplementedError(f"upsampling_mode {self.upsampling_mode}")

    def nil_features(self, batch: int, h: int, w: int, dtype=jnp.float32):
        return jnp.zeros((batch, h, w, self.filters), dtype)
