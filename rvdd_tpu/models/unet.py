"""ConvUNet family ('convunet'): plain conv U-Nets with optional feature
recurrence.

Functional re-design of the reference architectures (reference:
networks/unet.py:259-825).  The released checkpoints use the
'fixedfeatures' variants (constant 48 channels at every scale, the global
default netDenoiser; reference: options/base_options.py:31); the
channel-doubling 'default/concat' mode is also supported.

Feature recurrence is an explicit data path: ``apply(params, x, feat)``
returns ``(y, new_feat)`` where ``new_feat`` is the penultimate
post-processing activation (what the reference captures with a forward hook
on PostConvs[-2]; reference: networks/unet.py:808-825).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from rvdd_tpu.ops.resize import (
    avgpool2x2,
    maxpool2x2,
    upsample2x_bilinear,
    upsample2x_nearest,
)
from rvdd_tpu.ops.fastconv import Conv1x1


def zero_pad_to(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Center a feature map in a zero canvas of (h, w) (reference:
    networks/unet.py:151-170)."""
    dh = (h - x.shape[-3]) // 2
    dw = (w - x.shape[-2]) // 2
    return jnp.pad(
        x,
        [(0, 0)] * (x.ndim - 3)
        + [(dh, h - x.shape[-3] - dh), (dw, w - x.shape[-2] - dw), (0, 0)],
    )


def _activation(name: str):
    if name == "silu":
        return nn.silu
    return nn.relu


def _normalize(x, kind: str, mod: nn.Module | None = None, name: str = "norm"):
    """conv -> norm -> act normalization slot (reference:
    networks/unet.py:66,140,516; default None = Identity,
    unet.py:350-351).

    ``mod``/``name`` are the calling module and a call-site-unique param
    prefix, needed only by kinds with learnable parameters ('batch')."""
    if kind in (None, "none"):
        return x
    if kind == "instance":
        # torch nn.InstanceNorm2d defaults: affine=False, eps=1e-5,
        # per-sample per-channel stats over H, W
        mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
        var = jnp.var(x, axis=(-3, -2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5)
    if kind == "batch":
        # The docstring default the reference names (BatchNorm2d,
        # networks/unet.py:297) — but its own CLI path is unreachable:
        # parse_kwargs leaves 'batch' a string and unet.py:349-351 calls it
        # as a module class, raising TypeError.  We implement the corner it
        # intended: per-channel batch statistics over (N, H, W) with a
        # learnable affine (torch affine=True, eps=1e-5), using batch stats
        # in both train and eval (track_running_stats=False semantics —
        # there is no reference behavior to match for running averages, and
        # stat-carrying state would thread a second variable collection
        # through every checkpoint/optimizer surface for an ablation no
        # released checkpoint uses).
        c = x.shape[-1]
        scale = mod.param(f"{name}_bn_scale", nn.initializers.ones, (c,))
        offset = mod.param(f"{name}_bn_offset", nn.initializers.zeros, (c,))
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + offset
    raise NotImplementedError(f"normalization '{kind}'")


class NConvBlock(nn.Module):
    """n x (3x3 conv + norm + activation); the per-scale block."""

    features: int
    n_blocks: int = 2
    activation: str = "relu"
    use_bias: bool = True
    dtype: Any = None
    normalization: str = "none"

    @nn.compact
    def __call__(self, x):
        act = _activation(self.activation)
        for j in range(self.n_blocks):
            x = nn.Conv(
                self.features, (3, 3), padding=1, use_bias=self.use_bias,
                dtype=self.dtype, name=f"conv{j}",
            )(x)
            x = _normalize(x, self.normalization, self, f"conv{j}")
            x = act(x)
        return x


class ConvUNet(nn.Module):
    """U-Net with conv(+pool) downsampling and bilinear-up decoder.

    fixed_features=True -> constant ``filters`` channels at every scale (the
    released 'convunet-mode=fixedfeatures'); False -> channels double per
    scale (reference 'default'/'concat' mode).
    feature_rec=True -> the '+feat' variant with a preprocessing conv and a
    48-channel recurrent feature input.
    """

    in_channels: int
    out_channels: int
    filters: int = 48
    depth: int = 4
    bottleneck_depth: int = 2
    post_depth: int = 2
    n_blocks_encoder: int = 2
    n_blocks_decoder: int = 2
    downsampling_mode: str = "convmax"
    upsampling_mode: str = "bilinear"
    activation: str = "relu"
    normalization: str = "none"
    bottleneck_dilation: bool = False
    use_bias: bool = True
    residual: bool = False
    fixed_features: bool = True
    feature_rec: bool = False
    #: computation dtype; None = fp32, jnp.bfloat16 = MXU-native inference
    dtype: Any = None

    def _enc_features(self, i: int) -> int:
        return self.filters if self.fixed_features else self.filters * 2**i

    @nn.compact
    def __call__(self, x: jnp.ndarray, feat: Optional[jnp.ndarray] = None):
        act = _activation(self.activation)

        if self.feature_rec:
            if feat is None:
                raise ValueError("feature-recurrent net needs a feat input")
            y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=self.use_bias, dtype=self.dtype, name="pre")(x)
            x_in = jnp.concatenate([y, feat], axis=-1)
        else:
            x_in = x

        # encoder
        skips = []
        h = x_in
        for i in range(self.depth):
            h = NConvBlock(
                self._enc_features(i),
                self.n_blocks_encoder,
                self.activation,
                self.use_bias,
                self.dtype,
                self.normalization,
                name=f"enc_conv{i}",
            )(h)
            skips.append(h)
            if i < self.depth - 1:
                h = self._downsample(h, i)

        # bottleneck with running residual accumulator
        # (reference: networks/unet.py:560-567)
        d = skips[-1]
        s = d
        bneck_feat = self._enc_features(self.depth - 1)
        for i in range(self.bottleneck_depth):
            # --bottleneck_dilation: conv i dilated by 2^i with matching
            # padding (reference: networks/unet.py:448-463); no norm in the
            # bottleneck in either mode
            dil = 2**i if self.bottleneck_dilation else 1
            d = nn.Conv(
                bneck_feat, (3, 3), padding=dil, kernel_dilation=(dil, dil),
                use_bias=self.use_bias, dtype=self.dtype, name=f"bottleneck{i}",
            )(d)
            d = act(d)
            s = s + d
        d = s

        # decoder
        for i in range(self.depth - 1):
            lvl = self.depth - 2 - i  # encoder level being fused
            feats = self._enc_features(lvl)
            d = self._upsample(d, i)
            d = nn.Conv(feats, (3, 3), padding=1, use_bias=self.use_bias, dtype=self.dtype, name=f"dec_up{i}")(d)
            d = _normalize(d, self.normalization, self, f"dec_up{i}")
            d = act(d)
            skip = skips[lvl]
            d = zero_pad_to(d, skip.shape[-3], skip.shape[-2])
            d = jnp.concatenate([skip, d], axis=-1)
            d = NConvBlock(
                feats, self.n_blocks_decoder, self.activation, self.use_bias,
                self.dtype, self.normalization, name=f"dec_conv{i}",
            )(d)

        # post-processing; the activation before the final 1x1 conv is the
        # recurrent feature state.
        for i in range(self.post_depth - 1):
            d = nn.Conv(self.filters, (3, 3), padding=1, use_bias=self.use_bias, dtype=self.dtype, name=f"post{i}")(d)
            d = _normalize(d, self.normalization, self, f"post{i}")
            d = act(d)
        new_feat = d if self.feature_rec else None
        d = Conv1x1(
            self.out_channels, use_bias=self.use_bias, dtype=self.dtype, name="post_final"
        )(d)
        d = d.astype(jnp.float32)
        if new_feat is not None:
            new_feat = new_feat.astype(jnp.float32)

        if self.residual:
            # global residual assumes the first 4 input channels are raw
            # (reference: networks/unet.py:550,585-587)
            d = x[..., 4:] - d
        return d, new_feat

    def _downsample(self, h, i):
        mode = self.downsampling_mode
        feats = self._enc_features(i)
        if mode in ("convmax", "convavg"):
            h = nn.Conv(
                feats, (3, 3), padding=1, use_bias=self.use_bias,
                dtype=self.dtype, name=f"enc_down{i}",
            )(h)
            return maxpool2x2(h) if mode == "convmax" else avgpool2x2(h)
        if mode == "maxpool":
            return maxpool2x2(h)
        if mode == "stridedconv":
            return nn.Conv(
                feats, (2, 2), strides=(2, 2), use_bias=self.use_bias,
                dtype=self.dtype, name=f"enc_down{i}",
            )(h)
        raise NotImplementedError(f"downsampling_mode {mode}")

    def _upsample(self, d, i: int):
        mode = self.upsampling_mode
        if mode == "bilinear":
            # torch nn.Upsample default: align_corners=False
            return upsample2x_bilinear(d, align_corners=False)
        if mode == "nearest":
            return upsample2x_nearest(d)
        if mode[:14].lower() == "transposedconv":
            # torch ConvTranspose2d(ch, ch, k, stride=2, padding=(k-1)//2)
            # (reference: networks/unet.py:120-135); expressed as an
            # input-dilated conv with the spatially-flipped kernel
            k = int(mode[14:]) if len(mode) > 14 else 2
            p = (k - 1) // 2
            ch = d.shape[-1]
            kernel = self.param(
                f"up_transposed{i}_kernel",
                nn.initializers.lecun_normal(),
                (k, k, ch, ch),
            )
            bias = (
                self.param(f"up_transposed{i}_bias", nn.initializers.zeros, (ch,))
                if self.use_bias
                else None
            )
            if self.dtype is not None:
                d = d.astype(self.dtype)
                kernel = kernel.astype(self.dtype)
            y = jax.lax.conv_general_dilated(
                d,
                kernel[::-1, ::-1],
                window_strides=(1, 1),
                padding=[(k - 1 - p, k - 1 - p)] * 2,
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if bias is not None:
                y = y + (bias.astype(self.dtype) if self.dtype is not None else bias)
            return y
        raise NotImplementedError(f"upsampling_mode {mode}")

    def nil_features(self, batch: int, h: int, w: int, dtype=jnp.float32):
        """Zero recurrent feature state (reference: networks/unet.py:820-825)."""
        return jnp.zeros((batch, h, w, self.filters), dtype)
