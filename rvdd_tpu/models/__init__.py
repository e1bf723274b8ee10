"""Network architectures (Flax linen, NHWC) and checkpoint conversion."""

from rvdd_tpu.models.unet import ConvUNet
