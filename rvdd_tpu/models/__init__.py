"""Network architectures (Flax linen, NHWC) and checkpoint conversion."""

from rvdd_tpu.models.unet import ConvUNet
from rvdd_tpu.models.convnext_unet import ConvNeXtUNet
from rvdd_tpu.models.factory import build_network, parse_arch, init_network
from rvdd_tpu.models.convert import (
    convert_torch_checkpoint,
    convert_torch_state_dict,
    load_torch_checkpoint,
)
