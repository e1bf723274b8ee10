"""Core image ops: Bayer packing, demosaicing, warping, resizing, optical
flow, camera pipeline and metrics.  All functions are pure, NHWC, jittable.
"""

from rvdd_tpu.ops.bayer import pack_cfa, unpack_cfa, remosaic, bayer_masks
from rvdd_tpu.ops.demosaic import hamilton_adams
from rvdd_tpu.ops.transforms import to_net, from_net, normalize_bitdepth
from rvdd_tpu.ops.warp import warp, warp_bicubic, flow_upsample_2x
from rvdd_tpu.ops.resize import (
    upsample2x_bilinear,
    resize_bilinear,
    maxpool2x2,
    avgpool2x2,
)
from rvdd_tpu.ops.metrics import psnr
from rvdd_tpu.ops.tvl1 import tvl1_flow, tvl1_flow_pair, TVL1Params
