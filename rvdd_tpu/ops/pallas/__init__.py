"""Pallas TPU kernels for the hot ops."""

from rvdd_tpu.ops.pallas.warp_pallas import warp_bicubic_pallas
