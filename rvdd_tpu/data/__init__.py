"""Data pipeline: disk datasets with on-device flow precompute, plus fully
on-device raw synthesis."""

from rvdd_tpu.data.io import imread, imwrite, load_image, list_video_files
from rvdd_tpu.data.datasets import TrainWindowDataset, InferenceDataset
from rvdd_tpu.data.flow_cache import FlowCache
