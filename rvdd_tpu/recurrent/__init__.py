"""Recurrent denoising engine: unrolled training forward, streaming
inference, and the unrolling-loss weight schedules."""

from rvdd_tpu.recurrent.schedules import unroll_weights, active_unrollings
from rvdd_tpu.recurrent.engine import (
    EngineConfig,
    RecurrentState,
    init_state,
    prepare_frames,
    unrolled_forward,
    inference_step,
    scan_video,
    compute_losses,
)
