"""rvdd_tpu — a TPU-native framework for Recurrent Video Denoising and
Demosaicing (RVDD) of raw Bayer video.

This is a from-scratch JAX / Flax / Pallas re-design with the capabilities of
the reference PyTorch research framework (centreborelli/RVDD-release):

* joint denoising + demosaicing of GBRG Bayer video,
* on-device TV-L1 optical flow (the reference precomputes flow offline with a
  C library; here it is a jitted JAX function — see ``rvdd_tpu.ops.tvl1``),
* frame / feature recurrent U-Nets (``convunet`` and ``ConvNeXtUNet``
  families) with explicit functional recurrence state,
* unrolled-recurrence training with the ``unroll_focus`` loss schedules,
* inverse/forward camera pipeline raw synthesis and sRGB scoring,
* train/validate CLIs mirroring the reference option surface, and
* checkpoint conversion from the released ``trained-nets/*.pth`` weights.

Layouts are NHWC throughout (TPU-native); all compute paths are pure
functions designed to be ``jax.jit``-ed and sharded over a
``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"
