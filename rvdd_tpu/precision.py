"""Numerical precision policy.

TPU MXU native convolution/matmul accumulation is bfloat16-class; that is
the production default (fast, and what the benchmarks use).  For checkpoint
parity validation against the released fp32 PyTorch weights, switch to
exact fp32 accumulation:

    from rvdd_tpu.precision import use_exact_precision
    use_exact_precision()           # process-wide
    # or
    with exact_precision():         # scoped

This maps onto jax's ``default_matmul_precision`` so every conv in the
networks (and the warp/demosaic matmuls) picks it up without threading a
flag through each module.
"""

from __future__ import annotations

import contextlib

import jax


def use_exact_precision() -> None:
    jax.config.update("jax_default_matmul_precision", "highest")


def use_fast_precision() -> None:
    jax.config.update("jax_default_matmul_precision", "default")


@contextlib.contextmanager
def exact_precision():
    with jax.default_matmul_precision("highest"):
        yield
