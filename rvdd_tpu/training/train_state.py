"""Optimizer, LR schedule, and the sharded train step.

Optimizers mirror the reference surface (adam/adamw(+wd)/sgd; reference:
models/base_model.py:70-84, options/train_options.py:22-30).  The 'linear'
LR policy keeps the base rate for ``niter`` epochs then decays to zero over
``niter_decay`` (reference: networks/__init__.py:27-30, stepped per epoch
at models/base_model.py:128-133).

The train step is a single jitted function differentiating through all
unrollings (the reference's forward + backward_Denoiser + optimizer.step);
batch-data parallelism comes from sharding the batch over the mesh 'data'
axis — XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from rvdd_tpu.recurrent.engine import (
    EngineConfig,
    compute_losses,
    prepare_frames,
    unrolled_forward,
)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class LookaheadState(NamedTuple):
    inner: Any  # inner (fast) optimizer state
    slow: Any  # slow parameter copy
    count: jnp.ndarray


def lookahead(
    tx: optax.GradientTransformation, sync_period: int = 6, slow_step: float = 0.5
) -> optax.GradientTransformation:
    """Lookahead wrapper (Zhang et al. 2019) over a fast optimizer.

    Unlike ``optax.lookahead`` this keeps the slow weights inside the
    optimizer state (no split fast/slow parameter tree), so it composes
    with the plain ``TrainState``.  Every ``sync_period`` steps the slow
    weights move ``slow_step`` of the way to the fast weights and the fast
    weights are reset onto them — expressed as a correction to the update.
    """

    def init(params):
        return LookaheadState(
            tx.init(params),
            jax.tree_util.tree_map(jnp.asarray, params),
            jnp.zeros((), jnp.int32),
        )

    def update(grads, state, params):
        updates, inner = tx.update(grads, state.inner, params)
        count = state.count + 1
        fast = optax.apply_updates(params, updates)

        def do_sync(_):
            new_slow = jax.tree_util.tree_map(
                lambda s, f: s + slow_step * (f - s), state.slow, fast
            )
            return new_slow, new_slow  # fast resets onto slow

        def no_sync(_):
            return fast, state.slow

        final, slow = jax.lax.cond(count % sync_period == 0, do_sync, no_sync, None)
        new_updates = jax.tree_util.tree_map(lambda f, p: f - p, final, params)
        return new_updates, LookaheadState(inner, slow, count)

    return optax.GradientTransformation(init, update)


def lr_for_epoch(epoch: int, lr: float, policy: str, niter: int, niter_decay: int,
                 lr_decay_iters: int = 50) -> float:
    """Learning rate in effect during (1-based) ``epoch``."""
    e = epoch - 1  # the scheduler has stepped epoch-1 times
    if policy == "linear":
        factor = 1.0 - max(0, e + 1 - niter) / float(niter_decay + 1)
    elif policy == "step":
        factor = 0.1 ** (e // lr_decay_iters)
    elif policy == "cosine":
        import math

        factor = 0.5 * (1 + math.cos(math.pi * min(e, niter) / niter))
    elif policy == "plateau":
        # The reference constructs ReduceLROnPlateau(mode='min', factor=0.2,
        # threshold=0.01, patience=5) (networks/__init__.py:39-46) but steps
        # EVERY scheduler as scheduler.step(epoch) (base_model.py:128-133) —
        # the epoch number is the "metric".  It increases monotonically, so
        # it never improves on epoch 1's value and the schedule is exactly
        # deterministic: bad-epoch count hits patience+1 at the step after
        # epoch 7, then every 6 epochs -> LR x0.2 at the end of epochs
        # 7, 13, 19, ... (pinned against torch in tests/test_training.py).
        # NOTE: the train CLI does NOT route plateau through here — the loop
        # implements the policy's INTENDED semantics, driven by the actual
        # validation loss (loop.py plateau_factor state); this branch
        # reproduces the reference's literal schedule for parity tooling.
        factor = 0.2 ** max(0, (e - 1) // 6)
    else:
        raise NotImplementedError(f"lr_policy {policy}")
    return lr * factor


def make_optimizer(name: str, beta1: float, weight_decay: float) -> optax.GradientTransformation:
    if name == "adamw":
        tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=0.0, b1=beta1, b2=0.999, weight_decay=weight_decay
        )
    elif name == "adam":
        tx = optax.inject_hyperparams(optax.adam)(learning_rate=0.0, b1=beta1, b2=0.999)
    elif name == "adabelief":
        tx = optax.inject_hyperparams(optax.adabelief)(
            learning_rate=0.0, b1=beta1, b2=0.999
        )
    elif name == "ranger":
        # Ranger = RAdam + Lookahead (reference: models/base_model.py:78-80
        # imports the `ranger` package; its defaults are k=6, alpha=0.5)
        tx = lookahead(
            optax.inject_hyperparams(optax.radam)(
                learning_rate=0.0, b1=beta1, b2=0.999
            ),
            sync_period=6,
            slow_step=0.5,
        )
    elif name == "sgd":
        tx = optax.inject_hyperparams(optax.sgd)(learning_rate=0.0, momentum=beta1)
    else:
        raise NotImplementedError(f"optimizer {name}")
    return tx


def create_train_state(params, optimizer: str = "adamw", beta1: float = 0.9,
                       weight_decay: float = 0.01) -> tuple[TrainState, optax.GradientTransformation]:
    tx = make_optimizer(optimizer, beta1, weight_decay)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), tx


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    opt_state = state.opt_state
    # ranger wraps the inject_hyperparams state inside LookaheadState
    hp_state = opt_state.inner if isinstance(opt_state, LookaheadState) else opt_state
    hp_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return TrainState(state.params, opt_state, state.step)


def make_train_step(cfg: EngineConfig, net, tx, donate: bool = True):
    """Build the jitted train step.

    signature: (state, frames, flows, gt, weights, nil_feat) -> (state, losses)
    ``unrollings`` is baked per-specialization via the weights length.
    """

    def loss_fn(params, raw_frames, raw_flows, gt, weights):
        # on-device pre-demosaic + flow upsample (reference does this in
        # set_input; recurrent_model.py:124-129)
        frames, flows = prepare_frames(cfg, raw_frames, raw_flows)
        nil_feat = None
        if cfg.feature_rec:
            b, _, h, w, _ = frames.shape
            nil_feat = net.nil_features(b, h, w, frames.dtype)
        unrollings = weights.shape[0]
        outs = unrolled_forward(cfg, net, params, frames, flows, unrollings, nil_feat)
        losses = compute_losses(cfg, outs, gt, weights)
        if cfg.warp_impl == "shift" and flows is not None and not cfg.no_warp:
            # telemetry: fraction of pixels the banded sweep approximates
            # (clamps).  Zero for TV-L1 flows; nonzero flags silently-wrong
            # gradients on fast-motion data (ops/warp_shift.py:26-31).
            from rvdd_tpu.ops.warp_shift import clamp_fraction

            r = cfg.shift_warp_radius
            losses["warp_clamp"] = jax.lax.stop_gradient(
                clamp_fraction(flows, radius_v=r, radius_h=r)
            )
        return losses["Denoiser"], losses

    def train_step(state: TrainState, raw_frames, raw_flows, gt, weights):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, losses), grads = grad_fn(state.params, raw_frames, raw_flows, gt, weights)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), losses

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
