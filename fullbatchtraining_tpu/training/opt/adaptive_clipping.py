"""Iteration-adaptive gradient clipping ('Adaptive Gradient Descent').

Behavioral re-implementation of the reference AdaptiveGradientClipping
(/root/reference/fullbatch/training/additional_optimizers/adaptive_clipping.py):
track the gradient norms of the last ``interval`` steps; when the current
norm exceeds their maximum, rescale the gradient down to that maximum, then
take an SGD step.

Two reference defects fixed per SURVEY.md §7 (document, fix):
* ``_scale_gradients`` scaled the *parameters* instead of the gradients
  (adaptive_clipping.py:39-42);
* the non-clipping path after warmup returned without calling the optimizer
  step at all (adaptive_clipping.py:70-74). Here every update steps.

Matching reference semantics kept: spiked (clipped) norms are NOT recorded
into the history (the reference only appends in the non-clipping branches,
adaptive_clipping.py:62-74), so one spike cannot poison the window and
disable clipping for the next ``interval`` steps.

Trajectory-oracle tested against the reference's own train loop (recipes
``clipping`` (interval=2) and ``clipping1`` (interval=1, where the reference
arms on the very first step and rescales n0 by n0/(n0+1e-6)) in
tests/test_trajectory_oracle.py, reference minimally patched per the two
defects above): full stats trace + final params at fp64 rtol 1e-7, with
both armed-window branches firing.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..grad_reg import tree_scale
from ..optimizers import torch_sgd


class AdaptiveClipState(NamedTuple):
    sgd: Any
    norm_history: jax.Array  # (interval,)
    count: jax.Array


def adaptive_clipped_sgd(cfg_optim, mask=None, weight_decay=None):
    interval = int(cfg_optim.interval)
    norm_type = float("inf") if cfg_optim.norm_type == "inf" else float(cfg_optim.norm_type)

    base_init, base_update = torch_sgd(
        momentum=cfg_optim.momentum, dampening=cfg_optim.dampening,
        nesterov=cfg_optim.nesterov,
        weight_decay=(cfg_optim.weight_decay if weight_decay is None else weight_decay),
        mask=mask)

    def init(params):
        # at least float32; float64 params keep full precision (the norm
        # window feeds the clip scale factor, so a float32 hard-cast would
        # contaminate fp64 trajectories)
        dt = jnp.promote_types(jax.tree.leaves(params)[0].dtype, jnp.float32)
        return AdaptiveClipState(sgd=base_init(params),
                                 norm_history=jnp.zeros((interval,), dt),
                                 count=jnp.zeros((), jnp.int32))

    def grad_norm(grads):
        import math

        leaves = jax.tree.leaves(grads)
        if math.isinf(norm_type):
            return jnp.max(jnp.asarray([jnp.max(jnp.abs(g)) for g in leaves]))
        stack = jnp.asarray([jnp.linalg.norm(g.reshape(-1), ord=norm_type) for g in leaves])
        return jnp.linalg.norm(stack, ord=norm_type)

    def update(grads, state, params, lr):
        norm = grad_norm(grads).astype(state.norm_history.dtype)
        first = state.count == 0
        if interval > 1:
            warm = state.count >= interval
            recent_max = jnp.max(state.norm_history)
        else:
            # QUIRK mirrored: with interval=1 the reference is armed on the
            # very FIRST step — state['norms'] = [n0] already has len ==
            # interval, so step 0 compares n0 >= max([n0]) and rescales by
            # n0/(n0+1e-6) (adaptive_clipping.py:59-77).
            warm = jnp.asarray(True)
            recent_max = jnp.where(first, norm, jnp.max(state.norm_history))
        clipped = warm & (norm >= recent_max)
        scale = jnp.where(clipped, recent_max / (norm + 1e-6), 1.0)
        grads = tree_scale(grads, scale)
        # Record only non-clipped norms (reference appends norms solely in
        # the non-clipping branches): the window tracks typical magnitudes,
        # not spikes.
        slot = state.count % interval
        history = state.norm_history.at[slot].set(
            jnp.where(clipped, state.norm_history[slot], norm))
        # QUIRK mirrored: the reference seeds the history with the first
        # norm TWICE (state['norms'] = [n0], then the same step appends n0
        # again, adaptive_clipping.py:59-64), so clipping arms at step
        # interval-1 with n0 double-counted in the window.
        if interval > 1:
            history = history.at[1].set(jnp.where(first, norm, history[1]))
            inc = jnp.where(clipped, 0, jnp.where(first, 2, 1))
        else:
            # the seed entry [n0] persists even though step 0 takes the
            # clip branch (which never appends): slot 0 must hold n0 after
            # the first update.
            history = history.at[0].set(jnp.where(first, norm, history[0]))
            inc = jnp.where(first, 1, jnp.where(clipped, 0, 1))
        count = state.count + inc.astype(state.count.dtype)
        new_params, sgd_state = base_update(grads, state.sgd, params, lr)
        return new_params, AdaptiveClipState(sgd=sgd_state, norm_history=history,
                                             count=count)

    return init, update
