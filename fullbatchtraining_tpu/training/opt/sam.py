"""Sharpness-Aware Minimization (SAM) as an optimizer modification.

Behavioral re-implementation of the reference SAM wrapper
(/root/reference/fullbatch/training/additional_optimizers/sam.py:54-92): two
full gradient evaluations per step - grads at theta, then at
theta + rho * g/||g|| (the sharpness ascent point) - with the inner optimizer
stepping on the second gradient from the ORIGINAL parameters. Both
evaluations are full jitted dataset passes, mirroring the reference where
each closure call re-walks the dataset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..grad_reg import tree_add_scaled, tree_sqnorm


def make_sam_step(fns, cfg, opt_update):
    rho = float(cfg.hyp.optim_modification.rho)

    def step(state, images, labels):
        lr = fns.schedule(state.step)
        grads1, bn1, _ = fns.gradient_eval(state, images, labels)
        norm = jnp.sqrt(tree_sqnorm(grads1))
        perturbed = tree_add_scaled(state.params, grads1, rho / (norm + 1e-12))
        # the second closure call runs from the stats the FIRST call updated
        # (reference closure semantics: each call applies one EMA update;
        # the fused stochastic SAM path chains identically)
        probe = state.replace(params=perturbed, batch_stats=bn1)
        grads2, bn, metrics = fns.gradient_eval(probe, images, labels)
        params, opt_state = opt_update(grads2, state.opt_state, state.params, lr)
        metrics = dict(metrics)
        metrics["lr"] = lr
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=bn, opt_state=opt_state)
        return new_state, metrics

    return step
