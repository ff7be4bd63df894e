"""Gradient-norm regularization (the paper's core mechanism).

TPU-native re-implementation of the reference GradRegularizer
(/root/reference/fullbatch/models/modules.py:136-348). The regularizer adds
an approximation of (lr/4) * H @ (block_strength * g + acc_strength * g_pre)
to each chunk gradient - the gradient of the penalty (lr/4) * s * ||grad L||^2
- selected by ``hyp.grad_reg.implementation``:

* ``forward-differences`` (default in configs): darts-rule finite difference,
  eps_n = eps/||v||; here the perturb -> re-grad -> combine sequence is a pure
  function fused by XLA into the same program as the base gradient - no
  parameter save/restore (the reference clones and restores all params,
  modules.py:218, :240).
* ``forward-differences-legacy``: v = g only, acc_strength ignored
  (modules.py:243-264).
* ``central-differences``: two-sided difference (modules.py:266-299).
* ``autograd``: exact Hessian-vector product. On TPU this is
  ``jax.jvp`` of the gradient function - forward-over-reverse, XLA-native
  (SURVEY.md §2 #16 names this the idiomatic first choice).
* ``autograd-pen``: gradient of the explicit penalty, reproducing the
  reference's coefficient quirk: without pre_grads the penalty is
  s*||g||^2 whose gradient is 2*s*H@g - a factor 2 vs the other variants
  (modules.py:180-194). Kept formula-faithful for parity.
* ``complex-step``: the reference version was nonfunctional in torch 1.9
  (modules.py:302-344); complex-step exists to avoid second-order autodiff,
  which XLA handles natively, so this maps to the exact HVP as well.

All variants couple the strength to the current learning rate as lr/4
(modules.py:192, :214).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

Pytree = Any


def tree_sqnorm(tree: Pytree) -> jax.Array:
    return sum(jnp.sum(jnp.square(leaf)) for leaf in jax.tree.leaves(tree))


def tree_add_scaled(a: Pytree, b: Pytree, alpha) -> Pytree:
    return jax.tree.map(lambda x, y: x + alpha * y, a, b)


def tree_scale(a: Pytree, alpha) -> Pytree:
    return jax.tree.map(lambda x: alpha * x, a)


VARIANTS = ("forward-differences", "forward-differences-legacy", "central-differences",
            "autograd", "autograd-pen", "complex-step")


def make_grad_regularizer(cfg_reg, grad_fn: Callable):
    """Build the per-chunk regularizer.

    grad_fn(params, batch_stats, images, labels, key) -> grads: re-evaluates the chunk
    gradient at (possibly perturbed) parameters. BatchNorm runs in train mode
    but its running-stat side effects are not threaded through the extra
    evaluations (the reference's extra forward passes did mutate running
    stats as a side effect; that is an artifact, not a design goal).

    Returns reg_fn(grads, params, batch_stats, images, labels, pre_grads, lr, key) -> grads.
    """
    block_strength = float(cfg_reg.block_strength)
    acc_strength = float(cfg_reg.acc_strength)
    eps = float(cfg_reg.eps)
    implementation = cfg_reg.implementation

    if block_strength == 0.0 and acc_strength == 0.0:
        return None
    if implementation not in VARIANTS:
        raise ValueError(f"Invalid spec. given for regularizer implementation: {implementation}")
    if implementation == "autograd-pen" and acc_strength != 0 and block_strength == 0:
        raise ValueError("Requires non-zero block strength if computing pre_grads")

    def direction(grads, pre_grads):
        v = tree_scale(grads, block_strength)
        if pre_grads is not None and acc_strength != 0.0:
            v = tree_add_scaled(v, pre_grads, acc_strength)
        return v

    def hvp(params, batch_stats, v, images, labels, key):
        """Exact Hessian-vector product: forward-over-reverse."""
        return jax.jvp(lambda p: grad_fn(p, batch_stats, images, labels, key), (params,), (v,))[1]

    def reg_fn(grads, params, batch_stats, images, labels, pre_grads, lr, key):
        correction = lr / 4.0

        if implementation in ("autograd", "complex-step"):
            # ONE fused HVP on the combined direction: the HVP is linear in
            # v, so H(bs*g + as*pre) == bs*H(g) + as*H(pre) exactly — the
            # reference's two-pass form (modules.py _double_autograd, whose
            # own comment calls it "non-optimal") pays a second
            # forward-over-reverse pass per chunk for the same result.
            hv = hvp(params, batch_stats, direction(grads, pre_grads),
                     images, labels, key)
            return tree_add_scaled(grads, hv, correction)

        if implementation == "autograd-pen":
            def penalty(p):
                g = grad_fn(p, batch_stats, images, labels, key)
                if pre_grads is not None and acc_strength != 0.0:
                    fac = 1.0 / (2.0 * block_strength)
                    mix = tree_add_scaled(tree_scale(g, block_strength), pre_grads, acc_strength)
                    return fac * tree_sqnorm(mix)
                return block_strength * tree_sqnorm(g)

            vhp = jax.grad(penalty)(params)
            return tree_add_scaled(grads, vhp, correction)

        if implementation == "forward-differences-legacy":
            eps_n = eps / jnp.sqrt(tree_sqnorm(grads))
            offset = grad_fn(tree_add_scaled(params, grads, eps_n), batch_stats, images, labels, key)
            hv = tree_scale(jax.tree.map(jnp.subtract, offset, grads), 1.0 / eps_n)
            return tree_add_scaled(grads, hv, correction * block_strength)

        v = direction(grads, pre_grads)
        eps_n = eps / jnp.sqrt(tree_sqnorm(v))

        if implementation == "forward-differences":
            offset = grad_fn(tree_add_scaled(params, v, eps_n), batch_stats, images, labels, key)
            hv = tree_scale(jax.tree.map(jnp.subtract, offset, grads), 1.0 / eps_n)
            return tree_add_scaled(grads, hv, correction)

        # central-differences
        plus = grad_fn(tree_add_scaled(params, v, 0.5 * eps_n), batch_stats, images, labels, key)
        minus = grad_fn(tree_add_scaled(params, v, -0.5 * eps_n), batch_stats, images, labels, key)
        hv = tree_scale(jax.tree.map(jnp.subtract, plus, minus), 1.0 / eps_n)
        return tree_add_scaled(grads, hv, correction)

    return reg_fn
