"""SGD with NFNet adaptive gradient clipping (AGC).

Behavioral re-implementation of the reference SGD_AGC
(/root/reference/fullbatch/training/additional_optimizers/sgd_agc.py):
unit-wise clip of g where ||g||_unit > clipping * max(||p||_unit, eps),
then standard SGD. The final classifier ('linear' top-level module) is
exempt from clipping, and only_linear_layers_weight_decay zeroes decay on
stem/conv biases+gains and skip gains (reference optimizers.py:47-53).

Unit-wise norms in flax NHWC/HWIO layout: conv kernels (4D HWIO) reduce over
(H, W, I) per output channel; linear kernels (2D IO) reduce over I; vectors
and scalars use the full norm - mirroring the OIHW-aware logic at
sgd_agc.py:10-27.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp

from ..optimizers import torch_sgd

_AGC_WD_EXEMPT = re.compile(r"stem.*(bias|gain)|conv.*(bias|gain)|skip_gain")


def unitwise_norm(x: jax.Array) -> jax.Array:
    squeezed_rank = sum(1 for s in x.shape if s != 1)
    if squeezed_rank <= 1:
        return jnp.sqrt(jnp.sum(jnp.square(x)))
    if x.ndim in (2, 3):  # IO linear kernels: per output column
        return jnp.sqrt(jnp.sum(jnp.square(x), axis=tuple(range(x.ndim - 1)),
                                keepdims=True))
    if x.ndim == 4:  # HWIO conv kernels: per output channel
        return jnp.sqrt(jnp.sum(jnp.square(x), axis=(0, 1, 2), keepdims=True))
    raise ValueError(f"Got a parameter with ndim not in [1, 2, 3, 4]: {x.shape}")


def agc_clip(grads, params, clipping: float, eps: float = 1e-3, exempt=None):
    """Clip gradients unit-wise; ``exempt`` is a bool pytree (True = skip)."""

    def clip_one(g, p, skip):
        if skip:
            return g
        max_norm = jnp.maximum(unitwise_norm(p), eps) * clipping
        grad_norm = unitwise_norm(g)
        clipped = g * (max_norm / jnp.maximum(grad_norm, 1e-6))
        return jnp.where(grad_norm > max_norm, clipped, g)

    if exempt is None:
        exempt = jax.tree.map(lambda _: False, grads)
    return jax.tree.map(clip_one, grads, params, exempt)


def _path_trees(params):
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    paths = [jax.tree_util.keystr(path).lower() for path, _ in flat]
    return paths, treedef


def sgd_agc(cfg_optim, params=None, only_linear_wd: bool = False,
            weight_decay=None):
    clipping = cfg_optim.clipping
    eps = cfg_optim.eps

    def wd_mask(p):
        if not only_linear_wd:
            return None
        paths, treedef = _path_trees(p)
        return jax.tree.unflatten(treedef, [_AGC_WD_EXEMPT.search(s) is None for s in paths])

    base_init, base_update = torch_sgd(
        momentum=cfg_optim.momentum, dampening=cfg_optim.dampening,
        nesterov=cfg_optim.nesterov,
        weight_decay=(cfg_optim.weight_decay if weight_decay is None else weight_decay),
        mask=wd_mask if only_linear_wd else None)

    def update(grads, state, params, lr):
        paths, treedef = _path_trees(params)
        # classifier exemption (reference optimizers.py:47-49)
        exempt = jax.tree.unflatten(
            treedef, [s.strip("[]'\" ").startswith(("linear", "fc", "classifier"))
                      for s in paths])
        grads = agc_clip(grads, params, clipping, eps, exempt)
        return base_update(grads, state, params, lr)

    return base_init, update
