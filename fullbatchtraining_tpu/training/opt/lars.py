"""LARS / LARC trust-ratio gradient scaling.

Behavioral re-implementation of the reference's apex-LARC port
(/root/reference/fullbatch/training/additional_optimizers/lars.py:61-94):
per-parameter adaptive lr = tc * ||p|| / (||g|| + wd*||p|| + eps), LARC
additionally clips it to the base lr (expressed as min(adaptive/lr, 1)).
The wrapper absorbs the inner optimizer's weight decay (applied here,
before scaling), exactly like the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def wrap_lars(inner_update, trust_coefficient: float = 0.02, clip: bool = False,
              eps: float = 1e-8, weight_decay: float = 0.0, mask=None):
    """Wrap an (grads, state, params, lr) update with LARS/LARC scaling.

    ``mask``: optional fn(params) -> bool pytree; False leaves are exempt from
    weight decay (the reference reads per-group wd, which the
    only_linear_layers_weight_decay groups set to 0, optimizers.py:14-21)."""

    def update(grads, state, params, lr):
        wd_tree = mask(params) if mask is not None else jax.tree.map(lambda _: True, params)

        def scale(g, p, use_wd):
            wd = weight_decay if use_wd else 0.0
            param_norm = jnp.linalg.norm(p.reshape(-1))
            grad_norm = jnp.linalg.norm(g.reshape(-1))
            adaptive = trust_coefficient * param_norm / (
                grad_norm + param_norm * wd + eps)
            if clip:
                adaptive = jnp.minimum(adaptive / lr, 1.0)
            active = (param_norm != 0) & (grad_norm != 0)
            adaptive = jnp.where(active, adaptive, 1.0)
            # when either norm is zero the reference leaves the gradient
            # COMPLETELY untouched — its guard wraps the wd add too
            # (lars.py:76-87), so zero-grad params must not decay
            return jnp.where(active, (g + wd * p) * adaptive, g)

        scaled = jax.tree.map(scale, grads, params, wd_tree)
        return inner_update(scaled, state, params, lr)

    return update
