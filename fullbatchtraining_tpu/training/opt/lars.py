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
              eps: float = 1e-8, weight_decay: float = 0.0):
    """Wrap an (grads, state, params, lr) update with LARS/LARC scaling."""

    def update(grads, state, params, lr):
        def scale(g, p):
            param_norm = jnp.linalg.norm(p.reshape(-1))
            grad_norm = jnp.linalg.norm(g.reshape(-1))
            adaptive = trust_coefficient * param_norm / (
                grad_norm + param_norm * weight_decay + eps)
            if clip:
                adaptive = jnp.minimum(adaptive / lr, 1.0)
            adaptive = jnp.where((param_norm != 0) & (grad_norm != 0), adaptive, 1.0)
            return (g + weight_decay * p) * adaptive

        scaled = jax.tree.map(scale, grads, params)
        return inner_update(scaled, state, params, lr)

    return update
