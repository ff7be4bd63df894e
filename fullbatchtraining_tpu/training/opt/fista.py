"""FISTA / FISTA-MOD accelerated gradient descent.

Behavioral re-implementation of the reference FISTA optimizer
(/root/reference/fullbatch/training/additional_optimizers/fista.py:13-82):
explicit t_k over-relaxation sequence with the FISTA-MOD (p, q, r)
generalization (arXiv:1807.04005; p=q=1, r=4 is classic FISTA):

    x+   = y_k - lr * grad(y_k)          [params held by the model ARE y_k]
    t_k+1 = (p + sqrt(q + r t_k^2)) / 2
    a_k  = (t_k - 1) / t_k+1
    y_k+1 = x+ (1 + a_k) - x- a_k ;  x- = x+

Optional projection applied to x+ after the gradient step.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class FISTAState(NamedTuple):
    x_prev: Any
    tk: jax.Array


def fista(cfg_optim, projection: Callable | None = None):
    lr = float(cfg_optim.lr)
    p_factor, q_factor, r_factor = [float(v) for v in cfg_optim.fista_mod]
    if cfg_optim.get("projection") and projection is None:
        raise ValueError(f"Unknown projection {cfg_optim.projection!r}; "
                         "pass a callable to fista().")

    def init(params):
        return FISTAState(x_prev=jax.tree.map(jnp.copy, params),
                          tk=jnp.ones((), jnp.float32))

    def update(grads, state, params, step_lr):
        # group['lr'] in the reference is scheduler-driven (optimizers.py:69-91)
        x_plus = jax.tree.map(lambda y, g: y - step_lr * g, params, grads)
        if projection is not None:
            x_plus = projection(x_plus)
        tk_new = (p_factor + jnp.sqrt(q_factor + r_factor * state.tk**2)) / 2
        ak = (state.tk - 1) / tk_new
        y_new = jax.tree.map(lambda xp, xm: xp * (1 + ak) - xm * ak, x_plus, state.x_prev)
        return y_new, FISTAState(x_prev=x_plus, tk=tk_new)

    return init, update
