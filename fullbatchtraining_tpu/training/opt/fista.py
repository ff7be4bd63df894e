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

import logging
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

log = logging.getLogger(__name__)


class FISTAState(NamedTuple):
    x_prev: Any
    tk: jax.Array


class FISTALineSearchDriver:
    """FISTA with descent-lemma backtracking on the step size
    (reference fista.py:85-191): shrink lr by ``eta`` while
    (f(x+) - f(y) - <g, x+ - y>) * lr > ||x+ - y||^2 / 2, then apply the
    over-relaxation step. Each backtracking probe is a full jitted dataset
    pass (closure semantics). Select with hyp/optim=fista
    +hyp.optim.line_search=backtracking.
    """

    def __init__(self, fns, cfg):
        o = cfg.hyp.optim
        self.fns = fns
        self.lr = float(o.lr)
        self.eta = float(o.get("eta", 0.8))
        self.max_searches = int(o.get("max_searches", 25))
        p, q, r = [float(v) for v in o.fista_mod]
        self.pqr = (p, q, r)
        self.tk = float(o.get("tk", 1.0))
        self.x_prev = None

    def get_state(self):
        return {"lr": float(self.lr), "tk": float(self.tk),
                "x_prev": (jax.device_get(self.x_prev)
                           if self.x_prev is not None else {})}

    def set_state(self, p):
        self.lr = float(p.get("lr", self.lr))
        self.tk = float(p.get("tk", self.tk))
        xp = p.get("x_prev")
        self.x_prev = jax.tree.map(jnp.asarray, xp) if xp else None

    def step(self, state, images, labels):
        params = state.params  # y_k
        grads, bn, metrics = self.fns.gradient_eval(state, images, labels)
        bn_cur = bn  # stats chain through EVERY closure evaluation in order
        loss_yk = float(metrics["train_loss"])
        if self.x_prev is None:
            self.x_prev = params

        p, q, r = self.pqr
        tk_new = (p + (q + r * self.tk**2) ** 0.5) / 2
        ak = (self.tk - 1) / tk_new
        self.tk = tk_new

        x_plus, accepted = params, False
        for _ in range(self.max_searches):
            cand = jax.tree.map(lambda y, g: y - self.lr * g, params, grads)
            delta = jax.tree.map(jnp.subtract, cand, params)
            linearization = sum(float(jnp.vdot(g, d)) for g, d in
                                zip(jax.tree.leaves(grads), jax.tree.leaves(delta)))
            distance = sum(float(jnp.sum(d * d)) for d in jax.tree.leaves(delta)) / 2
            probe = state.replace(params=cand, batch_stats=bn_cur)
            _, bn_cur, m2 = self.fns.gradient_eval(probe, images, labels)
            loss_xk = float(m2["train_loss"])
            if (loss_xk - loss_yk - linearization) * self.lr > distance:
                self.lr *= self.eta
            else:
                x_plus, accepted = cand, True
                break
        if not accepted:
            # every probe violated the descent lemma: the reference restores
            # the parameters to y_k instead of stepping (fista.py:166-173)
            log.info("FISTA backtracking exhausted; keeping y_k.")
            x_plus = params

        y_new = jax.tree.map(lambda xp, xm: xp * (1 + ak) - xm * ak, x_plus, self.x_prev)
        self.x_prev = x_plus
        metrics = dict(metrics)
        metrics["lr"] = self.lr
        # The reference steps its (chainable) lr scheduler after every
        # optimizer step, composing the schedule factor ON TOP of the
        # backtracked lr (training.py:238/:285; torch cosine/exponential/
        # multistep all mutate group['lr'] by a per-step ratio). Mirror via
        # the schedule ratio; a zero schedule value (warmup step 0) has no
        # finite ratio, so the lr is left for the next step to scale.
        s_now = float(self.fns.schedule(state.step))
        s_next = float(self.fns.schedule(state.step + 1))
        if s_now > 0.0:
            self.lr *= s_next / s_now
        return state.replace(step=state.step + 1, params=y_new,
                             batch_stats=bn_cur), metrics


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
