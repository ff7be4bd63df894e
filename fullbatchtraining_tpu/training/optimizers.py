"""Optimizer interface: optax-style transforms + pure lr schedules.

TPU-native counterpart of /root/reference/fullbatch/training/optimizers.py.
The learning rate is a pure function of the step counter (jit-friendly),
threaded explicitly into the update so the GradRegularizer's lr/4 coupling
(modules.py:192) and the stats bookkeeping can read it.

Design: every optimizer is a pair (init_fn, update_fn) where
``update_fn(grads, state, params, lr) -> (new_params, new_state)`` runs
inside the jitted train step. Closure-based optimizers (line searches,
L-BFGS, SAM) instead orchestrate repeated jitted full-gradient evaluations
from Python (reference semantics: each closure call re-walks the dataset,
training.py docstring :7-26) - see training/opt/.
"""

from __future__ import annotations

import re
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

NO_WD_PATTERN = re.compile(r"(bias|gain)|skip_gain")


def wd_mask(params) -> Any:
    """True where weight decay applies. Mirrors the reference's regex exemption
    for bias/gain/skip_gain parameters (optimizers.py:14-21), used only when
    hyp.only_linear_layers_weight_decay is set."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree.structure(params)
    mask = [NO_WD_PATTERN.search(jax.tree_util.keystr(path).lower()) is None
            for path, _ in flat]
    return jax.tree.unflatten(treedef, mask)


# ---------------------------------------------------------------------------
# LR schedules (reference optimizers.py:69-91). Pure jnp functions of step.
# ---------------------------------------------------------------------------


def make_lr_schedule(cfg_hyp) -> Callable[[jax.Array], jax.Array]:
    base = float(cfg_hyp.optim.lr)
    steps = int(cfg_hyp.steps)
    name = cfg_hyp.scheduler
    warmup = int(cfg_hyp.warmup or 0)

    def cosine(T: int, eta_min: float):
        def fn(e):
            # No clamp past T: torch CosineAnnealingLR's closed form is
            # periodic, so the lr climbs back toward base after T_max — the
            # reference's cosine-4000 with hyp.steps > 4000 relies on this.
            return eta_min + (base - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * e / T))
        return fn

    if name == "linear":
        # Drop by 10x at ~5/8, 6/8, 7/8 of training.
        milestones = jnp.array([steps // 2.667, steps // 1.6, steps // 1.142])

        def after(e):
            return base * 0.1 ** jnp.sum(e >= milestones)
    elif name == "exponential":
        def after(e):
            return base * 0.99 ** e
    elif name == "cosine-decay":
        after = cosine(steps, 0.0)
    elif name == "cosine-decay-floored":
        after = cosine(steps, base / 25)
    elif name == "cosine-4000":
        after = cosine(4000, 0.0)
    elif name in ("", " ", None, "none"):
        def after(e):
            return jnp.asarray(base)
    else:
        raise ValueError(f"Invalid scheduler {name} provided.")

    def schedule(step):
        step = jnp.asarray(step)
        if warmup > 0:
            # The reference GradualWarmupScheduler holds the base lr at steps
            # `warmup` AND `warmup + 1` (the after-scheduler only starts
            # counting on the next .step() call), so the post-warmup epoch is
            # step - warmup - 1 (verified against the vendored oracle).
            return jnp.where(step < warmup, base * step / warmup,
                             after(jnp.maximum(step - warmup - 1, 0)))
        return after(step)

    return schedule


# ---------------------------------------------------------------------------
# SGD with torch-exact semantics (momentum/dampening/nesterov/coupled wd).
# ---------------------------------------------------------------------------


class SGDState(NamedTuple):
    momentum: Any
    count: jax.Array


def torch_sgd(momentum: float = 0.0, dampening: float = 0.0, nesterov: bool = False,
              weight_decay: float = 0.0, mask: Any = None):
    """torch.optim.SGD-equivalent:

    g <- g + wd * p; buf <- g (first step) else mu*buf + (1-dampening)*g;
    d <- g + mu*buf (nesterov) else buf; p <- p - lr*d.
    """

    def init(params):
        return SGDState(momentum=jax.tree.map(jnp.zeros_like, params),
                        count=jnp.zeros((), jnp.int32))

    def update(grads, state, params, lr):
        if weight_decay:
            wd_tree = mask(params) if mask is not None else jax.tree.map(lambda _: True, params)
            grads = jax.tree.map(
                lambda g, p, m: g + weight_decay * p if m else g, grads, params, wd_tree)
        if momentum:
            first = state.count == 0
            buf = jax.tree.map(
                lambda b, g: jnp.where(first, g, momentum * b + (1 - dampening) * g),
                state.momentum, grads)
            direction = jax.tree.map(lambda g, b: g + momentum * b, grads, buf) \
                if nesterov else buf
        else:
            buf = state.momentum
            direction = grads
        new_params = jax.tree.map(lambda p, d: p - lr * d.astype(p.dtype), params, direction)
        return new_params, SGDState(momentum=buf, count=state.count + 1)

    return init, update


class AdamWState(NamedTuple):
    mu: Any
    nu: Any
    nu_max: Any
    count: jax.Array


def torch_adamw(betas=(0.9, 0.999), eps: float = 1e-8, weight_decay: float = 0.01,
                amsgrad: bool = False, mask: Any = None):
    """torch.optim.AdamW-equivalent (decoupled wd: p <- p*(1 - lr*wd))."""
    b1, b2 = betas

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdamWState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                          nu_max=jax.tree.map(jnp.zeros_like, params) if amsgrad else None,
                          count=jnp.zeros((), jnp.int32))

    def update(grads, state, params, lr):
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
        # bias corrections at (at least) the parameter precision — a hard
        # float32 here injects 1e-7 drift into float64 training
        cdt = jnp.promote_types(jax.tree.leaves(params)[0].dtype, jnp.float32)
        bc1 = 1 - b1 ** count.astype(cdt)
        bc2 = 1 - b2 ** count.astype(cdt)
        if amsgrad:
            nu_max = jax.tree.map(jnp.maximum, state.nu_max, nu)
            denom_src = nu_max
        else:
            nu_max = None
            denom_src = nu

        def step(p, m, v, use_wd):
            upd = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            decay = weight_decay if use_wd else 0.0
            return p * (1 - lr * decay) - lr * upd.astype(p.dtype)

        wd_tree = mask(params) if mask is not None else jax.tree.map(lambda _: True, params)
        new_params = jax.tree.map(step, params, mu, denom_src, wd_tree)
        return new_params, AdamWState(mu=mu, nu=nu, nu_max=nu_max, count=count)

    return init, update


# ---------------------------------------------------------------------------
# Interface (reference optimizers.py:10-67)
# ---------------------------------------------------------------------------

CLOSURE_OPTIMIZERS = {"wolfe", "non-monotone", "restarting"}


def optim_interface(params, cfg_hyp):
    """Returns (init_fn, update_fn, schedule, info dict).

    info['closure'] marks optimizers whose step re-evaluates the full
    gradient (handled by the Python-level loop in training/opt/).
    ``params`` may be None; the wd mask is derived lazily from the tree.
    """
    name = cfg_hyp.optim.name
    mask = wd_mask if cfg_hyp.only_linear_layers_weight_decay else None
    schedule = make_lr_schedule(cfg_hyp)
    mod = cfg_hyp.optim_modification.name
    info = {"closure": None, "modification": mod}

    # LARS/LARC absorb the inner optimizer's weight decay (reference
    # lars.py:64-69: group wd zeroed, wd applied inside the wrapper).
    weight_decay = float(cfg_hyp.optim.get("weight_decay", 0.0) or 0.0)
    inner_wd = 0.0 if mod in ("LARS", "LARC") else weight_decay

    if name == "Gradient Descent":
        line_search = cfg_hyp.optim.get("line_search", "none")
        if line_search != "none":
            if line_search not in CLOSURE_OPTIMIZERS:
                raise ValueError(f"Invalid linesearch {line_search} defined.")
            info["closure"] = line_search
        init, update = torch_sgd(
            momentum=cfg_hyp.optim.momentum, dampening=cfg_hyp.optim.dampening,
            nesterov=cfg_hyp.optim.nesterov, weight_decay=inner_wd, mask=mask)
    elif name == "Adam":
        init, update = torch_adamw(
            betas=tuple(cfg_hyp.optim.betas), eps=cfg_hyp.optim.eps,
            weight_decay=inner_wd, amsgrad=cfg_hyp.optim.amsgrad, mask=mask)
    elif name == "Adaptive Gradient Descent":
        from .opt.adaptive_clipping import adaptive_clipped_sgd
        # inner wd zeroed under LARS/LARC like every inner optimizer
        # (reference lars.py:64-69 zeroes group wd unconditionally)
        init, update = adaptive_clipped_sgd(cfg_hyp.optim, mask=mask,
                                            weight_decay=inner_wd)
    elif name == "GD-AGC":
        from .opt.agc import sgd_agc
        init, update = sgd_agc(cfg_hyp.optim, params,
                               only_linear_wd=cfg_hyp.only_linear_layers_weight_decay,
                               weight_decay=inner_wd)
    elif name == "FISTA":
        from .opt.fista import fista
        if cfg_hyp.optim.get("line_search") in ("backtracking", "search"):
            info["closure"] = "fista-search"
        init, update = fista(cfg_hyp.optim)
    elif name == "L-BFGS":
        info["closure"] = "lbfgs"
        init, update = (lambda params: SGDState(momentum=None, count=jnp.zeros((), jnp.int32))), None
    else:
        raise ValueError(f"Invalid optimizer {name} provided.")

    if mod in ("LARS", "LARC") and update is not None:
        from .opt.lars import wrap_lars
        update = wrap_lars(update, trust_coefficient=cfg_hyp.optim_modification.trust_coefficient,
                           clip=(mod == "LARC"), eps=cfg_hyp.optim_modification.eps,
                           weight_decay=weight_decay, mask=mask)
    # SAM wraps at the step level (two full gradient evaluations) in training.py.

    return init, update, schedule, info
