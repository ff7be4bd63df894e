"""Loss-landscape direction utilities on parameter pytrees.

Counterpart of /root/reference/fullbatch/analysis/rollouts.py (from
tomgoldstein/loss-landscape): random directions with filter / layer /
weight / dfilter / dlayer / entire normalization, the 'biasbn' rule
(zero directions for rank<=1 parameters), parameter offsets along 1-2
directions, and the perturb-to-threshold flatness walk.

Layout note: torch iterates conv filters along dim 0 (OIHW); flax kernels
are HWIO, so a "filter" is a slice along the LAST axis, and filter norms
reduce over all leading axes.
"""

from __future__ import annotations

import logging
from typing import Any, Callable

import jax
import jax.numpy as jnp

log = logging.getLogger(__name__)

Pytree = Any


def _filter_norms(x: jax.Array) -> jax.Array:
    """Per-output-unit norms: reduce all axes but the last (HWIO/IO)."""
    axes = tuple(range(x.ndim - 1))
    return jnp.sqrt(jnp.sum(jnp.square(x), axis=axes, keepdims=True))


def tree_norm(tree: Pytree) -> jax.Array:
    from ..training.grad_reg import tree_sqnorm  # single norm implementation
    return jnp.sqrt(tree_sqnorm(tree))


def _normalize_leaf(d: jax.Array, w: jax.Array, norm: str, ignore: str,
                    key: jax.Array, entire_scale=None) -> jax.Array:
    if d.ndim <= 1:
        # rank<=1 replacements are norm-specific (rollouts.py:150-201):
        # filter/default -> w * random sign; layer -> randn matched to ||w||;
        # entire -> fresh randn * the global weights/direction norm ratio.
        if ignore == "biasbn":
            return jnp.zeros_like(d)
        if norm == "layer":
            fresh = jax.random.normal(key, d.shape, d.dtype)
            return fresh * jnp.linalg.norm(w) / (jnp.linalg.norm(fresh) + 1e-10)
        if norm == "entire":
            return jax.random.normal(key, d.shape, d.dtype) * entire_scale
        sign = jnp.sign(jax.random.normal(key, d.shape, d.dtype))
        return w * jnp.where(sign == 0, 1.0, sign)
    if norm == "filter":
        return d * _filter_norms(w) / (_filter_norms(d) + 1e-10)
    if norm in ("layer", "entire"):
        # reference 'entire' routes rank>1 leaves through normalize_direction,
        # whose per-layer constant equals the 'layer' rescale (rollouts.py:134-138)
        return d * jnp.linalg.norm(w.reshape(-1)) / (jnp.linalg.norm(d.reshape(-1)) + 1e-10)
    if norm == "weight":
        return d * w
    if norm == "dfilter":
        return d / (_filter_norms(d) + 1e-10)
    if norm == "dlayer":
        return d / (jnp.linalg.norm(d.reshape(-1)) + 1e-10)
    raise ValueError(f"Unknown direction norm {norm}.")


def create_random_direction(params: Pytree, key: jax.Array, norm: str = "filter",
                            ignore: str = "biasbn") -> Pytree:
    """Random direction shaped like ``params`` (rollouts.py:226-251)."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, 2 * len(leaves))
    raw = [jax.random.normal(keys[i], leaf.shape, jnp.float32)
           for i, leaf in enumerate(leaves)]
    entire_scale = None
    if norm == "entire":
        # the reference computes the global scalar from the RAW random tree
        # before any leaf replacement (rollouts.py:176-190)
        raw_norm = jnp.sqrt(sum(jnp.sum(jnp.square(r)) for r in raw))
        entire_scale = tree_norm(params) / (raw_norm + 1e-10)
    direction = [
        _normalize_leaf(d, w, norm, ignore, keys[len(leaves) + i], entire_scale)
        for i, (d, w) in enumerate(zip(raw, leaves))
    ]
    return jax.tree.unflatten(treedef, direction)


def set_parameter_offset(base: Pytree, dx: Pytree, x, dy: Pytree | None = None,
                         y=0.0) -> Pytree:
    """params = base + x*dx (+ y*dy) (reference crunch.py:72-77)."""
    if dy is None:
        return jax.tree.map(lambda b, d: b + x * d, base, dx)
    return jax.tree.map(lambda b, d1, d2: b + x * d1 + y * d2, base, dx, dy)


def perturb2threshold(params: Pytree, loss_fn: Callable[[Pytree], jax.Array],
                      key: jax.Array, step_size: float = 0.1, threshold: float = 1.0,
                      norm: str = "filter", ignore: str = "biasbn",
                      max_steps: int = 1000):
    """Walk a random direction until the mean loss exceeds ``threshold``
    (rollouts.py:278-290). Returns (direction_norm * counter, counter)."""
    direction = create_random_direction(params, key, norm=norm, ignore=ignore)
    direction_norm = float(tree_norm(direction))
    counter = 0
    current = params
    while counter < max_steps:
        loss = float(loss_fn(current))
        # not math.isnan guard but an inverted comparison: a NaN loss (logits
        # overflowed past inf-inf) must STOP the walk like a crossing — plain
        # `loss > threshold` is False for NaN, which would burn all
        # max_steps full-dataset evals and record a huge bogus flatness
        if not (loss <= threshold):
            break
        current = set_parameter_offset(current, direction, step_size)
        counter += 1
    else:
        # no silent caps: a value returned here measures the walk budget,
        # not a threshold crossing (the reference loops unboundedly)
        log.warning("perturb2threshold hit max_steps=%d without the loss "
                    "exceeding %g; the recorded flatness is a lower bound.",
                    max_steps, threshold)
    return direction_norm * counter, counter
