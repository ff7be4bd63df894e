"""Welford online mean/variance accumulation as a jit-friendly scan carry.

Counterpart of /root/reference/fullbatch/analysis/welford.py:23-39, extended
with the exact parallel merge (Chan et al.) so per-device accumulations
combine across the mesh - the reference recorded local-shard statistics only
("this is a limited sample in a DDP distributed setting", analysis.py:64);
merging makes them global.

FIX vs reference (documented per the PARITY policy): ``welford_finalize``
guards its divisors — sample variance uses ``max(count - 1, 1)`` and the
norm averages ``max(count, 1)`` — so a 0/1-sample finalize returns zeros
where the reference's ``M2 / (count - 1)`` (welford.py:36-39) produces
inf/nan that would poison the SNR/noise-scale stats downstream.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class WelfordState(NamedTuple):
    count: jax.Array
    mean: jax.Array
    m2: jax.Array
    norm_estimate: jax.Array          # running sum of ||v||
    squared_norm_estimate: jax.Array  # running sum of ||v||^2


def welford_init(dim: int, dtype=jnp.float32) -> WelfordState:
    return WelfordState(
        count=jnp.zeros((), jnp.float32),
        mean=jnp.zeros((dim,), dtype),
        m2=jnp.zeros((dim,), dtype),
        norm_estimate=jnp.zeros((), dtype),
        squared_norm_estimate=jnp.zeros((), dtype),
    )


def welford_update(state: WelfordState, vector: jax.Array) -> WelfordState:
    count = state.count + 1
    delta = vector - state.mean
    mean = state.mean + delta / count
    corrected = vector - mean
    sq = jnp.sum(vector * vector)
    return WelfordState(
        count=count,
        mean=mean,
        m2=state.m2 + delta * corrected,
        norm_estimate=state.norm_estimate + jnp.sqrt(sq),
        squared_norm_estimate=state.squared_norm_estimate + sq,
    )


def welford_merge(a: WelfordState, b: WelfordState) -> WelfordState:
    """Exact parallel combination of two accumulations."""
    count = a.count + b.count
    safe = jnp.maximum(count, 1.0)
    delta = b.mean - a.mean
    mean = a.mean + delta * (b.count / safe)
    m2 = a.m2 + b.m2 + delta * delta * (a.count * b.count / safe)
    return WelfordState(count=count, mean=mean, m2=m2,
                        norm_estimate=a.norm_estimate + b.norm_estimate,
                        squared_norm_estimate=a.squared_norm_estimate + b.squared_norm_estimate)


def welford_finalize(state: WelfordState):
    """Returns (mean, sample_variance, sample_std, avg_norm, avg_squared_norm)."""
    variance = state.m2 / jnp.maximum(state.count - 1, 1.0)
    std = jnp.sqrt(variance)
    return (state.mean, variance, std,
            state.norm_estimate / jnp.maximum(state.count, 1.0),
            state.squared_norm_estimate / jnp.maximum(state.count, 1.0))
