"""Pallas fused BatchNorm vs the pure-JAX twin (values and full backward).

Runs the kernels in interpreter mode on the CPU mesh; the on-chip timing
comparison lives in tools/pallas_bn_bench.py / VALIDATION.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fullbatchtraining_tpu.ops import pallas_bn


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pallas_bn, "_INTERPRET", True)


def _rand(shape, dtype, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape), dtype)


@pytest.mark.parametrize("shape,dtype", [
    ((4, 8, 8, 64), jnp.float32),
    ((2, 4, 4, 96), jnp.bfloat16),
    ((128, 40), jnp.float32),
])
def test_forward_matches_reference(shape, dtype):
    c = shape[-1]
    x = _rand(shape, dtype)
    scale = _rand((c,), jnp.float32, 1) * 0.5 + 1.0
    bias = _rand((c,), jnp.float32, 2)
    assert pallas_bn.supported(x)
    y, mean, var = pallas_bn.bn_train(x, scale, bias)
    y_ref, mean_ref, var_ref = pallas_bn.bn_train_reference(x, scale, bias)
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(mean, mean_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(var, var_ref, rtol=1e-5, atol=1e-6)


def test_backward_matches_reference():
    # full BN backward: mean/var are functions of x, so dx includes the
    # reduction terms - compare whole grads vs autodiff of the pure twin
    x = _rand((4, 8, 8, 64), jnp.float32)
    scale = _rand((64,), jnp.float32, 1) * 0.5 + 1.0
    bias = _rand((64,), jnp.float32, 2)
    cot = _rand((4, 8, 8, 64), jnp.float32, 3)

    def loss_pallas(x, s, b):
        y, _, _ = pallas_bn.bn_train(x, s, b)
        return jnp.sum(y * cot)

    def loss_ref(x, s, b):
        y, _, _ = pallas_bn.bn_train_reference(x, s, b)
        return jnp.sum(y * cot)

    g = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, scale, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g, g_ref):
        np.testing.assert_allclose(a, b_, rtol=2e-5, atol=2e-6)


def test_mean_var_cotangents():
    # the mean/var outputs feed running-stat updates; their cotangents are
    # zero in training but the vjp must still be correct when they are not
    x = _rand((2, 4, 4, 32), jnp.float32)
    scale = jnp.ones((32,))
    bias = jnp.zeros((32,))

    def agg_pallas(x):
        y, mean, var = pallas_bn.bn_train(x, scale, bias)
        return jnp.sum(y) + jnp.sum(mean * 3.0) + jnp.sum(var * 0.5)

    def agg_ref(x):
        y, mean, var = pallas_bn.bn_train_reference(x, scale, bias)
        return jnp.sum(y) + jnp.sum(mean * 3.0) + jnp.sum(var * 0.5)

    np.testing.assert_allclose(jax.grad(agg_pallas)(x), jax.grad(agg_ref)(x),
                               rtol=2e-5, atol=2e-6)


def test_unsupported_shapes_fall_back():
    # row count 12 has no 16-divisible tile; float64 is the oracle path
    assert not pallas_bn.supported(jnp.zeros((3, 4, 37)))
    assert not pallas_bn.supported(np.zeros((4, 4, 8), np.float64))
