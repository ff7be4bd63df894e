"""Gradient-regularizer numerics: cross-check all implementations.

The reference ships five interchangeable implementations and a derivative
check notebook it does not include (modules.py:224); these tests ARE that
check (SURVEY.md §4): finite differences vs exact HVP vs penalty gradient on
a tiny model, plus the lr/4 coupling and the darts eps rule.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fullbatchtraining_tpu.config import from_dict
from fullbatchtraining_tpu.training.grad_reg import make_grad_regularizer, tree_sqnorm


def _quadratic_problem():
    """loss(p) = 0.5 p^T A p with known Hessian A (per 'image batch')."""
    rng = np.random.default_rng(0)
    m = rng.normal(size=(5, 5))
    A = jnp.asarray(m @ m.T + np.eye(5), jnp.float32)
    params = {"w": jnp.asarray(rng.normal(size=(5,)), jnp.float32)}

    def loss(p, images, labels):
        w = p["w"]
        return 0.5 * w @ A @ w

    def grad_fn(p, batch_stats, images, labels, key):
        return jax.grad(loss)(p, images, labels)

    return A, params, grad_fn


def _cfg(implementation, block=0.5, acc=0.0, eps=1e-2):
    return from_dict({"norm": 2, "block_strength": block, "acc_strength": acc,
                      "eps": eps, "implementation": implementation})


def _run(implementation, block=0.5, acc=0.0, pre=None, lr=0.8):
    A, params, grad_fn = _quadratic_problem()
    reg = make_grad_regularizer(_cfg(implementation, block, acc), grad_fn)
    grads = grad_fn(params, {}, None, None, None)
    out = reg(grads, params, {}, None, None, pre, lr, jax.random.key(0))
    return A, params, grads, out


def _expected(A, grads, block, lr, pre=None, acc=0.0):
    v = block * grads["w"] + (acc * pre["w"] if pre is not None else 0.0)
    return grads["w"] + lr / 4 * (A @ v)


@pytest.mark.parametrize("impl", ["forward-differences", "central-differences",
                                  "autograd", "complex-step",
                                  "forward-differences-legacy"])
def test_variants_match_exact_hvp(impl):
    lr, block = 0.8, 0.5
    A, params, grads, out = _run(impl, block=block, lr=lr)
    expected = _expected(A, grads, block, lr)
    # quadratic problem: even finite differences are exact up to eps noise
    np.testing.assert_allclose(np.asarray(out["w"]), np.asarray(expected),
                               rtol=2e-3, atol=2e-3)


def test_gradpen_reproduces_reference_factor_two():
    """autograd-pen without pre_grads: penalty s*||g||^2 -> 2*s*H@g
    (the reference's coefficient quirk, modules.py:180-194)."""
    lr, block = 0.8, 0.5
    A, params, grads, out = _run("autograd-pen", block=block, lr=lr)
    expected = grads["w"] + lr / 4 * 2 * block * (A @ grads["w"])
    np.testing.assert_allclose(np.asarray(out["w"]), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


def test_acc_strength_mixes_pre_grads():
    lr, block, acc = 0.4, 0.5, 0.3
    A, params, grad_fn = _quadratic_problem()
    grads = grad_fn(params, {}, None, None, None)
    pre = {"w": jnp.asarray(np.random.default_rng(7).normal(size=(5,)), jnp.float32)}
    for impl in ["forward-differences", "autograd", "central-differences"]:
        reg = make_grad_regularizer(_cfg(impl, block, acc), grad_fn)
        out = reg(grads, params, {}, None, None, pre, lr, jax.random.key(0))
        expected = _expected(A, grads, block, lr, pre, acc)
        np.testing.assert_allclose(np.asarray(out["w"]), np.asarray(expected),
                                   rtol=5e-3, atol=5e-3, err_msg=impl)


def test_gradpen_with_pre_grads_matches_formula():
    """With pre_grads the penalty is 1/(2s)||s*g + a*pg||^2 -> H(s*g + a*pg)."""
    lr, block, acc = 0.4, 0.5, 0.3
    A, params, grad_fn = _quadratic_problem()
    grads = grad_fn(params, {}, None, None, None)
    pre = {"w": jnp.asarray(np.random.default_rng(7).normal(size=(5,)), jnp.float32)}
    reg = make_grad_regularizer(_cfg("autograd-pen", block, acc), grad_fn)
    out = reg(grads, params, {}, None, None, pre, lr, jax.random.key(0))
    expected = _expected(A, grads, block, lr, pre, acc)
    np.testing.assert_allclose(np.asarray(out["w"]), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


def test_legacy_fd_ignores_acc_strength():
    lr, block, acc = 0.8, 0.5, 0.9
    A, params, grad_fn = _quadratic_problem()
    grads = grad_fn(params, {}, None, None, None)
    pre = {"w": jnp.ones(5, jnp.float32)}
    reg = make_grad_regularizer(_cfg("forward-differences-legacy", block, acc), grad_fn)
    out = reg(grads, params, {}, None, None, pre, lr, jax.random.key(0))
    expected = _expected(A, grads, block, lr)  # acc ignored
    np.testing.assert_allclose(np.asarray(out["w"]), np.asarray(expected),
                               rtol=2e-3, atol=2e-3)


def test_lr_coupling():
    """The penalty strength is lr/4 * strength (modules.py:192)."""
    A, params, grads, out_lr1 = _run("autograd", lr=1.0)
    _, _, _, out_lr2 = _run("autograd", lr=2.0)
    delta1 = np.asarray(out_lr1["w"] - grads["w"])
    delta2 = np.asarray(out_lr2["w"] - grads["w"])
    np.testing.assert_allclose(delta2, 2 * delta1, rtol=1e-5)


def test_zero_strength_returns_none():
    _, _, grad_fn = _quadratic_problem()
    assert make_grad_regularizer(_cfg("forward-differences", 0.0, 0.0), grad_fn) is None


def test_invalid_implementation_raises():
    _, _, grad_fn = _quadratic_problem()
    with pytest.raises(ValueError):
        make_grad_regularizer(_cfg("not-a-method"), grad_fn)


def test_gradpen_requires_block_strength_for_pre_grads():
    _, _, grad_fn = _quadratic_problem()
    with pytest.raises(ValueError):
        make_grad_regularizer(_cfg("autograd-pen", block=0.0, acc=0.5), grad_fn)
