"""Unit tests for the line-search drivers' reference-exact side semantics.

The fp64 trajectory oracle (test_trajectory_oracle.py) proves the drivers
against the reference's own train() on a no-BN model; these stub-based tests
pin the semantics a no-BN oracle cannot see (sgd_linesearch.py cites):

- norm running stats chain through EVERY closure evaluation — retries and
  Wolfe phi probes run the model forward, so the accepted state carries one
  EMA update per closure call, not one off the pre-step stats (:177-178);
- Wolfe leaves the parameters at the LAST fresh step attempt and never
  re-applies the alpha the search returns (:345);
- a restart leaves a zeros (non-None) momentum buffer, so the redo step is
  (1-dampening)*grad even when it fires on step 0 (:53-56, :90).
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fullbatchtraining_tpu.training.optimizers import SGDState
from fullbatchtraining_tpu.training.training import TrainState


class _Optim(dict):
    """cfg.hyp.optim stand-in: attribute + .get access like OmegaConf."""

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as err:
            raise AttributeError(key) from err


def _cfg(**optim):
    base = dict(momentum=0.0, dampening=0.0, nesterov=False, weight_decay=0.0)
    base.update(optim)
    return types.SimpleNamespace(hyp=types.SimpleNamespace(optim=_Optim(base)))


class _StubFns:
    """gradient_eval returns queued losses, a constant gradient, and a
    batch_stats counter that increments off the INPUT state's stats — so the
    final stats count exactly the closure calls that chained."""

    def __init__(self, losses, grad_value=1.0):
        self.losses = list(losses)
        self.grad = {"w": jnp.full((2,), grad_value)}
        self.calls = 0

    def schedule(self, step):
        return 0.1

    def gradient_eval(self, state, images, labels, with_modifiers=True):
        self.calls += 1
        loss = self.losses.pop(0)
        bn = jax.tree.map(lambda s: s + 1.0, state.batch_stats)
        return self.grad, bn, {"train_loss": jnp.asarray(loss)}


def _state(params=None):
    params = params or {"w": jnp.zeros((2,))}
    return TrainState(step=jnp.asarray(0), params=params,
                      batch_stats={"bn": jnp.asarray(0.0)},
                      opt_state=SGDState(momentum=jax.tree.map(jnp.zeros_like, params),
                                         count=jnp.asarray(0)))


def test_nonmonotone_retries_chain_batch_stats():
    from fullbatchtraining_tpu.training.opt.closures import NonMonotoneLinesearch

    # interval=1: the retry loop engages on the very first driver step.
    # losses: initial eval 5.0, first retry probe 6.0 (still >= max), second
    # retry probe 3.0 (accepted) -> 3 closure calls in total.
    fns = _StubFns([5.0, 6.0, 3.0])
    drv = NonMonotoneLinesearch(fns, _cfg(interval=1, factor=0.25, max_iter=10))
    state, metrics = drv.step(_state(), None, None)

    assert fns.calls == 3
    # stats chained through every closure call (reference torch BN behavior)
    np.testing.assert_allclose(float(state.batch_stats["bn"]), 3.0)
    # stale-grad retry semantics: every retry scales the LATEST closure
    # gradient once by `factor` (the closure overwrote p.grad in between),
    # so with a constant stub gradient each retry attempts the same
    # -lr*factor*g step — no factor^k compounding
    np.testing.assert_allclose(np.asarray(state.params["w"]),
                               -0.1 * 0.25 * np.ones(2), rtol=1e-6)


def test_fista_driver_chains_stats_and_composes_schedule():
    """The FISTA backtracking driver chains running stats through every
    probe (each reference closure call applies one EMA update,
    fista.py:158) and composes the lr schedule's per-step RATIO on top of
    the backtracked lr (the reference steps its chainable scheduler after
    every optimizer step, training.py:285)."""
    from fullbatchtraining_tpu.training.opt.fista import FISTALineSearchDriver

    cfg = _cfg(lr=0.1, eta=0.5, max_searches=5,
               fista_mod=[1.0, 1.0, 4.0], tk=1.0)
    # losses: y_k eval 10.0, first probe violates the descent lemma (1e6),
    # second probe at the halved lr accepts (9.0 <= 10 - 0.1 + dist/lr)
    fns = _StubFns([10.0, 1e6, 9.0])
    fns.schedule = lambda step: 0.1 * (0.5 ** int(step))
    driver = FISTALineSearchDriver(fns, cfg)
    state, metrics = driver.step(_state(), None, None)
    assert fns.calls == 3
    # stats chained through ALL closure evaluations, including the rejected probe
    np.testing.assert_allclose(float(state.batch_stats["bn"]), 3.0)
    # backtracked once (0.1 -> 0.05), then scaled by schedule ratio 0.5
    np.testing.assert_allclose(driver.lr, 0.05 * 0.5, rtol=1e-12)


def test_wolfe_params_stay_at_last_fresh_attempt():
    from fullbatchtraining_tpu.training.opt.closures import WolfeGradientDescent

    # Strongly decreasing losses + constant gradient: |phi'(a)| == -phi'(0),
    # so the curvature condition (c2<1) never holds and alpha grows
    # 1 -> 2.5 -> 6.25 -> alpha_max, which the reference never evaluates —
    # the parameters stay at the alpha=6.25 attempt.
    fns = _StubFns([10.0, 1.0, 0.5, 0.25])
    drv = WolfeGradientDescent(fns, _cfg(c1=1e-4, c2=0.9, alpha_max=10.0,
                                         max_iter=10))
    state, metrics = drv.step(_state(), None, None)

    assert fns.calls == 4  # initial + fresh evals at alpha = 1, 2.5, 6.25
    np.testing.assert_allclose(float(state.batch_stats["bn"]), 4.0)
    np.testing.assert_allclose(np.asarray(state.params["w"]),
                               -0.1 * 6.25 * np.ones(2), rtol=1e-6)
    assert metrics["wolfe_alpha"] == pytest.approx(6.25)


def test_restarting_reset_uses_zeros_buffer_on_step0():
    from fullbatchtraining_tpu.training.opt.closures import RestartingLineSearch

    # interval=1 makes the restart fire on step 0 (loss < loss is False).
    # After _reset_momentum the torch buffer is zeros but NOT None, so the
    # redo step is (1-dampening)*grad — not the first-step buf = grad path.
    fns = _StubFns([5.0])
    drv = RestartingLineSearch(fns, _cfg(momentum=0.9, dampening=0.5,
                                         interval=1))
    state, metrics = drv.step(_state(), None, None)

    np.testing.assert_allclose(np.asarray(state.params["w"]),
                               -0.1 * 0.5 * np.ones(2), rtol=1e-6)


def test_wolfe_nan_trial_zooms_back_to_finite_point():
    """FIX vs reference (same class as the L-BFGS _wolfe fix): a NaN trial
    loss fails every Wolfe comparison, so the reference grows alpha THROUGH
    the overflow to alpha_max and adopts a NaN-loss point as the step
    (sgd_linesearch.py:322-351). Here the NaN counts as an Armijo violation:
    zoom brackets below it and the step lands on a finite point."""
    from fullbatchtraining_tpu.training.opt.closures import WolfeGradientDescent

    # initial 10.0; alpha=1 overflows (nan); zoom bisects to 0.5 -> 5.0,
    # which satisfies weak curvature and is accepted.
    fns = _StubFns([10.0, float("nan"), 5.0])
    drv = WolfeGradientDescent(fns, _cfg(c1=1e-4, c2=0.9, alpha_max=10.0,
                                         max_iter=10))
    state, metrics = drv.step(_state(), None, None)

    assert fns.calls == 3
    assert np.isfinite(float(metrics["train_loss"]))
    np.testing.assert_allclose(np.asarray(state.params["w"]),
                               -0.1 * 0.5 * np.ones(2), rtol=1e-6)
    assert metrics["wolfe_alpha"] == pytest.approx(0.5)
