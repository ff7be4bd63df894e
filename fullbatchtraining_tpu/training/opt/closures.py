"""Closure-based line-search optimizers.

Behavioral re-implementations of the reference's SGD line searches
(/root/reference/fullbatch/training/additional_optimizers/sgd_linesearch.py):
RestartingLineSearch, NonMonotoneLinesearch, WolfeGradientDescent. Matching
the reference's structure, each closure call is a full jitted dataset pass
(fns.gradient_eval), and the search logic runs in Python (SURVEY.md §7:
line-search loops stay in Python with jitted evals). Save/restore of
parameters (sgd_linesearch.py:34-52) is free here - pytrees are immutable.

NonMonotoneLinesearch retries mirror the reference exactly (trajectory-
oracle verified): each retry scales the gradient of the LATEST trial point
once by `factor` (the reference mutates whatever p.grad the last closure
wrote, sgd_linesearch.py:138-145, :166-178) rather than the arguably
intended factor^k * original_gradient.

Further reference semantics mirrored on purpose (they are well-defined
algorithm behavior that shaped the paper's trajectories, not defects -
see PARITY.md row 23 for the policy):
- every closure call runs the model forward, so norm running stats chain
  through retries and Wolfe phi evaluations in call order;
- Wolfe never re-applies the alpha the search returns: the parameters stay
  at the LAST fresh step attempt (sgd_linesearch.py:345), even when zoom
  exits through a cached alpha or a never-evaluated interpolant;
- a restart leaves a zeros (non-None) momentum buffer, so the redo step is
  (1-dampening)*grad even on step 0 (sgd_linesearch.py:53-56).

FIX vs reference — stochastic (per-block) closure mode: the reference's
stochastic loop does ``step_loss = optimizer.step(closure)`` with a closure
that returns the epoch's RUNNING SUM of block losses (training.py:262-281),
but all three line-search ``step()`` methods return None
(sgd_linesearch.py:57-90, :143-178, :283-345), so the second block's
``step_loss += block_loss`` raises TypeError — stochastic + SGD line search
CRASHES in the reference (only plain SGD and L-BFGS, whose steps return a
loss, run). Our per-block drivers receive the block's own loss (the
mathematically intended history/acceptance semantics) rather than
replicating a crash; documented per the PARITY policy. The same applies to
L-BFGS under stochastic mode: the reference feeds within-epoch running
sums — inflated once more per Wolfe re-evaluation — into its Armijo/Wolfe
conditions; we feed the block's actual loss.
"""

from __future__ import annotations

import logging
import math
import jax
import jax.numpy as jnp

from ..grad_reg import tree_add_scaled, tree_scale
from ..optimizers import SGDState

log = logging.getLogger(__name__)


def tree_dot(a, b):
    return sum(jnp.vdot(x, y) for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def _sgd_pieces(cfg_optim):
    return (float(cfg_optim.momentum), float(cfg_optim.dampening),
            bool(cfg_optim.nesterov), float(cfg_optim.weight_decay))


def wd_factors(params, cfg_hyp):
    """Per-leaf weight-decay factors honoring
    hyp.only_linear_layers_weight_decay: the reference's optim_interface
    builds param groups with weight_decay=0 for bias/gain/skip_gain
    (optimizers.py:14-21) and the line searches read the per-group wd."""
    wd = float(cfg_hyp.optim.weight_decay)
    if not wd:
        return None
    if cfg_hyp.get("only_linear_layers_weight_decay", False):
        from ..optimizers import wd_mask
        return jax.tree.map(lambda m: wd if m else 0.0, wd_mask(params))
    return jax.tree.map(lambda _: wd, params)


def apply_wd(grads, params, wdt):
    """grads + wd*params with the per-leaf factors from wd_factors."""
    if wdt is None:
        return grads
    return jax.tree.map(lambda g, p, w: g + w * p, grads, params, wdt)


def _descent_direction(grads, params, opt_state: SGDState, cfg_optim, wdt):
    """torch-SGD direction + momentum-buffer update
    (sgd_linesearch.py:210-244): returns (p_k, new_opt_state, phi0_grad)."""
    momentum, dampening, nesterov, _ = _sgd_pieces(cfg_optim)
    g = apply_wd(grads, params, wdt)
    if momentum:
        first = opt_state.count == 0
        buf = jax.tree.map(lambda b, gg: jnp.where(first, gg, momentum * b + (1 - dampening) * gg),
                           opt_state.momentum, g)
        direction = tree_add_scaled(g, buf, momentum) if nesterov else buf
    else:
        buf = opt_state.momentum
        direction = g
    p_k = tree_scale(direction, -1.0)
    phi0_grad = float(tree_dot(g, p_k))
    return p_k, SGDState(momentum=buf, count=opt_state.count + 1), phi0_grad


def _finish(state, params, opt_state, bn, metrics):
    return state.replace(step=state.step + 1, params=params, opt_state=opt_state,
                         batch_stats=bn), metrics


class _ResumableDriver:
    """Python-side driver scratch persists across checkpoint resume via a
    sidecar (reference checkpoints optimizer.state_dict() in its 5-tuple,
    training/utils.py:43-51)."""

    def get_state(self):
        return {"losses": [float(v) for v in getattr(self, "losses", [])]}

    def set_state(self, payload):
        if "losses" in payload:
            self.losses = [float(v) for v in payload["losses"]]


class RestartingLineSearch(_ResumableDriver):
    """Reset momentum and redo the step when the loss exceeds the maximum of
    the last ``interval`` losses (sgd_linesearch.py:12-90)."""

    def __init__(self, fns, cfg):
        self.fns = fns
        self.hyp = cfg.hyp
        self.optim = cfg.hyp.optim
        self.interval = int(cfg.hyp.optim.get("interval", 10))
        self.losses: list[float] = []

    def step(self, state, images, labels):
        lr = self.fns.schedule(state.step)
        grads, bn, metrics = self.fns.gradient_eval(state, images, labels)
        loss = float(metrics["train_loss"])
        wdt = wd_factors(state.params, self.hyp)
        p_k, opt_state, _ = _descent_direction(grads, state.params, state.opt_state,
                                               self.optim, wdt)
        params = tree_add_scaled(state.params, p_k, lr)

        if not self.losses:
            # the reference seeds the history with the first loss TWICE
            # (state['loss'] = [loss] then falls through to append,
            # sgd_linesearch.py:77-80) - mirrored for trajectory parity
            self.losses.append(loss)
        if len(self.losses) < self.interval:
            self.losses.append(loss)
        else:
            recent_max = max(self.losses[-self.interval:])
            if loss < recent_max:
                self.losses.append(loss)
            else:
                log.info("Recent maximum was %g, but new loss is %g. Resetting momentum...",
                         recent_max, loss)
                # _reset_momentum leaves a zeros (non-None) buffer, so the
                # redo step is always buf = (1-dampening)*g even when the
                # restart fires on step 0 (sgd_linesearch.py:53-56, :90) -
                # force the non-first-step branch of _descent_direction.
                zero = jax.tree.map(jnp.zeros_like, state.opt_state.momentum)
                reset = SGDState(momentum=zero,
                                 count=jnp.maximum(state.opt_state.count, 1))
                p_k, opt_state, _ = _descent_direction(
                    grads, state.params, reset, self.optim, wdt)
                params = tree_add_scaled(state.params, p_k, lr)
        metrics["lr"] = lr
        return _finish(state, params, opt_state, bn, metrics)


class NonMonotoneLinesearch(_ResumableDriver):
    """Retry the step with a factor-shrunk gradient until the loss beats the
    maximum of the last ``interval`` losses (sgd_linesearch.py:93-178)."""

    def __init__(self, fns, cfg):
        self.fns = fns
        self.hyp = cfg.hyp
        self.optim = cfg.hyp.optim
        self.interval = int(cfg.hyp.optim.get("interval", 10))
        self.factor = float(cfg.hyp.optim.get("factor", 0.25))
        self.max_iter = int(cfg.hyp.optim.get("max_iter", 10))
        self.losses: list[float] = []

    def step(self, state, images, labels):
        lr = self.fns.schedule(state.step)
        grads, bn, metrics = self.fns.gradient_eval(state, images, labels)
        loss = float(metrics["train_loss"])
        wdt = wd_factors(state.params, self.hyp)

        def take(gr):
            p_k, opt_state, _ = _descent_direction(gr, state.params,
                                                   state.opt_state, self.optim, wdt)
            return tree_add_scaled(state.params, p_k, lr), opt_state

        params, opt_state = take(grads)

        if not self.losses:
            # reference seeds the history with the first loss twice
            # (sgd_linesearch.py:158-161) - mirrored
            self.losses.append(loss)
        if len(self.losses) < self.interval:
            self.losses.append(loss)
        else:
            # Reference retry semantics, mirrored exactly
            # (sgd_linesearch.py:142-178): each retry restores the initial
            # params/momentum, scales the CURRENT p.grad once by `factor` -
            # which after the first retry is the gradient at the latest
            # TRIAL point, not the original - and the acceptance check
            # compares the latest closure loss (pre-step loss on the first
            # pass, trial-point losses afterwards). An exhausted loop keeps
            # the last trial without recording its loss. Each retry closure
            # runs the model forward, so norm running stats chain across
            # retries - the probe therefore carries the latest batch_stats.
            recent_max = max(self.losses[-self.interval:])
            cur_g = grads
            for _ in range(self.max_iter):
                if loss < recent_max:
                    self.losses.append(loss)
                    break
                log.info("Recent maximum was %g, but new loss is %g. Reducing lr by %g.",
                         recent_max, loss, self.factor)
                cur_g = tree_scale(cur_g, self.factor)
                params, opt_state = take(cur_g)
                probe = state.replace(params=params, batch_stats=bn)
                cur_g, bn, m2 = self.fns.gradient_eval(probe, images, labels)
                loss = float(m2["train_loss"])
        metrics["lr"] = lr
        return _finish(state, params, opt_state, bn, metrics)


class WolfeGradientDescent(_ResumableDriver):
    """Strong-Wolfe line search along the (momentum) descent direction with
    cubic-interpolation zoom (sgd_linesearch.py:183-381, Nocedal & Wright)."""

    def __init__(self, fns, cfg):
        self.fns = fns
        self.hyp = cfg.hyp
        self.optim = cfg.hyp.optim
        self.c1 = float(cfg.hyp.optim.get("c1", 1e-4))
        self.c2 = float(cfg.hyp.optim.get("c2", 0.9))
        self.alpha_max = float(cfg.hyp.optim.get("alpha_max", 10.0))
        self.max_iter = int(cfg.hyp.optim.get("max_iter", 10))

    def _phi(self, state, images, labels, theta0, p_k, lr, alpha, lut, track):
        """phi(a) = loss(theta0 + lr*a*p_k); phi'(a) = (grad+wd*theta) . p_k.

        Fresh (LUT-miss) evaluations mirror a reference closure call: norm
        running stats chain through every evaluation in call order
        (``track["bn"]``), and the evaluation becomes the "last attempted
        step" (``track["last"]``) that the reference leaves the parameters
        at (sgd_linesearch.py:266-272, :345).
        """
        if alpha in lut:
            entry = lut[alpha]
            return entry["val"], entry["grad"], entry
        params = tree_add_scaled(theta0, p_k, lr * alpha)
        probe = state.replace(params=params, batch_stats=track["bn"])
        grads, bn, metrics = self.fns.gradient_eval(probe, images, labels)
        g = apply_wd(grads, params, wd_factors(params, self.hyp))
        entry = {"val": float(metrics["train_loss"]), "grad": float(tree_dot(g, p_k)),
                 "params": params, "bn": bn, "metrics": metrics}
        lut[alpha] = entry
        track["bn"] = bn
        track["last"] = entry
        return entry["val"], entry["grad"], entry

    @staticmethod
    def _interpolate(a1, a2, lut):
        """Cubic interpolation (sgd_linesearch.py:366-381); non-finite
        endpoint values bisect (part of the NaN fix, see _zoom)."""
        if a1 == a2:
            return a1
        if not all(math.isfinite(lut[a]["val"]) and math.isfinite(lut[a]["grad"])
                   for a in (a1, a2)):
            return 0.5 * (a1 + a2)
        quotient = (lut[a1]["val"] - lut[a2]["val"]) / (a1 - a2)
        d_1 = lut[a1]["grad"] + lut[a2]["grad"] - 3 * quotient
        radicand = d_1**2 - lut[a1]["grad"] * lut[a2]["grad"]
        if radicand < 0:
            return 0.5 * (a1 + a2)
        d_2 = math.copysign(1.0, a2 - a1) * math.sqrt(radicand)
        nom = lut[a2]["grad"] + d_2 - d_1
        denom = lut[a2]["grad"] - lut[a1]["grad"] + 2 * d_2
        if denom == 0:
            return 0.5 * (a1 + a2)
        return a2 - (a2 - a1) * nom / denom

    def _zoom(self, alpha_low, alpha_high, phi_eval, phi0, lut):
        for _ in range(self.max_iter):
            if abs(alpha_low - alpha_high) < 1e-4:
                return alpha_low
            alpha = self._interpolate(alpha_low, alpha_high, lut)
            val, grad, _ = phi_eval(alpha)
            sufficient = phi0["val"] + self.c1 * alpha * phi0["grad"]
            if (not math.isfinite(val) or val > sufficient
                    or val > lut[alpha_low]["val"]):
                alpha_high = alpha
            else:
                if grad <= -self.c2 * phi0["grad"]:
                    return alpha
                if grad * (alpha_high - alpha_low) >= 0:
                    alpha_high = alpha_low
                alpha_low = alpha
        return self._interpolate(alpha_low, alpha_high, lut)

    def step(self, state, images, labels):
        lr = float(self.fns.schedule(state.step))
        grads, bn0, metrics = self.fns.gradient_eval(state, images, labels)
        loss = float(metrics["train_loss"])
        theta0 = state.params
        p_k, opt_state, phi0_grad = _descent_direction(
            grads, theta0, state.opt_state, self.optim,
            wd_factors(theta0, self.hyp))
        if phi0_grad > 0:
            log.info("phi'=%g is positive. p_k is not a descent direction.", phi0_grad)

        lut: dict[float, dict] = {0.0: {"val": loss, "grad": phi0_grad,
                                        "params": theta0, "bn": bn0, "metrics": metrics}}
        phi0 = lut[0.0]
        track = {"bn": bn0, "last": phi0}

        def phi_eval(alpha):
            return self._phi(state, images, labels, theta0, p_k, lr, alpha, lut, track)

        alpha, prev_alpha, prev_loss = 1.0, 0.0, float("inf")
        for _ in range(self.max_iter):
            val, grad, _ = phi_eval(alpha)
            sufficient = phi0["val"] + self.c1 * alpha * phi0["grad"]
            # FIX vs reference (NaN-producing defect, PARITY.md policy, same
            # fix as lbfgs.py _wolfe): every comparison below is False for a
            # NaN trial loss, so the reference loop grows alpha THROUGH an
            # overflow until alpha_max and adopts a NaN-loss point as "the
            # last successful step attempt" (sgd_linesearch.py:322-351). An
            # illegal value is treated as an Armijo violation instead: zoom
            # back into the bracket below it.
            if not math.isfinite(val) or val > sufficient or val > prev_loss:
                alpha = self._zoom(prev_alpha, alpha, phi_eval, phi0, lut)
                break
            if abs(grad) <= -self.c2 * phi0["grad"]:
                break
            if grad >= 0:
                alpha = self._zoom(alpha, prev_alpha, phi_eval, phi0, lut)
                break
            # QUIRK mirrored: the reference initializes prev_loss = inf and
            # never updates it inside the loop (sgd_linesearch.py:315,
            # :340-341), so its 'val > prev_loss' zoom trigger is DEAD code
            # (textbook Nocedal-Wright would compare against the previous
            # trial's value); keep it dead for trajectory parity.
            prev_alpha = alpha
            last_evaluated = alpha
            alpha = min(alpha * 2.5, self.alpha_max)
            if alpha == self.alpha_max:
                # bracket exhausted growing: the reference does NOT take a
                # final step at the grown alpha — "the last step attempt
                # counts as successful" (sgd_linesearch.py:348-351)
                alpha = last_evaluated
                break
        else:
            alpha = prev_alpha  # max_iter attempts: keep the last evaluated

        # The reference never re-applies the returned alpha: its parameters
        # stay wherever the LAST fresh _attempt_step landed ("the last step
        # attempt counts as successful", sgd_linesearch.py:345) - even when
        # zoom exits through a cached alpha or returns a never-evaluated
        # interpolant. Mirror that exactly instead of materializing `alpha`.
        chosen = track["last"]
        metrics = dict(chosen["metrics"])
        metrics["lr"] = lr
        metrics["wolfe_alpha"] = alpha
        return _finish(state, chosen["params"], opt_state, chosen["bn"], metrics)


_DRIVERS = {
    "restarting": RestartingLineSearch,
    "non-monotone": NonMonotoneLinesearch,
    "wolfe": WolfeGradientDescent,
}


class _BlockFns:
    """TrainFunctions facade the closure drivers are ALWAYS built over.

    With ``bidx=None`` (the default, full-batch mode) gradient_eval
    delegates to the full-dataset program; with an integer ``bidx``
    (stochastic mode) it is the per-block stochastic closure program
    (pmean'd block gradient, grad-reg with pre_grads=None, 2-norm clip only
    - reference training.py:257-276), keyed by the block index so
    augmentation/dropout draws differ per block. One facade per driver lets
    a single driver object - and therefore a single loss-history/scratch
    and one resume sidecar - serve both modes, exactly like the reference's
    single persistent optimizer instance across train_switch_stochastic."""

    def __init__(self, fns):
        self._fns = fns
        self.schedule = fns.schedule
        self.bidx = None

    def gradient_eval(self, state, images, labels, with_modifiers=True):
        if self.bidx is None:
            return self._fns.gradient_eval(state, images, labels,
                                           with_modifiers=with_modifiers)
        return self._fns.block_gradient_eval(state, images, labels, self.bidx)

    def __getattr__(self, name):  # anything else: the real TrainFunctions
        return getattr(self._fns, name)


def make_stochastic_closure_step(cfg, fns, kind: str, driver=None):
    """Per-block closure optimization in stochastic mode.

    Mirrors the reference's stochastic path, where optimizer.step(closure)
    runs once per mini-batch block with the closure re-evaluating that block
    (training.py:241-286). The line-search driver runs per block against the
    per-block gradient program; the step counter (and thus the lr schedule)
    advances once per epoch; epoch metrics aggregate over all blocks.

    Pass the run's existing ``driver`` so its scratch (loss histories,
    L-BFGS curvature pairs) carries across stochastic blocks, mode switches,
    and checkpoint resume - the reference persists one optimizer object for
    the whole run and checkpoints its state_dict.
    """
    driver = driver if driver is not None else make_closure_step(fns, cfg, kind)
    block_fns, driver_step = driver.fns, driver.step
    num_blocks = fns.layout[0]

    def step(state, images, labels):
        epoch_step = state.step
        loss_sum, acc_sum = 0.0, 0.0
        metrics = {}
        for block in range(num_blocks):
            block_fns.bidx = block
            bi, bl = images[block:block + 1], labels[block:block + 1]
            if fns.streamed:
                # Host-resident epoch (streamed mode): ship one block at a
                # time to the sharded per-block gradient program.
                from ...parallel.mesh import shard_epoch_arrays
                bi, bl = shard_epoch_arrays(fns.mesh, bi, bl)
            state, metrics = driver_step(state, bi, bl)
            state = state.replace(step=epoch_step)  # lr fixed within the epoch
            loss_sum += float(metrics["train_loss"])
            acc_sum += float(metrics["train_acc"])
        block_fns.bidx = None  # back to full-batch mode (train_switch_stochastic)
        state = state.replace(step=epoch_step + 1)
        metrics = dict(metrics)
        metrics["train_loss"] = loss_sum / num_blocks
        metrics["train_acc"] = acc_sum / num_blocks
        return state, metrics

    return step


def make_closure_step(fns, cfg, kind: str):
    """Return the driver OBJECT (call driver.step(state, images, labels));
    drivers expose get_state/set_state for checkpoint resume. The driver is
    built over a _BlockFns facade so the same object can also drive the
    stochastic per-block mode (make_stochastic_closure_step)."""
    fns = fns if isinstance(fns, _BlockFns) else _BlockFns(fns)
    if kind == "lbfgs":
        from .lbfgs import LBFGSDriver
        return LBFGSDriver(fns, cfg)
    if kind == "fista-search":
        from .fista import FISTALineSearchDriver
        return FISTALineSearchDriver(fns, cfg)
    if kind not in _DRIVERS:
        raise ValueError(f"Invalid linesearch {kind} defined.")
    return _DRIVERS[kind](fns, cfg)
