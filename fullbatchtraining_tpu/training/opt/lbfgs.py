"""Multi-batch L-BFGS with Powell damping and Armijo/Wolfe line search.

Behavioral re-implementation of the reference L-BFGS
(/root/reference/fullbatch/training/additional_optimizers/lbfgs.py, itself
based on Shi & Mudigere's multi-batch L-BFGS): two-loop recursion over a
(s, y) history with H_diag = ys/yy scaling (lbfgs.py:277-321), curvature-pair
rejection ys > eps * sBs with optional Powell damping
y <- theta*y + (1-theta)*Bs (lbfgs.py:323-391), and a closure-driven line
search ('None' | 'Armijo' backtracking | 'Wolfe' bracketing, lbfgs.py:397+).

Each closure evaluation is a full jitted dataset pass; the quasi-Newton
bookkeeping operates on the raveled parameter vector on device, with the
search logic in Python (reference semantics: every closure call re-walks the
dataset, SURVEY.md §3.1).

``impl.shard_opt_vectors`` (ZeRO-style, beyond the reference): every driver
vector — the m (s, y) curvature pairs, prev_flat_grad, Bs, d and the wd
factors — is laid out evenly split across the mesh's data axis instead of
replicated, so quasi-Newton memory per chip shrinks by n_devices (at
ImageNet scale, history_size=10 over a 60M-param model is 4.8 GB replicated
vs 0.6 GB/chip on 8 chips). Every dot in the two-loop recursion becomes a
local partial dot + one scalar psum riding XLA's computation-follows-data
propagation; the vector arithmetic stays local to each shard. The math is
identical up to dot-product reduction order (equality-tested at 1e-6 against
the replicated driver); the reference has no distributed-optimizer
equivalent (its LBFGS state is replicated per rank, lbfgs.py:241-259).
"""

from __future__ import annotations

import logging
import math
import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

log = logging.getLogger(__name__)


def _is_legal(v: float) -> bool:
    return math.isfinite(v)


def _polyinterp_min(points):
    """Minimizer of the interpolating polynomial through (x, f, g) rows
    (g = nan when unknown), clamped to [min x, max x] — the reference's
    polyinterp with default bounds (lbfgs.py:30-120, after minFunc)."""
    pts = np.asarray(points, float)
    order = int(np.sum(~np.isnan(pts[:, 1:3]))) - 1
    x_lo, x_hi = float(pts[:, 0].min()), float(pts[:, 0].max())
    bisect = 0.5 * (x_lo + x_hi)
    if len(pts) == 2 and order == 2 and pts[0, 0] == 0.0:
        denom = 2.0 * (pts[1, 1] - pts[0, 1] - pts[0, 2] * pts[1, 0])
        if denom == 0:
            return bisect
        return float(np.clip(-pts[0, 2] * pts[1, 0] ** 2 / denom, x_lo, x_hi))
    # general case: solve for descending-power coefficients, minimize over
    # real critical points within bounds plus the bounds themselves
    A, b = [], []
    for x, f, g in pts:
        if not np.isnan(f):
            A.append([x ** (order - j) for j in range(order + 1)])
            b.append(f)
        if not np.isnan(g):
            A.append([(order - j) * x ** max(order - j - 1, 0)
                      for j in range(order)] + [0.0])
            b.append(g)
    try:
        coeffs = np.linalg.solve(np.asarray(A), np.asarray(b))
    except np.linalg.LinAlgError:
        return bisect
    dcoeffs = np.polyder(coeffs)
    candidates = [x_lo, x_hi]
    for r in np.roots(dcoeffs) if len(dcoeffs) else []:
        if abs(r.imag) < 1e-12 and x_lo <= r.real <= x_hi:
            candidates.append(float(r.real))
    vals = [float(np.polyval(coeffs, c)) for c in candidates]
    best = candidates[int(np.argmin(vals))]
    return best if math.isfinite(best) else bisect


class LBFGSDriver:
    def __init__(self, fns, cfg):
        o = cfg.hyp.optim
        self.fns = fns
        self.lr = float(o.lr)
        self.history_size = int(o.history_size)
        self.line_search = str(o.line_search)
        self.eps = float(o.eps)
        self.damping = bool(o.damping)
        self.eta = float(o.eta)
        self.c1 = float(o.c1)
        self.c2 = float(o.get("c2", 0.9))
        self.max_ls = int(o.get("max_linesearches", 10))
        self.weight_decay = float(o.get("weight_decay", 0.0))
        self.hyp = cfg.hyp
        self._wd_flat = None  # flat per-element wd factors (lazy, needs params)
        self._size = None     # unpadded flat-parameter length (set per step)

        # ZeRO-style vector sharding (module docstring): flat driver vectors
        # split across the mesh's data axis, zero-padded to a multiple of it.
        self._vec_sharding = None
        mesh = getattr(fns, "mesh", None)
        if (mesh is not None and mesh.devices.size > 1
                and bool(getattr(cfg, "impl", {}).get("shard_opt_vectors", False))):
            from jax.sharding import NamedSharding, PartitionSpec
            self._vec_sharding = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
            self._rep_sharding = NamedSharding(mesh, PartitionSpec())
            self._n_shards = mesh.devices.size
            # Multi-process meshes cannot reshard eagerly (device_put across
            # non-addressable devices raises); a jitted identity with
            # out_shardings is the SPMD-safe scatter/gather. Compiled once.
            self._scatter = jax.jit(lambda v: v, out_shardings=self._vec_sharding)
            self._gather = jax.jit(lambda v: v, out_shardings=self._rep_sharding)

        # quasi-Newton memory (device vectors, python-list history)
        self.s_hist: list[jax.Array] = []
        self.y_hist: list[jax.Array] = []
        self.H_diag = 1.0
        self.prev_flat_grad = None
        self.d = None
        self.t = 1.0
        self.Bs = None
        self.fail = False
        self.n_iter = 0
        self.curv_skips = 0
        self.fail_skips = 0
        self._unravel = None
        self._bn_cur = None  # chained batch stats across closure evals

    # -- checkpoint-resume state (reference checkpoints optimizer.state_dict
    # in its 5-tuple, training/utils.py:43-51) ------------------------------
    def get_state(self):
        """Checkpoint payload, always shard- and padding-free.

        Sharded vectors gather through ``_unshard`` (which also strips the
        padding) so multi-process runs work too — the gather is a collective,
        so under process_count>1 EVERY process must call get_state even
        though only rank 0 writes the file (save_driver_state does this)."""
        def host(v):
            if v is None:
                return np.zeros((0,), np.float32)
            return np.asarray(self._unshard(v))
        return {"s_hist": [host(v) for v in self.s_hist],
                "y_hist": [host(v) for v in self.y_hist],
                "H_diag": float(self.H_diag), "t": float(self.t),
                "n_iter": int(self.n_iter), "curv_skips": int(self.curv_skips),
                "fail_skips": int(self.fail_skips), "fail": bool(self.fail),
                "prev_flat_grad": host(self.prev_flat_grad),
                "Bs": host(self.Bs), "d": host(self.d)}

    def set_state(self, p):
        def track(v):
            """Shard one unpadded checkpoint vector, recording its length so
            a get_state BEFORE the first step (preemption mid-stage) strips
            the padding instead of leaking it into the next checkpoint."""
            if v is None:
                return None
            v = np.asarray(v)
            if not v.size:
                return None
            self._size = v.shape[0]
            return self._shard(v)
        self.s_hist = [track(v) for v in p.get("s_hist", [])]
        self.y_hist = [track(v) for v in p.get("y_hist", [])]
        self.H_diag = float(p.get("H_diag", 1.0))
        self.t = float(p.get("t", 1.0))
        self.n_iter = int(p.get("n_iter", 0))
        self.curv_skips = int(p.get("curv_skips", 0))
        self.fail_skips = int(p.get("fail_skips", 0))
        self.fail = bool(p.get("fail", False))
        self.prev_flat_grad = track(p.get("prev_flat_grad"))
        self.Bs = track(p.get("Bs"))
        self.d = track(p.get("d"))

    # -- helpers -----------------------------------------------------------
    @staticmethod
    def _flat(tree):
        return ravel_pytree(tree)[0]

    def _shard(self, vec):
        """Place a flat vector split across the data axis (zero-padded to a
        multiple of the mesh size); identity when sharding is off. The
        padding zeros are inert in every dot and axpy the driver does."""
        if self._vec_sharding is None or vec is None:
            return vec
        pad = (-vec.shape[0]) % self._n_shards
        if isinstance(vec, jax.Array):
            if pad:
                vec = jnp.concatenate([vec, jnp.zeros((pad,), vec.dtype)])
            if jax.process_count() > 1:
                return self._scatter(vec)
            return jax.device_put(vec, self._vec_sharding)
        vec = np.asarray(vec)
        if pad:
            vec = np.concatenate([vec, np.zeros((pad,), vec.dtype)])
        # Host value: every process holds it in full, so a plain device_put
        # to the global sharding is valid even under multi-process.
        return jax.device_put(vec, self._vec_sharding)

    def _unshard(self, vec):
        """Gather a (padded) sharded vector back to a replicated unpadded
        one — needed to rebuild the parameter pytree and to checkpoint."""
        if self._vec_sharding is None:
            return vec
        if jax.process_count() > 1:
            return self._gather(vec)[:self._size]
        return jax.device_put(vec, self._rep_sharding)[:self._size]

    def _ensure_wd(self, params):
        """Flat per-element wd factors honoring
        hyp.only_linear_layers_weight_decay (reference per-group wd)."""
        if self.weight_decay and self._wd_flat is None:
            from .closures import wd_factors
            wdt = wd_factors(params, self.hyp)
            full = jax.tree.map(lambda pp, w: jnp.full(pp.shape, w, pp.dtype),
                                params, wdt)
            self._wd_flat = self._shard(ravel_pytree(full)[0])

    def _eval(self, state, images, labels, flat_params):
        """One closure evaluation. Norm running stats chain through EVERY
        evaluation in call order (self._bn_cur): the reference closure runs a
        train-mode forward on each call (reference training.py:10-23), so
        each call applies one EMA update to the module stats — the stats
        after the step are those of the LAST evaluation, accepted or not
        (same chaining the SGD line-search drivers in closures.py mirror)."""
        probe = state.replace(params=self._unravel(self._unshard(flat_params)),
                              batch_stats=self._bn_cur)
        grads, bn, metrics = self.fns.gradient_eval(probe, images, labels)
        self._bn_cur = bn
        g = self._shard(self._flat(grads))
        if self.weight_decay:
            g = g + self._wd_flat * flat_params
        return float(metrics["train_loss"]), g, bn, metrics

    def two_loop_recursion(self, vec):
        """Hv via the standard two-loop recursion (lbfgs.py:277-321)."""
        q = vec
        alphas = []
        rhos = [1.0 / float(jnp.vdot(y, s)) for s, y in zip(self.s_hist, self.y_hist)]
        for s, y, rho in zip(reversed(self.s_hist), reversed(self.y_hist),
                             reversed(rhos)):
            a = float(jnp.vdot(s, q)) * rho
            alphas.append(a)
            q = q - a * y
        r = q * self.H_diag
        for (s, y, rho), a in zip(zip(self.s_hist, self.y_hist, rhos),
                                  reversed(alphas)):
            beta = float(jnp.vdot(y, r)) * rho
            r = r + (a - beta) * s
        return r

    def curvature_update(self, flat_grad):
        """Accept/damp/reject the (s, y) pair (lbfgs.py:323-391).

        QUIRK, mirrored: s = d*t in the UNSCALED line-search units
        (lbfgs.py:359) while the actual parameter displacement is t*lr*d —
        at lr != 1 (e.g. during warmup) the curvature pairs and H_diag are
        scaled by 1/lr. The Wolfe/Armijo line search absorbs the scale, and
        matching the reference trajectory-for-trajectory requires mirroring
        it (trajectory-oracle verified)."""
        if self.fail:
            self.fail_skips += 1
            return
        y = flat_grad - self.prev_flat_grad
        s = self.d * self.t
        sBs = float(jnp.vdot(s, self.Bs))
        ys = float(jnp.vdot(y, s))
        if (ys > self.eps * sBs or self.damping) and float(jnp.vdot(s, s)) > 0:
            # The zero-pair guard is a documented FIX: the reference appends
            # (s=0, y) whenever damping is on (e.g. after a zero first-step
            # pseudo-gradient at wd=0) and then divides by y.s = 0 in the
            # two-loop recursion, NaN-ing the run (lbfgs.py:363-383 + :305).
            if self.damping and ys < self.eps * sBs and sBs != ys:
                theta = ((1 - self.eps) * sBs) / (sBs - ys)
                y = theta * y + (1 - theta) * self.Bs
                # QUIRK, mirrored: the reference scales H_diag with the
                # PRE-damping ys while the stored pair holds the damped y
                # (lbfgs.py:358-383) — ys is deliberately NOT recomputed.
            if float(jnp.vdot(y, s)) == 0.0:
                self.curv_skips += 1  # degenerate pair: rho would divide by 0
                return
            if len(self.s_hist) == self.history_size:
                self.s_hist.pop(0)
                self.y_hist.pop(0)
            self.s_hist.append(s)
            self.y_hist.append(y)
            yy = float(jnp.vdot(y, y))
            if yy > 0:
                self.H_diag = ys / yy
        else:
            self.curv_skips += 1

    # -- line searches ------------------------------------------------------
    def _armijo(self, phi, F_k, gtd):
        """Armijo backtracking with minFunc polynomial interpolation
        (reference lbfgs.py:436-500): factor shrink on the first/illegal
        trial, 2-point quadratic on the second, 3-point cubic through the
        previous trial afterwards, all clamped to [1e-3, 0.6]*t. t in
        reference units (starts at 1; lr lives in the evaluation)."""
        t = 1.0
        t_prev, F_prev = 0.0, float("nan")
        ls_step = 0
        F_new = phi(t)
        while F_new > F_k + self.c1 * t * gtd or not _is_legal(F_new):
            if ls_step >= self.max_ls:
                # the reference restores the params and re-evaluates the
                # closure at t=0 (lbfgs.py:458-461): one more eval, chaining
                # the BN stats through the restored point
                F_new = phi(0.0)
                return 0.0, F_new, True
            t_new = t
            if ls_step == 0 or not _is_legal(F_new):
                t = t / self.eta
            elif ls_step == 1 or not math.isfinite(F_prev):
                t = _polyinterp_min([(0.0, F_k, gtd),
                                     (t_new, F_new, float("nan"))])
            else:
                t = _polyinterp_min([(0.0, F_k, gtd),
                                     (t_new, F_new, float("nan")),
                                     (t_prev, F_prev, float("nan"))])
            t = min(max(t, 1e-3 * t_new), 0.6 * t_new)
            F_prev, t_prev = F_new, t_new
            F_new = phi(t)
            ls_step += 1
        return t, F_new, False

    @staticmethod
    def _quadinterp(x1, f1, g1, x2, f2):
        """minFunc 2-point quadratic minimizer, clamped to [min x, max x]
        (reference polyinterp explicit branch, lbfgs.py:67-83)."""
        lo, hi = min(x1, x2), max(x1, x2)
        if x1 == 0:
            denom = 2.0 * (f2 - f1 - g1 * x2)
            x = -g1 * x2 ** 2 / denom if denom != 0 else 0.5 * (lo + hi)
        else:
            a = -(f1 - f2 - g1 * (x1 - x2)) / (x1 - x2) ** 2
            x = x1 - g1 / (2 * a) if a != 0 else 0.5 * (lo + hi)
        if not math.isfinite(x):
            x = 0.5 * (lo + hi)
        return float(min(max(lo, x), hi))

    def _wolfe(self, phi_grad, F_k, gtd):
        """Weak-Wolfe bracketing, mirroring the reference loop structure
        exactly (lbfgs.py:515-612): t in reference units (starts at 1, the
        lr multiplier lives in the evaluation), eta growth / bisection while
        the upper bound is unknown, minFunc quadratic interpolation through
        (alpha, F_a, g_a)-(beta, F_b) once it is, with the reference's clamp
        rules — including its (beta-alpha)/2 upper clamp (upstream
        PyTorch-LBFGS behavior, kept for trajectory parity).

        FIX vs reference (NaN-producing defect, PARITY.md policy): the
        reference's Wolfe loop (lbfgs.py:539-554) tests only the two Wolfe
        inequalities, both of which are False for a NaN trial loss, so an
        overflowed evaluation is RETURNED as a successful step and the run
        dies at the divergence check. Here an illegal F_new is treated as an
        Armijo violation (upper bound -> bisection), exactly as the
        reference's own Armijo branch treats illegal losses (lbfgs.py:464)."""
        t = 1.0
        ls_step = 0
        t_prev = 0.0
        alpha, beta = 0.0, float("inf")
        F_a, g_a = F_k, gtd
        F_b = float("nan")
        F_new, g_new = phi_grad(t)
        while True:
            if ls_step >= self.max_ls:
                F_new, g_new = phi_grad(0.0)
                return 0.0, F_new, True
            if F_new > F_k + self.c1 * t * gtd or not _is_legal(F_new):
                beta = t
                t_prev = t
                F_b = F_new
            else:
                gtd_new = g_new
                if gtd_new < self.c2 * gtd:
                    alpha = t
                    t_prev = t
                    F_a, g_a = F_new, gtd_new
                else:
                    return t, F_new, False
            if not _is_legal(F_b):
                t = self.eta * t if beta == float("inf") else 0.5 * (alpha + beta)
            else:
                t = self._quadinterp(alpha, F_a, g_a, beta, F_b)
                if beta == float("inf"):
                    t = min(max(t, self.eta * t_prev), 2 * self.eta * t_prev)
                else:
                    if t < alpha + 0.2 * (beta - alpha):
                        t = alpha + 0.2 * (beta - alpha)
                    elif t > (beta - alpha) / 2.0:
                        t = (beta - alpha) / 2.0
                if t <= 0:
                    t = (beta - alpha) / 2.0
            F_new, g_new = phi_grad(t)
            ls_step += 1

    # -- the optimizer step --------------------------------------------------
    def step(self, state, images, labels):
        lr_sched = float(self.fns.schedule(state.step))
        self._ensure_wd(state.params)
        # _unravel is captured from the PARAMS tree (not the gradients, whose
        # leaves are in impl.accumulation_dtype): every probe and the final
        # update must rebuild parameters in the parameter dtype
        theta0, self._unravel = ravel_pytree(state.params)
        self._size = theta0.shape[0]
        theta0 = self._shard(theta0)
        self._bn_cur = state.batch_stats
        loss, g, bn, metrics = self._eval(state, images, labels, theta0)
        if self.n_iter == 0:
            # Reference quirk, mirrored: LBFGS.step gathers param.grad BEFORE
            # any closure has run (lbfgs.py:657 + the train loop's call
            # order), so the first step's direction is built from the
            # zeros+wd*theta views of _gather_flat_grad (lbfgs.py:241-251),
            # not the true gradient. The loss F_k is still the true closure
            # value (the Wolfe branch calls closure() first, lbfgs.py:527).
            g = (self._wd_flat * theta0 if self.weight_decay
                 else jnp.zeros_like(theta0))

        if self.n_iter > 0:
            self.curvature_update(g)
        self.prev_flat_grad = g

        d = -self.two_loop_recursion(g) if self.s_hist else -g * self.H_diag
        gtd = float(jnp.vdot(g, d))
        if gtd > 0:
            # DELIBERATE DEVIATION (documented, PARITY.md policy): the
            # reference feeds a non-descent direction straight into its line
            # search (lbfgs.py:420 has no gtd check), which then backtracks
            # futilely to a failed step while polluting the (s, y) history.
            # Restarting the memory on ascent directions is standard practice
            # (minFunc) and only fires where the reference run is already
            # degenerate.
            log.info("L-BFGS direction is not a descent direction (gtd=%g); "
                     "restarting memory.", gtd)
            self.s_hist, self.y_hist, self.H_diag = [], [], 1.0
            d = -g

        # t is bracketed in the reference's unscaled units (starts at 1);
        # the scheduled lr multiplies inside the evaluation, as the
        # reference's _add_update multiplies by group['lr'] (lbfgs.py:259).
        lr_eff = lr_sched
        cache: dict[float, tuple] = {}

        def eval_at(t):
            if t not in cache:
                cache[t] = self._eval(state, images, labels,
                                      theta0 + (t * lr_eff) * d)
            return cache[t]

        if self.line_search == "Armijo":
            t, F_new, self.fail = self._armijo(lambda tt: eval_at(tt)[0], loss, gtd)
        elif self.line_search == "Wolfe":
            def phi_grad(tt):
                F, g_t, _, _ = eval_at(tt)
                return F, float(jnp.vdot(g_t, d))
            t, F_new, self.fail = self._wolfe(phi_grad, loss, gtd)
        else:  # 'None': fixed steplength (reference t=1, scaled by lr)
            t, self.fail = 1.0, False
            eval_at(t)

        self.d, self.t = d, t
        # B s approximation for Powell damping (lbfgs.py:500-503); unscaled
        # t units as in the reference, see curvature_update.
        self.Bs = -t * g
        self.n_iter += 1

        if t > 0:
            if t in cache:
                _, _, _, metrics = eval_at(t)
            new_params = self._unravel(self._unshard(theta0 + (t * lr_eff) * d))
        else:
            if 0.0 in cache:  # failed search re-evaluated at the restored point
                _, _, _, metrics = cache[0.0]
            new_params = self._unravel(self._unshard(theta0))
        metrics = dict(metrics)
        metrics["lr"] = lr_sched
        metrics["lbfgs_t"] = t
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=self._bn_cur)
        return new_state, metrics
