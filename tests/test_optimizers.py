"""Optimizer numerics: torch-oracle cross-checks, schedules, zoo behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fullbatchtraining_tpu.config import from_dict, load_config
from fullbatchtraining_tpu.training.optimizers import (
    make_lr_schedule,
    torch_adamw,
    torch_sgd,
    wd_mask,
)


def _tree(seed=0):
    rng = np.random.default_rng(seed)
    return {"w": jnp.asarray(rng.normal(size=(4, 3)), jnp.float32),
            "bias": jnp.asarray(rng.normal(size=(3,)), jnp.float32)}


def _torch_params(tree):
    # jax.tree.map rebuilds dicts in sorted-key order; mirror that here so the
    # torch param list stays aligned across updates.
    return {k: torch.nn.Parameter(torch.tensor(np.asarray(tree[k]))) for k in sorted(tree)}


@pytest.mark.parametrize("momentum,dampening,nesterov,wd", [
    (0.9, 0.0, True, 5e-4),
    (0.9, 0.1, False, 0.0),
    (0.0, 0.0, False, 1e-2),
])
def test_sgd_matches_torch(momentum, dampening, nesterov, wd):
    params = _tree()
    tparams = _torch_params(params)
    opt = torch.optim.SGD(list(tparams.values()), lr=0.1, momentum=momentum,
                          dampening=dampening, nesterov=nesterov, weight_decay=wd)
    init, update = torch_sgd(momentum=momentum, dampening=dampening,
                             nesterov=nesterov, weight_decay=wd)
    state = init(params)
    for step in range(4):
        rng = np.random.default_rng(100 + step)
        grads = {k: jnp.asarray(rng.normal(size=v.shape), jnp.float32)
                 for k, v in params.items()}
        for k in tparams:
            tparams[k].grad = torch.tensor(np.asarray(grads[k]))
        opt.step()
        params, state = update(grads, state, params, 0.1)
        for k in tparams:
            np.testing.assert_allclose(tparams[k].detach().numpy(),
                                       np.asarray(params[k]), rtol=1e-5, atol=1e-6)


def test_adamw_matches_torch():
    params = _tree(1)
    tparams = _torch_params(params)
    opt = torch.optim.AdamW(list(tparams.values()), lr=0.01, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=0.01)
    init, update = torch_adamw(betas=(0.9, 0.999), eps=1e-8, weight_decay=0.01)
    state = init(params)
    for step in range(4):
        rng = np.random.default_rng(200 + step)
        grads = {k: jnp.asarray(rng.normal(size=v.shape), jnp.float32)
                 for k, v in params.items()}
        for k in tparams:
            tparams[k].grad = torch.tensor(np.asarray(grads[k]))
        opt.step()
        params, state = update(grads, state, params, 0.01)
        for k in tparams:
            np.testing.assert_allclose(tparams[k].detach().numpy(),
                                       np.asarray(params[k]), rtol=1e-4, atol=1e-6)


def test_wd_mask_excludes_bias_and_gains():
    params = {"conv": {"kernel": jnp.zeros((3, 3)), "bias": jnp.zeros(3)},
              "skip": {"skip_gain": jnp.zeros(())},
              "ws": {"gain": jnp.zeros(4)}}
    mask = wd_mask(params)
    assert mask["conv"]["kernel"] is True
    assert mask["conv"]["bias"] is False
    assert mask["skip"]["skip_gain"] is False
    assert mask["ws"]["gain"] is False


def _hyp(scheduler, steps=100, warmup=0, lr=0.4):
    return from_dict({"optim": {"lr": lr}, "scheduler": scheduler,
                      "steps": steps, "warmup": warmup})


def test_cosine_schedule_matches_torch():
    sched = make_lr_schedule(_hyp("cosine-decay", steps=100))
    p = [torch.nn.Parameter(torch.zeros(1))]
    opt = torch.optim.SGD(p, lr=0.4)
    tsched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, 100, eta_min=0.0)
    for step in range(100):
        np.testing.assert_allclose(float(sched(step)), tsched.get_last_lr()[0],
                                   rtol=1e-4)  # fp32 schedule vs torch fp64
        opt.step()
        tsched.step()


def test_warmup_then_cosine():
    sched = make_lr_schedule(_hyp("cosine-4000", steps=3000, warmup=400, lr=0.8))
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(200)), 0.4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(400)), 0.8, rtol=1e-6)  # cosine start
    assert float(sched(2000)) < 0.8
    # cosine-4000 with 3000 steps never reaches 0
    assert float(sched(2999)) > 0.05


def test_linear_multistep_schedule():
    sched = make_lr_schedule(_hyp("linear", steps=80, lr=1.0))
    # milestones at 80//2.667=29, 80//1.6=50, 80//1.142=70
    assert float(sched(0)) == 1.0
    np.testing.assert_allclose(float(sched(30)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(55)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(sched(75)), 0.001, rtol=1e-6)


def test_fista_sequence():
    from fullbatchtraining_tpu.training.opt.fista import fista

    cfg = from_dict({"lr": 0.1, "fista_mod": [1.0, 1.0, 4.0], "projection": None})
    init, update = fista(cfg)
    params = {"w": jnp.ones(3)}
    state = init(params)
    grads = {"w": jnp.ones(3)}
    # step 1: x+ = 1 - 0.1 = 0.9 ; t1 = (1+sqrt(5))/2 ; a = 0 -> y = x+
    params, state = update(grads, state, params, 0.1)
    np.testing.assert_allclose(np.asarray(params["w"]), 0.9, rtol=1e-6)
    np.testing.assert_allclose(float(state.tk), (1 + np.sqrt(5)) / 2, rtol=1e-6)
    # step 2: x+ = 0.9-0.1 = 0.8, a = (t1-1)/t2 > 0 -> y overshoots below 0.8
    params, state = update(grads, state, params, 0.1)
    assert float(params["w"][0]) < 0.8


def test_agc_unitwise_clip():
    from fullbatchtraining_tpu.training.opt.agc import agc_clip, unitwise_norm

    kernel = jnp.ones((3, 3, 8, 4))  # HWIO
    assert unitwise_norm(kernel).shape == (1, 1, 1, 4)
    params = {"conv": {"kernel": kernel * 0.01}}
    grads = {"conv": {"kernel": jnp.ones((3, 3, 8, 4))}}
    clipped = agc_clip(grads, params, clipping=0.01)
    # grad norm per unit = sqrt(72) ~ 8.49 >> 0.01*max(0.0849, 1e-3) -> clipped hard
    assert float(jnp.max(clipped["conv"]["kernel"])) < 1e-3
    # exempt tree disables clipping
    exempt = {"conv": {"kernel": True}}
    same = agc_clip(grads, params, clipping=0.01, exempt=exempt)
    np.testing.assert_array_equal(np.asarray(same["conv"]["kernel"]),
                                  np.asarray(grads["conv"]["kernel"]))


def test_adaptive_clipping_scales_to_recent_max():
    from fullbatchtraining_tpu.training.opt.adaptive_clipping import adaptive_clipped_sgd

    cfg = from_dict({"lr": 0.1, "momentum": 0.0, "dampening": 0.0, "nesterov": False,
                     "weight_decay": 0.0, "interval": 2, "norm_type": 2})
    init, update = adaptive_clipped_sgd(cfg)
    params = {"w": jnp.zeros(4)}
    state = init(params)
    g_small = {"w": jnp.full(4, 0.1)}
    for _ in range(2):  # fill history with small norms
        params, state = update(g_small, state, params, 0.0)
    before = np.asarray(params["w"]).copy()
    g_huge = {"w": jnp.full(4, 100.0)}
    params, state = update(g_huge, state, params, 1.0)
    # step magnitude bounded by the recent-max norm (0.2), not the huge grad
    delta = np.abs(np.asarray(params["w"]) - before)
    assert delta.max() <= 0.2


def test_lars_trust_ratio():
    from fullbatchtraining_tpu.training.opt.lars import wrap_lars

    captured = {}

    def inner(grads, state, params, lr):
        captured["grads"] = grads
        return params, state

    update = wrap_lars(inner, trust_coefficient=0.02, clip=False, eps=1e-8,
                       weight_decay=0.0)
    params = {"w": jnp.full(4, 2.0)}
    grads = {"w": jnp.full(4, 1.0)}
    update(grads, None, params, 0.1)
    # adaptive lr = 0.02*||p||/||g|| = 0.02*4/2 = 0.04 -> grads scaled by 0.04
    np.testing.assert_allclose(np.asarray(captured["grads"]["w"]), 0.04, rtol=1e-5)


@pytest.mark.skipif(not __import__("pathlib").Path(
    "/root/reference/fullbatch/training/additional_optimizers/scheduler.py").exists(),
    reason="reference repo not mounted")
def test_warmup_schedule_matches_reference_oracle():
    """lr(t) parity with the reference's GradualWarmupScheduler chained onto
    CosineAnnealingLR (the fb2/gradreg recipe: warmup 400 + cosine-4000)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_sched",
        "/root/reference/fullbatch/training/additional_optimizers/scheduler.py")
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)

    p = [torch.nn.Parameter(torch.zeros(1))]
    opt = torch.optim.SGD(p, lr=0.8)
    after = torch.optim.lr_scheduler.CosineAnnealingLR(opt, 4000, eta_min=0.0)
    ref = module.GradualWarmupScheduler(opt, multiplier=1.0, total_epoch=400,
                                        after_scheduler=after)
    mine = make_lr_schedule(_hyp("cosine-4000", steps=3000, warmup=400, lr=0.8))
    for step in range(1200):
        np.testing.assert_allclose(float(mine(step)), opt.param_groups[0]["lr"],
                                   rtol=5e-4, atol=1e-7)
        opt.step()
        ref.step()


def test_closure_wd_honors_linear_only_exemption(config_dir):
    """Line-search closures apply weight decay per parameter group: bias/gain
    parameters are exempt under hyp.only_linear_layers_weight_decay
    (reference optimizers.py:14-21 + per-group wd in the line searches)."""
    import jax.numpy as jnp

    from fullbatchtraining_tpu.config import load_config
    from fullbatchtraining_tpu.training.opt.closures import apply_wd, wd_factors

    cfg = load_config(config_dir, overrides=[
        "hyp=fb1", "hyp.optim.weight_decay=0.5",
        "hyp.only_linear_layers_weight_decay=True"])
    params = {"dense": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))},
              "norm": {"scale": jnp.ones((2,)), "bias": jnp.ones((2,))}}
    grads = jax.tree.map(jnp.zeros_like, params)
    out = apply_wd(grads, params, wd_factors(params, cfg.hyp))
    assert float(out["dense"]["kernel"].sum()) == pytest.approx(2.0)  # 0.5*4
    assert float(out["dense"]["bias"].sum()) == 0.0                   # exempt
    assert float(out["norm"]["bias"].sum()) == 0.0                    # exempt

    cfg.hyp.only_linear_layers_weight_decay = False
    out = apply_wd(grads, params, wd_factors(params, cfg.hyp))
    assert float(out["dense"]["bias"].sum()) == pytest.approx(1.0)    # decayed


def test_warmup_boundary_matches_reference_exactly():
    """The reference GradualWarmupScheduler holds the base lr at steps
    warmup AND warmup+1 (the after-scheduler starts counting one step
    later); verified exactly for the fast-moving exponential schedule."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_sched",
        "/root/reference/fullbatch/training/additional_optimizers/scheduler.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    p = [torch.nn.Parameter(torch.zeros(1))]
    opt = torch.optim.SGD(p, lr=0.8)
    after = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=0.99)
    tsched = ref.GradualWarmupScheduler(opt, multiplier=1.0, total_epoch=4,
                                        after_scheduler=after)
    sched = make_lr_schedule(_hyp("exponential", steps=16, warmup=4, lr=0.8))
    for step in range(16):
        np.testing.assert_allclose(float(sched(step)),
                                   opt.param_groups[0]["lr"], rtol=1e-6,
                                   err_msg=f"step {step}")
        opt.step()
        tsched.step()
