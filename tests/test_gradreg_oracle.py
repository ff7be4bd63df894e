"""Golden parity: our gradient regularizer vs the reference GradRegularizer.

Loads the reference's modules.py (torch-only, read-only oracle, skipped when
the reference repo is not mounted), builds a tiny linear classifier with
identical weights in torch and jax, and compares the regularized gradients of
every runnable implementation variant to float tolerance. This validates the
lr/4 coupling, the darts eps rule, and the FD/central/autograd formulas
against the actual reference code rather than a re-derivation.
"""

import importlib.util
import pathlib
import sys
import types

import numpy as np
import pytest

REF_MODULES = pathlib.Path("/root/reference/fullbatch/models/modules.py")

pytestmark = pytest.mark.skipif(not REF_MODULES.exists(),
                                reason="reference repo not mounted")


@pytest.fixture(autouse=True)
def _patch_foreach_for_modern_torch(monkeypatch):
    """The reference targets torch 1.9, where _foreach_add_ accepted a 0-d
    tensor alpha (used for the darts eps, modules.py:226) and permitted
    in-place foreach on grad-requiring leaves. Shim both so the oracle runs
    unmodified; monkeypatch restores the originals after each test."""
    import torch

    for name in ("_foreach_add_", "_foreach_sub_"):
        original = getattr(torch, name)

        def patched(tensors, others, alpha=1, _orig=original):
            if isinstance(alpha, torch.Tensor):
                alpha = alpha.item()
            with torch.no_grad():
                return _orig(tensors, others, alpha=alpha)

        monkeypatch.setattr(torch, name, patched)


def _load_ref_modules():
    pkg = types.ModuleType("refmodels2")
    pkg.__path__ = [str(REF_MODULES.parent)]
    sys.modules["refmodels2"] = pkg
    spec = importlib.util.spec_from_file_location("refmodels2.modules", REF_MODULES)
    module = importlib.util.module_from_spec(spec)
    module.__package__ = "refmodels2"
    sys.modules["refmodels2.modules"] = module
    spec.loader.exec_module(module)
    return module


@pytest.mark.parametrize("implementation,block,acc", [
    ("forward-differences", 0.5, 0.0),
    ("forward-differences", 0.5, 0.3),
    ("forward-differences-legacy", 0.5, 0.0),
    ("central-differences", 0.5, 0.0),
    ("autograd", 0.5, 0.0),
    ("autograd-pen", 0.5, 0.0),
    ("autograd-pen", 0.5, 0.3),
])
def test_gradreg_matches_reference_oracle(implementation, block, acc):
    import torch

    import jax
    import jax.numpy as jnp

    from fullbatchtraining_tpu.config import from_dict
    from fullbatchtraining_tpu.training.grad_reg import make_grad_regularizer

    ref = _load_ref_modules()
    rng = np.random.default_rng(0)
    w = rng.normal(size=(5, 12)).astype(np.float32)  # torch Linear: (out, in)
    b = rng.normal(size=(5,)).astype(np.float32)
    inputs = rng.normal(size=(8, 12)).astype(np.float32)
    labels = rng.integers(0, 5, 8)
    pre = {"w": jnp.asarray(rng.normal(size=(12, 5)), jnp.float32),
           "b": jnp.asarray(rng.normal(size=(5,)), jnp.float32)}
    lr, eps = 0.8, 1e-2

    # ---- reference side -------------------------------------------------
    tmodel = torch.nn.Linear(12, 5)
    with torch.no_grad():
        tmodel.weight.copy_(torch.tensor(w))
        tmodel.bias.copy_(torch.tensor(b))
    topt = torch.optim.SGD(tmodel.parameters(), lr=lr)
    tloss = torch.nn.CrossEntropyLoss()
    reg = ref.GradRegularizer(tmodel, topt, tloss, norm=2, block_strength=block,
                              acc_strength=acc, eps=eps, implementation=implementation)
    x = torch.tensor(inputs)
    y = torch.tensor(labels, dtype=torch.long)
    out = tloss(tmodel(x), y)
    tgrads = list(torch.autograd.grad(out, tmodel.parameters(),
                                      create_graph=reg.create_graph))
    # torch params iterate (weight, bias); pre_grads in the same order
    tpre = [torch.tensor(np.asarray(pre["w"]).T), torch.tensor(np.asarray(pre["b"]))] \
        if acc else None
    tref = reg(tgrads, x, y, tpre)
    ref_w = tref[0].detach().numpy().T  # (out,in) -> (in,out)
    ref_b = tref[1].detach().numpy()

    # ---- our side --------------------------------------------------------
    params = {"w": jnp.asarray(w.T), "b": jnp.asarray(b)}

    def loss_fn(p, x_, y_):
        logits = x_ @ p["w"] + p["b"]
        logp = jax.nn.log_softmax(logits)
        return -logp[jnp.arange(len(y_)), y_].mean()

    def grad_fn(p, batch_stats, images, labels_, key):
        return jax.grad(loss_fn)(p, images, labels_)

    cfg = from_dict({"norm": 2, "block_strength": block, "acc_strength": acc,
                     "eps": eps, "implementation": implementation})
    reg_fn = make_grad_regularizer(cfg, grad_fn)
    grads = grad_fn(params, {}, jnp.asarray(inputs), jnp.asarray(labels), None)
    ours = reg_fn(grads, params, {}, jnp.asarray(inputs), jnp.asarray(labels),
                  pre if acc else None, lr, jax.random.key(0))

    np.testing.assert_allclose(np.asarray(ours["w"]), ref_w, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours["b"]), ref_b, rtol=2e-3, atol=2e-4)


def test_losses_match_reference_oracle():
    import torch

    import jax.numpy as jnp

    from fullbatchtraining_tpu.models.modules import (
        incorrect_cross_entropy,
        label_smooth_cross_entropy,
        maxup_loss,
    )

    ref = _load_ref_modules()
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(20, 7)).astype(np.float32)
    labels = rng.integers(0, 7, 20)
    tl, ty = torch.tensor(logits), torch.tensor(labels, dtype=torch.long)

    for smoothing in (0.0, 0.1):
        ref_val = float(ref.LabelSmoothCrossEntropyLoss(smoothing=smoothing)(tl, ty))
        ours = float(label_smooth_cross_entropy(jnp.asarray(logits),
                                                jnp.asarray(labels), smoothing))
        np.testing.assert_allclose(ours, ref_val, rtol=1e-5)

        ref_val = float(ref.IncorrectCrossEntropyLoss(smoothing=smoothing)(tl, ty))
        ours = float(incorrect_cross_entropy(jnp.asarray(logits),
                                             jnp.asarray(labels), smoothing))
        np.testing.assert_allclose(ours, ref_val, rtol=1e-5)

    # Maxup at the reference's hardcoded ntrials=10 (its arg is ignored)
    logits10 = rng.normal(size=(30, 7)).astype(np.float32)
    labels10 = rng.integers(0, 7, 30)
    ref_val = float(ref.MaxupLoss(ntrials=10)(torch.tensor(logits10),
                                              torch.tensor(labels10, dtype=torch.long)))
    ours = float(maxup_loss(jnp.asarray(logits10), jnp.asarray(labels10), ntrials=10))
    np.testing.assert_allclose(ours, ref_val, rtol=1e-5)


def test_ghostnorm_output_matches_reference_train_mode():
    """Vectorized GhostBatchNorm == the reference's sequential ghost norm for
    fresh (default) affine parameters in train mode."""
    import torch

    import jax
    import jax.numpy as jnp

    from fullbatchtraining_tpu.models.modules import GhostBatchNorm

    ref = _load_ref_modules()
    rng = np.random.default_rng(4)
    x = rng.normal(size=(128, 4, 4, 6)).astype(np.float32)  # NHWC

    tmod = ref.SequentialGhostNorm(6, virtual_batch_size=64)
    tmod.train()
    with torch.no_grad():
        ref_out = tmod(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    gn = GhostBatchNorm(channels=6, virtual_batch_size=64)
    variables = gn.init(jax.random.key(0), jnp.asarray(x), train=True)
    ours, upd = gn.apply(variables, jnp.asarray(x), train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=2e-4, atol=2e-5)
    # running stats: the reference applies a SEQUENTIAL EMA, one update per
    # chunk through the shared inner BatchNorm2d — ours folds the identical
    # recursion in one vectorized expression
    np.testing.assert_allclose(np.asarray(upd["batch_stats"]["mean"]),
                               tmod.batchnorm.running_mean.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(upd["batch_stats"]["var"]),
                               tmod.batchnorm.running_var.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_wsconv_matches_reference_oracle():
    import importlib.util
    import torch

    import jax
    import jax.numpy as jnp

    from fullbatchtraining_tpu.models.layers import WSConv2d

    _load_ref_modules()
    spec = importlib.util.spec_from_file_location(
        "refmodels2.nfnets", REF_MODULES.parent / "nfnets.py")
    nf = importlib.util.module_from_spec(spec)
    nf.__package__ = "refmodels2"
    sys.modules["refmodels2.nfnets"] = nf
    spec.loader.exec_module(nf)

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 9, 9, 4)).astype(np.float32)
    tconv = nf.WSConv2D(4, 8, kernel_size=3, stride=1, padding=1)
    with torch.no_grad():
        tout = tconv(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    conv = WSConv2d(features=8, kernel_size=3, stride=1, padding=1)
    variables = conv.init(jax.random.key(0), jnp.asarray(x))
    variables = {"params": {
        "kernel": jnp.asarray(tconv.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "gain": jnp.asarray(tconv.gain.detach().numpy().reshape(-1)),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }}
    ours = conv.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), tout, rtol=2e-4, atol=2e-5)
