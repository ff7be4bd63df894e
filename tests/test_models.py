"""Model zoo tests: construction, forward shapes, init properties, losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fullbatchtraining_tpu.config import load_config
from fullbatchtraining_tpu.models import construct_model, initialize_model
from fullbatchtraining_tpu.models.modules import (
    incorrect_cross_entropy,
    label_smooth_cross_entropy,
    maxup_loss,
)

pytestmark = pytest.mark.slow  # compile-heavy on the 1-core host


def _build(config_dir, model_name, pixels=32, channels=3, classes=10, batch=2):
    cfg = load_config(config_dir, overrides=[f"model={model_name}"])
    model = construct_model(cfg.model, channels, classes)
    variables = initialize_model(model, jax.random.key(0), pixels, channels, batch=batch)
    return model, variables


def _forward(model, variables, batch=2, pixels=32, channels=3, train=True):
    x = jax.random.normal(jax.random.key(1), (batch, pixels, pixels, channels))
    if train:
        out, updates = model.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"stochdepth": jax.random.key(2), "dropout": jax.random.key(3)},
        )
        return out, updates
    return model.apply(variables, x, train=False), None


# Heavy models run at 16px: same code paths, ~4x less CPU compile time.
@pytest.mark.parametrize(
    "name,pixels", [("resnet18", 32), ("resnet20", 32), ("resnet50", 16),
                    ("vgg11", 32), ("vgg16", 32), ("densenet121", 16),
                    ("pyramidnet110", 16), ("nfn", 16), ("linear", 32)])
def test_forward_shapes(config_dir, name, pixels):
    model, variables = _build(config_dir, name, pixels=pixels)
    out, _ = _forward(model, variables, pixels=pixels)
    assert out.shape == (2, 10)
    out_eval = model.apply(variables, jnp.zeros((2, pixels, pixels, 3)), train=False)
    assert out_eval.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("depth,expect",
                         [(18, 11_173_962), (20, 272_474)])
def test_resnet_param_counts(config_dir, depth, expect):
    """Parameter counts match the torchvision/CIFAR references for the
    intended width semantics (resnet18 width 64, resnet20 width 16)."""
    model, variables = _build(config_dir, f"resnet{depth}")
    count = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert count == expect, f"ResNet{depth}: {count} != {expect}"


def test_zero_init_residual(config_dir):
    """initialization: skip-residual zeroes the last BN scale per block
    (reference resnets.py:119-126)."""
    _, variables = _build(config_dir, "resnet18")
    params = variables["params"]
    bn2_scale = params["layer1_block0"]["bn2"]["bn"]["scale"]
    assert np.all(np.asarray(bn2_scale) == 0.0)
    bn1_scale = params["layer1_block0"]["bn1"]["bn"]["scale"]
    assert np.all(np.asarray(bn1_scale) == 1.0)


def test_batch_stats_update(config_dir):
    model, variables = _build(config_dir, "resnet18")
    x = jax.random.normal(jax.random.key(4), (4, 32, 32, 3)) * 3 + 1
    _, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(updates["batch_stats"])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


def test_skipinit_resnet(config_dir):
    cfg = load_config(config_dir, overrides=["model=resnet18", "model.normalization=skipinit"])
    model = construct_model(cfg.model, 3, 10)
    variables = initialize_model(model, jax.random.key(0), 32, 3)
    # skipinit: no batch stats; Skipper alpha params present and zero.
    assert "batch_stats" not in variables or not variables["batch_stats"]
    alphas = [v for path, v in jax.tree_util.tree_flatten_with_path(variables["params"])[0]
              if "skip" in str(path) and "alpha" in str(path)]
    assert alphas and all(np.asarray(a) == 0.0 for a in alphas)
    out, _ = model.apply(variables, jnp.ones((2, 32, 32, 3)), train=True,
                         mutable=["batch_stats"])
    assert out.shape == (2, 10)


def test_ghostnorm_resnet(config_dir):
    cfg = load_config(config_dir,
                      overrides=["model=resnet20", "model.normalization=SequentialGhostNorm"])
    model = construct_model(cfg.model, 3, 10)
    variables = initialize_model(model, jax.random.key(0), 32, 3)
    x = jax.random.normal(jax.random.key(1), (128, 32, 32, 3))
    out, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (128, 10)


def test_wsconv_standardization(config_dir):
    cfg = load_config(config_dir, overrides=["model=resnet20", "model.convolution=standardized"])
    model = construct_model(cfg.model, 3, 10)
    variables = initialize_model(model, jax.random.key(0), 32, 3)
    out, _ = model.apply(variables, jnp.ones((2, 32, 32, 3)) * 100.0, train=True,
                         mutable=["batch_stats"])
    assert np.isfinite(np.asarray(out)).all()


def test_label_smoothing_loss():
    logits = jnp.array([[10.0, 0.0, 0.0], [0.0, 10.0, 0.0]])
    labels = jnp.array([0, 1])
    plain = label_smooth_cross_entropy(logits, labels, 0.0)
    smoothed = label_smooth_cross_entropy(logits, labels, 0.1)
    assert plain < smoothed  # smoothing penalizes confident correct predictions
    # matches -log softmax at the target for smoothing 0
    expected = -jax.nn.log_softmax(logits)[jnp.arange(2), labels].mean()
    assert np.isclose(plain, expected, atol=1e-6)


def test_incorrect_xent_masks_correct():
    logits = jnp.array([[10.0, 0.0], [10.0, 0.0]])
    labels = jnp.array([0, 1])  # first correct, second wrong
    loss = incorrect_cross_entropy(logits, labels)
    full = label_smooth_cross_entropy(logits, labels, 0.0)
    assert 0 < loss < full


def test_maxup_respects_ntrials():
    """The reference ignored its ntrials arg (modules.py:127); we honor it."""
    logits = jax.random.normal(jax.random.key(0), (12, 5))
    labels = jnp.zeros((12,), jnp.int32)
    l2 = maxup_loss(logits, labels, ntrials=2)
    l3 = maxup_loss(logits, labels, ntrials=3)
    assert not np.isclose(float(l2), float(l3))


def test_avg_pool_count_include_pad_matches_torch():
    """count_include_pad=False divides each window by its REAL element count
    (torch nn.AvgPool2d semantics; no reference model reaches this path, but
    the layer factory exposes it)."""
    import torch

    from fullbatchtraining_tpu.models.layers import avg_pool

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 7, 7, 3)).astype(np.float32)
    for window, stride, padding in [(3, 2, 1), (2, 2, 1), (3, 1, 1)]:
        ours = avg_pool(jnp.asarray(x), window, stride, padding,
                        count_include_pad=False)
        ref = torch.nn.functional.avg_pool2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), window, stride, padding,
            count_include_pad=False).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-6, atol=1e-6)
        # include_pad path unchanged
        ours_inc = avg_pool(jnp.asarray(x), window, stride, padding)
        ref_inc = torch.nn.functional.avg_pool2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), window, stride, padding,
            count_include_pad=True).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours_inc), ref_inc,
                                   rtol=1e-6, atol=1e-6)


def test_memory_efficient_densenet_matches_plain(config_dir):
    """memory_efficient=True is pure rematerialization: same params, same
    forward as the plain layer (it crashed at init before — the remat twin
    re-registered the layer name)."""
    from fullbatchtraining_tpu.models.densenets import DenseNet

    outs = {}
    for me in (False, True):
        # tiny block config: the crash was name registration, not depth
        model = DenseNet(growth_rate=4, block_config=(2, 2),
                         num_init_features=8, classes=10,
                         memory_efficient=me)
        variables = initialize_model(model, jax.random.key(0), 16, 3)
        outs[me] = model.apply(variables, jnp.ones((2, 16, 16, 3)), train=False)
    np.testing.assert_allclose(np.asarray(outs[False]), np.asarray(outs[True]),
                               rtol=1e-6)


def test_standardized_convs_have_no_bias_under_batchnorm(config_dir):
    """Reference conv_layer=WSConv2D receives bias=use_bias (False for BN
    nets, utils.py:14 + resnets.py:70): a standardized ResNet must not grow
    conv biases the reference doesn't have."""
    cfg = load_config(config_dir, overrides=[
        "model=resnet20", "model.convolution=standardized"])
    model = construct_model(cfg.model, 3, 10)
    variables = initialize_model(model, jax.random.key(0), 32, 3)
    conv_biases = [p for p, _ in jax.tree_util.tree_flatten_with_path(
        variables["params"])[0]
        if "conv" in str(p).lower() and str(p[-1].key) == "bias"]
    assert not conv_biases, conv_biases
    # WSConv gains are still there
    gains = [p for p, _ in jax.tree_util.tree_flatten_with_path(
        variables["params"])[0] if str(p[-1].key) == "gain"]
    assert gains


def test_fc_bias_keeps_torch_default_uniform(config_dir):
    """The reference init loop touches only Conv2d/BN (resnets.py:110-114):
    the classifier bias keeps torch's uniform(+-1/sqrt(fan_in)) draw, not
    zeros."""
    cfg = load_config(config_dir, overrides=["model=resnet20"])
    model = construct_model(cfg.model, 3, 10)
    variables = initialize_model(model, jax.random.key(0), 32, 3)
    b = np.asarray(variables["params"]["fc"]["bias"])
    assert np.any(b != 0.0)
    fan_in = variables["params"]["fc"]["kernel"].shape[0]
    assert np.all(np.abs(b) <= 1.0 / np.sqrt(fan_in) + 1e-8)


def test_maxup_with_label_smoothing_raises(config_dir):
    """Reference training.py:393-400 rejects the combination; the DEFAULT
    label_smoothing=0.0 must NOT trip the guard (documented fix — the
    reference's `not in [None, '']` test made maxup unreachable)."""
    from fullbatchtraining_tpu.models.modules import get_loss_fn

    cfg = load_config(config_dir, overrides=[
        "hyp.loss_modification=maxup-4", "hyp.label_smoothing=0.1"])
    with pytest.raises(ValueError, match="label smoothing"):
        get_loss_fn(cfg.hyp, 32)
    cfg = load_config(config_dir, overrides=["hyp.loss_modification=maxup-4"])
    assert get_loss_fn(cfg.hyp, 32) is not None
