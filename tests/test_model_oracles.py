"""Full-forward parity of additional model families vs the reference torch code.

Complements tests/test_pretrained.py (ResNet parity): loads the reference's
pyramidnets.py (torch-only oracle, skipped when unmounted), converts its
weights into our flax module, and compares logits.
"""

import importlib.util
import pathlib
import re
import sys
import types

import numpy as np
import pytest

REF_MODELS = pathlib.Path("/root/reference/fullbatch/models")

pytestmark = [pytest.mark.slow,  # compile-heavy on the 1-core host
              pytest.mark.skipif(not REF_MODELS.exists(),
                                reason="reference repo not mounted")]


def _load(name):
    pkg_name = "refmodels3"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [str(REF_MODELS)]
        sys.modules[pkg_name] = pkg
    spec = importlib.util.spec_from_file_location(f"{pkg_name}.{name}",
                                                  REF_MODELS / f"{name}.py")
    module = importlib.util.module_from_spec(spec)
    module.__package__ = pkg_name
    sys.modules[f"{pkg_name}.{name}"] = module
    spec.loader.exec_module(module)
    return module


def _convert_pyramidnet(torch_state, variables):
    """Map the reference PyramidNet state dict onto our flax collections."""
    import jax
    import jax.numpy as jnp

    def torch_key(parts, leaf, collection):
        name = parts[0]
        # layer{s}_block{b} -> layer{s}.{b} ; top-level names map 1:1
        match = re.fullmatch(r"layer(\d+)_block(\d+)", name)
        prefix = f"layer{match.group(1)}.{match.group(2)}." if match else ""
        inner = ".".join(parts[1:] if match else parts[:-0] or parts)
        base = prefix + (parts[1] if match else name)
        suffix = {("params", "kernel"): "weight", ("params", "scale"): "weight",
                  ("params", "bias"): "bias", ("batch_stats", "mean"): "running_mean",
                  ("batch_stats", "var"): "running_var"}[(collection, leaf)]
        return f"{base}.{suffix}"

    out = {"params": jax.device_get(variables["params"]),
           "batch_stats": jax.device_get(variables["batch_stats"])}
    for collection in ("params", "batch_stats"):
        flat, treedef = jax.tree_util.tree_flatten_with_path(out[collection])
        leaves = []
        for path, leaf in flat:
            parts = [p.key for p in path]
            key = torch_key(parts, parts[-1], collection)
            value = torch_state[key]
            if parts[-1] == "kernel":
                value = value.transpose(2, 3, 1, 0) if value.ndim == 4 else value.T
            assert value.shape == leaf.shape, (key, value.shape, leaf.shape)
            leaves.append(jnp.asarray(value))
        out[collection] = jax.tree.unflatten(treedef, leaves)
    return out


@pytest.mark.parametrize("depth,alpha,bottleneck", [(110, 84, False), (56, 84, True)])
def test_pyramidnet_forward_parity(depth, alpha, bottleneck):
    import torch

    import jax
    import jax.numpy as jnp

    from fullbatchtraining_tpu.models.pyramidnets import PyramidNet

    ref = _load("pyramidnets")
    tmodel = ref.PyramidNet(depth, alpha, 3, 10, bottleneck=bottleneck)
    tmodel.eval()
    state = {k: np.asarray(v.detach().numpy()) for k, v in tmodel.state_dict().items()
             if "num_batches_tracked" not in k}

    model = PyramidNet(depth=depth, alpha=alpha, channels=3, classes=10,
                       bottleneck=bottleneck)
    variables = dict(model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                                train=False))
    variables = _convert_pyramidnet(state, variables)

    x = np.random.default_rng(0).normal(size=(4, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        tout = tmodel(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, tout, rtol=2e-3, atol=2e-4)


def test_nfnet_forward_parity():
    import torch

    import jax
    import jax.numpy as jnp

    from fullbatchtraining_tpu.models.nfnets import NFNet

    nf = _load("nfnets")
    tmodel = nf.NFNet(3, 10, variant="F0", stochdepth_rate=0.0, alpha=0.2,
                      se_ratio=0.5, activation="gelu", stem="CIFAR",
                      use_dropout=False)
    tmodel.eval()
    state = {k: np.asarray(v.detach().numpy()) for k, v in tmodel.state_dict().items()}

    model = NFNet(channels=3, classes=10, variant="F0", stochdepth_rate=0.0,
                  alpha=0.2, se_ratio=0.5, activation="gelu", stem="CIFAR",
                  use_dropout=False)
    variables = dict(model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                                train=False))

    def torch_key(parts, leaf):
        name = parts[0]
        if name.startswith("stem_conv"):
            base = f"stem.conv{name.removeprefix('stem_conv')}"
            rest = []
        elif name.startswith("block"):
            base = f"body.{name.removeprefix('block')}"
            rest = parts[1:-1]
        elif name == "final_conv":
            base, rest = "final_conv", []
        elif name == "linear":
            base, rest = "linear", []
        else:
            raise KeyError(name)
        suffix = {"kernel": "weight", "gain": "gain", "bias": "bias",
                  "skip_gain": "skip_gain"}[leaf]
        if leaf == "skip_gain":
            return f"{base}.skip_gain"
        return ".".join([base, *rest, suffix])

    import jax.tree_util as jtu

    flat, treedef = jtu.tree_flatten_with_path(jax.device_get(variables["params"]))
    leaves = []
    for path, leaf in flat:
        parts = [p.key for p in path]
        value = state[torch_key(parts, parts[-1])]
        if parts[-1] == "kernel":
            value = value.transpose(2, 3, 1, 0) if value.ndim == 4 else value.T
        elif parts[-1] == "gain":
            value = value.reshape(-1)
        assert value.shape == leaf.shape, (parts, value.shape, leaf.shape)
        leaves.append(jnp.asarray(value))
    variables["params"] = jtu.tree_unflatten(treedef, leaves)

    x = np.random.default_rng(1).normal(size=(2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        tout = tmodel(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, tout, rtol=2e-3, atol=2e-3)


def test_vgg_forward_parity():
    import torch

    import jax
    import jax.numpy as jnp

    from fullbatchtraining_tpu.models.vgg import VGG, VGG_PLANS

    ref = _load("vgg")
    tmodel = ref.VGG("VGG11", in_channels=3, num_classes=10)
    tmodel.eval()
    state = {k: np.asarray(v.detach().numpy()) for k, v in tmodel.state_dict().items()
             if "num_batches_tracked" not in k}

    model = VGG(vgg_name="VGG11", channels=3, classes=10)
    variables = dict(model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                                train=False))

    # reference features is a flat Sequential: conv,norm,relu per entry, +1 per 'M'
    conv_to_seq, seq = {}, 0
    idx = 0
    for entry in VGG_PLANS["VGG11"]:
        if entry == "M":
            seq += 1
        else:
            conv_to_seq[idx] = seq
            seq += 3
            idx += 1

    def torch_key(parts, leaf):
        name = parts[0]
        suffix = {("params", "kernel"): "weight", ("params", "scale"): "weight",
                  ("params", "bias"): "bias", ("batch_stats", "mean"): "running_mean",
                  ("batch_stats", "var"): "running_var"}[(parts[-2] == "bn" and
                  leaf in ("mean", "var") and "batch_stats" or
                  ("batch_stats" if leaf in ("mean", "var") else "params"), leaf)]
        if name == "classifier":
            return f"classifier.{suffix}"
        kind, i = name[:4], int(name[4:])
        base = conv_to_seq[i] + (0 if kind == "conv" else 1)
        return f"features.{base}.{suffix}"

    import jax.tree_util as jtu

    for collection in ("params", "batch_stats"):
        flat, treedef = jtu.tree_flatten_with_path(jax.device_get(variables[collection]))
        leaves = []
        for path, leaf in flat:
            parts = [p.key for p in path]
            value = state[torch_key(parts, parts[-1])]
            if parts[-1] == "kernel":
                value = value.transpose(2, 3, 1, 0) if value.ndim == 4 else value.T
            assert value.shape == leaf.shape, (parts, value.shape, leaf.shape)
            leaves.append(jnp.asarray(value))
        variables[collection] = jtu.tree_unflatten(treedef, leaves)

    x = np.random.default_rng(2).normal(size=(3, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        tout = tmodel(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, tout, rtol=2e-3, atol=2e-4)


def _load_densenets():
    """The reference densenets.py subclasses torchvision's _DenseLayer only to
    reuse its forward; shim that base class (torchvision absent here)."""
    import torch

    if "torchvision" not in sys.modules:
        class _TVDenseLayer(torch.nn.Module):
            def bn_function(self, inputs):
                return self.conv1(self.relu1(self.norm1(torch.cat(inputs, 1))))

            def forward(self, input):  # noqa: A002 - torchvision signature
                prev = [input] if isinstance(input, torch.Tensor) else input
                bottleneck = self.bn_function(prev)
                new = self.conv2(self.relu2(self.norm2(bottleneck)))
                if self.drop_rate > 0:
                    new = torch.nn.functional.dropout(
                        new, p=self.drop_rate, training=self.training)
                return new

        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")
        tv_densenet = types.ModuleType("torchvision.models.densenet")
        tv_densenet._DenseLayer = _TVDenseLayer
        tv_models.densenet = tv_densenet
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
        sys.modules["torchvision.models.densenet"] = tv_densenet
    _load("utils")
    return _load("densenets")


def _densenet_torch_key(parts, leaf):
    suffix = {"kernel": "weight", "scale": "weight", "bias": "bias",
              "mean": "running_mean", "var": "running_var"}[leaf]
    name = parts[0]
    parts = [p for p in parts if p != "bn"]  # BatchNorm2d wrapper subtree
    if name == "classifier":
        return f"classifier.{suffix}"
    if name.startswith(("stem_conv", "stem_norm")):
        return f"features.{name.removeprefix('stem_')}.{suffix}"
    match = re.fullmatch(r"block(\d+)_layer(\d+)", name)
    if match:
        return (f"features.denseblock{match.group(1)}."
                f"denselayer{match.group(2)}.{parts[1]}.{suffix}")
    match = re.fullmatch(r"transition(\d+)_(norm|conv)", name)
    if match:
        return f"features.transition{match.group(1)}.{match.group(2)}.{suffix}"
    if name == "final_norm":
        return f"features.norm5.{suffix}"
    raise KeyError(name)


def test_densenet121_forward_parity():
    """DenseNet-121 full-forward parity vs the reference densenets.py
    (CIFAR stem), converted weights OIHW->HWIO."""
    import torch

    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from fullbatchtraining_tpu.models.densenets import DenseNet, densenet_depths_to_config

    ref = _load_densenets()
    growth, blocks, init_feats = ref.densenet_depths_to_config(121)
    tmodel = ref.DenseNet(growth_rate=growth, block_config=blocks,
                          num_init_features=init_feats, num_classes=10,
                          channels=3, stem="CIFAR")
    tmodel.eval()
    state = {k: np.asarray(v.detach().numpy()) for k, v in tmodel.state_dict().items()
             if "num_batches_tracked" not in k}

    assert densenet_depths_to_config(121) == (growth, blocks, init_feats)
    model = DenseNet(growth_rate=growth, block_config=blocks,
                     num_init_features=init_feats, classes=10, stem="CIFAR")
    variables = dict(model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                                train=False))

    for collection in ("params", "batch_stats"):
        flat, treedef = jtu.tree_flatten_with_path(jax.device_get(variables[collection]))
        leaves = []
        for path, leaf in flat:
            parts = [p.key for p in path]
            value = state[_densenet_torch_key(parts, parts[-1])]
            if parts[-1] == "kernel":
                value = value.transpose(2, 3, 1, 0) if value.ndim == 4 else value.T
            assert value.shape == leaf.shape, (parts, value.shape, leaf.shape)
            leaves.append(jnp.asarray(value))
        variables[collection] = jtu.tree_unflatten(treedef, leaves)

    x = np.random.default_rng(3).normal(size=(2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        tout = tmodel(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, tout, rtol=2e-3, atol=2e-3)


def test_resnet18_train_mode_parity():
    """Train-mode (BN-updating) forward parity: logits computed with batch
    statistics AND the updated running mean/var match torch, including the
    unbiased-variance running update (torch semantics)."""
    import torch

    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    # reuse the resnets loader from test_pretrained
    from test_pretrained import _load_reference_models
    from fullbatchtraining_tpu.models import construct_model, initialize_model
    from fullbatchtraining_tpu.pretrained import _model_cfg, convert_torch_resnet

    ref = _load_reference_models()
    block, layers = ref.resnet_depths_to_config(18)
    tmodel = ref.ResNet(block, layers, 3, 10, stem="CIFAR", downsample="C",
                        zero_init_residual=True)
    state = {k: np.asarray(v.detach().numpy())
             for k, v in tmodel.state_dict().items()}

    model = construct_model(_model_cfg(18), 3, 10)
    variables = initialize_model(model, jax.random.key(0), pixels=32, channels=3)
    variables = convert_torch_resnet(state, variables)

    x = np.random.default_rng(4).normal(size=(8, 32, 32, 3)).astype(np.float32)
    tmodel.train()
    with torch.no_grad():
        tout = tmodel(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    ours, mutated = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ours), tout, rtol=1e-3, atol=1e-4)

    # updated running stats must match torch's post-forward state dict
    post = {k: np.asarray(v.detach().numpy())
            for k, v in tmodel.state_dict().items()}
    # tolerance: fp32 conv outputs differ between torch and XLA and the
    # difference compounds with depth (measured ~3e-4 at layer4)
    flat, _ = jtu.tree_flatten_with_path(jax.device_get(mutated["batch_stats"]))
    checked = 0
    for path, leaf in flat:
        parts = [p.key for p in path]
        key = _resnet_stats_key(parts)
        np.testing.assert_allclose(np.asarray(leaf), post[key],
                                   rtol=1e-2, atol=1e-3, err_msg=key)
        checked += 1
    assert checked >= 40  # ResNet-18: 20 BN layers x (mean, var)


def test_batchnorm_unbiased_running_update():
    """_TorchBatchNorm matches torch.nn.BatchNorm2d exactly at small n, where
    biased vs unbiased running-var updates differ by n/(n-1) = 16/15 — well
    above fp noise (flax.linen.BatchNorm would fail this)."""
    import torch

    import jax
    import jax.numpy as jnp

    from fullbatchtraining_tpu.models.layers import _TorchBatchNorm

    x = np.random.default_rng(5).normal(size=(4, 2, 2, 3)).astype(np.float32)
    tbn = torch.nn.BatchNorm2d(3)
    tbn.train()
    with torch.no_grad():
        tout = tbn(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()

    bn = _TorchBatchNorm(3)
    variables = bn.init(jax.random.key(0), jnp.asarray(x), train=True)
    ours, mutated = bn.apply(variables, jnp.asarray(x), train=True,
                             mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), tout,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["var"]),
                               tbn.running_var.numpy(), rtol=1e-6, atol=1e-7)


def _resnet_stats_key(parts):
    """flax batch_stats path -> reference ResNet running-stat key (mirrors
    the mapping in fullbatchtraining_tpu/pretrained.py)."""
    from fullbatchtraining_tpu.pretrained import _torch_key_for

    return _torch_key_for(parts, parts[-1], "batch_stats")


# ---------------------------------------------------------------------------
# Export direction: flax variables -> reference state dict, strict-loaded
# into the reference's OWN torch models (the inverse of the import oracles
# above; reference checkpoints carry any family's state_dict,
# training/utils.py:43-51)
# ---------------------------------------------------------------------------


def _export_family_case(family):
    """(our flax model, reference torch model, cfg_model dict, input hw)."""
    if family == "vgg11":
        from fullbatchtraining_tpu.models.vgg import VGG

        ref = _load("vgg")
        return (VGG(vgg_name="VGG11", channels=3, classes=10),
                ref.VGG("VGG11", in_channels=3, num_classes=10),
                {"name": "VGG11", "head": "CIFAR"}, 32)
    if family == "densenet":
        from fullbatchtraining_tpu.models.densenets import DenseNet

        ref = _load_densenets()
        return (DenseNet(growth_rate=8, block_config=(2, 2),
                         num_init_features=16, classes=10, stem="CIFAR"),
                ref.DenseNet(growth_rate=8, block_config=(2, 2),
                             num_init_features=16, num_classes=10,
                             channels=3, stem="CIFAR"),
                {"name": "DenseNet-tiny"}, 16)
    if family == "nfnet":
        from fullbatchtraining_tpu.models.nfnets import NFNet

        ref = _load("nfnets")
        kw = dict(stochdepth_rate=0.0, alpha=0.2, se_ratio=0.5,
                  activation="gelu", stem="CIFAR", use_dropout=False)
        return (NFNet(channels=3, classes=10, variant="F0", **kw),
                ref.NFNet(3, 10, variant="F0", **kw),
                {"name": "nfnet"}, 16)
    if family == "pyramidnet":
        from fullbatchtraining_tpu.models.pyramidnets import PyramidNet

        ref = _load("pyramidnets")
        return (PyramidNet(depth=20, alpha=12, channels=3, classes=10,
                           bottleneck=False),
                ref.PyramidNet(20, 12, 3, 10, bottleneck=False),
                {"name": "pyramidnet20"}, 32)  # ref avg-pools a fixed 8x8
    raise KeyError(family)


@pytest.mark.parametrize("family", ["vgg11", "densenet", "nfnet", "pyramidnet"])
def test_export_torch_state_family(family, tmp_path):
    """Our randomly-initialized variables export to a state dict the
    reference's own torch model accepts with load_state_dict(strict=True),
    the two models then agree on logits, and re-importing the export
    reproduces the original variables bitwise (the two-way interop oracle
    for the non-ResNet families; ResNets are covered in test_pretrained.py)."""
    import torch

    import jax
    import jax.numpy as jnp

    from fullbatchtraining_tpu.config import from_dict
    from fullbatchtraining_tpu.pretrained import (convert_torch_state,
                                                  export_torch_state)

    model, tmodel, cfg_dict, hw = _export_family_case(family)
    tmodel.eval()
    cfg_model = from_dict(cfg_dict)
    variables = dict(model.init(jax.random.key(3),
                                jnp.zeros((1, hw, hw, 3)), train=False))

    exported = export_torch_state(variables, cfg_model, step=7)
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.tensor(v) for k, v in exported.items()}, strict=True)
    assert not missing and not unexpected

    x = np.random.default_rng(11).normal(size=(2, hw, hw, 3)).astype(np.float32)
    with torch.no_grad():
        tout = tmodel(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, tout, rtol=2e-3, atol=2e-3)

    # round-trip: export -> import must be bitwise on every leaf
    fresh = dict(model.init(jax.random.key(9), jnp.zeros((1, hw, hw, 3)),
                            train=False))
    back = convert_torch_state(exported, fresh, cfg_model)
    flat_a = jax.tree_util.tree_leaves_with_path(
        {k: variables[k] for k in back if variables.get(k)})
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=str(pa))
