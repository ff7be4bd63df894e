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
