"""Pretrained-checkpoint conversion: forward parity against the reference model.

Loads the reference's torch ResNet implementation (read-only oracle, only if
mounted) to produce a genuine release-format state dict, converts it, and
checks logits match between torch (NCHW) and flax (NHWC) to float tolerance.
This is the acceptance test for hub-checkpoint compatibility (SURVEY.md §4).
"""

import importlib.util
import pathlib
import sys
import types

import numpy as np
import pytest

REFERENCE = pathlib.Path("/root/reference/fullbatch/models")

pytestmark = [pytest.mark.slow,  # compile-heavy on the 1-core host
              pytest.mark.skipif(not REFERENCE.exists(),
                                reason="reference repo not mounted")]


def _load_reference_models():
    """Assemble the reference models subpackage without importing fullbatch/
    (whose __init__ requires torchvision)."""
    pkg = types.ModuleType("refmodels")
    pkg.__path__ = [str(REFERENCE)]
    sys.modules["refmodels"] = pkg
    for name in ["modules", "nfnets", "utils", "resnets"]:
        spec = importlib.util.spec_from_file_location(
            f"refmodels.{name}", REFERENCE / f"{name}.py")
        module = importlib.util.module_from_spec(spec)
        module.__package__ = "refmodels"
        sys.modules[f"refmodels.{name}"] = module
        spec.loader.exec_module(module)
    return sys.modules["refmodels.resnets"]


@pytest.mark.parametrize("depth,downsample", [(18, "C"), (18, "B"), (50, "C")])
def test_forward_parity_with_reference_resnet(depth, downsample):
    import torch

    import jax
    import jax.numpy as jnp

    from fullbatchtraining_tpu.models import construct_model, initialize_model
    from fullbatchtraining_tpu.pretrained import _model_cfg, convert_torch_resnet

    ref = _load_reference_models()
    block, layers = ref.resnet_depths_to_config(depth)
    torch_model = ref.ResNet(block, layers, 3, 10, stem="CIFAR", downsample=downsample,
                             zero_init_residual=True)
    torch_model.eval()
    state_dict = {k: np.asarray(v.detach().numpy())
                  for k, v in torch_model.state_dict().items()}

    cfg_model = _model_cfg(depth, downsample=downsample)
    model = construct_model(cfg_model, 3, 10)
    variables = initialize_model(model, jax.random.key(0), pixels=32, channels=3)
    variables = convert_torch_resnet(state_dict, variables)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        torch_out = torch_model(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    jax_out = np.asarray(model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False))
    np.testing.assert_allclose(jax_out, torch_out, rtol=1e-3, atol=1e-4)


def test_release_entry_roundtrip(tmp_path):
    """5-tuple .pth release format loads through load_pretrained."""
    import torch

    import jax
    import jax.numpy as jnp

    from fullbatchtraining_tpu.pretrained import load_pretrained

    ref = _load_reference_models()
    block, layers = ref.resnet_depths_to_config(18)
    torch_model = ref.ResNet(block, layers, 3, 10, stem="CIFAR", downsample="C",
                             zero_init_residual=True)
    file = tmp_path / "final_fbaug_highreg_lr08_resnet18.pth"
    torch.save([{}, torch_model.state_dict(), {}, None, 3000], file)

    model, variables = load_pretrained("resnet18_fbaug_highreg", file=file)
    out = model.apply(variables, jnp.zeros((2, 32, 32, 3)), train=False)
    assert out.shape == (2, 10)


@pytest.mark.parametrize("depth,downsample", [(18, "C"), (18, "B"), (50, "C")])
def test_export_into_reference_resnet(depth, downsample, tmp_path):
    """The ORACLE test for the export direction: a flax model exported via
    save_reference_checkpoint loads into the reference's own torch ResNet
    with strict=True and produces matching logits — a model trained here is
    externally checkable by the reference's evaluator (MIGRATION.md
    'two-way')."""
    import torch

    import jax
    import jax.numpy as jnp

    from fullbatchtraining_tpu.models import construct_model, initialize_model
    from fullbatchtraining_tpu.pretrained import _model_cfg, save_reference_checkpoint

    cfg_model = _model_cfg(depth, downsample=downsample)
    model = construct_model(cfg_model, 3, 10)
    variables = initialize_model(model, jax.random.key(1), pixels=32, channels=3)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    # one train-mode pass makes the running stats non-trivial, so the export
    # roundtrips real BN state rather than the (0, 1) init
    _, mutated = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": mutated["batch_stats"]}

    file = save_reference_checkpoint(variables, tmp_path / "export.pth",
                                     downsample=downsample, step=7)
    payload = torch.load(file, weights_only=False)
    assert isinstance(payload, list) and len(payload) == 5
    assert payload[4] == 7

    ref = _load_reference_models()
    block, layers = ref.resnet_depths_to_config(depth)
    torch_model = ref.ResNet(block, layers, 3, 10, stem="CIFAR",
                             downsample=downsample, zero_init_residual=True)
    torch_model.load_state_dict(payload[1], strict=True)
    torch_model.eval()

    with torch.no_grad():
        torch_out = torch_model(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    jax_out = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(jax_out, torch_out, rtol=1e-3, atol=1e-4)


def test_export_reimport_bitwise(tmp_path):
    """Export -> convert_torch_resnet round trip reproduces every leaf
    bitwise (the transposes are exact permutations; no value passes through
    torch compute)."""
    import jax

    from fullbatchtraining_tpu.models import construct_model, initialize_model
    from fullbatchtraining_tpu.pretrained import (_model_cfg, _torch_load,
                                                  convert_torch_resnet,
                                                  save_reference_checkpoint)

    cfg_model = _model_cfg(18)
    model = construct_model(cfg_model, 3, 10)
    source = initialize_model(model, jax.random.key(2), pixels=32, channels=3)

    file = save_reference_checkpoint(source, tmp_path / "rt.pth", step=11)
    model_state, step = _torch_load(file)
    assert step == 11
    template = initialize_model(model, jax.random.key(3), pixels=32, channels=3)
    restored = convert_torch_resnet(model_state, template)

    flat_src = jax.tree_util.tree_leaves_with_path(
        {"params": source["params"], "batch_stats": source["batch_stats"]})
    flat_new = jax.tree_util.tree_leaves_with_path(
        {"params": restored["params"], "batch_stats": restored["batch_stats"]})
    assert len(flat_src) == len(flat_new)
    for (path, a), (_, b) in zip(flat_src, flat_new):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(path))


def test_export_roundtrip_through_hub_entry(tmp_path):
    """An exported checkpoint re-enters through the public load_pretrained
    hub path with logits matching the source model to float tolerance."""
    import jax
    import jax.numpy as jnp

    from fullbatchtraining_tpu.models import construct_model, initialize_model
    from fullbatchtraining_tpu.pretrained import (_model_cfg, load_pretrained,
                                                  save_reference_checkpoint)

    cfg_model = _model_cfg(18)
    model = construct_model(cfg_model, 3, 10)
    source = initialize_model(model, jax.random.key(4), pixels=32, channels=3)
    file = tmp_path / "final_fbaug_highreg_lr08_resnet18.pth"
    save_reference_checkpoint(source, file, step=3000)

    loaded_model, variables = load_pretrained("resnet18_fbaug_highreg", file=file)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    out_src = np.asarray(model.apply(source, x, train=False))
    out_new = np.asarray(loaded_model.apply(variables, x, train=False))
    np.testing.assert_allclose(out_new, out_src, atol=1e-6)


def test_export_rejects_non_resnet():
    """Non-ResNet trees fail with a clear message instead of a silent
    partial export."""
    from fullbatchtraining_tpu.pretrained import export_torch_resnet

    with pytest.raises(KeyError, match="ResNet family"):
        export_torch_resnet({"params": {"mystery_module": {
            "kernel": np.zeros((3, 3, 4, 4), np.float32)}}})


def test_unknown_entry_raises():
    from fullbatchtraining_tpu.pretrained import load_pretrained

    with pytest.raises(ValueError, match="Unknown entry"):
        load_pretrained("resnet9000")


def test_release_entry_url_download(tmp_path, monkeypatch):
    """The auto-download path (reference hubconf.py:37-40) works, exercised
    with a file:// URL since this environment has no egress."""
    import torch
    import jax.numpy as jnp

    from fullbatchtraining_tpu.pretrained import load_pretrained

    ref = _load_reference_models()
    block, layers = ref.resnet_depths_to_config(18)
    torch_model = ref.ResNet(block, layers, 3, 10, stem="CIFAR", downsample="C",
                             zero_init_residual=True)
    file = tmp_path / "final_fbaug_highreg_lr08_resnet18.pth"
    torch.save([{}, torch_model.state_dict(), {}, None, 3000], file)
    monkeypatch.setenv("HOME", str(tmp_path / "home"))  # redirect the cache dir

    model, variables = load_pretrained("resnet18_fbaug_highreg",
                                       file=f"file://{file}")
    out = model.apply(variables, jnp.zeros((2, 32, 32, 3)), train=False)
    assert out.shape == (2, 10)


def test_download_offline_error_message(tmp_path, monkeypatch):
    from fullbatchtraining_tpu.pretrained import _fetch_release_asset

    with pytest.raises(RuntimeError, match="network egress"):
        _fetch_release_asset("file:///nonexistent/asset.pth", cache_dir=tmp_path)


def test_pretrained_false_returns_random_init():
    """hub entries honor pretrained=False offline and accept progress
    (reference hubconf signature: pretrained gates load_state_dict_from_url)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import hubconf

    model, variables = hubconf.resnet18_fbaug_clip(pretrained=False, progress=False)
    assert "params" in variables  # no network access happened

    # signature parity: the reference defaults pretrained=False
    # (hubconf.py:71-99), so a bare hub call returns a random init there too
    import inspect

    for entry in ("resnet18_fbaug_clip", "resnet18_fbaug_gradreg",
                  "resnet18_fbaug_gradreg_v2", "resnet18_fbaug_highreg",
                  "resnet152_fbaug_highreg"):
        sig = inspect.signature(getattr(hubconf, entry))
        assert sig.parameters["pretrained"].default is False, entry


def test_torch_hub_load_local():
    """The REAL torch.hub machinery (reference usage: torch.hub.load(repo,
    entry) — README/hubconf.py) loads this repo's hubconf: entrypoint
    discovery via torch.hub.list, the declared dependencies check, and a
    torch.hub.load(source='local') call returning the converted flax pair."""
    from pathlib import Path

    import torch

    repo = str(Path(__file__).resolve().parent.parent)
    # (torch.hub.list has no source='local' in this torch — load is the API)
    for entry in ("resnet18_fbaug_clip", "resnet152_fbaug_highreg"):
        model, variables = torch.hub.load(repo, entry, source="local",
                                          trust_repo=True,
                                          pretrained=False, progress=False)
        assert "params" in variables and hasattr(model, "apply"), entry
