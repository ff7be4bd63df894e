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


def test_export_training_checkpoint_resumes_in_torch(tmp_path):
    """Training-resume export: the optim slot loads into a real torch SGD
    over the reference's own ResNet with buffers on the RIGHT parameters
    (registration-order oracle), and the scheduler slot continues the lr
    sequence exactly where this framework's schedule left off — the two
    pieces the reference's _load_from_checkpoint consumes beyond weights
    (training/utils.py:54-70)."""
    import importlib.util

    import torch

    import jax
    import jax.numpy as jnp
    import types

    from fullbatchtraining_tpu.config import load_config
    from fullbatchtraining_tpu.models import construct_model, initialize_model
    from fullbatchtraining_tpu.pretrained import (
        _model_cfg, export_reference_training_checkpoint, torch_parameter_keys)
    from fullbatchtraining_tpu.training.optimizers import SGDState, make_lr_schedule

    cfg = load_config(pathlib.Path(__file__).resolve().parent.parent / "config",
                      overrides=["model=resnet18", "hyp=fb1", "hyp.steps=16",
                                 "hyp.warmup=3", "hyp.scheduler=cosine-decay"])
    steps_done = 5
    model = construct_model(cfg.model, 3, 10)
    variables = initialize_model(model, jax.random.key(7), pixels=32, channels=3)
    # distinct fake momentum buffers so index mispairings cannot cancel
    momentum = jax.tree.map(
        lambda p: jnp.full_like(p, float(np.prod(p.shape) % 97) + 0.25),
        variables["params"])
    state = types.SimpleNamespace(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=SGDState(momentum=momentum, count=jnp.asarray(steps_done)),
        step=np.asarray(steps_done, np.int32))

    file = export_reference_training_checkpoint(state, cfg,
                                                tmp_path / "resume.pth")
    optim_state, model_state, scheduler_state, scaler_state, step = torch.load(
        file, weights_only=False)
    assert step == steps_done and scaler_state is None
    assert len(optim_state["param_groups"]) == 1
    assert optim_state["param_groups"][0]["momentum"] == cfg.hyp.optim.momentum

    # --- the torch side: reference ResNet + real SGD + the reference's own
    # warmup scheduler class ----------------------------------------------
    ref = _load_reference_models()
    block, layers = ref.resnet_depths_to_config(18)
    tmodel = ref.ResNet(block, layers, 3, 10, stem="CIFAR", downsample="C",
                        zero_init_residual=True)
    tmodel.load_state_dict(model_state, strict=True)

    # ordering oracle: our registration-order ranking IS torch's
    assert torch_parameter_keys(model_state) == \
        [k for k, _ in tmodel.named_parameters()]

    # construction-then-load order mirrors the reference flow exactly:
    # optim_interface builds optimizer + scheduler (whose init step writes
    # an lr into the groups), THEN _load_from_checkpoint restores the
    # optimizer (saved group lr survives) and the scheduler attrs
    opt = torch.optim.SGD(tmodel.parameters(), lr=cfg.hyp.optim.lr,
                          momentum=cfg.hyp.optim.momentum,
                          weight_decay=cfg.hyp.optim.weight_decay)
    spec = importlib.util.spec_from_file_location(
        "refsched", REFERENCE.parent / "training/additional_optimizers/scheduler.py")
    refsched = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(refsched)
    after = torch.optim.lr_scheduler.CosineAnnealingLR(opt, cfg.hyp.steps,
                                                       eta_min=0.0)
    warm = refsched.GradualWarmupScheduler(opt, multiplier=1.0,
                                           total_epoch=cfg.hyp.warmup,
                                           after_scheduler=after)

    opt.load_state_dict(optim_state)  # structural check: counts must match
    for i, (name, param) in enumerate(tmodel.named_parameters()):
        buf = opt.state[param]["momentum_buffer"]
        expected = float(np.prod(param.shape) % 97) + 0.25
        assert float(buf.ravel()[0]) == expected, (i, name)
        assert buf.shape == param.shape, name
    warm.load_state_dict(dict(scheduler_state))

    # lr continuation oracle: the loaded group lr is the lr our schedule
    # assigns to the NEXT step, and stepping the reference scheduler
    # reproduces our schedule for the rest of the run
    schedule = make_lr_schedule(cfg.hyp)
    np.testing.assert_allclose(opt.param_groups[0]["lr"],
                               float(schedule(steps_done)), rtol=1e-6)
    for k in range(steps_done, cfg.hyp.steps - 1):
        warm.step()
        np.testing.assert_allclose(opt.param_groups[0]["lr"],
                                   float(schedule(k + 1)), rtol=1e-6,
                                   err_msg=f"lr diverged at step {k + 1}")


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


def test_import_training_checkpoint_roundtrip(tmp_path):
    """export -> import is the identity on a plain-SGD TrainState: params,
    BN running stats, momentum buffers and the step survive the reference
    5-tuple bitwise (fp32), so a run can hop frameworks in either direction
    without numeric drift."""
    import types as _types  # noqa: F401  (parallel structure with export test)

    import jax
    import jax.numpy as jnp

    from fullbatchtraining_tpu.config import load_config
    from fullbatchtraining_tpu.models import construct_model, initialize_model
    from fullbatchtraining_tpu.pretrained import (
        export_reference_training_checkpoint, import_reference_training_checkpoint)
    from fullbatchtraining_tpu.training.optimizers import SGDState
    from fullbatchtraining_tpu.training.training import TrainState

    cfg = load_config(pathlib.Path(__file__).resolve().parent.parent / "config",
                      overrides=["model=resnet18", "hyp=fb1", "hyp.steps=16",
                                 "hyp.warmup=3", "hyp.scheduler=cosine-decay"])
    model = construct_model(cfg.model, 3, 10)
    variables = initialize_model(model, jax.random.key(1), pixels=32, channels=3)
    rng = np.random.default_rng(5)
    momentum = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape), p.dtype),
        variables["params"])
    src = TrainState(step=jnp.asarray(5, jnp.int32),
                     params=variables["params"],
                     batch_stats=variables["batch_stats"],
                     opt_state=SGDState(momentum=momentum,
                                        count=jnp.asarray(5, jnp.int32)))

    file = export_reference_training_checkpoint(src, cfg, tmp_path / "rt.pth")

    zeros = lambda t: jax.tree.map(jnp.zeros_like, t)  # noqa: E731
    template = TrainState(step=jnp.zeros((), jnp.int32),
                          params=zeros(variables["params"]),
                          batch_stats=zeros(variables["batch_stats"]),
                          opt_state=SGDState(momentum=zeros(momentum),
                                             count=jnp.zeros((), jnp.int32)))
    restored, step = import_reference_training_checkpoint(file, cfg, template)
    assert step == 5 and int(restored.step) == 5

    for tag, a, b in (("params", src.params, restored.params),
                      ("batch_stats", src.batch_stats, restored.batch_stats),
                      ("momentum", src.opt_state.momentum,
                       restored.opt_state.momentum)):
        for (pa, va), (pb, vb) in zip(
                jax.tree_util.tree_leaves_with_path(a),
                jax.tree_util.tree_leaves_with_path(b), strict=True):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                          err_msg=f"{tag}:{pa}")


def test_import_seeds_ema_from_loaded_weights(tmp_path):
    """The reference seeds its EMA model by deepcopying the model AFTER the
    checkpoint load (training/training.py:63 loads, :74 deepcopies), so the
    importer must re-seed ema_params/ema_batch_stats from the loaded weights
    rather than leave the template's init behind."""
    import jax
    import jax.numpy as jnp

    from fullbatchtraining_tpu.config import load_config
    from fullbatchtraining_tpu.models import construct_model, initialize_model
    from fullbatchtraining_tpu.pretrained import (
        export_reference_training_checkpoint, import_reference_training_checkpoint)
    from fullbatchtraining_tpu.training.optimizers import SGDState
    from fullbatchtraining_tpu.training.training import TrainState

    cfg = load_config(pathlib.Path(__file__).resolve().parent.parent / "config",
                      overrides=["model=resnet20", "model.width=8", "hyp=fb1",
                                 "hyp.steps=8", "hyp.evaluate_ema=True"])
    model = construct_model(cfg.model, 3, 10)
    variables = initialize_model(model, jax.random.key(3), pixels=32, channels=3)
    src = TrainState(step=jnp.asarray(2, jnp.int32),
                     params=variables["params"],
                     batch_stats=variables["batch_stats"],
                     opt_state=SGDState(
                         momentum=jax.tree.map(jnp.zeros_like, variables["params"]),
                         count=jnp.asarray(2, jnp.int32)))
    file = export_reference_training_checkpoint(src, cfg, tmp_path / "ema.pth")

    ones = lambda t: jax.tree.map(jnp.ones_like, t)  # noqa: E731
    template = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=ones(variables["params"]),
        batch_stats=ones(variables["batch_stats"]),
        opt_state=SGDState(momentum=ones(variables["params"]),
                           count=jnp.zeros((), jnp.int32)),
        ema_params=ones(variables["params"]),
        ema_batch_stats=ones(variables["batch_stats"]))
    restored, _ = import_reference_training_checkpoint(file, cfg, template)
    for a, b in zip(jax.tree.leaves(restored.ema_params),
                    jax.tree.leaves(restored.params), strict=True):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(restored.ema_batch_stats),
                    jax.tree.leaves(restored.batch_stats), strict=True):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_skipinit_interop_refuses_cleanly():
    """SkipInit ResNets are structurally incompatible with the reference's
    runtime skipinit layout (its isinstance-on-a-class bug, resnets.py:53-56,
    keeps post-act blocks with Skipper norm slots); both directions must fail
    with the explanatory error, not an opaque KeyError."""
    import jax

    from fullbatchtraining_tpu.config import load_config
    from fullbatchtraining_tpu.models import construct_model, initialize_model
    from fullbatchtraining_tpu.pretrained import (convert_torch_resnet,
                                                  export_torch_resnet)

    cfg = load_config(pathlib.Path(__file__).resolve().parent.parent / "config",
                      overrides=["model=resnet20", "model.width=4",
                                 "model.normalization=skipinit"])
    model = construct_model(cfg.model, 3, 10)
    variables = initialize_model(model, jax.random.key(0), pixels=32, channels=3)
    with pytest.raises(ValueError, match="SkipInit"):
        export_torch_resnet(variables)
    with pytest.raises(ValueError, match="SkipInit"):
        convert_torch_resnet({}, variables)
