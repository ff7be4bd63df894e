"""Pretrained checkpoint loading: torch .pth release format -> JAX pytrees.

Counterpart of /root/reference/hubconf.py. The reference publishes trained
ResNet checkpoints as GitHub release v1 assets in the 5-element torch.save
list [optim_state, model_state, scheduler_state, scaler_state, step]
(hubconf.py:37-40, training/utils.py:43-51). This module converts that
``model_state`` OrderedDict into this framework's flax variable collections
({'params', 'batch_stats'}), transposing conv kernels OIHW -> HWIO and
linear weights (O, I) -> (I, O).

Hub-style entry points mirror hubconf.py:71-99: resnet18_fbaug_clip /
gradreg / gradreg_v2 / highreg and resnet152_fbaug_highreg. Assets are
auto-downloaded from the v1 release URL (urllib, cached); with zero network
egress a clear error asks for a local file= path instead.
"""

from __future__ import annotations

import logging
import os
import re
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .config import from_dict
from .models import construct_model, initialize_model

log = logging.getLogger(__name__)

# Release assets (reference hubconf.py:9-16).
RELEASE_FILES = {
    "resnet18_fbaug_clip": "final_fbaug_clip_lr04_resnet18.pth",
    "resnet18_fbaug_gradreg": "final_fbaug_gradreg_lr08_resnet18.pth",
    "resnet18_fbaug_gradreg_v2": "final_fbaug_gradreg_lr16_resnet18.pth",
    "resnet18_fbaug_highreg": "final_fbaug_highreg_lr08_resnet18.pth",
    "resnet152_fbaug_highreg": "final_fbaug_highreg_lr08_shuffle_resnet152.pth",
}

_RELEASE_URL = "https://github.com/JonasGeiping/fullbatchtraining/releases/download/v1/"


def _torch_load(path):
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, (list, tuple)) and len(payload) == 5:
        _, model_state, _, _, step = payload
    else:  # bare state dict
        model_state, step = payload, 0
    # np.array (copy): .numpy() views torch storage; see convert_torch_resnet.
    return {k: np.array(v.detach().numpy() if hasattr(v, "detach") else v)
            for k, v in model_state.items()}, int(step)


# torch.nn.Sequential indices of the downsample conv/norm per variant
# (reference resnets.py:138-163: A = (conv,), B = (conv, norm),
# C = (pool, conv, norm), preact-B = (nonlin, conv), preact-C =
# (nonlin, pool, conv)).
_DOWNSAMPLE_SEQ_INDICES = {
    "A": {"conv": 0},
    "B": {"conv": 0, "norm": 1},
    "C": {"conv": 1, "norm": 2},
    "preact-B": {"conv": 1},
    "preact-C": {"conv": 2},
}

# flax (collection, leaf name) -> torch state-dict key suffix; shared by the
# ResNet mapper and every family mapper below.
_SUFFIX_MAP = {
    ("params", "kernel"): "weight", ("params", "scale"): "weight",
    ("params", "bias"): "bias",
    ("batch_stats", "mean"): "running_mean",
    ("batch_stats", "var"): "running_var",
}


def _checked_suffix(collection: str, leaf: str, parts) -> str:
    try:
        return _SUFFIX_MAP[(collection, leaf)]
    except KeyError:
        if leaf == "alpha":
            raise ValueError(
                "SkipInit ResNets have no reference state-dict "
                "correspondence: the reference's `isinstance(block, "
                "BasicBlock)` bug (resnets.py:53-56, isinstance on a class) "
                "means its runtime skipinit model keeps post-activation "
                "blocks with Skipper layers in the norm slots, while this "
                "framework implements the intended pre-activation SkipInit "
                "blocks (models/resnets.py module docstring) — the two "
                "parameterizations are structurally different, so "
                "checkpoints cannot be translated in either direction."
            ) from None
        raise KeyError(
            f"No torch suffix for leaf {leaf!r} at {'/'.join(parts)}") from None


def _to_torch_layout(value: np.ndarray, leaf: str) -> np.ndarray:
    """flax leaf -> torch layout: conv kernels HWIO -> OIHW, linear weights
    (I, O) -> (O, I), WSConv2d gains (C,) -> (C, 1, 1, 1)."""
    if leaf == "kernel":
        if value.ndim == 4:
            return value.transpose(3, 2, 0, 1)
        if value.ndim == 2:
            return value.T
    elif leaf == "gain":
        return value.reshape(-1, 1, 1, 1)
    return value


def _from_torch_layout(value: np.ndarray, leaf: str) -> np.ndarray:
    """Inverse of :func:`_to_torch_layout`."""
    if leaf == "kernel":
        if value.ndim == 4:
            return value.transpose(2, 3, 1, 0)
        if value.ndim == 2:
            return value.T
    elif leaf == "gain":
        return value.reshape(-1)
    return value


def _torch_key_for(path_parts: list[str], leaf: str, collection: str,
                   downsample_indices: dict | None = None) -> str | None:
    """Map a flax parameter path to the reference ResNet state-dict key.

    Reference module layout (resnets.py): stem = Sequential(conv, bn, nonlin
    [, maxpool]); layers = Sequential of stage-Sequentials of blocks;
    downsample variants place the conv/norm at Sequential indices depending
    on the variant (``downsample_indices``, default variant 'C' — the import
    path shape-probes the alternatives, the export path passes the exact
    variant); classifier is ``fc``.
    """
    name = path_parts[0]
    suffix = _checked_suffix(collection, leaf, [*path_parts, leaf])

    if name == "fc":
        return f"fc.{suffix}"
    if name.startswith("stem_conv"):
        idx = int(name.removeprefix("stem_conv")) - 1
        return f"stem.{3 * idx}.{suffix}"
    if name.startswith("stem_bn"):
        idx = int(name.removeprefix("stem_bn")) - 1
        return f"stem.{3 * idx + 1}.{suffix}"

    match = re.fullmatch(r"layer(\d+)_block(\d+)", name)
    if match:
        stage, block = int(match.group(1)) - 1, int(match.group(2))
        inner = path_parts[1]
        if inner == "downsample":
            kind = path_parts[2]  # 'conv' or 'norm'
            idx = (downsample_indices or _DOWNSAMPLE_SEQ_INDICES["C"])[kind]
            return f"layers.{stage}.{block}.downsample.{idx}.{suffix}"
        # conv1/bn1/conv2/... map 1:1
        return f"layers.{stage}.{block}.{inner}.{suffix}"
    return None


def convert_torch_resnet(model_state: dict, variables: dict) -> dict:
    """Fill the flax variables with the reference ResNet torch state dict."""
    converted = {"params": jax.device_get(variables["params"]),
                 "batch_stats": jax.device_get(variables.get("batch_stats", {}))}
    missing = []

    def visit(collection):
        flat, treedef = jax.tree_util.tree_flatten_with_path(converted[collection])
        new_leaves = []
        for path, leaf in flat:
            parts = [p.key for p in path]
            # strip the flax BatchNorm wrapper level ('bn') for key mapping
            logical = [p for p in parts[:-1] if p != "bn"]
            key = _torch_key_for(logical, parts[-1], collection)
            value = None
            if key is not None:
                def shape_ok(v):
                    if v is None:
                        return False
                    return _from_torch_layout(v, parts[-1]).shape == leaf.shape

                # Sequential indices differ by downsample variant:
                # A: (conv,) -> 0 ; B: (conv, norm) -> 0, 1 ; C: (pool, conv,
                # norm) -> 1, 2. Probe candidates and accept by shape.
                candidates = [key]
                if ".downsample." in key:
                    for a, b in (("1.", "0."), ("2.", "1.")):
                        candidates.append(key.replace(f".downsample.{a}",
                                                      f".downsample.{b}"))
                for cand in candidates:
                    if shape_ok(model_state.get(cand)):
                        value = model_state[cand]
                        break
            if value is None:
                missing.append("/".join(parts))
                new_leaves.append(leaf)
                continue
            value = _from_torch_layout(value, parts[-1])
            assert value.shape == leaf.shape, \
                f"{'/'.join(parts)}: {value.shape} != {leaf.shape}"
            # jnp.array (copy=True): on the CPU backend jnp.asarray would
            # ALIAS a numpy view of torch storage, so later in-place torch
            # mutations (e.g. BN running-stat updates) would silently change
            # the converted arrays.
            new_leaves.append(jnp.array(value, leaf.dtype))
        converted[collection] = jax.tree.unflatten(treedef, new_leaves)

    visit("params")
    if converted["batch_stats"]:
        visit("batch_stats")
    if missing:
        raise KeyError(f"Unmapped parameters during conversion: {missing[:10]}")
    return converted


def export_torch_resnet(variables: dict, downsample: str = "C",
                        step: int = 0) -> dict:
    """Inverse of :func:`convert_torch_resnet`: flax variables -> the
    reference torch ResNet state dict (reference key names, conv kernels
    HWIO -> OIHW, linear weights (I, O) -> (O, I)).

    ``downsample`` selects the reference Sequential layout of the shortcut
    branch (resnets.py:138-163) — unlike the import direction, which probes
    by shape, the export direction must know the variant to place keys at
    the right indices. Each BatchNorm additionally gets the
    ``num_batches_tracked`` buffer torch's strict ``load_state_dict``
    requires (set to ``step``; the reference's momentum-EMA BNs never read
    it back).

    Returns numpy arrays; :func:`save_reference_checkpoint` wraps them in
    torch tensors and the release 5-tuple.
    """
    if downsample not in _DOWNSAMPLE_SEQ_INDICES:
        raise ValueError(f"Unknown downsample variant {downsample!r}")
    ds_indices = _DOWNSAMPLE_SEQ_INDICES[downsample]
    state_dict: dict[str, np.ndarray] = {}

    def visit(collection, tree):
        flat, _ = jax.tree_util.tree_flatten_with_path(tree)
        for path, leaf in flat:
            parts = [p.key for p in path]
            logical = [p for p in parts[:-1] if p != "bn"]
            key = _torch_key_for(logical, parts[-1], collection,
                                 downsample_indices=ds_indices)
            if key is None:
                raise KeyError(
                    f"Cannot map {'/'.join(parts)} to a reference ResNet key "
                    "— export_torch_resnet covers the ResNet family only "
                    "(the reference release format, hubconf.py:9-16).")
            # dtype preserved: fp32 states export fp32 (the release format);
            # fp64 trajectory-oracle states round-trip exactly
            value = _to_torch_layout(np.asarray(jax.device_get(leaf)),
                                     parts[-1])
            # order="C": contiguous copy that PRESERVES 0-d shapes
            # (ascontiguousarray would promote scalars to (1,))
            state_dict[key] = np.array(value, order="C")

    visit("params", variables["params"])
    if variables.get("batch_stats"):
        visit("batch_stats", variables["batch_stats"])
    for key in [k for k in state_dict if k.endswith(".running_mean")]:
        state_dict[key.replace(".running_mean", ".num_batches_tracked")] = \
            np.asarray(step, np.int64)
    return state_dict


def save_reference_checkpoint(variables: dict, file, downsample: str = "C",
                              step: int = 0, optim_state: dict | None = None,
                              scheduler_state: dict | None = None,
                              scaler_state=None, model_cfg=None):
    """Write the reference's 5-element torch checkpoint [optim_state,
    model_state, scheduler_state, scaler_state, step]
    (reference training/utils.py:43-51) from flax variables, loadable by
    every reference consumer of the format: ``torch.hub`` release entries
    (hubconf.py:37-40), ``verify_model_checkpoint.py:30-34`` and
    ``crunch.py:27-32`` — all of which read only ``model_state`` and
    ``step``. Pass ``model_cfg`` to export any model family
    (:func:`export_torch_state`); without it, the ResNet release layout
    with the given ``downsample`` variant is assumed. The
    optimizer/scheduler slots default to empty dicts; pass explicit dicts
    (see :func:`export_reference_training_checkpoint`) to fill them.
    """
    import torch

    if model_cfg is not None:
        raw = export_torch_state(variables, model_cfg, step=step)
    else:
        raw = export_torch_resnet(variables, downsample=downsample, step=step)
    # torch.tensor COPIES: device_get leaves can be non-writable views, which
    # from_numpy would wrap with an undefined-behavior warning.
    model_state = {k: torch.tensor(v) for k, v in raw.items()}
    file = Path(file)
    file.parent.mkdir(parents=True, exist_ok=True)
    torch.save([optim_state or {}, model_state, scheduler_state or {},
                scaler_state, int(step)], file)
    log.info("Exported reference-format checkpoint (%d tensors, step %d) to %s",
             len(model_state), step, file)
    return file


# ---------------------------------------------------------------------------
# Family-generic state-dict interop: key mappers for the non-ResNet model
# families, shared by the export (flax -> torch .pth) and import
# (torch -> flax) directions. The reference's checkpoint machinery saves
# state_dicts of ANY of its model families (training/utils.py:43-51), so
# two-way interop cannot stop at the ResNet release format. Layout sources:
# /root/reference/fullbatch/models/{densenets,vgg,nfnets,pyramidnets}.py.
# Each mapper takes (logical_parts, leaf, collection) where logical_parts is
# the flax module path with the BatchNorm2d wrapper level ('bn') stripped
# and the leaf name removed, and returns the reference state-dict key.
# ---------------------------------------------------------------------------

def _densenet_key(parts, leaf, collection):
    """Reference DenseNet key (densenets.py: torchvision layout —
    features.conv0/norm0 stem, denseblock{i}.denselayer{j}.{norm,conv}{1,2},
    transition{i}.{norm,conv}, norm5, classifier)."""
    suffix = _checked_suffix(collection, leaf, parts)
    name = parts[0]
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
    raise KeyError(f"Unmapped DenseNet module {name!r}")


def _vgg_key_factory(vgg_name: str, head: str):
    """Reference VGG key mapper (vgg.py:45-68): features is a flat
    Sequential of (conv, norm, nonlin) per plan entry, +1 per 'M' pool;
    the classifier is a bare Linear (CIFAR), Sequential(pool, Linear)
    (TinyImageNet) or the 8-slot ImageNet MLP (Linears at 1/4/7)."""
    from .models.vgg import VGG_PLANS

    conv_to_seq, seq, idx = {}, 0, 0
    for entry in VGG_PLANS[vgg_name.upper()]:
        if entry == "M":
            seq += 1
        else:
            conv_to_seq[idx] = seq
            seq += 3
            idx += 1

    def mapper(parts, leaf, collection):
        suffix = _checked_suffix(collection, leaf, parts)
        name = parts[0]
        if name == "classifier":
            if head == "CIFAR":
                return f"classifier.{suffix}"
            if head == "TinyImageNet":
                return f"classifier.1.{suffix}"
            return f"classifier.7.{suffix}"
        if name == "fc1":
            return f"classifier.1.{suffix}"
        if name == "fc2":
            return f"classifier.4.{suffix}"
        kind, i = name[:4], int(name[4:])
        base = conv_to_seq[i] + (0 if kind == "conv" else 1)
        return f"features.{base}.{suffix}"

    return mapper


def _nfnet_key(parts, leaf, collection):
    """Reference NFNet key (nfnets.py: stem.conv{n}, body.{i} blocks,
    final_conv, linear; WSConv2d carries a per-channel 'gain' and blocks a
    scalar 'skip_gain' — no running stats anywhere)."""
    name = parts[0]
    if name.startswith("stem_conv"):
        base, rest = f"stem.conv{name.removeprefix('stem_conv')}", []
    elif name.startswith("block"):
        base, rest = f"body.{name.removeprefix('block')}", parts[1:]
    elif name in ("final_conv", "linear"):
        base, rest = name, []
    else:
        raise KeyError(f"Unmapped NFNet module {name!r}")
    if leaf == "skip_gain":
        return f"{base}.skip_gain"
    suffix = {"kernel": "weight", "gain": "gain", "bias": "bias"}[leaf]
    return ".".join([base, *rest, suffix])


def _pyramidnet_key(parts, leaf, collection):
    """Reference PyramidNet key (pyramidnets.py: layer{s} Sequentials of
    blocks with conv/bn modules named 1:1; top-level conv1/bn_final/fc)."""
    suffix = _checked_suffix(collection, leaf, parts)
    name = parts[0]
    match = re.fullmatch(r"layer(\d+)_block(\d+)", name)
    if match:
        return f"layer{match.group(1)}.{match.group(2)}.{parts[1]}.{suffix}"
    return f"{name}.{suffix}"


def _family_key_mapper(cfg_model):
    """Dispatch a key mapper by model family, mirroring
    models.construct_model's name matching (models/models.py:39-106)."""
    name = str(cfg_model.name).lower()
    if "densenet" in name:
        return _densenet_key
    if "vgg" in name:
        return _vgg_key_factory(str(cfg_model.name),
                                str(cfg_model.get("head", "CIFAR")))
    if "linear" in name:
        raise ValueError(
            "The linear debug model has no reference state-dict layout: the "
            "reference's is a 2-layer Sequential MLP (models.py:41-43), ours "
            "a single Dense — both are debug-only and neither is released.")
    if "nfnet" in name:
        return _nfnet_key
    if "pyramidnet" in name:
        return _pyramidnet_key
    raise ValueError(f"Unknown model family {cfg_model.name!r} for "
                     "state-dict interop")


def export_torch_state(variables: dict, cfg_model, step: int = 0) -> dict:
    """flax variables -> the reference torch state dict for ANY reference
    model family (ResNets dispatch to :func:`export_torch_resnet`, which
    additionally needs the downsample Sequential layout). Conv kernels
    HWIO -> OIHW, linear weights (I, O) -> (O, I), NFNet gains
    (C,) -> (C, 1, 1, 1); every BatchNorm gets the ``num_batches_tracked``
    buffer torch's strict ``load_state_dict`` requires."""
    name = str(cfg_model.name).lower()
    if "resnet" in name:
        return export_torch_resnet(
            variables, downsample=str(cfg_model.get("downsample", "C")),
            step=step)
    mapper = _family_key_mapper(cfg_model)
    state_dict: dict[str, np.ndarray] = {}

    def visit(collection, tree):
        flat, _ = jax.tree_util.tree_flatten_with_path(tree)
        for path, leaf_val in flat:
            parts = [p.key for p in path]
            logical = [p for p in parts[:-1] if p != "bn"]
            key = mapper(logical, parts[-1], collection)
            value = _to_torch_layout(np.asarray(jax.device_get(leaf_val)),
                                     parts[-1])
            # order="C" (NOT ascontiguousarray, which promotes 0-d scalars
            # like NFNet skip_gain to shape (1,))
            state_dict[key] = np.array(value, order="C")

    visit("params", variables["params"])
    if variables.get("batch_stats"):
        visit("batch_stats", variables["batch_stats"])
    for key in [k for k in state_dict if k.endswith(".running_mean")]:
        state_dict[key.replace(".running_mean", ".num_batches_tracked")] = \
            np.asarray(step, np.int64)
    return state_dict


def convert_torch_state(model_state: dict, variables: dict, cfg_model) -> dict:
    """torch state dict -> flax variables for ANY reference model family
    (inverse of :func:`export_torch_state`; ResNets dispatch to the
    shape-probing :func:`convert_torch_resnet`)."""
    name = str(cfg_model.name).lower()
    if "resnet" in name:
        return convert_torch_resnet(model_state, variables)
    mapper = _family_key_mapper(cfg_model)
    converted = {"params": jax.device_get(variables["params"]),
                 "batch_stats": jax.device_get(variables.get("batch_stats", {}))}

    def visit(collection):
        flat, treedef = jax.tree_util.tree_flatten_with_path(converted[collection])
        new_leaves = []
        for path, leaf in flat:
            parts = [p.key for p in path]
            logical = [p for p in parts[:-1] if p != "bn"]
            key = mapper(logical, parts[-1], collection)
            if key not in model_state:
                raise KeyError(f"Checkpoint is missing {key} "
                               f"(for {'/'.join(parts)})")
            value = _from_torch_layout(np.asarray(model_state[key]),
                                       parts[-1])
            assert value.shape == leaf.shape, \
                f"{'/'.join(parts)}: {value.shape} != {leaf.shape}"
            # copy (see convert_torch_resnet): never alias torch storage
            new_leaves.append(jnp.array(value, leaf.dtype))
        converted[collection] = jax.tree.unflatten(treedef, new_leaves)

    visit("params")
    if converted["batch_stats"]:
        visit("batch_stats")
    return converted


# ---------------------------------------------------------------------------
# Training-resume export: the optimizer and scheduler slots of the 5-tuple,
# so reference-side training can CONTINUE a run trained here
# (reference training/utils.py:54-70 _load_from_checkpoint).
# ---------------------------------------------------------------------------


def _torch_param_rank(key: str) -> tuple:
    """Registration-order rank of a torch ResNet PARAMETER key.

    torch optimizer state is keyed by the enumeration index of
    ``model.parameters()``, which follows module registration order
    (reference resnets.py __init__: stem Sequential, then stages/blocks —
    within a block convN/bnN in definition order with downsample LAST,
    resnets.py:198-211 / Bottleneck — then fc). Oracle-pinned against the
    reference's own named_parameters() in tests/test_pretrained.py."""
    leaf = 0 if key.endswith(".weight") else 1
    parts = key.split(".")
    if parts[0] == "stem":
        return (0, int(parts[1]), 0, 0, leaf)
    if parts[0] == "layers":
        stage, block, inner = int(parts[1]), int(parts[2]), parts[3]
        if inner == "downsample":
            return (1, stage, block, 100 + int(parts[4]), leaf)
        rank = {"conv1": 0, "bn1": 1, "conv2": 2, "bn2": 3,
                "conv3": 4, "bn3": 5}[inner]
        return (1, stage, block, rank, leaf)
    if parts[0] == "fc":
        return (2, 0, 0, 0, leaf)
    raise KeyError(f"Unknown torch ResNet parameter key {key!r}")


def torch_parameter_keys(model_state: dict) -> list[str]:
    """The torch ``model.parameters()`` order for a ResNet state dict."""
    params = [k for k in model_state if not k.endswith(
        ("running_mean", "running_var", "num_batches_tracked"))]
    return sorted(params, key=_torch_param_rank)


def export_torch_sgd_state(momentum_by_key: dict | None, param_order: list[str],
                           lr_next: float, cfg_optim) -> dict:
    """torch.optim.SGD.state_dict() for the 5-tuple's optim slot.

    ``momentum_by_key``: torch-keyed momentum buffers (this framework's
    SGDState.momentum is torch-exact, optimizers.py:94-133) — None or empty
    before the first step, matching torch's lazily-created state.
    ``lr_next``: the group lr the NEXT step will consume (the reference
    loop steps the scheduler after the optimizer, training.py:237-238, so
    a saved group carries the already-advanced lr). Single param group
    (hyp.only_linear_layers_weight_decay=False, the recipe default)."""
    import torch

    state = {}
    if momentum_by_key:
        missing = [k for k in param_order if k not in momentum_by_key]
        if missing:
            raise KeyError(f"Momentum buffers missing for {missing[:5]}")
        state = {i: {"momentum_buffer": torch.tensor(momentum_by_key[k])}
                 for i, k in enumerate(param_order)}
    group = {
        "lr": float(lr_next),
        "momentum": float(cfg_optim.momentum),
        "dampening": float(cfg_optim.get("dampening", 0.0) or 0.0),
        "weight_decay": float(cfg_optim.get("weight_decay", 0.0) or 0.0),
        "nesterov": bool(cfg_optim.get("nesterov", False)),
        # modern-torch group keys (absent in torch 1.9; harmless there)
        "maximize": False, "foreach": None, "differentiable": False,
        "fused": None,
        "params": list(range(len(param_order))),
    }
    return {"state": state, "param_groups": [group]}


def export_torch_scheduler_state(cfg_hyp, steps_done: int,
                                 n_groups: int = 1) -> dict:
    """The scheduler slot of the 5-tuple after ``steps_done`` training steps.

    Replays REAL torch schedulers built exactly like the reference
    (optimizers.py:69-91: MultiStepLR at steps//2.667/1.6/1.142 for
    'linear', CosineAnnealingLR variants, the empty MultiStepLR for null,
    all wrapped in GradualWarmupScheduler when warmup > 0) for
    ``steps_done`` step() calls, then serializes in the reference's
    format: the warmup wrapper's custom state_dict stores its own attrs
    plus the after-scheduler's attr dict (scheduler.py:92-101); bare
    schedulers use torch's standard state_dict."""
    import torch

    base_lr = float(cfg_hyp.optim.lr)
    steps = int(cfg_hyp.steps)
    opt = torch.optim.SGD(
        [torch.nn.Parameter(torch.zeros(1)) for _ in range(n_groups)],
        lr=base_lr)
    name = cfg_hyp.scheduler
    sched = torch.optim.lr_scheduler
    if name == "linear":
        after = sched.MultiStepLR(opt, milestones=[
            steps // 2.667, steps // 1.6, steps // 1.142], gamma=0.1)
    elif name == "exponential":
        after = sched.ExponentialLR(opt, gamma=0.99)
    elif name == "cosine-decay-floored":
        after = sched.CosineAnnealingLR(opt, steps, eta_min=base_lr / 25)
    elif name == "cosine-decay":
        after = sched.CosineAnnealingLR(opt, steps, eta_min=0.0)
    elif name == "cosine-4000":
        after = sched.CosineAnnealingLR(opt, 4000, eta_min=0.0)
    elif name in ("", " ", None):
        after = sched.MultiStepLR(opt, milestones=[], gamma=1)
    else:
        raise ValueError(f"Invalid scheduler {name} provided.")

    warmup = int(cfg_hyp.warmup or 0)
    if warmup <= 0:
        for _ in range(steps_done):
            after.step()
        return after.state_dict()

    _Base = getattr(sched, "LRScheduler", None) or sched._LRScheduler

    class _GradualWarmupReplica(_Base):
        """Behavioral replica of the reference GradualWarmupScheduler
        (additional_optimizers/scheduler.py:32-101) used ONLY to replay
        and serialize scheduler state for exports: lr ramps base*epoch/total
        (multiplier 1.0), the first post-warmup get_lr flips `finished` and
        re-bases the after-scheduler, after which step() delegates."""

        def __init__(self, optimizer, total_epoch, after_scheduler):
            self.multiplier = 1.0
            self.total_epoch = total_epoch
            self.after_scheduler = after_scheduler
            self.finished = False
            super().__init__(optimizer)

        def get_lr(self):
            if self.last_epoch > self.total_epoch:
                if not self.finished:
                    self.after_scheduler.base_lrs = [
                        b * self.multiplier for b in self.base_lrs]
                    self.finished = True
                return list(self.after_scheduler.get_last_lr())
            return [b * (float(self.last_epoch) / self.total_epoch)
                    for b in self.base_lrs]

        def step(self, epoch=None):
            if self.finished and self.after_scheduler:
                self.after_scheduler.step(
                    epoch - self.total_epoch if epoch is not None else None)
                self._last_lr = list(self.after_scheduler.get_last_lr())
            else:
                super().step(epoch)

    warm = _GradualWarmupReplica(opt, warmup, after)
    for _ in range(steps_done):
        warm.step()
    payload = {k: v for k, v in warm.__dict__.items()
               if k not in ("optimizer", "after_scheduler")}
    payload["after_scheduler"] = {k: v for k, v in after.__dict__.items()
                                  if k != "optimizer"}
    return payload


def export_reference_training_checkpoint(state, cfg, file, schedule=None):
    """Full 5-tuple export from a TrainState: model weights PLUS the
    optimizer momentum and scheduler state, so the reference's own
    ``_load_from_checkpoint`` (training/utils.py:54-70) resumes training
    mid-run from a model trained here. Falls back to weights-only (empty
    optim/scheduler slots) with a log line when the run's optimizer is not
    the plain-SGD family the torch layout maps to."""
    from .training.optimizers import make_lr_schedule

    step = int(np.asarray(jax.device_get(state.step)))
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    exportable = (
        cfg.hyp.optim.name == "Gradient Descent"
        and cfg.hyp.optim.get("line_search", "none") == "none"
        and not cfg.hyp.get("only_linear_layers_weight_decay", False)
        and cfg.hyp.optim_modification.name in (None, "none")
        and getattr(state.opt_state, "momentum", None) is not None
        # torch optimizer state is keyed by parameters() enumeration index;
        # the registration-order ranking is oracle-pinned for ResNets only
        and "resnet" in str(cfg.model.name).lower())
    if not exportable:
        log.info("Optimizer %s (model %s) has no torch-resumable state "
                 "layout: exporting weights-only (empty optim/scheduler "
                 "slots).", cfg.hyp.optim.name, cfg.model.name)
        return save_reference_checkpoint(variables, file, step=step,
                                         model_cfg=cfg.model)

    downsample = str(cfg.model.get("downsample", "C"))
    model_state = export_torch_resnet(variables, downsample=downsample,
                                      step=step)
    momentum_by_key = None
    if step > 0 and float(cfg.hyp.optim.momentum):
        # torch SGD state is lazily created: no buffers before the first
        # step or with momentum=0
        momentum_by_key = export_torch_resnet(
            {"params": jax.device_get(state.opt_state.momentum)},
            downsample=downsample)
    schedule = schedule or make_lr_schedule(cfg.hyp)
    lr_next = float(np.asarray(jax.device_get(schedule(step))))
    optim_state = export_torch_sgd_state(
        momentum_by_key, torch_parameter_keys(model_state), lr_next,
        cfg.hyp.optim)
    scheduler_state = export_torch_scheduler_state(cfg.hyp, step)
    return save_reference_checkpoint(
        variables, file, downsample=downsample, step=step,
        optim_state=optim_state, scheduler_state=scheduler_state)


def import_torch_sgd_state(optim_state: dict, param_order: list[str]) -> dict:
    """Inverse of :func:`export_torch_sgd_state`: torch SGD ``state_dict()``
    -> momentum buffers keyed by torch PARAMETER key. torch keys its state
    by the ``model.parameters()`` enumeration index (possibly serialized as
    strings); ``param_order`` supplies that enumeration. Empty when the
    checkpoint predates the first step (torch state is lazily created)."""
    buffers = {}
    for idx, slot in (optim_state.get("state") or {}).items():
        buf = slot.get("momentum_buffer")
        if buf is None:
            continue
        key = param_order[int(idx)]
        buffers[key] = np.asarray(buf.detach().cpu().numpy()
                                  if hasattr(buf, "detach") else buf)
    return buffers


def import_reference_training_checkpoint(file, cfg, state, schedule=None):
    """Inverse of :func:`export_reference_training_checkpoint`: read a
    reference ``.pth`` 5-tuple and fill the template ``TrainState`` so
    training CONTINUES here from a reference-side run (the migration
    direction: reference users switch frameworks mid-run). Returns
    ``(state, step)``.

    Model weights and BN stats import for every family
    (:func:`convert_torch_state`); SGD momentum imports for the plain-SGD +
    ResNet combination whose parameter enumeration is oracle-pinned
    (anything else continues with fresh optimizer state and a log line,
    exactly mirroring the export direction's fallback). The scheduler slot
    needs no import — our schedule is a pure function of the step — but the
    saved group lr is cross-checked against ``schedule(step)`` to catch a
    cfg/checkpoint hyp mismatch early."""
    import torch

    from .training.optimizers import SGDState, make_lr_schedule

    optim_state, model_state, scheduler_state, scaler_state, step = torch.load(
        file, map_location="cpu", weights_only=False)
    step = int(step)
    model_np = {k: np.asarray(v.detach().cpu().numpy()
                              if hasattr(v, "detach") else v)
                for k, v in model_state.items()}
    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    converted = convert_torch_state(model_np, variables, cfg.model)
    state = state.replace(params=converted["params"],
                          batch_stats=converted["batch_stats"],
                          step=jnp.asarray(step, jnp.int32))
    if state.ema_params is not None:
        # Re-seed EMA from the LOADED weights, as the reference does on
        # resume (training/training.py:63 loads into the model, :74
        # deepcopies it into ema_model) — otherwise evaluate_ema runs would
        # pair checkpoint weights with the template's random-init EMA.
        state = state.replace(
            ema_params=jax.tree.map(jnp.array, converted["params"]),
            ema_batch_stats=jax.tree.map(jnp.array,
                                         converted["batch_stats"]))

    momentum_importable = (
        isinstance(state.opt_state, SGDState)
        and "resnet" in str(cfg.model.name).lower()
        and (optim_state or {}).get("state"))
    if momentum_importable:
        momentum_by_key = import_torch_sgd_state(
            optim_state, torch_parameter_keys(model_np))
        # reuse the shape-probing ResNet converter on the momentum tree
        # (parameter keys, no running stats)
        mom = convert_torch_resnet(momentum_by_key,
                                   {"params": jax.device_get(
                                       state.opt_state.momentum)})
        state = state.replace(opt_state=SGDState(
            momentum=mom["params"], count=jnp.asarray(step, jnp.int32)))
    elif optim_state:
        log.info("Optimizer slot not importable for model %s (momentum "
                 "maps for plain-SGD ResNets only): continuing with fresh "
                 "optimizer state.", cfg.model.name)

    groups = (optim_state or {}).get("param_groups") or []
    if groups and "lr" in groups[0]:
        schedule = schedule or make_lr_schedule(cfg.hyp)
        lr_here = float(np.asarray(jax.device_get(schedule(step))))
        lr_saved = float(groups[0]["lr"])
        if not np.isclose(lr_here, lr_saved, rtol=1e-5, atol=1e-12):
            log.warning(
                "Checkpoint lr %.6g != schedule(%d)=%.6g — the hyp config "
                "does not match the run that wrote this checkpoint.",
                lr_saved, step, lr_here)
    if scaler_state:
        log.info("Ignoring the grad-scaler slot: bf16 on TPU needs no loss "
                 "scaling (the reference only populates it under AMP).")
    return state, step


def _model_cfg(depth: int, width: int = 64, downsample: str = "C"):
    return from_dict({
        "name": f"ResNet{depth}", "depth": depth, "width": width, "stem": "CIFAR",
        "convolution": "Standard", "nonlin_fn": "ReLU",
        "normalization": "BatchNorm2d", "downsample": downsample,
        "initialization": "skip-residual",
    })


def _fetch_release_asset(url: str, cache_dir: Path | None = None,
                         progress: bool = True) -> Path:
    """Download a release asset with urllib (reference hubconf.py:37-40 uses
    torch.hub.load_state_dict_from_url, whose ``progress`` flag we honor as
    per-MiB progress logging). Cached under ~/.cache; raises a clear error
    in zero-egress environments. file:// URLs work offline."""
    import urllib.error
    import urllib.request

    cache_dir = Path(cache_dir or Path.home() / ".cache" / "fullbatchtraining_tpu")
    cache_dir.mkdir(parents=True, exist_ok=True)
    target = cache_dir / url.rsplit("/", 1)[-1]
    if target.exists():
        return target
    log.info("Downloading %s -> %s", url, target)
    # pid-unique tmp: two processes downloading the same asset concurrently
    # (multi-host, shared cache) must not interleave writes into one file
    # and then atomically install the corrupt result
    tmp = target.with_suffix(f".{os.getpid()}.tmp")
    try:
        with urllib.request.urlopen(url, timeout=60) as response, open(tmp, "wb") as out:
            total = int(response.headers.get("Content-Length") or 0)
            done = 0
            while chunk := response.read(1 << 20):
                out.write(chunk)
                done += len(chunk)
                if progress:
                    log.info("  %.1f MiB%s", done / 2**20,
                             f" / {total / 2**20:.1f}" if total else "")
    except (urllib.error.URLError, OSError) as err:
        tmp.unlink(missing_ok=True)
        raise RuntimeError(
            f"Could not download {url} ({err}). This environment may have no "
            f"network egress: download the asset manually and pass its local "
            f"path via file=..."
        ) from err
    tmp.replace(target)
    return target


def load_pretrained(entry: str, file: str | Path | None = None,
                    channels: int = 3, classes: int = 10,
                    pretrained: bool = True, progress: bool = True):
    """Build the model + converted variables for a hub entry.

    ``file``: local path or URL (http/https/file) of the release .pth asset.
    When None, the asset is fetched from the v1 GitHub release URL (reference
    hubconf.py:37-40) — offline, a clear error points at file=.
    ``pretrained=False`` skips weight loading and returns the randomly
    initialized model (reference hubconf gates the download on the flag).
    ``progress`` toggles download progress logging (the reference forwards
    it to load_state_dict_from_url).
    """
    if entry not in RELEASE_FILES:
        raise ValueError(f"Unknown entry {entry}. Available: {sorted(RELEASE_FILES)}")
    depth = 152 if "152" in entry else 18
    cfg_model = _model_cfg(depth)
    model = construct_model(cfg_model, channels, classes)
    variables = initialize_model(model, jax.random.key(0), pixels=32, channels=channels)

    if not pretrained:
        log.info("pretrained=False: returning randomly initialized %s.", entry)
        return model, variables
    if file is None:
        file = _fetch_release_asset(_RELEASE_URL + RELEASE_FILES[entry],
                                    progress=progress)
    elif isinstance(file, str) and file.split("://")[0] in ("http", "https", "file"):
        file = _fetch_release_asset(file, progress=progress)
    model_state, step = _torch_load(file)
    variables = convert_torch_resnet(model_state, variables)
    log.info("Loaded %s (trained to step %d).", entry, step)
    return model, variables


def __getattr__(name):
    """hub-style callables: pretrained.resnet18_fbaug_highreg(file=...).

    Defaults mirror hubconf.py:71-99 (pretrained=False), unlike the explicit
    library call load_pretrained(entry) which defaults to loading weights."""
    if name in RELEASE_FILES:
        return lambda file=None, pretrained=False, **kw: load_pretrained(
            name, file=file, pretrained=pretrained, **kw)
    raise AttributeError(name)
