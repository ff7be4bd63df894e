"""Model factory: parse config and build the requested flax module.

TPU-native counterpart of /root/reference/fullbatch/models/models.py.
``construct_model`` returns a flax module; ``initialize_model`` creates the
variable collections ({'params', 'batch_stats'}) with a PRNG key.

The reference's ``prepare_model`` broadcast initial parameters from rank 0
and JIT-traced the model (models.py:55-77); under pjit both are implicit —
replicated sharding IS the broadcast, and every step function is jitted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .densenets import DenseNet, densenet_depths_to_config
from .nfnets import NFNet
from .pyramidnets import PyramidNet
from .resnets import ResNet, resnet_depths_to_config
from .vgg import VGG


class LinearDebugModel(nn.Module):
    """Flatten -> first 100 features -> Dense; debugging only (models.py:43-45)."""

    classes: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.reshape(x.shape[0], -1)[:, :100]
        return nn.Dense(self.classes, name="fc")(x)


def construct_model(cfg_model, channels: int, classes: int) -> nn.Module:
    """cfg_model templates live under config/model (mirrors models.py:14-52)."""
    name = cfg_model.name.lower()
    if "resnet" in name:
        block_type, layers = resnet_depths_to_config(cfg_model.depth)
        return ResNet(
            block_type=block_type,
            layers=layers,
            channels=channels,
            classes=classes,
            stem=cfg_model.stem,
            convolution_type=cfg_model.convolution,
            nonlin=cfg_model.nonlin_fn,
            norm=cfg_model.normalization,
            downsample=cfg_model.downsample,
            width_per_group=cfg_model.width,
            zero_init_residual="skip_residual" in str(cfg_model.initialization)
            or "skip-residual" in str(cfg_model.initialization),
        )
    if "densenet" in name:
        growth_rate, block_config, num_init_features = densenet_depths_to_config(cfg_model.depth)
        return DenseNet(
            growth_rate=growth_rate,
            block_config=block_config,
            num_init_features=num_init_features,
            bn_size=cfg_model.bn_size,
            drop_rate=cfg_model.drop_rate,
            channels=channels,
            classes=classes,
            memory_efficient=cfg_model.memory_efficient,
            norm=cfg_model.normalization,
            nonlin=cfg_model.nonlin_fn,
            stem=cfg_model.stem,
            convolution_type=cfg_model.convolution,
        )
    if "vgg" in name:
        return VGG(
            vgg_name=cfg_model.name,
            channels=channels,
            classes=classes,
            norm=cfg_model.get("normalization", "BatchNorm2d"),
            nonlin=cfg_model.get("nonlin_fn", "ReLU"),
            head=cfg_model.get("head", "CIFAR"),
            convolution_type=cfg_model.get("convolution", "Standard"),
            drop_rate=cfg_model.get("drop_rate", 0.0),
            classical_weight_init=cfg_model.get("classical_weight_init", True),
        )
    if "linear" in name:
        return LinearDebugModel(classes=classes)
    if "nfnet" in name:
        return NFNet(
            channels=channels,
            classes=classes,
            variant=cfg_model.variant,
            stochdepth_rate=cfg_model.stochdepth_rate,
            alpha=cfg_model.alpha,
            se_ratio=cfg_model.se_ratio,
            activation=cfg_model.nonlin,
            stem=cfg_model.stem,
            use_dropout=cfg_model.use_dropout,
        )
    if "pyramidnet" in name:
        return PyramidNet(
            depth=cfg_model.depth,
            alpha=cfg_model.alpha,
            channels=channels,
            classes=classes,
            bottleneck=cfg_model.bottleneck,
        )
    raise ValueError(f"Unknown model {cfg_model.name}.")


def initialize_model(model: nn.Module, key: jax.Array, pixels: int, channels: int,
                     batch: int = 2, dtype=jnp.float32) -> dict:
    """Initialize variables with a dummy NHWC batch."""
    dummy = jnp.zeros((batch, pixels, pixels, channels), dtype)
    params_key, stoch_key, drop_key = jax.random.split(key, 3)
    variables = model.init(
        {"params": params_key, "stochdepth": stoch_key, "dropout": drop_key},
        dummy, train=True,
    )
    return dict(variables)


def model_rngs(key: jax.Array) -> dict:
    """Per-call RNGs for stochastic layers (stochdepth/dropout)."""
    k1, k2 = jax.random.split(key)
    return {"stochdepth": k1, "dropout": k2}


def detect_norm_momenta(model: nn.Module, pixels: int, channels: int) -> set:
    """Running-stat momenta of every norm layer in the model.

    Collected during an abstract trace (``jax.eval_shape`` of ``model.init``
    with a flax method interceptor) — no compilation, no compute. The grouped
    accumulation scan folds vmapped per-chunk BatchNorm updates into the exact
    sequential EMA and needs to know the momentum those layers actually use;
    this makes the assumption checkable instead of silent (the reference has
    no analogue — torch BN owns its own momentum per instance).
    """
    momenta = []

    def interceptor(next_fun, args, kwargs, context):
        m = getattr(context.module, "momentum", None)
        if isinstance(m, (float, int)) and not isinstance(m, bool):
            momenta.append(round(float(m), 12))
        return next_fun(*args, **kwargs)

    dummy = jnp.zeros((2, pixels, pixels, channels), jnp.float32)
    keys = jax.random.split(jax.random.key(0), 3)
    rngs = {"params": keys[0], "stochdepth": keys[1], "dropout": keys[2]}
    with nn.intercept_methods(interceptor):
        abstract = jax.eval_shape(lambda: model.init(rngs, dummy, train=True))
    if "batch_stats" not in abstract:
        return set()
    return set(momenta)


def measure_norm_stat_decay(model: nn.Module, sub: int, pixels: int,
                            channels: int):
    """Per-leaf decay of the train-mode running-stat update, measured.

    Every norm layer here updates its stats as an affine map of the incoming
    stats, ``b = A * r_in + c(x)`` with a constant diagonal ``A`` — plain
    BatchNorm has ``A = momentum``, but GhostBatchNorm applies one EMA per
    virtual chunk so its per-FORWARD decay is ``momentum**k`` with
    ``k = batch // virtual_batch_size`` (reference SequentialGhostNorm calls
    the shared BatchNorm2d once per chunk, modules.py:31-35). The grouped
    accumulation scan's sequential BN fold needs the true per-forward decay,
    so it is measured here concretely with three probe forwards at the real
    chunk batch size (``A = b(1) - b(0)``, affinity validated against
    ``b(2) - b(1)``), in the stats' own dtype. The probe input is random so
    data-dependent nonlinear updates (e.g. a running max) land between the
    probe points and fail the affinity check (a heuristic guard: probing
    refutes affinity, it cannot prove it). Returns ``(A_tree, affine_ok)``;
    ``(None, True)`` for models without running stats.
    """
    # Everything concrete is passed as a jit ARGUMENT, never closed over:
    # a nullary jit makes the whole probe a compile-time constant and XLA's
    # HLO constant folder then evaluates three full train-mode forwards with
    # its slow single-threaded evaluator (minutes per ResNet on one core,
    # observed as a startup "hang").
    dummy = jax.random.normal(jax.random.key(1),
                              (sub, pixels, pixels, channels), jnp.float32)
    keys = jax.random.split(jax.random.key(0), 3)
    rngs = {"params": keys[0], "stochdepth": keys[1], "dropout": keys[2]}
    # Abstract-trace the stat check first so stat-free models (NFNets) skip
    # the concrete init/probe compile entirely.
    if "batch_stats" not in jax.eval_shape(
            lambda: model.init(rngs, dummy, train=True)):
        return None, True
    variables = jax.jit(model.init, static_argnames="train")(
        rngs, dummy, train=True)
    apply_rngs = {"stochdepth": keys[1], "dropout": keys[2]}

    @jax.jit
    def probes(params, batch_stats, x):
        def upd(c):
            bn = jax.tree.map(lambda v: jnp.full_like(v, c), batch_stats)
            _, out = model.apply(
                {"params": params, "batch_stats": bn}, x,
                train=True, mutable=["batch_stats"], rngs=apply_rngs)
            return out["batch_stats"]
        # probe points 0 / 0.5 / 8 (exactly representable): a kink anywhere
        # below 8 in the incoming-stat axis breaks the extrapolation check
        b0, b1, b2 = upd(0.0), upd(0.5), upd(8.0)
        decay = jax.tree.map(lambda x1, x0: (x1 - x0) * 2.0, b1, b0)
        resid = jax.tree.map(
            lambda x2, x0, a: jnp.max(jnp.abs(x2 - x0 - 8.0 * a)),
            b2, b0, decay)
        return decay, resid

    decay, resid = probes(variables["params"], variables["batch_stats"], dummy)
    affine_ok = all(float(r) <= 1e-4 for r in jax.tree.leaves(resid))
    return jax.device_get(decay) if affine_ok else None, affine_ok


def estimate_activation_bytes(model: nn.Module, pixels: int, channels: int,
                              compute_dtype=jnp.float32) -> int:
    """Per-sample activation bytes of one train-mode forward, estimated.

    Sums every flax module's output during an abstract trace (a batch-2
    probe via ``jax.eval_shape`` of ``model.init`` with a method
    interceptor — no compilation or compute, same machinery as
    :func:`detect_norm_momenta`), divided by the probe batch. Parent
    modules re-count their last child's output, so this overestimates the
    VJP residual set somewhat — fine for its consumer, the auto
    block-grouping HBM cap (``training._resolve_block_grouping``), where
    only the order of magnitude matters. The models themselves carry no
    dtype attribute — the training wrapper casts inputs AND params to the
    compute dtype (``training.forward``) — so the trace runs in float32
    and every counted element is charged ``compute_dtype``'s itemsize;
    pass the resolved ``impl.mixed_precision``/``impl.compute_dtype``
    result so bf16 recipes halve the estimate as they do at runtime.
    """
    elems = 0

    def interceptor(next_fun, args, kwargs, context):
        nonlocal elems
        out = next_fun(*args, **kwargs)
        for leaf in jax.tree.leaves(out):
            shape = getattr(leaf, "shape", None)
            if shape is not None and getattr(leaf, "dtype", None) is not None:
                elems += int(np.prod(shape))
        return out

    probe_batch = 2
    dummy = jnp.zeros((probe_batch, pixels, pixels, channels), jnp.float32)
    keys = jax.random.split(jax.random.key(0), 3)
    rngs = {"params": keys[0], "stochdepth": keys[1], "dropout": keys[2]}
    with nn.intercept_methods(interceptor):
        jax.eval_shape(lambda: model.init(rngs, dummy, train=True))
    return elems * jnp.dtype(compute_dtype).itemsize // probe_batch
