"""Layer factory: pluggable convolution / normalization / nonlinearity.

TPU-native counterpart of the reference's ``get_layer_functions``
(/root/reference/fullbatch/models/utils.py:8-42). Returns constructors for
flax.linen modules. All convolutions are NHWC (TPU-native layout) and use
kaiming-normal fan-out initialization to match the reference's default
(resnets.py:112-117).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules import GhostBatchNorm

# torch's kaiming_normal_(mode='fan_out', nonlinearity='relu')
kaiming_normal_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
# torch's kaiming_normal_() defaults (mode='fan_in', relu), e.g. DenseNet init
kaiming_normal_in = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
# torch's default Conv2d init: kaiming_uniform(a=sqrt(5)) == uniform(+-1/sqrt(fan_in))
torch_default_conv = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
# torch's default Linear init: kaiming_uniform(a=sqrt(5)) == uniform(+-1/sqrt(fan_in))
torch_linear_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_default_bias(fan_in: int):
    """torch's module-default bias init: uniform(+-1/sqrt(fan_in)). flax
    cannot derive fan_in from the bias shape, so callers pass it."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _conv(features: int, kernel_size: int = 3, stride: int = 1, padding: int = 0,
          groups: int = 1, bias: bool = False, dilation: int = 1,
          padding_mode: str = "zeros", kernel_init=kaiming_normal_out,
          bias_init=nn.initializers.zeros,
          name: str | None = None) -> nn.Conv:
    if padding_mode == "zeros":
        # torch.nn.Conv2d pads by exactly `padding` regardless of dilation
        pad = [(padding, padding)] * 2 if isinstance(padding, int) else padding
    else:
        # circular/reflect/replicate: handled via explicit jnp.pad wrapper below.
        pad = "VALID"
    conv = nn.Conv(
        features=features,
        kernel_size=(kernel_size, kernel_size),
        strides=(stride, stride),
        padding=pad,
        feature_group_count=groups,
        use_bias=bias,
        kernel_dilation=(dilation, dilation),
        kernel_init=kernel_init,
        bias_init=bias_init,
        name=name,
    )
    if padding_mode == "zeros":
        return conv
    return _PaddedConv(conv=conv, padding=padding, mode=padding_mode, name=name)


class _PaddedConv(nn.Module):
    """Explicit-padding conv for circular/reflect/replicate modes (utils.py:13-15)."""

    conv: nn.Conv
    padding: int
    mode: str

    _MODES = {"circular": "wrap", "reflect": "reflect", "replicate": "edge"}

    @nn.compact
    def __call__(self, x):
        p = self.padding
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode=self._MODES[self.mode])
        return self.conv(x)


class WSConv2d(nn.Module):
    """Scaled weight-standardized convolution (NFNet; reference nfnets.py:262-291).

    Weights standardized over fan-in with a per-output-channel learnable gain:
    w' = (w - mean) * rsqrt(max(var * fan_in, eps)) * gain. Xavier-normal init
    and a bias, as in the reference.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    groups: int = 1
    bias: bool = True
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kshape = (self.kernel_size, self.kernel_size, in_features // self.groups, self.features)
        kernel = self.param("kernel", nn.initializers.xavier_normal(), kshape)
        gain = self.param("gain", nn.initializers.ones, (self.features,))
        fan_in = kshape[0] * kshape[1] * kshape[2]
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        # The reference uses torch.var (unbiased); match it.
        var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True, ddof=1)
        scale = jax.lax.rsqrt(jnp.maximum(var * fan_in, 1e-4))
        weight = (kernel - mean) * scale * gain
        out = jax.lax.conv_general_dilated(
            x,
            weight.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
            preferred_element_type=x.dtype,
        )
        if self.bias:
            # reference WSConv2D overrides only the weight (xavier,
            # nfnets.py:269); the bias keeps torch Conv2d's default uniform
            out = out + self.param("bias", torch_default_bias(fan_in),
                                   (self.features,)).astype(x.dtype)
        return out


class Identity(nn.Module):
    channels: int = 0
    scale_init: Any = None  # accepted for norm-factory compatibility, unused

    def __call__(self, x, train: bool = True):
        return x


class _TorchBatchNorm(nn.Module):
    """BatchNorm with exact torch.nn.BatchNorm2d semantics.

    flax.linen.BatchNorm updates the running variance with the BIASED batch
    variance; torch uses the UNBIASED one (factor n/(n-1)) while normalizing
    with the biased one. Matching torch here keeps eval-mode logits of
    converted checkpoints and long-trained running stats aligned with the
    reference (train-mode parity test in tests/test_model_oracles.py).
    Statistics are computed in at-least-float32 — bf16/f16 inputs upcast,
    while float64 inputs (trajectory-oracle runs) keep full double to match
    torch's all-double BN (the same promote rule as GhostBatchNorm); pass
    ``stat_dtype`` to force a dtype.
    """

    channels: int
    momentum: float = 0.9  # flax convention: ra = m * ra + (1 - m) * new
    epsilon: float = 1e-5
    scale_init: Callable = nn.initializers.ones
    stat_dtype: Any = None  # None: promote_types(x.dtype, float32)

    @nn.compact
    def __call__(self, x, train: bool = True):
        stat_dtype = self.stat_dtype or jnp.promote_types(x.dtype, jnp.float32)
        scale = self.param("scale", self.scale_init, (self.channels,), stat_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.channels,), stat_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.channels, stat_dtype))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.channels, stat_dtype))
        if train:
            xf = x.astype(stat_dtype)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            var = jnp.mean(jnp.square(xf), axes) - jnp.square(mean)
            if not self.is_initializing():
                n = x.size / self.channels
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var * (n / max(n - 1, 1)))
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x.astype(stat_dtype) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


class BatchNorm2d(nn.Module):
    """BatchNorm with torch-compatible defaults (momentum 0.1 torch = 0.9 flax).

    Kept as a thin wrapper with the stats under a ``bn`` subtree so checkpoint
    and converter paths are stable.
    """

    channels: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self, x, train: bool = True):
        return _TorchBatchNorm(self.channels, momentum=self.momentum,
                               epsilon=self.epsilon, scale_init=self.scale_init,
                               name="bn")(x, train=train)


class GroupNorm2d(nn.Module):
    channels: int
    num_groups: int = 32
    scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self, x, train: bool = True):
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5, scale_init=self.scale_init, name="gn")(x)


class LayerNorm2d(nn.Module):
    channels: int
    scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self, x, train: bool = True):
        return nn.LayerNorm(scale_init=self.scale_init, name="ln")(x)


class InstanceNorm2d(nn.Module):
    channels: int
    scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self, x, train: bool = True):
        # torch InstanceNorm2d default: no affine; normalize over H, W per sample.
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5)


def get_layer_functions(convolution_type: str, norm: str, nonlin: str):
    """Return (conv_ctor, norm_ctor, nonlin_fn) matching reference utils.py:8-42.

    conv_ctor(features, kernel_size=, stride=, padding=, groups=, bias=, dilation=)
    norm_ctor(channels) -> Module called as m(x, train=)
    nonlin_fn: elementwise function.
    """
    ct = convolution_type.lower()
    if ct in ("standard", "default", "zeros"):
        conv_layer = _conv
    elif ct in ("circular", "reflect", "replicate"):
        conv_layer = partial(_conv, padding_mode=ct)
    elif ct == "standardized":
        def conv_layer(features, kernel_size=3, stride=1, padding=0, groups=1, bias=False,
                       dilation=1, name=None, **_):
            # bias passes THROUGH (reference conv_layer = WSConv2D and the
            # callers' bias=use_bias, utils.py:14 + resnets.py:70): a
            # standardized ResNet under BatchNorm has NO conv biases
            return WSConv2d(features=features, kernel_size=kernel_size, stride=stride,
                            padding=padding, groups=groups, bias=bias, dilation=dilation, name=name)
    else:
        raise ValueError(f"Invalid convolution type {convolution_type} provided.")

    nl = norm.lower()
    if nl == "batchnorm2d":
        norm_layer = BatchNorm2d
    elif nl in ("sequentialghostnorm", "ghostnorm"):
        norm_layer = GhostBatchNorm
    elif nl == "groupnorm":
        norm_layer = partial(GroupNorm2d, num_groups=32)
    elif nl == "groupnorm1":
        norm_layer = partial(GroupNorm2d, num_groups=1)
    elif nl == "groupnorm8":
        norm_layer = lambda channels, **kw: GroupNorm2d(channels=channels, num_groups=min(8, channels), **kw)  # noqa: E731
    elif nl == "groupnorm32":
        norm_layer = lambda channels, **kw: GroupNorm2d(channels=channels, num_groups=min(32, channels), **kw)  # noqa: E731
    elif nl == "groupnorm4th":
        norm_layer = lambda channels, **kw: GroupNorm2d(channels=channels, num_groups=channels // 4, **kw)  # noqa: E731
    elif nl == "layernorm":
        norm_layer = LayerNorm2d
    elif nl == "instancenorm2d":
        norm_layer = InstanceNorm2d
    elif nl in ("skipinit", "none", "identity"):
        norm_layer = Identity
    else:
        raise ValueError(f"Invalid norm layer {norm} found.")

    nonlin_fn = get_nonlin(nonlin)
    return conv_layer, norm_layer, nonlin_fn


_NONLINS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "elu": jax.nn.elu,
    "celu": jax.nn.celu,
    "selu": jax.nn.selu,
    "leakyrelu": jax.nn.leaky_relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "softplus": jax.nn.softplus,
    "hardswish": jax.nn.hard_swish,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "identity": lambda x: x,
}


def get_nonlin(name: str) -> Callable:
    try:
        return _NONLINS[name.lower()]
    except KeyError as err:
        raise ValueError(f"Invalid nonlinearity {name}.") from err


def max_pool(x, window: int, stride: int, padding: int = 0):
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=[(padding, padding)] * 2)


def avg_pool(x, window: int, stride: int, padding: int = 0, count_include_pad: bool = True):
    """torch nn.AvgPool2d semantics incl. count_include_pad=False, where each
    window divides by the number of REAL (unpadded) elements it covers."""
    if padding and not count_include_pad:
        dims, strides = (1, window, window, 1), (1, stride, stride, 1)
        pads = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
        sums = jax.lax.reduce_window(x, jnp.zeros((), x.dtype), jax.lax.add,
                                     dims, strides, pads)
        ones = jnp.ones(x.shape[1:3], x.dtype)  # counts are per-pixel, not per-channel
        counts = jax.lax.reduce_window(ones, jnp.zeros((), x.dtype), jax.lax.add,
                                       dims[1:3], strides[1:3], pads[1:3])
        return sums / counts[None, :, :, None]
    return nn.avg_pool(x, (window, window), strides=(stride, stride),
                       padding=[(padding, padding)] * 2)


def global_avg_pool(x):
    return jnp.mean(x, axis=(1, 2))
