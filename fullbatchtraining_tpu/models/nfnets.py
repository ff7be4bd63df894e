"""NFNet (normalizer-free) family, TPU-native (flax.linen, NHWC).

Behavioral re-implementation of the reference NFNet
(/root/reference/fullbatch/models/nfnets.py, itself from benjs/nfnets_pytorch):
variants F0-F7, variance-preserving GELU/ReLU, signal-propagation beta/alpha
scaling with zero-init skip_gain, scaled weight-standardized convolutions
(WSConv2d in layers.py), squeeze-excite (output doubled), stochastic depth
without rescaling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (WSConv2d, avg_pool, global_avg_pool, torch_default_bias,
                     torch_linear_init)

nfnet_params = {
    "F0": {"width": [256, 512, 1536, 1536], "depth": [1, 2, 6, 3], "train_imsize": 192,
           "test_imsize": 256, "drop_rate": 0.2},
    "F1": {"width": [256, 512, 1536, 1536], "depth": [2, 4, 12, 6], "train_imsize": 224,
           "test_imsize": 320, "drop_rate": 0.3},
    "F2": {"width": [256, 512, 1536, 1536], "depth": [3, 6, 18, 9], "train_imsize": 256,
           "test_imsize": 352, "drop_rate": 0.4},
    "F3": {"width": [256, 512, 1536, 1536], "depth": [4, 8, 24, 12], "train_imsize": 320,
           "test_imsize": 416, "drop_rate": 0.4},
    "F4": {"width": [256, 512, 1536, 1536], "depth": [5, 10, 30, 15], "train_imsize": 384,
           "test_imsize": 512, "drop_rate": 0.5},
    "F5": {"width": [256, 512, 1536, 1536], "depth": [6, 12, 36, 18], "train_imsize": 416,
           "test_imsize": 544, "drop_rate": 0.5},
    "F6": {"width": [256, 512, 1536, 1536], "depth": [7, 14, 42, 21], "train_imsize": 448,
           "test_imsize": 576, "drop_rate": 0.5},
    "F7": {"width": [256, 512, 1536, 1536], "depth": [8, 16, 48, 24], "train_imsize": 480,
           "test_imsize": 608, "drop_rate": 0.5},
}

# Variance-preserving activation gains (nfnets.py:52-68).
VP_GAINS = {"gelu": 1.7015043497085571, "relu": 1.7139588594436646}


def vp_activation(name: str):
    gain = VP_GAINS[name]
    base = jax.nn.gelu if name == "gelu" else jax.nn.relu
    return lambda x: base(x) * gain


class SqueezeExcite(nn.Module):
    """SE block; the *caller* multiplies the gate by 2 (nfnets.py:243, :294-316)."""

    channels: int
    se_ratio: float = 0.5
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x):
        act = vp_activation(self.activation)
        hidden = max(1, int(self.channels * self.se_ratio))
        pooled = jnp.mean(x, axis=(1, 2))
        # reference SE uses plain nn.Linear (nfnets.py:305-306): torch
        # default weight AND bias inits
        out = nn.Dense(hidden, name="linear", kernel_init=torch_linear_init,
                       bias_init=torch_default_bias(pooled.shape[-1]))(pooled)
        out = nn.Dense(self.channels, name="linear_1",
                       kernel_init=torch_linear_init,
                       bias_init=torch_default_bias(hidden))(act(out))
        out = jax.nn.sigmoid(out)
        return out[:, None, None, :]


class NFBlock(nn.Module):
    out_channels: int
    stride: int
    alpha: float
    beta: float
    se_ratio: float
    group_size: int
    stochdepth_rate: float
    activation: str
    pad: int
    expansion: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = vp_activation(self.activation)
        in_channels = x.shape[-1]
        width = int(self.out_channels * self.expansion)
        groups = width // self.group_size
        width = self.group_size * groups

        out = act(x) * self.beta

        use_projection = self.stride > 1 or in_channels != self.out_channels
        if self.stride > 1:
            shortcut = avg_pool(out, window=2, stride=2, padding=self.pad)
            shortcut = WSConv2d(self.out_channels, kernel_size=1, name="conv_shortcut")(shortcut)
        elif use_projection:
            shortcut = WSConv2d(self.out_channels, kernel_size=1, name="conv_shortcut")(out)
        else:
            shortcut = x

        out = act(WSConv2d(width, kernel_size=1, name="conv0")(out))
        out = act(WSConv2d(width, kernel_size=3, stride=self.stride, padding=1,
                           groups=groups, name="conv1")(out))
        out = act(WSConv2d(width, kernel_size=3, stride=1, padding=1,
                           groups=groups, name="conv1b")(out))
        out = WSConv2d(self.out_channels, kernel_size=1, name="conv2")(out)
        out = (SqueezeExcite(self.out_channels, self.se_ratio, self.activation,
                             name="squeeze_excite")(out) * 2) * out

        if train and 0.0 < self.stochdepth_rate < 1.0:
            # StochDepth without rescaling, matching nfnets.py:318-333.
            rng = self.make_rng("stochdepth")
            keep = jax.random.bernoulli(rng, 1.0 - self.stochdepth_rate, (out.shape[0], 1, 1, 1))
            out = out * keep.astype(out.dtype)

        skip_gain = self.param("skip_gain", nn.initializers.zeros, ())
        return out * self.alpha * skip_gain + shortcut


class NFNet(nn.Module):
    channels: int
    classes: int
    variant: str = "F0"
    stochdepth_rate: float = 0.0
    alpha: float = 0.2
    se_ratio: float = 0.5
    activation: str = "gelu"
    stem: str = "ImageNet"
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.variant not in nfnet_params:
            raise RuntimeError(f"Variant {self.variant} does not exist.")
        params = nfnet_params[self.variant]
        act = vp_activation(self.activation)

        stride_stem = {"ImageNet": 2, "CIFAR": 1}[self.stem]
        # Stem: 4 WSConvs 16/32/64/128, no padding (nfnets.py:171-187).
        for i, (feats, s) in enumerate([(16, stride_stem), (32, 1), (64, 1), (128, stride_stem)]):
            x = WSConv2d(feats, kernel_size=3, stride=s, name=f"stem_conv{i}")(x)
            if i < 3:
                x = act(x)

        num_blocks = sum(params["depth"])
        index = 0
        expected_std = 1.0
        sd_rate = self.stochdepth_rate or 0.0
        for stage, (block_width, stage_depth, stride) in enumerate(
                zip(params["width"], params["depth"], [1, 2, 2, 2])):
            for block_index in range(stage_depth):
                beta = 1.0 / expected_std
                x = NFBlock(
                    out_channels=block_width,
                    stride=stride if block_index == 0 else 1,
                    alpha=self.alpha,
                    beta=beta,
                    se_ratio=self.se_ratio,
                    group_size=128,
                    stochdepth_rate=sd_rate * index / num_blocks,
                    activation=self.activation,
                    pad=1 if self.stem == "ImageNet" else 0,
                    name=f"block{index}",
                )(x, train=train)
                index += 1
                if block_index == 0:
                    expected_std = 1.0
                expected_std = (expected_std ** 2 + self.alpha ** 2) ** 0.5

        final_channels = 2 * params["width"][-1]
        x = act(WSConv2d(final_channels, kernel_size=1, name="final_conv")(x))
        x = global_avg_pool(x)
        if train and self.use_dropout and params["drop_rate"] > 0:
            x = nn.Dropout(params["drop_rate"], deterministic=False)(x)
        # reference overrides only the weight (normal 0.01, nfnets.py:154);
        # the bias keeps the torch Linear default uniform
        return nn.Dense(self.classes, name="linear",
                        kernel_init=nn.initializers.normal(0.01),
                        bias_init=torch_default_bias(x.shape[-1]))(x)
