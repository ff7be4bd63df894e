"""PyramidNet (CIFAR), TPU-native (flax.linen, NHWC).

Behavioral re-implementation of the reference PyramidNet
(/root/reference/fullbatch/models/pyramidnets.py, from
dyhan0920/PyramidNet-PyTorch): additive channel widening by alpha/(3n) per
block, pre-activation blocks with a trailing BN, zero-padded channel
shortcuts, average-pool downsampling.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import (_TorchBatchNorm, avg_pool, global_avg_pool,
                     kaiming_normal_out, torch_default_bias, torch_linear_init)


def _conv(features, kernel_size=3, stride=1, padding=1, name=None):
    return nn.Conv(features, (kernel_size, kernel_size), strides=(stride, stride),
                   padding=[(padding, padding)] * 2, use_bias=False,
                   kernel_init=kaiming_normal_out, name=name)


def _bn(name):
    # _TorchBatchNorm: torch-exact running-stat updates (see layers.py)
    return lambda x, train: _TorchBatchNorm(x.shape[-1], name=name)(x, train=train)


def _shortcut_add(out, shortcut):
    """out += shortcut zero-padded along channels (pyramidnets.py:63-72)."""
    extra = out.shape[-1] - shortcut.shape[-1]
    if extra > 0:
        shortcut = jnp.pad(shortcut, ((0, 0), (0, 0), (0, 0), (0, extra)))
    return out + shortcut


class PyramidBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        out = _bn("bn1")(x, train)
        out = _conv(self.planes, 3, self.stride, 1, name="conv1")(out)
        out = _bn("bn2")(out, train)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, 1, name="conv2")(out)
        out = _bn("bn3")(out, train)
        shortcut = avg_pool(x, window=2, stride=2) if self.downsample else x
        return _shortcut_add(out, shortcut)


class PyramidBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    outchannel_ratio: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        out = _bn("bn1")(x, train)
        out = _conv(self.planes, 1, 1, 0, name="conv1")(out)
        out = _bn("bn2")(out, train)
        out = nn.relu(out)
        out = _conv(self.planes, 3, self.stride, 1, name="conv2")(out)
        out = _bn("bn3")(out, train)
        out = nn.relu(out)
        out = _conv(self.planes * self.outchannel_ratio, 1, 1, 0, name="conv3")(out)
        out = _bn("bn4")(out, train)
        shortcut = avg_pool(x, window=2, stride=2) if self.downsample else x
        return _shortcut_add(out, shortcut)


class PyramidNet(nn.Module):
    depth: int
    alpha: float
    channels: int
    classes: int
    bottleneck: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.bottleneck:
            n = (self.depth - 2) // 9
            block_cls, ratio = PyramidBottleneck, 4
        else:
            n = (self.depth - 2) // 6
            block_cls, ratio = PyramidBasicBlock, 1
        addrate = self.alpha / (3 * n * 1.0)

        x = _conv(16, 3, 1, 1, name="conv1")(x)
        x = _bn("bn1")(x, train)

        featuremap_dim = 16.0
        for stage in range(3):
            stride = 1 if stage == 0 else 2
            for block_idx in range(n):
                featuremap_dim += addrate
                x = block_cls(
                    planes=int(round(featuremap_dim)),
                    stride=stride if block_idx == 0 else 1,
                    downsample=(stride != 1 and block_idx == 0),
                    name=f"layer{stage + 1}_block{block_idx}",
                )(x, train=train)

        x = _TorchBatchNorm(x.shape[-1], name="bn_final")(x, train=train)
        x = nn.relu(x)
        x = global_avg_pool(x)
        # fc keeps torch Linear defaults (reference inits convs/BN only,
        # pyramidnets.py:158-164) — weight AND bias (uniform, not zeros)
        return nn.Dense(self.classes, name="fc", kernel_init=torch_linear_init,
                        bias_init=torch_default_bias(x.shape[-1]))(x)
