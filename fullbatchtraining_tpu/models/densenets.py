"""DenseNet-BC family, TPU-native (flax.linen, NHWC).

Behavioral re-implementation of the reference DenseNet
(/root/reference/fullbatch/models/densenets.py): depth table 121/161/169/201,
CIFAR/standard/efficient stems, bottleneck dense layers with concat growth,
transition layers, optional rematerialization for ``memory_efficient``
(jax.checkpoint replaces torch.utils.checkpoint per SURVEY.md §2 #11).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (avg_pool, get_layer_functions, global_avg_pool,
                     kaiming_normal_in, max_pool, torch_linear_init)


def densenet_depths_to_config(depth: int):
    """Depth -> (growth_rate, block_config, num_init_features); densenets.py:14-32."""
    table = {
        121: (32, (6, 12, 24, 16), 64),
        161: (48, (6, 12, 36, 24), 96),
        169: (32, (6, 12, 32, 32), 64),
        201: (32, (6, 12, 48, 32), 64),
    }
    if depth not in table:
        raise ValueError(f"Unsupported DenseNet depth {depth}.")
    return table[depth]


class _DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int
    drop_rate: float
    conv: Callable
    norm: Callable
    nonlin: Callable
    memory_efficient: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        def body(h):
            h = self.norm(h.shape[-1], name="norm1")(h, train=train)
            h = self.nonlin(h)
            h = self.conv(self.bn_size * self.growth_rate, kernel_size=1, stride=1,
                          bias=False, kernel_init=kaiming_normal_in,
                          name="conv1")(h)
            h = self.norm(h.shape[-1], name="norm2")(h, train=train)
            h = self.nonlin(h)
            h = self.conv(self.growth_rate, kernel_size=3, stride=1, padding=1,
                          bias=False, kernel_init=kaiming_normal_in,
                          name="conv2")(h)
            return h

        out = body(x)
        if self.drop_rate > 0:
            out = nn.Dropout(self.drop_rate, deterministic=not train)(out)
        return out


class DenseNet(nn.Module):
    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    num_init_features: int = 64
    bn_size: int = 4
    drop_rate: float = 0.0
    classes: int = 1000
    channels: int = 3
    memory_efficient: bool = False
    norm: str = "BatchNorm2d"
    nonlin: str = "ReLU"
    stem: str = "CIFAR"
    convolution_type: str = "Standard"

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv, norm, nonlin = get_layer_functions(self.convolution_type, self.norm, self.nonlin)

        # Stems (densenets.py:72-103)
        if self.stem in ("imagenet", "standard"):
            x = conv(self.num_init_features, kernel_size=7, stride=2, padding=3,
                     bias=False, kernel_init=kaiming_normal_in, name="stem_conv0")(x)
            x = norm(self.num_init_features, name="stem_norm0")(x, train=train)
            x = nonlin(x)
            x = max_pool(x, window=3, stride=2, padding=1)
        elif self.stem == "CIFAR":
            x = conv(self.num_init_features, kernel_size=3, stride=1, padding=1,
                     bias=False, kernel_init=kaiming_normal_in, name="stem_conv0")(x)
        elif self.stem == "efficient":
            stem_width = self.num_init_features // 2
            for i, feats in enumerate([stem_width, stem_width, self.num_init_features]):
                stride = 2 if i == 0 else 1
                x = conv(feats, kernel_size=3, stride=stride, padding=1, bias=False,
                         kernel_init=kaiming_normal_in, name=f"stem_conv{i}")(x)
                x = norm(feats, name=f"stem_norm{i}")(x, train=train)
                x = nonlin(x)
            x = max_pool(x, window=3, stride=2, padding=1)
        else:
            raise ValueError(f"Invalid stem {self.stem}.")

        num_features = self.num_init_features
        for block_idx, num_layers in enumerate(self.block_config):
            for layer_idx in range(num_layers):
                # pick the class BEFORE constructing: instantiating a named
                # module registers the name on the parent, so building a
                # throwaway _DenseLayer and then a remat twin with the same
                # name raises flax NameInUseError
                layer_cls = (nn.remat(_DenseLayer, static_argnums=(2,))
                             if self.memory_efficient else _DenseLayer)
                layer = layer_cls(
                    growth_rate=self.growth_rate,
                    bn_size=self.bn_size,
                    drop_rate=self.drop_rate,
                    conv=conv,
                    norm=norm,
                    nonlin=nonlin,
                    memory_efficient=self.memory_efficient,
                    name=f"block{block_idx + 1}_layer{layer_idx + 1}",
                )
                new = layer(x, train)
                x = jnp.concatenate([x, new], axis=-1)
                num_features += self.growth_rate
            if block_idx != len(self.block_config) - 1:
                out_features = num_features // 2
                x = norm(num_features, name=f"transition{block_idx + 1}_norm")(x, train=train)
                x = nonlin(x)
                x = conv(out_features, kernel_size=1, stride=1, bias=False,
                         kernel_init=kaiming_normal_in, name=f"transition{block_idx + 1}_conv")(x)
                x = avg_pool(x, window=2, stride=2)
                num_features = out_features

        x = norm(num_features, name="final_norm")(x, train=train)
        x = nonlin(x)
        x = global_avg_pool(x)
        # reference init: Linear bias zeroed, weight torch default (densenets.py:137-144)
        return nn.Dense(self.classes, name="classifier",
                        kernel_init=torch_linear_init)(x)
