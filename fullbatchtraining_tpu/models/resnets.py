"""ResNet family, TPU-native (flax.linen, NHWC).

Behavioral re-implementation of the reference ResNet
(/root/reference/fullbatch/models/resnets.py): depth tables for 3-stage CIFAR
(20/32/56/110) and 4-stage (18/34/50/101/152) nets, pluggable
conv/norm/nonlinearity, stems CIFAR/standard/efficient, downsample variants
A/B/C/preact-B/preact-C, Bottleneck v1.5 (stride on the 3x3), SkipInit block
variants, zero-init-residual.

Notes vs the reference:
* NHWC layout and flax BatchNorm (biased running variance) — behavioral, not
  bitwise, parity.
* The reference checks ``isinstance(block, BasicBlock)`` on a *class*
  (resnets.py:60, :66), which is always False, silently pinning
  inplanes/base_width to 64 and ignoring the configured ``width`` for CIFAR
  ResNets. We implement the intended semantics (``width`` honored), per
  SURVEY.md §7 "document, fix".
* ``BottleneckSkipInit.__init__`` in the reference calls
  ``super(Bottleneck, ...)`` (resnets.py:330), skipping Bottleneck's own
  init — harmless there, nothing to replicate here.
* ``initialization: skip-residual`` (every stock ResNet config) actually
  ENABLES zero-init-residual here. The reference tests ``'skip_residual' in
  cfg_model.initialization`` with an underscore (models.py:22) against
  configs that spell it with a hyphen, so the documented init silently never
  fired there — its runs used bn2/bn3 scale 1. We implement the configured
  intent (the goodfellow-style zero residual start the configs ask for),
  per the document-and-fix policy; from-scratch init distributions
  therefore differ from the reference's accidental ones.
"""

from __future__ import annotations

from typing import Callable, Sequence

from flax import linen as nn

from .layers import avg_pool, get_layer_functions, max_pool, global_avg_pool
from .modules import Skipper


def resnet_depths_to_config(depth: int):
    """Depth -> (block_type, stage sizes); mirrors reference resnets.py:12-40."""
    table = {
        20: ("basic", [3, 3, 3]),
        32: ("basic", [5, 5, 5]),
        56: ("basic", [9, 9, 9]),
        110: ("basic", [18, 18, 18]),
        18: ("basic", [2, 2, 2, 2]),
        34: ("basic", [3, 4, 6, 3]),
        50: ("bottleneck", [3, 4, 6, 3]),
        101: ("bottleneck", [3, 4, 23, 3]),
        152: ("bottleneck", [3, 8, 36, 3]),
    }
    if depth not in table:
        raise ValueError(f"Unsupported ResNet depth {depth}.")
    return table[depth]


_EXPANSION = {"basic": 1, "bottleneck": 4}


class _Downsample(nn.Module):
    """Shortcut projection, variants A/B/C/preact-B/preact-C (resnets.py:138-165)."""

    variant: str
    features: int
    stride: int
    conv: Callable
    norm: Callable
    nonlin: Callable
    use_bias: bool

    @nn.compact
    def __call__(self, x, train: bool = True):
        v, s = self.variant, self.stride
        if v == "A":
            return self.conv(self.features, kernel_size=1, stride=s, bias=self.use_bias, name="conv")(x)
        if v == "B":
            x = self.conv(self.features, kernel_size=1, stride=s, bias=self.use_bias, name="conv")(x)
            return self.norm(self.features, name="norm")(x, train=train)
        if v == "C":
            x = avg_pool(x, window=s, stride=s)
            x = self.conv(self.features, kernel_size=1, stride=1, bias=self.use_bias, name="conv")(x)
            return self.norm(self.features, name="norm")(x, train=train)
        if v == "preact-B":
            x = self.nonlin(x)
            return self.conv(self.features, kernel_size=1, stride=s, bias=self.use_bias, name="conv")(x)
        if v == "preact-C":
            x = self.nonlin(x)
            x = avg_pool(x, window=s, stride=s)
            return self.conv(self.features, kernel_size=1, stride=1, bias=self.use_bias, name="conv")(x)
        raise ValueError("Invalid downsample block specification.")


class BasicBlock(nn.Module):
    planes: int
    stride: int
    conv: Callable
    norm: Callable
    nonlin: Callable
    use_bias: bool
    downsample: str | None = None
    zero_init_residual: bool = False
    groups: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        out = self.conv(self.planes, kernel_size=3, stride=self.stride, padding=1,
                        bias=self.use_bias, name="conv1")(x)
        out = self.norm(self.planes, name="bn1")(out, train=train)
        out = self.nonlin(out)
        out = self.conv(self.planes, kernel_size=3, stride=1, padding=1,
                        bias=self.use_bias, name="conv2")(out)
        bn2 = self.norm(self.planes, name="bn2",
                        **({"scale_init": nn.initializers.zeros} if self.zero_init_residual else {}))
        out = bn2(out, train=train)
        if self.downsample is not None:
            identity = _Downsample(self.downsample, self.planes, self.stride, self.conv,
                                   self.norm, self.nonlin, self.use_bias,
                                   name="downsample")(x, train=train)
        return self.nonlin(out + identity)


class BasicBlockSkipInit(nn.Module):
    """Pre-activation basic block with SkipInit gain (resnets.py:234-268)."""

    planes: int
    stride: int
    conv: Callable
    norm: Callable
    nonlin: Callable
    use_bias: bool
    downsample: str | None = None
    zero_init_residual: bool = False
    groups: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        out = self.nonlin(x)
        out = self.conv(self.planes, kernel_size=3, stride=self.stride, padding=1,
                        bias=self.use_bias, name="conv1")(out)
        out = self.nonlin(out)
        out = self.conv(self.planes, kernel_size=3, stride=1, padding=1,
                        bias=self.use_bias, name="conv2")(out)
        out = Skipper(name="skip")(out)
        if self.downsample is not None:
            identity = _Downsample(self.downsample, self.planes, self.stride, self.conv,
                                   self.norm, self.nonlin, self.use_bias,
                                   name="downsample")(x, train=train)
        return out + identity


class Bottleneck(nn.Module):
    """ResNet v1.5 bottleneck: stride on the 3x3 conv (resnets.py:271-316)."""

    planes: int
    stride: int
    conv: Callable
    norm: Callable
    nonlin: Callable
    use_bias: bool
    downsample: str | None = None
    zero_init_residual: bool = False
    groups: int = 1
    base_width: int = 64

    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_planes = self.planes * self.expansion
        identity = x
        out = self.conv(width, kernel_size=1, stride=1, bias=self.use_bias, name="conv1")(x)
        out = self.norm(width, name="bn1")(out, train=train)
        out = self.nonlin(out)
        out = self.conv(width, kernel_size=3, stride=self.stride, padding=1,
                        groups=self.groups, bias=self.use_bias, name="conv2")(out)
        out = self.norm(width, name="bn2")(out, train=train)
        out = self.nonlin(out)
        out = self.conv(out_planes, kernel_size=1, stride=1, bias=self.use_bias, name="conv3")(out)
        bn3 = self.norm(out_planes, name="bn3",
                        **({"scale_init": nn.initializers.zeros} if self.zero_init_residual else {}))
        out = bn3(out, train=train)
        if self.downsample is not None:
            identity = _Downsample(self.downsample, out_planes, self.stride, self.conv,
                                   self.norm, self.nonlin, self.use_bias,
                                   name="downsample")(x, train=train)
        return self.nonlin(out + identity)


class BottleneckSkipInit(nn.Module):
    planes: int
    stride: int
    conv: Callable
    norm: Callable
    nonlin: Callable
    use_bias: bool
    downsample: str | None = None
    zero_init_residual: bool = False
    groups: int = 1
    base_width: int = 64

    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_planes = self.planes * self.expansion
        identity = x
        out = self.nonlin(x)
        out = self.conv(width, kernel_size=1, stride=1, bias=self.use_bias, name="conv1")(out)
        out = self.nonlin(out)
        out = self.conv(width, kernel_size=3, stride=self.stride, padding=1,
                        groups=self.groups, bias=self.use_bias, name="conv2")(out)
        out = self.nonlin(out)
        out = self.conv(out_planes, kernel_size=1, stride=1, bias=self.use_bias, name="conv3")(out)
        out = Skipper(name="skip")(out)
        if self.downsample is not None:
            identity = _Downsample(self.downsample, out_planes, self.stride, self.conv,
                                   self.norm, self.nonlin, self.use_bias,
                                   name="downsample")(x, train=train)
        return out + identity


_BLOCKS = {
    ("basic", False): BasicBlock,
    ("basic", True): BasicBlockSkipInit,
    ("bottleneck", False): Bottleneck,
    ("bottleneck", True): BottleneckSkipInit,
}


class ResNet(nn.Module):
    """ResNet with pluggable layers (reference resnets.py:43-193)."""

    block_type: str
    layers: Sequence[int]
    channels: int
    classes: int
    zero_init_residual: bool = False
    strides: Sequence[int] = (1, 2, 2, 2)
    groups: int = 1
    width_per_group: int = 64
    norm: str = "BatchNorm2d"
    nonlin: str = "ReLU"
    stem: str = "CIFAR"
    downsample: str = "B"
    convolution_type: str = "Standard"

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv, norm, nonlin = get_layer_functions(self.convolution_type, self.norm, self.nonlin)
        skipinit = self.norm.lower() == "skipinit"
        use_bias = skipinit
        downsample = f"preact-{self.downsample}" if skipinit else self.downsample
        block_cls = _BLOCKS[(self.block_type, skipinit)]
        expansion = _EXPANSION[self.block_type]

        inplanes = self.width_per_group if self.block_type == "basic" else 64
        base_width = self.width_per_group if self.block_type == "bottleneck" else 64

        # Stem (resnets.py:68-96)
        if self.stem == "CIFAR":
            x = conv(inplanes, kernel_size=3, stride=1, padding=1, bias=use_bias, name="stem_conv1")(x)
            x = norm(inplanes, name="stem_bn1")(x, train=train)
            x = nonlin(x)
        elif self.stem == "standard":
            x = conv(inplanes, kernel_size=7, stride=2, padding=3, bias=use_bias, name="stem_conv1")(x)
            x = norm(inplanes, name="stem_bn1")(x, train=train)
            x = nonlin(x)
            x = max_pool(x, window=3, stride=2, padding=1)
        elif self.stem == "efficient":
            stem_width = inplanes // 2
            for i, feats in enumerate([stem_width, stem_width, inplanes]):
                stride = 2 if i == 0 else 1
                x = conv(feats, kernel_size=3, stride=stride, padding=1, bias=use_bias,
                         name=f"stem_conv{i + 1}")(x)
                x = norm(feats, name=f"stem_bn{i + 1}")(x, train=train)
                x = nonlin(x)
            x = max_pool(x, window=3, stride=2, padding=1)
        else:
            raise ValueError(f"Invalid stem designation {self.stem}.")

        # Stages (resnets.py:99-106, :128-178)
        width = inplanes
        current = inplanes
        for stage_idx, num_blocks in enumerate(self.layers):
            stride = self.strides[stage_idx]
            for block_idx in range(num_blocks):
                s = stride if block_idx == 0 else 1
                needs_ds = s != 1 or current != width * expansion
                x = block_cls(
                    planes=width,
                    stride=s,
                    conv=conv,
                    norm=norm,
                    nonlin=nonlin,
                    use_bias=use_bias,
                    downsample=downsample if (block_idx == 0 and needs_ds) else None,
                    zero_init_residual=self.zero_init_residual,
                    groups=self.groups,
                    base_width=base_width,
                    name=f"layer{stage_idx + 1}_block{block_idx}",
                )(x, train=train)
                current = width * expansion
            width *= 2

        x = global_avg_pool(x)
        # fc keeps torch Linear defaults: the reference init loop touches
        # only Conv2d/BN (resnets.py:110-114), so the bias is
        # uniform(+-1/sqrt(fan_in)), not zeros
        return nn.Dense(self.classes, name="fc", kernel_init=torch_linear_init,
                        bias_init=torch_default_bias(x.shape[-1]))(x)


from .layers import torch_default_bias, torch_linear_init  # noqa: E402  (shared torch Linear defaults)
