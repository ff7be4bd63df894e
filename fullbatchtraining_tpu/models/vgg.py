"""VGG family, TPU-native (flax.linen, NHWC).

Behavioral re-implementation of the reference VGG
(/root/reference/fullbatch/models/vgg.py): conv-norm-nonlin stacks per the
VGG11/13/16/19 plans with max-pool 'M' markers, and CIFAR / TinyImageNet /
ImageNet heads.
"""

from __future__ import annotations

from flax import linen as nn

from .layers import (get_layer_functions, global_avg_pool, kaiming_normal_out,
                     max_pool, torch_default_bias, torch_default_conv,
                     torch_linear_init)

VGG_PLANS = {
    "VGG11": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "VGG13": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "VGG16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
              512, 512, 512, "M"],
    "VGG19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M",
              512, 512, 512, 512, "M"],
}


class VGG(nn.Module):
    vgg_name: str
    channels: int = 3
    classes: int = 10
    norm: str = "BatchNorm2d"
    nonlin: str = "ReLU"
    head: str = "CIFAR"
    convolution_type: str = "Standard"
    drop_rate: float = 0.0
    classical_weight_init: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv, norm, nonlin = get_layer_functions(self.convolution_type, self.norm, self.nonlin)
        # classical_weight_init (the reference config default, vgg.py:70-103):
        # convs kaiming-normal fan_out + zero bias, Linear normal(0, 0.01) +
        # zero bias; otherwise torch's module defaults — including the
        # uniform(+-1/sqrt(fan_in)) BIAS draws, not just the kernels.
        classical = self.classical_weight_init
        if classical:
            conv_init, dense_init = kaiming_normal_out, nn.initializers.normal(0.01)
        else:
            conv_init, dense_init = torch_default_conv, torch_linear_init

        def bias_for(fan_in):
            return (nn.initializers.zeros if classical
                    else torch_default_bias(fan_in))

        idx = 0
        for entry in VGG_PLANS[self.vgg_name.upper()]:
            if entry == "M":
                x = max_pool(x, window=2, stride=2)
            else:
                # the reference's conv layers keep torch's default bias=True
                # (vgg.py:86: no bias argument passed)
                x = conv(entry, kernel_size=3, padding=1, bias=True,
                         kernel_init=conv_init,
                         bias_init=bias_for(x.shape[-1] * 9),
                         name=f"conv{idx}")(x)
                x = norm(entry, name=f"norm{idx}")(x, train=train)
                x = nonlin(x)
                idx += 1

        if self.head == "CIFAR":
            x = x.reshape(x.shape[0], -1)
            return nn.Dense(self.classes, name="classifier",
                            kernel_init=dense_init,
                            bias_init=bias_for(x.shape[-1]))(x)
        if self.head == "TinyImageNet":
            x = global_avg_pool(x)
            return nn.Dense(self.classes, name="classifier",
                            kernel_init=dense_init,
                            bias_init=bias_for(x.shape[-1]))(x)
        # ImageNet head: 7x7 adaptive pool + 3-layer MLP (vgg.py:62-68).
        x = nn.avg_pool(x, (x.shape[1] // 7, x.shape[2] // 7),
                        strides=(x.shape[1] // 7, x.shape[2] // 7))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096, name="fc1", kernel_init=dense_init,
                             bias_init=bias_for(x.shape[-1]))(x))
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, name="fc2", kernel_init=dense_init,
                             bias_init=bias_for(4096))(x))
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        return nn.Dense(self.classes, name="classifier", kernel_init=dense_init,
                        bias_init=bias_for(4096))(x)
