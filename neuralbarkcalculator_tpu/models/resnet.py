"""Dilated ResNet backbones (torchvision-numerics-compatible), NHWC Flax.

Reimplements the reference backbone — torchvision ``resnet50/101`` with
``replace_stride_with_dilation=[False, True, True]`` wrapped in
``IntermediateLayerGetter({'layer4': 'out'})`` (reference models.py:127-139)
— as idiomatic NHWC Flax modules so XLA can tile convs onto the MXU and
fuse the BN/ReLU chains.

Dilation layout matches torchvision's ``_make_layer``: when a stage is
dilated its first block keeps the *previous* dilation and stride becomes 1,
remaining blocks use the doubled dilation; with [False, True, True] the
output stride is 8 and layer3/layer4 blocks run at dilation 2/4. The 3x3
bottleneck conv carries the stride (ResNet v1.5), matching the weights'
expectations for checkpoint conversion (models/convert.py).

Compute dtype is configurable (bf16 for the MXU fast path); BatchNorm
statistics/params stay float32.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class Bottleneck(nn.Module):
    """torchvision Bottleneck (expansion 4, stride on the 3x3 conv)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name)
        conv = lambda f, k, s, d, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s),
            padding=[(d * (k // 2),) * 2] * 2,
            kernel_dilation=(d, d), use_bias=False, dtype=self.dtype,
            name=name)

        identity = x
        out = conv(self.planes, 1, 1, 1, "conv1")(x)
        out = nn.relu(norm("bn1")(out))
        out = conv(self.planes, 3, self.stride, self.dilation, "conv2")(out)
        out = nn.relu(norm("bn2")(out))
        out = conv(self.planes * 4, 1, 1, 1, "conv3")(out)
        out = norm("bn3")(out)

        if self.has_downsample:
            identity = conv(self.planes * 4, 1, self.stride, 1,
                            "downsample_conv")(x)
            identity = norm("downsample_bn")(identity)

        return nn.relu(out + identity.astype(out.dtype))


class DilatedResNet(nn.Module):
    """ResNet backbone with stride->dilation replacement, returning the
    layer4 feature map (the IntermediateLayerGetter 'out')."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # resnet50
    replace_stride_with_dilation: Sequence[bool] = (False, True, True)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)])

        inplanes = 64
        dilation = 1
        for stage, num_blocks in enumerate(self.stage_sizes):
            planes = 64 * (2 ** stage)
            stride = 1 if stage == 0 else 2
            prev_dilation = dilation
            if stage > 0 and self.replace_stride_with_dilation[stage - 1]:
                dilation *= stride
                stride = 1
            for block in range(num_blocks):
                first = block == 0
                x = Bottleneck(
                    planes=planes,
                    stride=stride if first else 1,
                    dilation=prev_dilation if first else dilation,
                    has_downsample=first and (
                        stride != 1 or inplanes != planes * 4),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x, train=train)
                inplanes = planes * 4
        return x


def resnet50_dilated(dtype: Dtype = jnp.float32) -> DilatedResNet:
    """Backbone of reference fcn_resnet50/deeplabv3_resnet50
    (models.py:127-134)."""
    return DilatedResNet(stage_sizes=(3, 4, 6, 3), dtype=dtype)


def resnet101_dilated(dtype: Dtype = jnp.float32) -> DilatedResNet:
    """Backbone of reference fcn_resnet101/deeplabv3_resnet101
    (models.py:142-149)."""
    return DilatedResNet(stage_sizes=(3, 4, 23, 3), dtype=dtype)
