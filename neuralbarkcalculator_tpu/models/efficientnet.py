"""EfficientNet-B0..B7 feature extractor, NHWC Flax.

The reference's alternate backbones (models.py:86-110) wrap
``efficientnet_pytorch.EfficientNet.from_pretrained('efficientnet-b{n}')``
and use ``extract_features`` — the 1x1-projected head features before
pooling (channels = efficientnet_inplanes, models.py:74-83:
[1280, 1280, 1408, 1536, 1792, 2048, 2304, 2560]).

This is a faithful reimplementation of that architecture (MBConv with
squeeze-excitation, TF-style SAME padding, swish, width/depth scaling with
the divisor-8 filter rounding), so the full reference model zoo is
constructible and trainable TPU-side. ImageNet-pretrained weights are not
bundled (the reference downloads them at runtime; this environment has no
egress) — models start from random init unless a converted checkpoint is
supplied.
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

# (width_mult, depth_mult) per variant b0..b7 (efficientnet_pytorch params)
SCALING = [
    (1.0, 1.0), (1.0, 1.1), (1.1, 1.2), (1.2, 1.4),
    (1.4, 1.8), (1.6, 2.2), (1.8, 2.6), (2.0, 3.1),
]

# base blocks: (expand_ratio, channels, repeats, stride, kernel)
BASE_BLOCKS = [
    (1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]

EFFICIENTNET_INPLANES = [1280, 1280, 1408, 1536, 1792, 2048, 2304, 2560]


def round_filters(filters: int, width_mult: float, divisor: int = 8) -> int:
    filters *= width_mult
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:  # prevent >10% reduction
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


class SqueezeExcite(nn.Module):
    """SE block: global pool -> reduce -> swish -> expand -> sigmoid."""

    reduced: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype,
                    name="reduce")(s)
        s = nn.swish(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                    name="expand")(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    """Mobile inverted bottleneck with SE and stochastic depth."""

    out_ch: int
    expand_ratio: int
    kernel: int
    stride: int
    se_ratio: float = 0.25
    drop_rate: float = 0.0
    dtype: Dtype = jnp.float32
    folded: bool = False  # BN folded into convs (models/fold.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.folded and train:
            raise ValueError("folded models are inference-only")
        norm = lambda name: (  # noqa: E731
            (lambda z: z) if self.folded else nn.BatchNorm(
                use_running_average=not train, momentum=0.99,
                epsilon=1e-3, dtype=jnp.float32, name=name))
        in_ch = x.shape[-1]
        h = x
        if self.expand_ratio != 1:
            h = nn.Conv(in_ch * self.expand_ratio, (1, 1),
                        use_bias=self.folded, dtype=self.dtype,
                        name="expand_conv")(h)
            h = nn.swish(norm("bn0")(h))
        h = nn.Conv(h.shape[-1], (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    feature_group_count=h.shape[-1],
                    use_bias=self.folded,
                    dtype=self.dtype, name="depthwise_conv")(h)
        h = nn.swish(norm("bn1")(h))
        if self.se_ratio > 0:
            h = SqueezeExcite(max(1, int(in_ch * self.se_ratio)),
                              dtype=self.dtype, name="se")(h)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=self.folded,
                    dtype=self.dtype, name="project_conv")(h)
        h = norm("bn2")(h)
        if self.stride == 1 and in_ch == self.out_ch:
            if train and self.drop_rate > 0:
                # stochastic depth (drop_connect): drop the residual branch
                # per sample with prob drop_rate, rescale survivors
                import jax
                keep = 1.0 - self.drop_rate
                mask = jax.random.bernoulli(
                    self.make_rng("dropout"), keep,
                    (h.shape[0], 1, 1, 1)).astype(h.dtype)
                h = h * mask / keep
            h = h + x
        return h


class EfficientNetFeatures(nn.Module):
    """extract_features parity: stem -> MBConv stages -> 1x1 head conv.

    Output: [N, H/32, W/32, EFFICIENTNET_INPLANES[variant]].
    """

    variant: int = 0
    drop_connect_rate: float = 0.2
    dtype: Dtype = jnp.float32
    folded: bool = False  # BN folded into convs (models/fold.py)

    # TF-SAME stride-2 padding phase depends on the true input height, so
    # zero-padded batches cannot be made bit-exact (see __call__); the
    # predict engine falls back to exact-height bucketing (one compiled
    # program per distinct trimmed height) for this backbone.
    supports_ragged = False
    supports_fold = True
    bn_eps = 1e-3  # efficientnet_pytorch BatchNorm eps (models/fold.py)
    feature_stride = 32

    @nn.compact
    def __call__(self, x, train: bool = False, valid_h=None):
        # Ragged-height masking is NOT supported here, fundamentally:
        # TF-style SAME padding (which efficientnet_pytorch emulates) pads
        # stride-2 convs asymmetrically by an amount depending on the
        # *true* input height's parity, so a zero-padded batch cannot
        # reproduce each image's own conv phase for general heights —
        # unlike the ResNet's fixed symmetric padding, where row masks
        # make padded batches bit-exact (models/resnet.py). Exactness
        # would hold only for heights that are multiples of 32.
        # Ragged batched inference therefore uses the ResNet models.
        del valid_h
        if self.folded and train:
            raise ValueError("folded models are inference-only")
        width_mult, depth_mult = SCALING[self.variant]
        norm = lambda name: (  # noqa: E731
            (lambda z: z) if self.folded else nn.BatchNorm(
                use_running_average=not train, momentum=0.99,
                epsilon=1e-3, dtype=jnp.float32, name=name))

        x = nn.Conv(round_filters(32, width_mult), (3, 3), strides=(2, 2),
                    padding="SAME", use_bias=self.folded,
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.swish(norm("stem_bn")(x))

        total_blocks = sum(round_repeats(r, depth_mult)
                           for _, _, r, _, _ in BASE_BLOCKS)
        block_idx = 0
        for stage, (expand, ch, repeats, stride, kernel) in enumerate(
                BASE_BLOCKS):
            out_ch = round_filters(ch, width_mult)
            for i in range(round_repeats(repeats, depth_mult)):
                x = MBConv(out_ch=out_ch, expand_ratio=expand,
                           kernel=kernel, stride=stride if i == 0 else 1,
                           drop_rate=self.drop_connect_rate
                           * block_idx / total_blocks,
                           dtype=self.dtype, folded=self.folded,
                           name=f"block{stage}_{i}")(x, train=train)
                block_idx += 1

        x = nn.Conv(EFFICIENTNET_INPLANES[self.variant], (1, 1),
                    use_bias=self.folded, dtype=self.dtype,
                    name="head_conv")(x)
        return nn.swish(norm("head_bn")(x))

    def valid_feature_height(self, valid_h):
        raise NotImplementedError(
            "ragged batched inference is supported for the ResNet "
            "backbones only: TF-SAME stride-2 padding phase depends on "
            "the true input height's parity, so padded batches cannot be "
            "made bit-exact for EfficientNet (see __call__ docstring)")
