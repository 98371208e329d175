"""Pure-torch replica of efficientnet_pytorch's EfficientNet features.

efficientnet_pytorch is not installed in this image, so to validate the
checkpoint converter (models/convert.py:efficientnet_state_dict_to_backbone)
we rebuild the exact ``extract_features`` architecture the reference wraps
(reference models.py:95-101: ``EfficientNet.from_pretrained(...)`` +
``extract_features``) in plain torch with state_dict keys identical to
efficientnet_pytorch's (``_conv_stem``, ``_bn0``, ``_blocks.{i}._*``,
``_conv_head``, ``_bn1``), including TF-style dynamic SAME padding, swish,
squeeze-excitation, and the width/depth compound scaling with divisor-8
filter rounding.

Host-side tool only: nothing in the JAX framework imports it.
"""
from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

# Same tables as neuralbarkcalculator_tpu/models/efficientnet.py (which in
# turn mirror efficientnet_pytorch's params for b0..b7).
SCALING = [
    (1.0, 1.0), (1.0, 1.1), (1.1, 1.2), (1.2, 1.4),
    (1.4, 1.8), (1.6, 2.2), (1.8, 2.6), (2.0, 3.1),
]
BASE_BLOCKS = [
    (1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]
HEAD_CH = [1280, 1280, 1408, 1536, 1792, 2048, 2304, 2560]


def round_filters(filters: int, width_mult: float, divisor: int = 8) -> int:
    filters *= width_mult
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


def _same_pad(x, kernel: int, stride: int):
    """TF SAME padding (efficientnet_pytorch Conv2dDynamicSamePadding)."""
    ih, iw = x.shape[-2:]
    ph = max((math.ceil(ih / stride) - 1) * stride + kernel - ih, 0)
    pw = max((math.ceil(iw / stride) - 1) * stride + kernel - iw, 0)
    if ph or pw:
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
    return x


def _swish(x):
    return x * torch.sigmoid(x)


def _bn(ch):
    return nn.BatchNorm2d(ch, momentum=0.01, eps=1e-3)


class MBConvBlock(nn.Module):
    """efficientnet_pytorch MBConvBlock naming: _expand_conv/_bn0/
    _depthwise_conv/_bn1/_se_reduce/_se_expand/_project_conv/_bn2."""

    def __init__(self, in_ch, out_ch, expand, kernel, stride,
                 se_ratio=0.25):
        super().__init__()
        self.in_ch, self.out_ch = in_ch, out_ch
        self.kernel, self.stride = kernel, stride
        mid = in_ch * expand
        if expand != 1:
            self._expand_conv = nn.Conv2d(in_ch, mid, 1, bias=False)
            self._bn0 = _bn(mid)
        self._depthwise_conv = nn.Conv2d(mid, mid, kernel, stride=stride,
                                         groups=mid, bias=False)
        self._bn1 = _bn(mid)
        squeezed = max(1, int(in_ch * se_ratio))
        self._se_reduce = nn.Conv2d(mid, squeezed, 1)
        self._se_expand = nn.Conv2d(squeezed, mid, 1)
        self._project_conv = nn.Conv2d(mid, out_ch, 1, bias=False)
        self._bn2 = _bn(out_ch)

    def forward(self, x):
        h = x
        if hasattr(self, "_expand_conv"):
            h = _swish(self._bn0(self._expand_conv(h)))
        h = self._depthwise_conv(_same_pad(h, self.kernel, self.stride))
        h = _swish(self._bn1(h))
        se = h.mean((2, 3), keepdim=True)
        se = self._se_expand(_swish(self._se_reduce(se)))
        h = torch.sigmoid(se) * h
        h = self._bn2(self._project_conv(h))
        if self.stride == 1 and self.in_ch == self.out_ch:
            h = h + x  # drop_connect is identity in eval
        return h


class EfficientNetFeaturesTorch(nn.Module):
    """extract_features replica (stem -> blocks -> 1x1 head conv)."""

    def __init__(self, variant: int = 0):
        super().__init__()
        width_mult, depth_mult = SCALING[variant]
        in_ch = round_filters(32, width_mult)
        self._conv_stem = nn.Conv2d(3, in_ch, 3, stride=2, bias=False)
        self._bn0 = _bn(in_ch)
        blocks = []
        for expand, ch, repeats, stride, kernel in BASE_BLOCKS:
            out_ch = round_filters(ch, width_mult)
            for i in range(round_repeats(repeats, depth_mult)):
                blocks.append(MBConvBlock(
                    in_ch, out_ch, expand, kernel,
                    stride if i == 0 else 1))
                in_ch = out_ch
        self._blocks = nn.ModuleList(blocks)
        self._conv_head = nn.Conv2d(in_ch, HEAD_CH[variant], 1, bias=False)
        self._bn1 = _bn(HEAD_CH[variant])

    def extract_features(self, x):
        x = _swish(self._bn0(self._conv_stem(_same_pad(x, 3, 2))))
        for block in self._blocks:
            x = block(x)
        return _swish(self._bn1(self._conv_head(x)))

    forward = extract_features
