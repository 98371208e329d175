"""Pure-torch replica of the reference model architecture.

torchvision is not installed in this image, so for (a) weight-conversion
parity tests and (b) measuring the reference's CPU inference baseline we
rebuild the exact architecture of the reference fcn_resnet50
(reference models.py:27-43, 113-139: torchvision resnet50 with
replace_stride_with_dilation=[False, True, True] wrapped in
IntermediateLayerGetter({'layer4': 'out'}), FCNHead, bicubic upsample) in
plain torch, with state_dict keys identical to torchvision's so reference
checkpoints load into it and conversions can be validated both ways.

This file is a host-side tool: nothing in the JAX framework imports it.
"""
from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=dilation, dilation=dilation,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class DilatedResNetBackbone(nn.Module):
    """torchvision-resnet-compatible backbone returning {'out': layer4}."""

    def __init__(self, layers=(3, 4, 6, 3),
                 replace_stride_with_dilation=(False, True, True)):
        super().__init__()
        self.inplanes = 64
        self.dilation = 1
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(
            128, layers[1], stride=2,
            dilate=replace_stride_with_dilation[0])
        self.layer3 = self._make_layer(
            256, layers[2], stride=2,
            dilate=replace_stride_with_dilation[1])
        self.layer4 = self._make_layer(
            512, layers[3], stride=2,
            dilate=replace_stride_with_dilation[2])

    def _make_layer(self, planes, blocks, stride=1, dilate=False):
        downsample = None
        previous_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        if stride != 1 or self.inplanes != planes * Bottleneck.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * Bottleneck.expansion, 1,
                          stride=stride, bias=False),
                nn.BatchNorm2d(planes * Bottleneck.expansion),
            )
        layers = [Bottleneck(self.inplanes, planes, stride,
                             previous_dilation, downsample)]
        self.inplanes = planes * Bottleneck.expansion
        for _ in range(1, blocks):
            layers.append(
                Bottleneck(self.inplanes, planes, dilation=self.dilation))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        return {"out": x}


def fcn_head(in_channels, channels, dropout=0.1):
    inter = in_channels // 4
    return nn.Sequential(
        nn.Conv2d(in_channels, inter, 3, padding=1, bias=False),
        nn.BatchNorm2d(inter),
        nn.ReLU(),
        nn.Dropout(dropout),
        nn.Conv2d(inter, channels, 1),
    )


class SimpleSegmentationModel(nn.Module):
    """Reference models.py:27-43 forward semantics."""

    def __init__(self, backbone, classifier):
        super().__init__()
        self.backbone = backbone
        self.classifier = classifier

    def forward(self, x):
        input_shape = x.shape[-2:]
        x = self.backbone(x)["out"]
        x = self.classifier(x)
        return F.interpolate(x, size=input_shape, mode="bicubic",
                             align_corners=False)


def fcn_resnet50_torch(dropout=0.1, num_classes=3):
    return SimpleSegmentationModel(
        DilatedResNetBackbone((3, 4, 6, 3)),
        fcn_head(2048, num_classes, dropout))


def fcn_resnet101_torch(dropout=0.1, num_classes=3):
    return SimpleSegmentationModel(
        DilatedResNetBackbone((3, 4, 23, 3)),
        fcn_head(2048, num_classes, dropout))
