"""Segmentation model assembly (reference models.py:27-154).

``SegmentationModel`` = backbone -> head -> torch-parity bicubic upsample to
the input resolution (reference SimpleSegmentationModel, models.py:33-43).
Factories mirror the reference model zoo:

- fcn_resnet50 (models.py:127-139)  — the production model (models.py:221)
- fcn_resnet101 (models.py:142-154)
- deeplabv3_resnet50 / deeplabv3_resnet101 (models.py:46-71)
- fcn_efficientnet / deeplabv3_efficientnet (models.py:86-110)

Logits come back in NHWC float32 regardless of the compute dtype.
"""
from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

from ..config import NUM_CLASSES
from ..ops.resize import bicubic_upsample
from .heads import DeepLabHead, FCNHead
from .resnet import resnet101_dilated, resnet50_dilated

Dtype = Any


class SegmentationModel(nn.Module):
    """backbone features -> head logits -> bicubic upsample to input H, W."""

    backbone: nn.Module
    classifier: nn.Module

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_h, in_w = x.shape[1], x.shape[2]
        feat = self.backbone(x, train=train)
        logits = self.classifier(feat, train=train)
        logits = logits.astype(jnp.float32)
        if (logits.shape[1], logits.shape[2]) != (in_h, in_w):
            logits = bicubic_upsample(logits, in_h, in_w)
        return logits


def fcn_resnet50(dropout: float = 0.1,
                 num_classes: int = NUM_CLASSES,
                 dtype: Dtype = jnp.float32) -> SegmentationModel:
    return SegmentationModel(
        backbone=resnet50_dilated(dtype=dtype),
        classifier=FCNHead(num_classes, dropout=dropout, dtype=dtype),
    )


def fcn_resnet101(dropout: float = 0.1,
                  num_classes: int = NUM_CLASSES,
                  dtype: Dtype = jnp.float32) -> SegmentationModel:
    return SegmentationModel(
        backbone=resnet101_dilated(dtype=dtype),
        classifier=FCNHead(num_classes, dropout=dropout, dtype=dtype),
    )


def deeplabv3_resnet50(num_classes: int = NUM_CLASSES,
                       dtype: Dtype = jnp.float32) -> SegmentationModel:
    return SegmentationModel(
        backbone=resnet50_dilated(dtype=dtype),
        classifier=DeepLabHead(num_classes, dtype=dtype),
    )


def deeplabv3_resnet101(num_classes: int = NUM_CLASSES,
                        dtype: Dtype = jnp.float32) -> SegmentationModel:
    return SegmentationModel(
        backbone=resnet101_dilated(dtype=dtype),
        classifier=DeepLabHead(num_classes, dtype=dtype),
    )


def fcn_efficientnet(n: int, dropout: float = 0.1,
                     num_classes: int = NUM_CLASSES,
                     dtype: Dtype = jnp.float32) -> SegmentationModel:
    from .efficientnet import EfficientNetFeatures
    return SegmentationModel(
        backbone=EfficientNetFeatures(variant=n, dtype=dtype),
        classifier=FCNHead(num_classes, dropout=dropout, dtype=dtype),
    )


def deeplabv3_efficientnet(n: int, num_classes: int = NUM_CLASSES,
                           dtype: Dtype = jnp.float32) -> SegmentationModel:
    from .efficientnet import EfficientNetFeatures
    return SegmentationModel(
        backbone=EfficientNetFeatures(variant=n, dtype=dtype),
        classifier=DeepLabHead(num_classes, dtype=dtype),
    )


MODEL_FACTORIES: dict[str, Callable[..., SegmentationModel]] = {
    "fcn_resnet50": fcn_resnet50,
    "fcn_resnet101": fcn_resnet101,
    "deeplabv3_resnet50": deeplabv3_resnet50,
    "deeplabv3_resnet101": deeplabv3_resnet101,
    "fcn_efficientnet": fcn_efficientnet,
    "deeplabv3_efficientnet": deeplabv3_efficientnet,
}
