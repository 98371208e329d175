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
from ..ops.resize import bicubic_upsample, bicubic_upsample_ragged
from .heads import DeepLabHead, FCNHead
from .resnet import resnet101_dilated, resnet50_dilated

Dtype = Any


class SegmentationModel(nn.Module):
    """backbone features -> head logits -> bicubic upsample to input H, W.

    Ragged-height batched inference: pass ``valid_h`` ([B] true trimmed
    heights; inputs zero-padded to the static H) and ``row_upsample``
    ([B, H, H//8] per-image embedded bicubic row operators, see
    ops/resize.py:embedded_bicubic_rows). Together these make the padded
    batch bit-equivalent to running each image at its own height
    (masking rationale in models/resnet.py). Without them this is the plain
    reference forward (models.py:33-43).
    """

    backbone: nn.Module
    classifier: nn.Module

    @nn.compact
    def __call__(self, x, train: bool = False, valid_h=None,
                 row_upsample=None):
        in_h, in_w = x.shape[1], x.shape[2]
        feat_h = (None if valid_h is None
                  else self.backbone.valid_feature_height(valid_h))
        feat = self.backbone(x, train=train, valid_h=valid_h)
        logits = self.classifier(feat, train=train, valid_h=feat_h)
        logits = logits.astype(jnp.float32)
        if row_upsample is not None:
            return bicubic_upsample_ragged(logits, row_upsample, in_w)
        if (logits.shape[1], logits.shape[2]) != (in_h, in_w):
            logits = bicubic_upsample(logits, in_h, in_w)
        return logits

    def head_logits(self, x, train: bool = False, valid_h=None):
        """Head logits at the feature stride, WITHOUT the upsample — for
        callers that fuse upsample+argmax in Pallas
        (ops/pallas_kernels.upsample_argmax). Use via
        ``model.apply(vars, x, ..., method=SegmentationModel.head_logits)``.
        """
        feat_h = (None if valid_h is None
                  else self.backbone.valid_feature_height(valid_h))
        feat = self.backbone(x, train=train, valid_h=valid_h)
        logits = self.classifier(feat, train=train, valid_h=feat_h)
        return logits.astype(jnp.float32)


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

# Variant-bound names ("fcn_efficientnet_b0" ... "_b7") so CLIs / the
# Experiment / the predict engine can select EfficientNet models without a
# separate n argument (reference callers pass n positionally, models.py:104).
import functools  # noqa: E402

for _n in range(8):
    MODEL_FACTORIES[f"fcn_efficientnet_b{_n}"] = functools.partial(
        fcn_efficientnet, _n)
    MODEL_FACTORIES[f"deeplabv3_efficientnet_b{_n}"] = functools.partial(
        deeplabv3_efficientnet, _n)


def efficientnet_variant_of(model_name: str) -> int | None:
    """'fcn_efficientnet_b3' -> 3; None for non-EfficientNet names."""
    if "_efficientnet_b" in model_name:
        return int(model_name.rsplit("_b", 1)[1])
    return None
