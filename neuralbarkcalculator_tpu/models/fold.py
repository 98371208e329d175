"""Inference-time constant folding: BatchNorm -> conv kernel/bias.

In eval mode every BatchNorm in this model zoo is an affine map with
constants (``y = scale * (x - mean) / sqrt(var + eps) + bias``) applied
directly to a bias-free convolution's output. Folding it into the conv —

    kernel' = kernel * (scale / sqrt(var + eps))   (per output channel)
    bias'   = bias - mean * scale / sqrt(var + eps)

— removes every BN elementwise pass over the activations from the
inference graph (the conv-bn-relu chains at 128x128x2048 are pure HBM
traffic on TPU; see docs/SCALING.md) and hands XLA a plain
conv+bias+relu chain it fuses completely. Reference citation: the
BN layers being folded are torchvision's (reference models.py:113-139);
this transform has no reference equivalent — the reference always runs
BN at inference.

Numerics: kernel' is computed in float64 then cast back, so the folded
f32 forward matches the unfolded one to normal f32 rounding; class maps
(argmax over 3 well-separated logits) are identical in practice, and
tests/test_fold.py proves map equality plus logit closeness on
realistic content.

Input normalize: only the 1/std *scale* could be folded into the stem
conv without changing semantics — zero padding maps to zero under a
linear scale. The -mean shift can NOT be folded into a bias: the stem
conv's zero padding represents zeros in *normalized* space, and a bias
correction would wrongly apply to padded taps at the image border (and
break the zero-beyond-valid_h ragged invariant). The shift is one fused
elementwise op over the uint8->f32 conversion XLA already performs, so
neither half is worth the asymmetry; we fold neither.

Scope: the ResNet family with FCN / DeepLab heads (every BN here follows
the ``<name>bn<suffix> -> <name>conv<suffix>`` naming convention).
EfficientNet backbones are not folded (depthwise + TF-SAME layout);
``fold_inference_variables`` raises ValueError so callers can fall back.
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

BN_EPS = 1e-5  # every BatchNorm in models/resnet.py + models/heads.py


def _conv_scope_for(bn_scope: tuple[str, ...]) -> tuple[str, ...]:
    """'bn1'->'conv1', 'bn'->'conv', 'downsample_bn'->'downsample_conv',
    'b0_bn'->'b0_conv', 'pool_bn'->'pool_conv', 'project_bn'->
    'project_conv' — the single naming rule the whole zoo follows."""
    name = bn_scope[-1]
    if "bn" not in name:
        raise ValueError(f"unrecognized BatchNorm scope {bn_scope}")
    return bn_scope[:-1] + (name.replace("bn", "conv"),)


def fold_inference_variables(variables: Mapping[str, Any]) -> dict:
    """{'params', 'batch_stats'} -> {'params'} with every BN folded into
    its producer conv (which gains a bias). The result only works with a
    ``folded=True`` model (models/segmentation.py factories)."""
    params = flatten_dict(variables["params"])
    stats = flatten_dict(variables.get("batch_stats", {}))
    if not stats:
        raise ValueError("no batch_stats to fold (already folded?)")

    bn_scopes = {path[:-1] for path in stats}
    out: dict[tuple, np.ndarray] = {}
    for path, leaf in params.items():
        if path[:-1] not in bn_scopes:
            out[path] = leaf
    for bn in sorted(bn_scopes):
        conv = _conv_scope_for(bn)
        kernel_path = conv + ("kernel",)
        if kernel_path not in params:
            raise ValueError(
                f"BN scope {bn} has no conv sibling {conv} — backbone "
                f"not foldable (EfficientNet?)")
        kernel = np.asarray(params[kernel_path], np.float64)
        scale = np.asarray(params[bn + ("scale",)], np.float64)
        bias = np.asarray(params[bn + ("bias",)], np.float64)
        mean = np.asarray(stats[bn + ("mean",)], np.float64)
        var = np.asarray(stats[bn + ("var",)], np.float64)
        k = scale / np.sqrt(var + BN_EPS)
        out[kernel_path] = (kernel * k).astype(np.float32)  # HWIO: k on O
        out[conv + ("bias",)] = (bias - mean * k).astype(np.float32)
    return {"params": unflatten_dict(out)}


def fold_model(model, variables: Mapping[str, Any]):
    """(model, {'params','batch_stats'}) -> (folded model, {'params'}).

    The folded model is the same module tree with ``folded=True`` on the
    backbone and classifier: convs carry biases, BNs vanish from the
    traced graph. Raises ValueError for backbones without fold support.
    """
    if not getattr(model.backbone, "supports_fold", False):
        raise ValueError(
            f"backbone {type(model.backbone).__name__} has no folded "
            f"inference mode")
    folded_vars = fold_inference_variables(variables)
    folded = model.clone(
        backbone=model.backbone.clone(folded=True),
        classifier=model.classifier.clone(folded=True))
    return folded, folded_vars
