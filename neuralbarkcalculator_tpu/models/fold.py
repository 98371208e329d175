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

Scope: the whole zoo. ResNet/FCN/DeepLab BNs follow the
``<name>bn<suffix> -> <name>conv<suffix>`` naming rule; EfficientNet's
MBConv BNs (bn0/bn1/bn2 -> expand/depthwise/project conv, eps 1e-3)
are mapped via an explicit table — the depthwise kernel [k, k, 1, C]
folds identically (the BN scale rides the trailing output-channel dim).
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

BN_EPS = 1e-5  # models/resnet.py + models/heads.py (torchvision parity)

# MBConv scopes (models/efficientnet.py): names don't carry the conv's
# name, so the suffix rule can't apply
_MBCONV_BN_TO_CONV = {
    "bn0": "expand_conv",
    "bn1": "depthwise_conv",
    "bn2": "project_conv",
}


def _conv_candidates(bn_scope: tuple[str, ...]) -> list[tuple[str, ...]]:
    """Possible producer-conv scopes for a BN scope. The suffix rule
    ('bn1'->'conv1', 'downsample_bn'->'downsample_conv', 'stem_bn'->
    'stem_conv', ...) covers ResNet/FCN/DeepLab and EfficientNet's
    stem/head; MBConv's bn0/bn1/bn2 names collide with the Bottleneck's
    bnN names, so both candidates are returned and the caller picks
    whichever conv exists in the params tree."""
    name = bn_scope[-1]
    out = []
    if "bn" in name:
        out.append(bn_scope[:-1] + (name.replace("bn", "conv"),))
    if name in _MBCONV_BN_TO_CONV:
        out.append(bn_scope[:-1] + (_MBCONV_BN_TO_CONV[name],))
    if not out:
        raise ValueError(f"unrecognized BatchNorm scope {bn_scope}")
    return out


def fold_inference_variables(variables: Mapping[str, Any],
                             eps: float | Mapping[str, float] = BN_EPS
                             ) -> dict:
    """{'params', 'batch_stats'} -> {'params'} with every BN folded into
    its producer conv (which gains a bias). The result only works with a
    ``folded=True`` model (models/segmentation.py factories).

    ``eps``: the BatchNorm epsilon, or a mapping from top-level scope
    ('backbone'/'classifier') to epsilon — EfficientNet backbones use
    1e-3 while the heads use torchvision's 1e-5."""
    params = flatten_dict(variables["params"])
    stats = flatten_dict(variables.get("batch_stats", {}))
    if not stats:
        raise ValueError("no batch_stats to fold (already folded?)")

    def eps_for(path: tuple[str, ...]) -> float:
        if isinstance(eps, Mapping):
            return eps.get(path[0], BN_EPS)
        return eps

    bn_scopes = {path[:-1] for path in stats}
    out: dict[tuple, np.ndarray] = {}
    for path, leaf in params.items():
        if path[:-1] not in bn_scopes:
            out[path] = leaf
    for bn in sorted(bn_scopes):
        candidates = _conv_candidates(bn)
        conv = next((c for c in candidates
                     if c + ("kernel",) in params), None)
        if conv is None:
            raise ValueError(
                f"BN scope {bn} has no conv sibling among {candidates}")
        kernel_path = conv + ("kernel",)
        kernel = np.asarray(params[kernel_path], np.float64)
        scale = np.asarray(params[bn + ("scale",)], np.float64)
        bias = np.asarray(params[bn + ("bias",)], np.float64)
        mean = np.asarray(stats[bn + ("mean",)], np.float64)
        var = np.asarray(stats[bn + ("var",)], np.float64)
        k = scale / np.sqrt(var + eps_for(bn))
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
    eps = {"backbone": getattr(model.backbone, "bn_eps", BN_EPS),
           "classifier": BN_EPS}
    folded_vars = fold_inference_variables(variables, eps=eps)
    folded = model.clone(
        backbone=model.backbone.clone(folded=True),
        classifier=model.classifier.clone(folded=True))
    return folded, folded_vars
