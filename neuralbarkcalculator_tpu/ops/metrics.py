"""Segmentation metrics, JAX-native.

Ports the reference metric surface:

- ``iou`` / ``miou`` (lovasz_losses.py:54-77): per-class IoU x100 over the
  whole batch, EMPTY=1.0 when a class's union is zero.
- ``PixelWiseF1`` (utils.py:201-235): argmax -> remove_small_zones -> sklearn
  per-class F1, plus the absent-class fixup — if class i appears in neither
  target nor output, its score is replaced by the mean of the *other* scores,
  sequentially in class order (so later fixups see earlier fixed values,
  exactly like the reference's in-place loop).

All functions are jittable; the confusion-matrix reductions run on device
and only 3x3 counts ever cross back to the host.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import NUM_CLASSES
from .ccl import remove_small_zones


@functools.partial(jax.jit, static_argnums=(2,))
def confusion_matrix(preds: jnp.ndarray, labels: jnp.ndarray,
                     num_classes: int = NUM_CLASSES,
                     weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """[C, C] counts: rows = true class, cols = predicted class.

    Computed as a one-hot matmul — [C, P] @ [P, C] rides the MXU, whereas
    a scatter-add over P indices serializes on TPU. f32 accumulation is
    exact for counts < 2^24 (16.7M pixels per entry, far above any batch
    here); image-scale counts stay exact in int32 output.

    ``weights`` ({0,1}, broadcastable to labels' shape): masked-out pixels
    contribute nothing — used to make padded eval batches count-exact.
    """
    t = jax.nn.one_hot(labels.reshape(-1), num_classes, dtype=jnp.float32)
    if weights is not None:
        t = t * jnp.broadcast_to(
            weights, labels.shape).reshape(-1, 1).astype(jnp.float32)
    p = jax.nn.one_hot(preds.reshape(-1), num_classes, dtype=jnp.float32)
    cm = jnp.einsum("pt,pc->tc", t, p,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return cm.astype(jnp.int32)


def iou_from_confusion(cm: jnp.ndarray, empty: float = 1.0) -> jnp.ndarray:
    """Per-class IoU x100 with the reference's EMPTY convention
    (lovasz_losses.py:54-73)."""
    cm = cm.astype(jnp.float32)
    tp = jnp.diagonal(cm)
    union = jnp.sum(cm, axis=0) + jnp.sum(cm, axis=1) - tp
    iou_c = jnp.where(union > 0, tp / jnp.maximum(union, 1.0), empty)
    return 100.0 * iou_c


def iou(logits: jnp.ndarray, labels: jnp.ndarray,
        num_classes: int = NUM_CLASSES) -> jnp.ndarray:
    """Reference ``iou`` parity (lovasz_losses.py:54-73): argmax over the
    class axis, IoU per class over the whole batch, x100.

    logits: [..., H, W, C]; labels: [..., H, W] int.
    """
    preds = jnp.argmax(logits, axis=-1)
    return iou_from_confusion(confusion_matrix(preds, labels, num_classes))


def miou(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Reference ``miou`` parity (lovasz_losses.py:76-77)."""
    return jnp.mean(iou(logits, labels))


def f1_from_confusion(cm: jnp.ndarray) -> jnp.ndarray:
    """Per-class F1 from a confusion matrix; 0 where the denominator is 0
    (sklearn f1_score zero_division default)."""
    cm = cm.astype(jnp.float32)
    tp = jnp.diagonal(cm)
    fp = jnp.sum(cm, axis=0) - tp
    fn = jnp.sum(cm, axis=1) - tp
    denom = 2 * tp + fp + fn
    return jnp.where(denom > 0, 2 * tp / jnp.maximum(denom, 1.0), 0.0)


def _absent_class_fixup(scores: jnp.ndarray, cm: jnp.ndarray) -> jnp.ndarray:
    """Reference utils.py:221-226: if class i is absent from both target and
    output, scores[i] := mean of the other scores. Applied sequentially in
    class order on the running (already-fixed) score vector."""
    num_classes = scores.shape[0]
    target_count = jnp.sum(cm, axis=1)
    output_count = jnp.sum(cm, axis=0)
    absent = jnp.logical_and(target_count == 0, output_count == 0)
    for i in range(num_classes):
        others = jnp.delete(scores, i, assume_unique_indices=True)
        scores = scores.at[i].set(
            jnp.where(absent[i], jnp.mean(others), scores[i]))
    return scores


@functools.partial(jax.jit, static_argnums=(2, 3))
def pixelwise_f1(logits: jnp.ndarray, labels: jnp.ndarray,
                 num_classes: int = NUM_CLASSES,
                 postprocess: bool = True,
                 weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """PixelWiseF1 parity (utils.py:211-226): argmax, remove_small_zones,
    per-class F1 with the absent-class fixup. Returns the raw [C] vector;
    reduce with ``.mean()`` for the scalar metric (class_to_watch=None) or
    ``1 - .mean()`` for 'loss' mode.

    logits: [..., H, W, C]; labels: [..., H, W] int; weights: optional
    {0,1} validity mask excluding padded pixels from the counts.
    """
    preds = jnp.argmax(logits, axis=-1)
    if postprocess:
        preds = remove_small_zones(
            preds if preds.ndim >= 2 else preds[None])
    cm = confusion_matrix(preds, labels, num_classes, weights=weights)
    return _absent_class_fixup(f1_from_confusion(cm), cm)
