"""Jitted, mesh-sharded train and eval steps.

The reference's per-batch work (Poutyne internals + __main__.py:235-242):
forward -> Lovász-Softmax -> backward -> Adam step -> metrics
(miou, PixelWiseF1). Here the whole step — including the paired random
augmentation (crop/flip/jitter, reference __main__.py:155-166) and the
metric postprocess — is one compiled program, sharded over the mesh data
axis; gradients are reduced by XLA-inserted psum over ICI. The training
set is small enough to live in HBM (N*1024*1024*4 bytes as uint8), so a
step consumes only *indices*: gather -> augment -> forward/backward happen
entirely on device with zero per-step host->device image traffic.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct
from flax.training import train_state

from ..config import CLASS_WEIGHTS, NUM_CLASSES
from ..data.augment import gather_augment_batch
from ..ops import losses as L
from ..ops.metrics import confusion_matrix, iou_from_confusion, pixelwise_f1
from ..parallel.mesh import ShardingRules


class TrainState(train_state.TrainState):
    batch_stats: Any = struct.field(pytree_node=True)


def make_loss_fn(name: str) -> Callable:
    """Loss menu parity (reference loss classes, SURVEY.md C7). Every loss
    accepts ``pixel_weights=None`` ({0,1} validity mask) for exact padded
    evaluation."""
    weights = jnp.asarray(CLASS_WEIGHTS, jnp.float32)
    if name == "lovasz":  # the loss actually used (__main__.py:239)
        return lambda logits, labels, pixel_weights=None: \
            L.lovasz_softmax_loss(logits, labels,
                                  pixel_weights=pixel_weights)
    if name == "lovasz_hist":
        # TPU fast path: sort-free histogram formulation (quantized sort
        # keys, tie-averaged subgradient — ops/losses.py). Loss value is
        # ~exact; use when the exact sort's cost matters more than
        # bit-parity with the reference.
        return lambda logits, labels, pixel_weights=None: \
            L.lovasz_softmax_loss(logits, labels,
                                  pixel_weights=pixel_weights, bins=1024)
    if name == "cwe":
        return lambda logits, labels, pixel_weights=None: \
            L.weighted_cross_entropy(logits, labels, weights,
                                     pixel_weights=pixel_weights)
    if name == "mixed":
        return lambda logits, labels, pixel_weights=None: \
            L.mixed_loss(logits, labels, weights,
                         pixel_weights=pixel_weights)
    if name == "jaccard":
        return lambda logits, labels, pixel_weights=None: \
            L.jaccard_loss(logits, labels, pixel_weights=pixel_weights)
    raise ValueError(f"unknown loss {name!r}")


def make_train_step(rules: ShardingRules, loss_name: str = "lovasz",
                    crop: int = 512, mean=None, std=None,
                    brightness: float = 0.1, saturation: float = 0.2,
                    compute_f1: bool = True,
                    f1_postprocess: bool = False):
    """Build the fused gather+augment+train step.

    Signature: step(state, images_u8 [N,H,W,3], labels_u8 [N,H,W],
    idx [B], key) -> (state, metrics). images/labels are the full
    HBM-resident training array; idx selects this batch's samples.
    """
    loss_fn = make_loss_fn(loss_name)
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)

    def step(state: TrainState, images_u8, labels_u8, idx, key):
        # fused gather+augment: crop windows are sliced straight out of
        # the uint8 dataset (no full-image materialization; jitter runs
        # post-crop — pointwise, so distribution-identical)
        imgs, labs = gather_augment_batch(key, images_u8, labels_u8, idx,
                                          crop, mean, std,
                                          brightness=brightness,
                                          saturation=saturation)

        def compute_loss(params):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                imgs, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(key, 1)})
            return loss_fn(logits, labs), (logits, mutated)

        (loss, (logits, mutated)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        state = state.apply_gradients(
            grads=grads, batch_stats=mutated["batch_stats"])

        cm = confusion_matrix(jnp.argmax(logits, -1), labs, NUM_CLASSES)
        metrics = {"loss": loss,
                   "miou": jnp.mean(iou_from_confusion(cm))}
        if compute_f1:
            # The per-train-batch F1 is display-only (Poutyne batch
            # logging); its in-metric connected-component postprocess
            # costs ~5x the whole fwd+bwd on TPU, so it defaults off here
            # — pass f1_postprocess=True for exact reference batch logs.
            # Validation/test F1 (make_eval_step) always postprocesses.
            metrics["f1"] = jnp.mean(pixelwise_f1(
                logits, labs, postprocess=f1_postprocess))
        return state, metrics

    return jax.jit(
        step,
        in_shardings=(rules.replicated, rules.replicated, rules.replicated,
                      rules.batch, rules.replicated),
        donate_argnums=(0,))


def make_eval_step(model, rules: ShardingRules, loss_name: str = "lovasz",
                   mean=None, std=None, compute_f1: bool = True):
    """Validation/test step over the HBM-resident dataset: gather by idx,
    normalize, forward (eval mode), loss + per-batch metrics (Poutyne
    averages metrics per batch, weighted by batch size — the host loop
    reproduces that; reference lovasz_losses.py:54-77, utils.py:211).

    ``valid`` ([B] {0,1}) marks real samples: batches are padded with
    repeats to a data-axis multiple, and padded entries are excluded
    EXACTLY from loss and metrics via pixel-validity weights, so eval
    results are identical for any mesh/batch combination (the padded
    samples still flow through the forward — their logits are simply
    never counted).
    """
    loss_fn = make_loss_fn(loss_name)
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)

    def step(variables, images_u8, labels_u8, idx, valid):
        imgs = (images_u8[idx].astype(jnp.float32) / 255.0 - mean) / std
        labs = labels_u8[idx].astype(jnp.int32)
        pw = valid.astype(jnp.float32)[:, None, None]  # [B,1,1] pixel mask
        logits = model.apply(variables, imgs, train=False)
        cm = confusion_matrix(jnp.argmax(logits, -1), labs, NUM_CLASSES,
                              weights=pw)
        out = {"loss": loss_fn(logits, labs, pixel_weights=pw),
               "miou": jnp.mean(iou_from_confusion(cm)),
               "iou_per_class": iou_from_confusion(cm)}
        if compute_f1:
            out["f1_per_class"] = pixelwise_f1(logits, labs, weights=pw)
            out["f1"] = jnp.mean(out["f1_per_class"])
        return out

    return jax.jit(step, in_shardings=(
        rules.replicated, rules.replicated, rules.replicated, rules.batch,
        rules.batch))
