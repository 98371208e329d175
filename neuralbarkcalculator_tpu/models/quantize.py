"""Post-training int8 quantization (calibrate -> convert -> int8 model).

Turns a folded inference model (models/fold.py) into the ``quantized=True``
int8 module mode (models/resnet.py, models/heads.py, primitives in
models/qops.py): symmetric per-output-channel weight scales, static
per-tensor activation scales calibrated as max|x|/127 over a few batches
of representative data, and offline-precomputed requantization epilogues
(m[c] = s_in * s_w[c] / s_next, b[c] = bias[c] / s_next) so the runtime
graph is conv_int8 -> fused multiply-add -> round/clip/cast, nothing else.

Measured on the v5e MXU the int8 convs run 1.6-2.05x faster than bf16 at
this model's hot shapes (benchmarks/int8_probe.json) and the int8
activations halve HBM traffic everywhere. The mode is opt-in and
approximate: class maps typically agree with f32 on >99% of pixels
(tests/test_quantize.py pins a floor), while the default bf16 path keeps
the reference-parity guarantees. No reference equivalent (the reference
runs f32 CPU inference, models.py:249-262).

Scope: DilatedResNet backbones + FCNHead/DeepLabHead (fcn_resnet50/101,
deeplabv3_resnet50/101). EfficientNet raises — its SE/swish graph needs
per-op treatment that this release does not carry.
"""
from __future__ import annotations

from typing import Any, Mapping, Sequence

import jax.numpy as jnp
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

from .fold import fold_model

_EPS = 1e-6  # floor for calibrated scales (dead tensors/channels)

# Offline-quantized checkpoint format: this magic prefix (8-byte tag +
# 1 version byte), then the flax msgpack of the quantized {'params'}
# tree. The prefix lets loaders distinguish int8 checkpoints from plain
# ones BEFORE deserializing (msgpack needs the right template), so the
# predict engine can skip BN folding and first-chunk calibration
# entirely. Version history:
#   \x00  f32 residual adds (dequant to real units, inv_s_out rescale)
#   \x01  residual math in s_out units (conv3/downsample m/b divided by
#         s_out, s_ratio instead of s_in+inv_s_out) — halves HBM spills,
#         see models/resnet.py::_quantized_forward
QCKPT_TAG = b"NBCQINT8"
QCKPT_MAGIC = QCKPT_TAG + b"\x01"


def calibrate(model, variables: Mapping[str, Any],
              batches: Sequence[Any]) -> dict:
    """Run the folded f32/bf16 model over calibration batches, collecting
    per-tensor max-abs from the ``quant_stats`` sows. Returns a flat dict
    {scope tuple -> float max-abs} aggregated (max) across batches."""
    from .segmentation import SegmentationModel

    agg: dict[tuple, float] = {}
    for x in batches:
        _, state = model.apply(
            variables, jnp.asarray(x), train=False,
            method=SegmentationModel.head_logits,
            mutable=["quant_stats"])
        for path, vals in flatten_dict(state["quant_stats"]).items():
            v = float(np.max([np.asarray(v) for v in vals]))
            agg[path] = max(agg.get(path, 0.0), v)
    return agg


def _quantize_conv(out: dict, scope: tuple, kernel: np.ndarray,
                   bias: np.ndarray, s_in: float,
                   s_next: float | None) -> None:
    """Emit {scope}_q / {scope}_m / {scope}_b for one conv. ``s_next``
    None means the consumer wants real units (residual adds, logits)."""
    k = np.asarray(kernel, np.float64)
    b = np.asarray(bias, np.float64)
    w_scale = np.maximum(np.max(np.abs(k), axis=(0, 1, 2)) / 127.0, _EPS)
    out[scope[:-1] + (scope[-1] + "_q",)] = np.clip(
        np.rint(k / w_scale), -127, 127).astype(np.int8)
    if s_next is None:
        m, bq = s_in * w_scale, b
    else:
        m, bq = s_in * w_scale / s_next, b / s_next
    out[scope[:-1] + (scope[-1] + "_m",)] = m.astype(np.float32)
    out[scope[:-1] + (scope[-1] + "_b",)] = bq.astype(np.float32)


def quantize_variables(folded_variables: Mapping[str, Any], stats: dict,
                       stage_sizes: Sequence[int],
                       head: str = "fcn") -> dict:
    """Folded {'params'} + calibration stats -> quantized {'params'}.

    Walks the backbone blocks in dataflow order so each block's input
    scale is its producer's output scale (stem feeds layer1_0, each
    block feeds the next, layer4's last block feeds the head).
    ``head``: 'fcn' (FCNHead) or 'deeplab' (DeepLabHead/ASPP)."""
    params = flatten_dict(folded_variables["params"])
    out: dict[tuple, np.ndarray] = {}

    def scale(*path: str) -> float:
        if path not in stats:
            raise ValueError(f"calibration stats missing {path} — was the "
                             "calibration run on the folded model?")
        return max(stats[path] / 127.0, _EPS)

    def conv(scope: tuple, s_in: float, s_next: float | None) -> None:
        _quantize_conv(out, scope, params[scope + ("kernel",)],
                       params[scope + ("bias",)], s_in, s_next)

    # stem stays bf16 (resnet.py: C_in=3 starves the int8 MXU depth
    # lanes) — copy the folded conv verbatim, quantize after the pool
    s_prev = scale("backbone", "q_stem")
    out[("backbone", "conv1", "kernel")] = np.asarray(
        params[("backbone", "conv1", "kernel")], np.float32)
    out[("backbone", "conv1", "bias")] = np.asarray(
        params[("backbone", "conv1", "bias")], np.float32)
    out[("backbone", "inv_s_stem")] = np.float32(1.0 / s_prev)

    inplanes = 64
    for stage, num_blocks in enumerate(stage_sizes):
        planes = 64 * (2 ** stage)
        stride = 1 if stage == 0 else 2
        # downsample presence must mirror models/resnet.py: every stage's
        # first block has inplanes != planes*4, so stride-vs-dilation
        # replacement cannot change the outcome
        for block in range(num_blocks):
            name = f"layer{stage + 1}_{block}"
            bscope = ("backbone", name)
            s_t1 = scale(*bscope, "q_t1")
            s_t2 = scale(*bscope, "q_t2")
            s_out = scale(*bscope, "q_out")
            conv(bscope + ("conv1",), s_prev, s_t1)
            conv(bscope + ("conv2",), s_t1, s_t2)
            # conv3 + downsample requantize to s_out units so the whole
            # residual add runs there (resnet.py::_quantized_forward)
            conv(bscope + ("conv3",), s_t2, s_out)
            if block == 0 and (stride != 1 or inplanes != planes * 4):
                conv(bscope + ("downsample_conv",), s_prev, s_out)
                # requant_signed clips this branch to +-127*s_out; the
                # clip is only sound if the calibrated branch magnitude
                # fits (ADVICE r4: the branch CAN exceed the post-ReLU
                # block output it shares a scale with). Warn on overflow
                # risk — saturation there is a systematic error, not
                # rounding. (q_ds missing = pre-r5 stats; skip quietly.)
                ds_key = bscope + ("q_ds",)
                if ds_key in stats and stats[ds_key] > 127.0 * s_out:
                    import warnings
                    warnings.warn(
                        f"int8 calibration: {name} downsample branch "
                        f"max-abs {stats[ds_key]:.3g} exceeds its "
                        f"residual clip range {127.0 * s_out:.3g} "
                        f"({stats[ds_key] / (127.0 * s_out):.2f}x) — "
                        "expect saturation error in this block; "
                        "calibrate on more representative data",
                        stacklevel=2)
            else:
                out[bscope + ("s_ratio",)] = np.float32(s_prev / s_out)
            s_prev = s_out
            inplanes = planes * 4

    if head == "fcn":
        s_h1 = scale("classifier", "q_t1")
        conv(("classifier", "conv1"), s_prev, s_h1)
        conv(("classifier", "conv2"), s_h1, None)
    elif head == "deeplab":
        aspp = ("classifier", "aspp")
        s_cat = scale(*aspp, "q_cat")
        conv(aspp + ("b0_conv",), s_prev, s_cat)
        for i in range(3):  # ASPP.rates branches, all requant to s_cat
            conv(aspp + (f"b{i + 1}", "conv"), s_prev, s_cat)
        # pooled branch stays f32 (models/heads.py ASPP._quantized_forward)
        out[aspp + ("pool_conv_kernel",)] = np.asarray(
            params[aspp + ("pool_conv", "kernel")], np.float32)[0, 0]
        out[aspp + ("pool_conv_bias",)] = np.asarray(
            params[aspp + ("pool_conv", "bias")], np.float32)
        out[aspp + ("s_in",)] = np.float32(s_prev)
        out[aspp + ("inv_s_cat",)] = np.float32(1.0 / s_cat)
        s_proj = scale(*aspp, "q_proj")
        conv(aspp + ("project_conv",), s_cat, s_proj)
        s_h = scale("classifier", "q_h")
        conv(("classifier", "conv"), s_proj, s_h)
        conv(("classifier", "classifier"), s_h, None)
    else:
        raise ValueError(f"unknown head kind {head!r}")
    return {"params": unflatten_dict(out)}


def quantize_model(model, variables: Mapping[str, Any],
                   calib_batches: Sequence[Any]):
    """(model, vars, calibration batches) -> (int8 model, int8 vars).

    Accepts either an unfolded model (+batch_stats; folded internally) or
    an already-folded one. ``calib_batches``: an iterable of normalized
    NHWC f32 batches representative of inference inputs (a handful of
    images is enough for max-abs calibration)."""
    for part, label in ((model.backbone, "backbone"),
                        (model.classifier, "head")):
        if not getattr(part, "supports_quantize", False):
            raise ValueError(
                f"{label} {type(part).__name__} has no int8 inference "
                "mode (supported: DilatedResNet backbones + "
                "FCNHead/DeepLabHead)")
    if "batch_stats" in variables:
        model, variables = fold_model(model, variables)
    elif not getattr(model.backbone, "folded", False):
        raise ValueError("quantize_model needs batch_stats or an "
                         "already-folded (model, variables) pair")
    head = ("deeplab" if type(model.classifier).__name__ == "DeepLabHead"
            else "fcn")
    stats = calibrate(model, variables, calib_batches)
    qvars = quantize_variables(variables, stats,
                               tuple(model.backbone.stage_sizes), head)
    qmodel = model.clone(
        backbone=model.backbone.clone(quantized=True),
        classifier=model.classifier.clone(quantized=True))
    return qmodel, qvars


def save_quantized(path: str, qvars: Mapping[str, Any]) -> None:
    """Persist a quantized {'params'} tree (from quantize_model or a
    calibrated engine) as an offline int8 checkpoint: deployments load
    it directly — no batch_stats, no folding, no first-chunk
    calibration, ~4x smaller than the f32 checkpoint."""
    import flax.serialization
    with open(path, "wb") as f:
        f.write(QCKPT_MAGIC)
        f.write(flax.serialization.to_bytes(qvars))


def is_quantized_checkpoint(path: str) -> bool:
    """True when ``path`` is an offline int8 checkpoint file."""
    import os
    if not os.path.isfile(path):
        return False
    with open(path, "rb") as f:
        return f.read(len(QCKPT_TAG)) == QCKPT_TAG


def load_quantized(path: str, model_name: str = "fcn_resnet50",
                   dtype: Any = None):
    """Offline int8 checkpoint -> (quantized model, quantized variables).

    ``model_name`` must name the factory the checkpoint was quantized
    from (shape mismatches surface as flax deserialization errors).
    ``dtype`` sets the compute dtype of the non-quantized islands (the
    bf16 stem, ASPP pooled branch); default bfloat16 — the precision
    offline exports are calibrated at (tools/quantize_checkpoint.py)."""
    import flax.serialization
    import jax
    import jax.numpy as jnp

    from .segmentation import MODEL_FACTORIES
    model = MODEL_FACTORIES[model_name](
        dtype=jnp.bfloat16 if dtype is None else dtype)
    qmodel = model.clone(
        backbone=model.backbone.clone(quantized=True),
        classifier=model.classifier.clone(quantized=True))
    # param shapes are input-size independent; init tiny for the template
    template = qmodel.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           train=False)
    with open(path, "rb") as f:
        prefix = f.read(len(QCKPT_MAGIC))
        if prefix[:len(QCKPT_TAG)] != QCKPT_TAG:
            raise ValueError(f"{path!r} is not an int8 checkpoint "
                             "(missing NBCQINT8 prefix)")
        if prefix != QCKPT_MAGIC:
            raise ValueError(
                f"{path!r} is int8 checkpoint version "
                f"{prefix[len(QCKPT_TAG):]!r}, this runtime reads "
                f"{QCKPT_MAGIC[len(QCKPT_TAG):]!r} — re-export it with "
                "tools/quantize_checkpoint.py from the original "
                "f32 checkpoint")
        qvars = flax.serialization.from_bytes(template, f.read())
    return qmodel, qvars
