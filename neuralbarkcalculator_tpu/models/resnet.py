"""Dilated ResNet backbones (torchvision-numerics-compatible), NHWC Flax.

Reimplements the reference backbone — torchvision ``resnet50/101`` with
``replace_stride_with_dilation=[False, True, True]`` wrapped in
``IntermediateLayerGetter({'layer4': 'out'})`` (reference models.py:127-139)
— as idiomatic NHWC Flax modules so XLA can tile convs onto the MXU and
fuse the BN/ReLU chains.

Dilation layout matches torchvision's ``_make_layer``: when a stage is
dilated its first block keeps the *previous* dilation and stride becomes 1,
remaining blocks use the doubled dilation; with [False, True, True] the
output stride is 8 and layer3/layer4 blocks run at dilation 2/4. The 3x3
bottleneck conv carries the stride (ResNet v1.5), matching the weights'
expectations for checkpoint conversion (models/convert.py).

Compute dtype is configurable (bf16 for the MXU fast path); BatchNorm
statistics/params stay float32.

Ragged-height batching (``valid_h``): folder inference batches images whose
trimmed heights differ (reference models.py:200-201) by zero-padding them to
one static height. To keep *exact* per-image semantics inside the padded
batch, a row mask is applied to the input of every op whose kernel mixes
rows (7x7/3x3 convs, max-pool): rows beyond an image's valid height are
forced to zero, which is precisely what the reference's per-image conv
zero-padding provides at the true bottom boundary. 1x1 convs, BN (eval) and
ReLU are pointwise, so garbage rows they produce are cleaned at the next
masked op and never leak into valid rows. The per-stage valid heights follow
the conv output-size arithmetic (floor((h + 2p - k)/s) + 1).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def conv_out_size(h, kernel: int, stride: int, padding: int):
    """torch/XLA conv output length along one dim (works on traced ints)."""
    return (h + 2 * padding - kernel) // stride + 1


def row_mask(valid_h, height: int, dtype) -> jnp.ndarray:
    """[B] valid heights -> [B, height, 1, 1] {0,1} mask (NHWC broadcast)."""
    rows = jnp.arange(height, dtype=jnp.int32)
    return (rows[None, :] < valid_h[:, None]).astype(dtype)[:, :, None, None]


def apply_row_mask(x, valid_h):
    """Zero rows >= valid_h of an NHWC tensor; no-op when valid_h is None."""
    if valid_h is None:
        return x
    return x * row_mask(valid_h, x.shape[1], x.dtype)


class Bottleneck(nn.Module):
    """torchvision Bottleneck (expansion 4, stride on the 3x3 conv).

    ``folded``: inference-only mode where every BatchNorm has been
    constant-folded into its producer conv's kernel + a bias
    (models/fold.py) — the BN ops vanish from the traced graph and the
    convs carry biases instead.

    ``quantized``: int8 inference mode (models/quantize.py builds the
    parameters from a folded checkpoint + calibration stats). The block
    consumes and produces int8 activations; convs run int8 x int8 ->
    int32 on the MXU with fused requantizing epilogues (models/qops.py).
    The folded forward additionally sows per-tensor max-abs values into
    the ``quant_stats`` collection (dead code unless the caller passes
    ``mutable=["quant_stats"]``) — that is the calibration pass."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: Dtype = jnp.float32
    folded: bool = False
    quantized: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, valid_h=None):
        if (self.folded or self.quantized) and train:
            raise ValueError("folded/quantized models are inference-only")
        if self.quantized:
            return self._quantized_forward(x, valid_h)
        norm = lambda name: (  # noqa: E731
            (lambda z: z) if self.folded else nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name=name))
        conv = lambda f, k, s, d, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s),
            padding=[(d * (k // 2),) * 2] * 2,
            kernel_dilation=(d, d), use_bias=self.folded, dtype=self.dtype,
            name=name)

        identity = x
        out = conv(self.planes, 1, 1, 1, "conv1")(x)
        out = nn.relu(norm("bn1")(out))
        if self.folded:  # calibration point (models/quantize.py); gated
            # so plain model.init never emits a quant_stats collection
            self.sow("quant_stats", "q_t1", jnp.max(jnp.abs(out)))
        # conv2 is the only row-mixing op in the block: mask its input so
        # rows beyond valid_h read as zero (= reference conv zero-padding).
        out = apply_row_mask(out, valid_h)
        out = conv(self.planes, 3, self.stride, self.dilation, "conv2")(out)
        out = nn.relu(norm("bn2")(out))
        if self.folded:
            self.sow("quant_stats", "q_t2", jnp.max(jnp.abs(out)))
        out = conv(self.planes * 4, 1, 1, 1, "conv3")(out)
        out = norm("bn3")(out)

        if self.has_downsample:
            identity = conv(self.planes * 4, 1, self.stride, 1,
                            "downsample_conv")(x)
            identity = norm("downsample_bn")(identity)
            if self.folded:
                # the int8 path requantizes this branch to s_out with a
                # symmetric +-127 clip (qops.requant_signed); calibrate
                # its own max-abs so quantize_variables can verify the
                # clip covers the observed range (warn if not)
                self.sow("quant_stats", "q_ds", jnp.max(jnp.abs(identity)))

        out = nn.relu(out + identity.astype(out.dtype))
        if self.folded:
            self.sow("quant_stats", "q_out", jnp.max(jnp.abs(out)))
        return out

    def _quantized_forward(self, x_q, valid_h):
        """int8 path: x_q int8 at scale s_in -> int8 at scale s_out.
        Parameter layout is produced by models/quantize.py; m/b arrays
        carry the combined requant multipliers (see models/qops.py).

        All residual arithmetic happens in s_out units: conv3's epilogue
        (m = s_t2*s_w/s_out, b = bias/s_out) fuses the dequant, the
        identity add, the ReLU, and the output round/clip into the conv,
        and the downsample branch requantizes its own accumulator to int8
        in the SAME s_out units. That second point is the load-bearing
        one: the residual add has two conv producers, XLA fuses its
        epilogue into only one, and the other branch's output spills to
        HBM — as int8 it spills 1 byte/element instead of the 4-byte raw
        s32 accumulator (9.2 GB/step of s32 at batch 32 before this
        layout, benchmarks/int8_hlo_diag.json). The extra rounding of
        the downsample branch (one int8 quantization at s_out, the scale
        the block output is about to be quantized to anyway) is one
        numeric difference vs the f32-residual formulation; the other is
        requant_signed's symmetric clip to +-127*s_out — the branch
        magnitude is not bounded by the post-ReLU block output whose
        scale it borrows, so values past the clip saturate
        systematically. Calibration sows the branch max-abs (q_ds) and
        quantize_variables warns when it exceeds the clip range."""
        from . import qops

        def qp(name, shape, dtype=jnp.float32):
            return self.param(name, nn.initializers.zeros, shape, dtype)

        cin = x_q.shape[-1]
        p, p4 = self.planes, self.planes * 4
        acc = qops.qconv(x_q, qp("conv1_q", (1, 1, cin, p), jnp.int8))
        t1 = qops.requant_relu(acc, qp("conv1_m", (p,)), qp("conv1_b", (p,)))
        t1 = apply_row_mask(t1, valid_h)  # int8 mask multiply: 0/1
        acc = qops.qconv(t1, qp("conv2_q", (3, 3, p, p), jnp.int8),
                         self.stride, self.dilation)
        t2 = qops.requant_relu(acc, qp("conv2_m", (p,)), qp("conv2_b", (p,)))
        acc = qops.qconv(t2, qp("conv3_q", (1, 1, p, p4), jnp.int8))
        # main branch in s_out units (m/b already divided by s_out)
        out = qops.dequant(acc, qp("conv3_m", (p4,)), qp("conv3_b", (p4,)))

        if self.has_downsample:
            acc = qops.qconv(x_q, qp("downsample_conv_q", (1, 1, cin, p4),
                                     jnp.int8), self.stride)
            identity = qops.requant_signed(
                acc, qp("downsample_conv_m", (p4,)),
                qp("downsample_conv_b", (p4,))).astype(jnp.float32)
        else:
            identity = x_q.astype(jnp.float32) * qp("s_ratio", ())
        out = nn.relu(out + identity)
        return jnp.clip(jnp.round(out), 0, 127).astype(jnp.int8)


class _S2DStemConv(nn.Module):
    """The 7x7/s2 stem conv evaluated as a 4x4/s1 conv over 2x2
    space-to-depth blocks — the standard TPU CNN trick for thin-channel
    stems: the MXU contracts over input channels, and C_in=3 wastes
    nearly the whole 128-lane dimension; blocking 2x2 pixels into
    channels gives a 4x4 x 12-channel contraction (48 vs 21 useful
    values per tap column) on a quarter the spatial grid.

    Exactness: with r = 2i + dy - 3 (dy in 0..6 of the original kernel),
    block row R = r//2 spans i-2..i+1, so the block conv has 4 taps with
    padding (2, 1); tap (DY, p) reads original dy = 2*DY + p - 1, with
    dy = -1 zero-padded. Zero padding in block space equals the original
    conv's zero padding, so ragged row masking stays exact.

    Parameters are IDENTICAL to the plain nn.Conv stem ('kernel'
    [7,7,3,64], plus 'bias' when folded) — checkpoints load unchanged
    and the rearrangement runs inside the traced program (a few-KB
    gather XLA hoists out of the hot loop).
    """

    folded: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, 3, 64))
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            raise ValueError(f"s2d stem needs even H, W; got {h}x{w}")
        x2 = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2,
                                                    4 * c)
        k = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k = k.reshape(4, 2, 4, 2, c, 64).transpose(0, 2, 1, 3, 4, 5)
        k = k.reshape(4, 4, 4 * c, 64)
        y = jax.lax.conv_general_dilated(
            x2.astype(self.dtype), k.astype(self.dtype), (1, 1),
            ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.folded:
            bias = self.param("bias", nn.initializers.zeros, (64,))
            y = y + bias.astype(self.dtype)
        return y


class DilatedResNet(nn.Module):
    """ResNet backbone with stride->dilation replacement, returning the
    layer4 feature map (the IntermediateLayerGetter 'out')."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # resnet50
    replace_stride_with_dilation: Sequence[bool] = (False, True, True)
    dtype: Dtype = jnp.float32
    folded: bool = False  # BN constant-folded into convs (models/fold.py)
    quantized: bool = False  # int8 inference mode (models/quantize.py)
    s2d_stem: bool = False  # stem as space-to-depth conv (_S2DStemConv)

    # Fixed symmetric conv padding makes zero-padded batches bit-exact
    # with per-image row masks (predict engine's ragged bucketing).
    supports_ragged = True
    supports_fold = True
    supports_quantize = True  # int8 post-training quantization
    bn_eps = 1e-5  # torchvision BatchNorm2d default (models/fold.py)

    @property
    def feature_stride(self) -> int:
        """Output stride: stem (2) x pool (2) x each non-dilated stage."""
        stride = 4
        for dilate in self.replace_stride_with_dilation:
            if not dilate:
                stride *= 2
        return stride

    @nn.compact
    def __call__(self, x, train: bool = False, valid_h=None):
        if (self.folded or self.quantized) and train:
            raise ValueError("folded/quantized models are inference-only")
        if self.quantized and self.s2d_stem:
            raise ValueError("quantized mode uses the plain stem conv")
        # The raw input is zero below valid_h by construction (host pads
        # with zeros), so the stem conv needs no input mask.
        if self.quantized:
            # The stem stays un-quantized (same folded conv1 kernel+bias
            # layout as the bf16+fold path): with C_in=3 an int8 stem
            # packs 3 of the MXU's 32 depth lanes and measured SLOWER
            # than bf16 (0.466 vs 0.385 ms/img at b32,
            # benchmarks/int8_backbone_stages.json). Quantization happens
            # after the max pool below, where the tensor is 64-deep and
            # 4x smaller. Compute dtype = self.dtype so the stem runs at
            # the same precision q_stem/inv_s_stem were calibrated at
            # (ADVICE r4: a hardcoded bf16 here diverged from f32-config
            # calibration runs).
            x = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)], use_bias=True,
                        dtype=self.dtype, name="conv1")(x)
            x = nn.relu(x)
        else:
            if self.folded:  # calibration point; gated so plain
                # model.init never emits a quant_stats collection
                self.sow("quant_stats", "q_in", jnp.max(jnp.abs(x)))
            if self.s2d_stem:
                x = _S2DStemConv(folded=self.folded, dtype=self.dtype,
                                 name="conv1")(x)
            else:
                x = nn.Conv(64, (7, 7), strides=(2, 2),
                            padding=[(3, 3), (3, 3)], use_bias=self.folded,
                            dtype=self.dtype, name="conv1")(x)
            if not self.folded:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=jnp.float32, name="bn1")(x)
            x = nn.relu(x)
            # max-pool below is a spatial max of post-ReLU values, so the
            # stem's max-abs (and hence its scale) survives the pool —
            # one sow covers both the pre- and post-pool tensor.
            if self.folded:
                self.sow("quant_stats", "q_stem", jnp.max(jnp.abs(x)))
        h = None if valid_h is None else conv_out_size(valid_h, 7, 2, 3)
        # max_pool mixes rows; masked zeros are equivalent to torch's -inf
        # padding here because pre-pool activations are post-ReLU (>= 0).
        x = apply_row_mask(x, h)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)])
        if h is not None:
            h = conv_out_size(h, 3, 2, 1)
        if self.quantized:
            from . import qops
            # int8 entry point: the pool is a spatial max of post-ReLU
            # (>= 0) values, so quantizing after it equals quantizing
            # before it at the same scale; masked rows stay exactly zero.
            x = qops.quantize_act(
                x, self.param("inv_s_stem", nn.initializers.ones, ()))

        inplanes = 64
        dilation = 1
        for stage, num_blocks in enumerate(self.stage_sizes):
            planes = 64 * (2 ** stage)
            stride = 1 if stage == 0 else 2
            prev_dilation = dilation
            if stage > 0 and self.replace_stride_with_dilation[stage - 1]:
                dilation *= stride
                stride = 1
            for block in range(num_blocks):
                first = block == 0
                x = Bottleneck(
                    planes=planes,
                    stride=stride if first else 1,
                    dilation=prev_dilation if first else dilation,
                    has_downsample=first and (
                        stride != 1 or inplanes != planes * 4),
                    dtype=self.dtype,
                    folded=self.folded,
                    quantized=self.quantized,
                    name=f"layer{stage + 1}_{block}",
                )(x, train=train, valid_h=h)
                inplanes = planes * 4
                if first and h is not None and stride != 1:
                    h = conv_out_size(h, 3, stride, 1)
        return x

    def valid_feature_height(self, valid_h):
        """Valid rows of the returned feature map for input valid_h (the
        same conv arithmetic the masked forward uses)."""
        h = conv_out_size(valid_h, 7, 2, 3)   # stem conv
        h = conv_out_size(h, 3, 2, 1)         # max pool
        for stage in range(1, len(self.stage_sizes)):
            if not self.replace_stride_with_dilation[stage - 1]:
                h = conv_out_size(h, 3, 2, 1)  # stage's strided conv2
        return h


def resnet50_dilated(dtype: Dtype = jnp.float32) -> DilatedResNet:
    """Backbone of reference fcn_resnet50/deeplabv3_resnet50
    (models.py:127-134)."""
    return DilatedResNet(stage_sizes=(3, 4, 6, 3), dtype=dtype)


def resnet101_dilated(dtype: Dtype = jnp.float32) -> DilatedResNet:
    """Backbone of reference fcn_resnet101/deeplabv3_resnet101
    (models.py:142-149)."""
    return DilatedResNet(stage_sizes=(3, 4, 23, 3), dtype=dtype)
