"""Segmentation heads: FCN and DeepLabV3 (ASPP), NHWC Flax.

- FCNHead (reference models.py:113-124): 3x3 conv (in->in/4, no bias) + BN +
  ReLU + Dropout + 1x1 conv (->classes, with bias).
- DeepLabHead (torchvision, used by reference models.py:46-71): ASPP with
  atrous rates (12, 24, 36) + global-pooling branch, projected to 256 then
  3x3 conv + BN + ReLU + 1x1 classifier.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .resnet import apply_row_mask

Dtype = Any


class FCNHead(nn.Module):
    """Reference FCNHead parity (models.py:113-124).

    ``valid_h`` (feature-resolution valid heights, [B]) masks the input of
    the 3x3 conv for exact ragged-height batching (see models/resnet.py).
    """

    channels: int  # number of classes
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    folded: bool = False  # BN folded into conv1 (models/fold.py)
    quantized: bool = False  # int8 inference mode (models/quantize.py)

    supports_quantize = True

    @nn.compact
    def __call__(self, x, train: bool = False, valid_h=None):
        if (self.folded or self.quantized) and train:
            raise ValueError("folded/quantized models are inference-only")
        if self.quantized:
            return self._quantized_forward(x, valid_h)
        inter = x.shape[-1] // 4
        x = apply_row_mask(x, valid_h)
        x = nn.Conv(inter, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=self.folded, dtype=self.dtype,
                    name="conv1")(x)
        if not self.folded:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name="bn1")(x)
        x = nn.relu(x)
        if self.folded:  # calibration point (models/quantize.py)
            self.sow("quant_stats", "q_t1", jnp.max(jnp.abs(x)))
        x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        x = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                    name="conv2")(x)
        return x

    def _quantized_forward(self, x_q, valid_h):
        """int8 backbone features (scale baked into conv1_m) -> f32
        logits. Dropout is an inference no-op (deterministic), so the
        quantized graph simply omits it."""
        from . import qops

        def qp(name, shape, dtype=jnp.float32):
            return self.param(name, nn.initializers.zeros, shape, dtype)

        cin = x_q.shape[-1]
        inter = cin // 4
        x_q = apply_row_mask(x_q, valid_h)
        acc = qops.qconv(x_q, qp("conv1_q", (3, 3, cin, inter), jnp.int8))
        t1 = qops.requant_relu(acc, qp("conv1_m", (inter,)),
                               qp("conv1_b", (inter,)))
        acc = qops.qconv(t1, qp("conv2_q", (1, 1, inter, self.channels),
                                jnp.int8))
        return qops.dequant(acc, qp("conv2_m", (self.channels,)),
                            qp("conv2_b", (self.channels,)))


class ASPPConv(nn.Module):
    rate: int
    dtype: Dtype = jnp.float32
    folded: bool = False
    quantized: bool = False  # int8 inference mode (models/quantize.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.quantized:
            # int8 branch: x at s_in -> int8 at the shared concat scale
            # (requant epilogue carries s_in*s_w/s_cat; models/qops.py)
            from . import qops
            cin = x.shape[-1]
            acc = qops.qconv(x, self.param("conv_q", nn.initializers.zeros,
                                           (3, 3, cin, 256), jnp.int8),
                             dilation=self.rate)
            return qops.requant_relu(
                acc, self.param("conv_m", nn.initializers.zeros, (256,)),
                self.param("conv_b", nn.initializers.zeros, (256,)))
        x = nn.Conv(256, (3, 3), padding=[(self.rate,) * 2] * 2,
                    kernel_dilation=(self.rate, self.rate),
                    use_bias=self.folded, dtype=self.dtype,
                    name="conv")(x)
        if not self.folded:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name="bn")(x)
        return nn.relu(x)


class ASPP(nn.Module):
    """torchvision ASPP: 1x1 + three atrous convs + pooled branch, projected
    back to 256 channels with dropout 0.5."""

    rates: Sequence[int] = (12, 24, 36)
    dtype: Dtype = jnp.float32
    folded: bool = False
    quantized: bool = False  # int8 inference mode (models/quantize.py)

    @nn.compact
    def __call__(self, x, train: bool = False, valid_h=None):
        if (self.folded or self.quantized) and train:
            raise ValueError("folded/quantized models are inference-only")
        if self.quantized:
            return self._quantized_forward(x, train, valid_h)
        norm = lambda name: (  # noqa: E731
            (lambda z: z) if self.folded else nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name=name))
        x = apply_row_mask(x, valid_h)  # atrous 3x3 branches mix rows
        branches = []
        b = nn.Conv(256, (1, 1), use_bias=self.folded, dtype=self.dtype,
                    name="b0_conv")(x)
        branches.append(nn.relu(norm("b0_bn")(b)))
        for i, rate in enumerate(self.rates):
            branches.append(
                ASPPConv(rate, dtype=self.dtype, folded=self.folded,
                         name=f"b{i + 1}")(x, train=train))
        # global-pooling branch: mean -> 1x1 conv -> BN -> ReLU -> broadcast
        if valid_h is None:
            pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        else:
            # masked mean: padded rows are zero, divide by the true count
            denom = (valid_h.astype(x.dtype) * x.shape[2])[:, None, None,
                                                           None]
            pooled = jnp.sum(x, axis=(1, 2), keepdims=True) / denom
        pooled = nn.Conv(256, (1, 1), use_bias=self.folded,
                         dtype=self.dtype, name="pool_conv")(pooled)
        pooled = nn.relu(norm("pool_bn")(pooled))
        branches.append(
            jnp.broadcast_to(pooled,
                             (*x.shape[:-1], pooled.shape[-1])))

        y = jnp.concatenate(branches, axis=-1)
        if self.folded:  # calibration points (models/quantize.py): one
            # shared scale for the concat (all branches requantize to it)
            self.sow("quant_stats", "q_cat", jnp.max(jnp.abs(y)))
        y = nn.Conv(256, (1, 1), use_bias=self.folded, dtype=self.dtype,
                    name="project_conv")(y)
        y = nn.relu(norm("project_bn")(y))
        if self.folded:
            self.sow("quant_stats", "q_proj", jnp.max(jnp.abs(y)))
        y = nn.Dropout(rate=0.5, deterministic=not train)(y)
        return y

    def _quantized_forward(self, x_q, train, valid_h):
        """int8 ASPP: x_q at s_in -> int8 at s_proj. The four conv
        branches run int8 on the MXU and requantize to one shared concat
        scale s_cat; the global-pooling branch (a [B,1,1,C] 1x1 conv —
        negligible FLOPs) stays f32 and quantizes its broadcast output to
        s_cat; dropout is an inference no-op and is omitted."""
        from . import qops

        def qp(name, shape, dtype=jnp.float32):
            return self.param(name, nn.initializers.zeros, shape, dtype)

        cin = x_q.shape[-1]
        x_q = apply_row_mask(x_q, valid_h)  # int8 0/1 mask multiply
        branches = []
        acc = qops.qconv(x_q, qp("b0_conv_q", (1, 1, cin, 256), jnp.int8))
        branches.append(qops.requant_relu(acc, qp("b0_conv_m", (256,)),
                                          qp("b0_conv_b", (256,))))
        for i, rate in enumerate(self.rates):
            branches.append(
                ASPPConv(rate, quantized=True, name=f"b{i + 1}")(
                    x_q, train=train))
        # pooled branch: the spatial sum runs in exact int32 (order-
        # independent, so padded batches match per-image runs bit-for-bit
        # — the f32 masked mean of the unquantized path is only ~1e-4
        # reproducible across batch shapes), then dequantize and divide
        # by the true row count
        sums = jnp.sum(x_q.astype(jnp.int32), axis=(1, 2))
        if valid_h is None:
            denom = jnp.float32(x_q.shape[1] * x_q.shape[2])
        else:
            denom = (valid_h.astype(jnp.float32) * x_q.shape[2])[:, None]
        pooled = sums.astype(jnp.float32) * qp("s_in", ()) / denom
        pooled = pooled @ qp("pool_conv_kernel", (cin, 256)) \
            + qp("pool_conv_bias", (256,))
        pooled_q = qops.quantize_act(nn.relu(pooled),
                                     qp("inv_s_cat", ()))
        branches.append(jnp.broadcast_to(
            pooled_q[:, None, None, :], (*x_q.shape[:-1], 256)))

        y = jnp.concatenate(branches, axis=-1)
        acc = qops.qconv(y, qp("project_conv_q", (1, 1, 5 * 256, 256),
                               jnp.int8))
        return qops.requant_relu(acc, qp("project_conv_m", (256,)),
                                 qp("project_conv_b", (256,)))


class DeepLabHead(nn.Module):
    """torchvision DeepLabHead parity (used at reference models.py:55)."""

    channels: int  # number of classes
    dtype: Dtype = jnp.float32
    folded: bool = False
    quantized: bool = False  # int8 inference mode (models/quantize.py)

    supports_quantize = True

    @nn.compact
    def __call__(self, x, train: bool = False, valid_h=None):
        if (self.folded or self.quantized) and train:
            raise ValueError("folded/quantized models are inference-only")
        if self.quantized:
            return self._quantized_forward(x, train, valid_h)
        x = ASPP(dtype=self.dtype, folded=self.folded, name="aspp")(
            x, train=train, valid_h=valid_h)
        x = apply_row_mask(x, valid_h)
        x = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=self.folded, dtype=self.dtype,
                    name="conv")(x)
        if not self.folded:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name="bn")(x)
        x = nn.relu(x)
        if self.folded:  # calibration point (models/quantize.py)
            self.sow("quant_stats", "q_h", jnp.max(jnp.abs(x)))
        x = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                    name="classifier")(x)
        return x

    def _quantized_forward(self, x_q, train, valid_h):
        """int8 backbone features -> f32 logits (see ASPP)."""
        from . import qops

        def qp(name, shape, dtype=jnp.float32):
            return self.param(name, nn.initializers.zeros, shape, dtype)

        x = ASPP(quantized=True, name="aspp")(x_q, train=train,
                                              valid_h=valid_h)
        x = apply_row_mask(x, valid_h)
        acc = qops.qconv(x, qp("conv_q", (3, 3, 256, 256), jnp.int8))
        t = qops.requant_relu(acc, qp("conv_m", (256,)),
                              qp("conv_b", (256,)))
        acc = qops.qconv(t, qp("classifier_q",
                               (1, 1, 256, self.channels), jnp.int8))
        return qops.dequant(acc, qp("classifier_m", (self.channels,)),
                            qp("classifier_b", (self.channels,)))
