"""int8 inference primitives (post-training quantization).

The v5e MXU runs int8 x int8 -> int32 convolutions at ~2x bf16 peak
(394 vs 197 TOPs; measured 1.6-2.05x at this model's hot conv shapes,
benchmarks/int8_probe.json), and int8 activations halve the HBM traffic
of every bandwidth-bound stage. These helpers implement the symmetric
per-channel-weight / per-tensor-activation scheme used by the
``quantized=True`` module mode (models/resnet.py, models/heads.py):

- weights:      W_q[..., c] = round(W[..., c] / s_w[c]),  s_w per OUTPUT
  channel (the trailing HWIO dim), so each MXU column carries its own
  scale — recovered for free in the epilogue multiply.
- activations:  x_q = round(x / s_x) clipped to [-127, 127], one static
  scale per tensor, calibrated offline (models/quantize.py) as
  max|x|/127 over calibration batches.
- conv:         acc_i32 = conv(x_q, W_q)  (exact integer arithmetic)
- epilogue:     y = acc * m + b  with  m[c] = s_x * s_w[c] / s_y  and
  b[c] = bias[c] / s_y  precomputed offline — one fused multiply-add,
  then round+clip+cast back to int8. ReLU costs nothing: it is the
  clip's lower bound of 0.

Everything here is shape- and control-flow-static, so XLA fuses each
epilogue into its conv and the int8 tensors are what travels through
HBM. No reference equivalent (the reference runs f32 CPU inference);
this mode is opt-in and approximate by construction — the exact-parity
paths (f32/bf16, folded or not) are untouched.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def qconv(x_q: jax.Array, kernel_q: jax.Array, stride: int = 1,
          dilation: int = 1) -> jax.Array:
    """int8 NHWC conv -> int32 accumulator (SAME-style explicit padding,
    matching the model's symmetric ``d * (k // 2)`` convention)."""
    k = kernel_q.shape[0]
    pad = dilation * (k // 2)
    return jax.lax.conv_general_dilated(
        x_q, kernel_q, (stride, stride), [(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def requant_relu(acc_i32: jax.Array, m: jax.Array,
                 b: jax.Array) -> jax.Array:
    """Fused epilogue: dequant + bias + ReLU + quantize to the next
    tensor's scale. m/b already carry s_in*s_w/s_next and bias/s_next."""
    y = acc_i32.astype(jnp.float32) * m + b
    return jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)


def requant_signed(acc_i32: jax.Array, m: jax.Array,
                   b: jax.Array) -> jax.Array:
    """Fused epilogue without ReLU: requantize a residual-branch
    accumulator to int8 in the consumer's scale units (values may be
    negative, so the clip is symmetric). Exists so the downsample branch
    of a bottleneck block spills int8 to HBM: the residual add has TWO
    conv producers and XLA fuses the add epilogue into only one of them
    — whatever the other one writes is materialized, and a raw s32
    accumulator is 4x the bytes (measured: 9.2 GB/step of s32 spills at
    batch 32, benchmarks/int8_hlo_diag.json)."""
    y = acc_i32.astype(jnp.float32) * m + b
    return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def dequant(acc_i32: jax.Array, m: jax.Array, b: jax.Array) -> jax.Array:
    """Affine epilogue to f32: acc * m + b. With m = s_in*s_w this is a
    dequant to real units (final logits); the bottleneck blocks pass
    m/b pre-divided by s_out so the result lands directly in the block's
    output-scale units (see resnet.py::_quantized_forward)."""
    return acc_i32.astype(jnp.float32) * m + b


def quantize_act(x: jax.Array, inv_scale: jax.Array) -> jax.Array:
    """f32 tensor -> int8 at a static scale (inv_scale = 1/s). Exactly
    preserves zeros, so zero-padded ragged rows stay zero."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) * inv_scale),
                    -127, 127).astype(jnp.int8)
