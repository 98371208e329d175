"""Pallas TPU kernels for the inference hot path.

``upsample_argmax``: fused (per-image bicubic row operator) x (head
logits) x (static bicubic column operator) -> argmax class map.

The unfused path (ops/resize.py bicubic_upsample_ragged + jnp.argmax)
materializes the upsampled [B, 1024, 1024, 3] float32 logits in HBM
(12 MB/image written + read back) only to reduce them to a 1 MB uint8
map. This kernel keeps everything in VMEM per output tile: the whole
stride-8 feature map (128x128x3 f32 = 192 KB) and both 1-D operators fit
on-chip, so each grid step does three [TILE, F] @ [F, Wf] @ [Wf, OW]
matmul chains on the MXU and writes only the uint8 argmax.

Grid: (B, OH // TILE_H). Per step:
  rows[TILE_H, F] @ feat_c[F, Wf] -> [TILE_H, Wf]   (MXU)
  ... @ colT[Wf, OW]              -> [TILE_H, OW]   (MXU)
  argmax over the 3 class planes   -> uint8          (VPU)

Padded output rows (beyond an image's true height) come out 0 because the
embedded row operators (ops/resize.py:embedded_bicubic_rows) have zero
rows there: all three class scores tie at 0 and argmax's first-index rule
returns class 0 — matching the unfused path exactly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 128


def _kernel(rows_ref, feat_ref, colt_ref, out_ref):
    """rows [1, TILE_H, F]; feat [1, F, Wf, C]; colT [Wf, OW] ->
    out [1, TILE_H, OW] uint8."""
    rows = rows_ref[0]
    colt = colt_ref[:]
    # HIGHEST: parity with the unfused path (ops/resize.py), which matches
    # torch bicubic within f32 rounding — keeps argmax flips impossible
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.HIGHEST)

    def plane(c):
        tmp = jnp.dot(rows, feat_ref[0, :, :, c], **kw)
        return jnp.dot(tmp, colt, **kw)

    c0 = plane(0)
    c1 = plane(1)
    c2 = plane(2)
    # argmax with first-index tie-breaking (jnp.argmax semantics).
    # Select in 32-bit lanes: Mosaic can't relayout an i1 mask from
    # (8,128) sublane tiling onto 8-bit (32,128) vectors; the final
    # int32 -> uint8 cast is a supported truncation.
    idx = jnp.where(c1 > c0, jnp.int32(1), jnp.int32(0))
    best = jnp.maximum(c0, c1)
    idx = jnp.where(c2 > best, jnp.int32(2), idx)
    out_ref[0] = idx.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("out_w", "interpret"))
def upsample_argmax(feat_logits: jnp.ndarray, row_ops: jnp.ndarray,
                    colt: jnp.ndarray, out_w: int = 1024,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused bicubic upsample + channel argmax.

    feat_logits: [B, F, Wf, 3] float32 head logits (stride-8 grid)
    row_ops:     [B, OH, F] per-image embedded row operators
    colt:        [Wf, OW] transposed static column operator
                 (bicubic_resize_matrix(Wf, OW).T)
    Returns [B, OH, OW] uint8 class maps.
    """
    import math

    b, f, wf, c = feat_logits.shape
    oh = row_ops.shape[1]
    assert c == 3 and colt.shape == (wf, out_w)
    # production buckets are multiples of 128 -> full TILE_H; small test
    # shapes (height_bucket 32) fall back to the largest dividing tile
    # (still a sublane multiple of 8 for any bucket that is one)
    tile_h = math.gcd(oh, TILE_H)

    grid = (b, oh // tile_h)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_h, f), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, wf, c), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wf, out_w), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, out_w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, oh, out_w), jnp.uint8),
        interpret=interpret,
    )(row_ops, feat_logits, colt)


# --------------------------------------------------------------------------
# Fused dropout + 1x1-conv head (training hot path)
#
# Measured (docs/SCALING.md "Train-step roofline"): interposing ANY
# elementwise producer — a dropout mask, a fixed multiply, even a plain
# reshape+dot — between the FCN head's conv->bn->relu chain and its final
# 1x1 conv breaks XLA:TPU's layout propagation for the backward pass and
# costs +47 ms/step in re-layout copies (the mask's own arithmetic is
# ~4 ms). This kernel gives XLA a single opaque boundary instead: dropout
# mask generation (on-core PRNG), the masked scale, and the 1x1-conv
# matmul all live inside one Pallas call, with a custom VJP whose
# backward regenerates the identical mask from the same per-block seeds
# (no mask residual in HBM at all; only the pre-mask activations, which
# autodiff saves anyway).
#
#   fwd:  y[n, k]  = sum_c h[n, c] * m[n, c] * w[c, k] + b[k]
#   bwd:  dh = (g @ w^T) * m;  dw = (h * m)^T @ g  (per-block partials,
#         summed in XLA);  db = sum_n g
#
# m in {0, 1/keep}, keep = 1 - rate, from uint32 bits < keep * 2^32.

_FDM_BLOCK_ROWS = 16  # feature rows per grid step


def _fdm_mask(seed_ref, shape, thresh: int, inv_keep: float):
    """Regenerate the block's dropout mask (identical in fwd and bwd)."""
    # Mosaic caps prng_seed at 2 values: fold the 2-D grid id into one
    block_id = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    pltpu.prng_seed(seed_ref[0], block_id)
    bits = pltpu.prng_random_bits(shape)
    bits = jax.lax.bitcast_convert_type(bits, jnp.uint32)
    return jnp.where(bits < jnp.uint32(thresh), jnp.float32(inv_keep),
                     jnp.float32(0.0))


def _fdm_fwd_kernel(seed_ref, h_ref, w_ref, b_ref, y_ref, *, thresh,
                    inv_keep):
    bh, wf, c = h_ref.shape[1:]
    h = h_ref[0].reshape(bh * wf, c)
    m = _fdm_mask(seed_ref, (bh * wf, c), thresh, inv_keep)
    y = jnp.dot(h * m, w_ref[:], preferred_element_type=jnp.float32)
    y_ref[0] = (y + b_ref[:][None, :]).reshape(bh, wf, -1)


def _fdm_bwd_kernel(seed_ref, h_ref, w_ref, g_ref, dh_ref, dw_ref, *,
                    thresh, inv_keep):
    bh, wf, c = h_ref.shape[1:]
    k = g_ref.shape[-1]
    h = h_ref[0].reshape(bh * wf, c)
    g = g_ref[0].reshape(bh * wf, k)
    m = _fdm_mask(seed_ref, (bh * wf, c), thresh, inv_keep)
    dh = jnp.dot(g, w_ref[:].T, preferred_element_type=jnp.float32) * m
    dh_ref[0] = dh.reshape(bh, wf, c)
    dw_ref[0, 0] = jax.lax.dot_general(
        h * m, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _fdm_grid(h):
    b, hf = h.shape[0], h.shape[1]
    bh = hf if hf <= _FDM_BLOCK_ROWS else _FDM_BLOCK_ROWS
    if hf % bh:
        raise ValueError(f"feature height {hf} not divisible into "
                         f"{bh}-row blocks")
    return (b, hf // bh), bh


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_dropout_matmul(h, w, b, seed, rate: float):
    """y = dropout(h, rate) @ w + b as one Pallas program.

    h: [B, Hf, Wf, C] f32 (the head's post-ReLU activations);
    w: [C, K]; b: [K]; seed: [1] int32 (fold the step's dropout key);
    rate: python float (static). Gradients flow to h, w, b.
    """
    y, _ = _fdm_fwd(h, w, b, seed, rate)
    return y


def _fdm_call(kernel, h, w, b_or_g, seed, rate, out_shapes, extra_out):
    (grid, bh) = _fdm_grid(h)
    thresh = min(int((1.0 - rate) * 2 ** 32), 2 ** 32 - 1)
    inv_keep = 1.0 / (1.0 - rate)
    wf, c = h.shape[2], h.shape[3]
    k = b_or_g.shape[-1]
    in_specs = [
        pl.BlockSpec((1,), lambda i, j: (0,), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, bh, wf, c), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, k), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(b_or_g.shape if b_or_g.ndim == 1 else (1, bh, wf, k),
                     (lambda i, j: (0,)) if b_or_g.ndim == 1
                     else (lambda i, j: (i, j, 0, 0)),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        functools.partial(kernel, thresh=thresh, inv_keep=inv_keep),
        grid=grid, in_specs=in_specs, out_specs=extra_out,
        out_shape=out_shapes,
    )(seed, h, w, b_or_g)


def _fdm_fwd(h, w, b, seed, rate):
    (_, bh) = _fdm_grid(h)
    bsz, hf, wf = h.shape[:3]
    k = w.shape[-1]
    y = _fdm_call(
        _fdm_fwd_kernel, h, w, b, seed, rate,
        jax.ShapeDtypeStruct((bsz, hf, wf, k), jnp.float32),
        pl.BlockSpec((1, bh, wf, k), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM))
    return y, (h, w, seed)


def _fdm_bwd(rate, res, g):
    h, w, seed = res
    (_, bh) = _fdm_grid(h)
    bsz, hf, wf, c = h.shape
    k = w.shape[-1]
    dh, dw_parts = _fdm_call(
        _fdm_bwd_kernel, h, w, g.astype(jnp.float32), seed, rate,
        (jax.ShapeDtypeStruct((bsz, hf, wf, c), jnp.float32),
         jax.ShapeDtypeStruct((bsz, hf // bh, c, k), jnp.float32)),
        (pl.BlockSpec((1, bh, wf, c), lambda i, j: (i, j, 0, 0),
                      memory_space=pltpu.VMEM),
         pl.BlockSpec((1, 1, c, k), lambda i, j: (i, j, 0, 0),
                      memory_space=pltpu.VMEM)))
    dw = jnp.sum(dw_parts, axis=(0, 1))
    db = jnp.sum(g, axis=tuple(range(g.ndim - 1))).astype(jnp.float32)
    return dh, dw, db, None


fused_dropout_matmul.defvjp(_fdm_fwd, _fdm_bwd)
