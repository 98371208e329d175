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
    b, f, wf, c = feat_logits.shape
    oh = row_ops.shape[1]
    assert c == 3 and oh % TILE_H == 0 and colt.shape == (wf, out_w)

    grid = (b, oh // TILE_H)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_H, f), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, wf, c), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wf, out_w), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_H, out_w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, oh, out_w), jnp.uint8),
        interpret=interpret,
    )(row_ops, feat_logits, colt)
