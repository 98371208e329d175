"""Dark-band trimming (reference models.py:157-166).

The reference keeps rows from the first to the last row whose fraction of
"non-black" pixels (channel-sum > 1e-3) exceeds 0.85. Everything here is a
pair of row reductions — pure VPU work — so we compute the (start, stop)
bounds on device and let the host do the ragged slice (output height varies
per image, which XLA cannot represent as a static shape).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import TRIM_PIXEL_THRESHOLD, TRIM_ROW_FRACTION


@jax.jit
def trim_bounds(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return (first, last) row bounds, matching reference models.py:157-166.

    img: [H, W, C] float. Reference semantics:
        summed = (img.sum(-1) > 1e-3)
        keep_row = summed.mean(-1) > 0.85
        first = argmax(keep_row); last = H - argmax(keep_row[::-1])
    If no row qualifies, argmax of all-False is 0 -> (0, H): no trim.
    """
    h = img.shape[0]
    nonblack = jnp.sum(img, axis=-1) > TRIM_PIXEL_THRESHOLD
    keep = jnp.mean(nonblack.astype(jnp.float32), axis=-1) > TRIM_ROW_FRACTION
    first = jnp.argmax(keep)
    last = h - jnp.argmax(keep[::-1])
    return first, last


@jax.jit
def trim_bounds_batch(imgs: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized trim bounds for a batch [N, H, W, C]."""
    return jax.vmap(trim_bounds)(imgs)
