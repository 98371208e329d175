"""Connected-component labeling and small-zone removal, TPU-native.

Replaces the reference's skimage morphology calls (utils.py:135-148):

    np_image = (img == 0)
    remove_small_holes(np_image, area_threshold=150, connectivity=2)
    remove_small_objects(np_image, min_size=150, connectivity=2)
    img[(np_image == 0) & (img == 0)] = 1   # dropped class-0 islands -> bark
    img[(np_image != 0) & (img != 0)] = 0   # filled holes -> class 0

skimage's union-find is inherently sequential; here labeling runs as
iterative *segmented min-scans*: per sweep, each row run and column run of
foreground pixels is reduced to its minimum label with
``lax.associative_scan`` (log2(N) shifted selects, pure VPU — no gathers,
which are the slow path on TPU), plus one 8-neighbor min to hop across
diagonals. Convergence needs one sweep per "turn" of the most serpentine
component (blobby segmentation masks converge in a handful); a while_loop
checks convergence each sweep. Everything is jit-compatible with static
shapes and vmaps over the batch. (An earlier pointer-jumping formulation
converged in fewer sweeps but each sweep needed two full-image gathers —
~100x slower end-to-end on real TPU masks. The sequential-exact
union-find also exists native-side: io/native.remove_small_zones_host,
which the predict pipeline uses host-side after pulling class maps for
artifact rendering.)

Semantics parity notes (all verified against scipy.ndimage golden tests):
- connectivity=2 == 8-connectivity.
- remove_small_objects drops components with area *strictly less* than
  min_size; remove_small_holes fills complement components with area
  strictly less than area_threshold (skimage behavior).
- remove_small_holes has no border exclusion: a small background component
  touching the border is filled too (matches skimage).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import SMALL_ZONE_THRESHOLD

_MAX_SWEEPS = 1024  # safety bound; convergence is checked every sweep


def _min_neighbor_labels(lab: jnp.ndarray, sentinel: int) -> jnp.ndarray:
    """Min label over the 8-neighborhood (edges padded with sentinel)."""
    p = jnp.pad(lab, 1, constant_values=sentinel)
    best = lab
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0:
                continue
            shifted = jax.lax.dynamic_slice(p, (1 + dr, 1 + dc), lab.shape)
            best = jnp.minimum(best, shifted)
    return best


def _seg_min_scan(lab: jnp.ndarray, fg: jnp.ndarray, axis: int,
                  sentinel: int) -> jnp.ndarray:
    """Min label over each contiguous foreground run along ``axis``.

    Two segmented scans (forward + reverse) with the standard associative
    segmented-reduce operator on (value, segment-start-flag) pairs.
    """
    fg_shift = jnp.roll(fg, 1, axis=axis)
    idx0 = [slice(None)] * lab.ndim
    idx0[axis] = slice(0, 1)
    fg_shift = fg_shift.at[tuple(idx0)].set(False)
    start = jnp.logical_or(~fg, ~fg_shift)  # bg cells isolate themselves

    def combine(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, jnp.minimum(va, vb)), jnp.logical_or(fa,
                                                                      fb)

    fwd, _ = jax.lax.associative_scan(combine, (lab, start), axis=axis)

    fg_shift_r = jnp.roll(fg, -1, axis=axis)
    idxl = [slice(None)] * lab.ndim
    idxl[axis] = slice(-1, None)
    fg_shift_r = fg_shift_r.at[tuple(idxl)].set(False)
    start_r = jnp.logical_or(~fg, ~fg_shift_r)
    rev, _ = jax.lax.associative_scan(combine, (lab, start_r), axis=axis,
                                      reverse=True)
    return jnp.where(fg, jnp.minimum(fwd, rev), sentinel)


@jax.jit
def label_components(fg: jnp.ndarray) -> jnp.ndarray:
    """8-connected component labels for a boolean mask [H, W].

    Returns int32 labels where each foreground pixel holds the flat index of
    its component's minimal pixel; background pixels hold H*W (sentinel).
    """
    h, w = fg.shape
    sentinel = h * w
    init = jnp.where(
        fg,
        jnp.arange(sentinel, dtype=jnp.int32).reshape(h, w),
        jnp.int32(sentinel),
    )

    def body(state):
        lab, _, it = state
        new = _seg_min_scan(lab, fg, 1, sentinel)  # row runs
        new = _seg_min_scan(new, fg, 0, sentinel)  # column runs
        new = jnp.where(fg, _min_neighbor_labels(new, sentinel), sentinel)
        changed = jnp.any(new != lab)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < _MAX_SWEEPS)

    lab, _, _ = jax.lax.while_loop(
        cond, body, (init, jnp.bool_(True), jnp.int32(0)))
    return lab


@jax.jit
def component_areas(fg: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel area of the component containing each foreground pixel.

    Background pixels get area 0. [H, W] bool -> [H, W] int32.
    """
    h, w = fg.shape
    lab = label_components(fg)
    counts = jnp.zeros(h * w + 1, jnp.int32).at[lab.reshape(-1)].add(1)
    area = counts[lab]
    return jnp.where(fg, area, 0)


@functools.partial(jax.jit, static_argnums=(1,))
def remove_small_objects(mask: jnp.ndarray,
                         min_size: int = SMALL_ZONE_THRESHOLD) -> jnp.ndarray:
    """Drop 8-connected components with area < min_size (skimage parity)."""
    return jnp.logical_and(mask, component_areas(mask) >= min_size)


@functools.partial(jax.jit, static_argnums=(1,))
def remove_small_holes(mask: jnp.ndarray,
                       area_threshold: int = SMALL_ZONE_THRESHOLD
                       ) -> jnp.ndarray:
    """Fill complement components with area < area_threshold (skimage
    parity: complement, remove_small_objects, complement)."""
    inv = jnp.logical_not(mask)
    keep_inv = jnp.logical_and(inv, component_areas(inv) >= area_threshold)
    return jnp.logical_not(keep_inv)


@jax.jit
def _remove_small_zones_2d(img: jnp.ndarray) -> jnp.ndarray:
    """Exact reference write-back semantics on a [H, W] class-index image
    (utils.py:135-148)."""
    zero_mask = img == 0
    cleaned = remove_small_holes(zero_mask, SMALL_ZONE_THRESHOLD)
    cleaned = remove_small_objects(cleaned, SMALL_ZONE_THRESHOLD)
    out = img
    # class-0 islands that got removed become bark (class 1)
    out = jnp.where(jnp.logical_and(~cleaned, img == 0), 1, out)
    # non-zero pixels inside the cleaned zero-mask (filled holes) become 0
    out = jnp.where(jnp.logical_and(cleaned, img != 0), 0, out)
    return out


@jax.jit
def _remove_small_zones_masked_2d(img: jnp.ndarray,
                                  valid_h: jnp.ndarray) -> jnp.ndarray:
    """Reference semantics restricted to rows < valid_h of a padded [H, W]
    class map: bit-equivalent to slicing to the true height, running
    utils.py:135-148, and zero-padding back. Padded rows come back as 0.

    - holes step: padded rows forced to class 0, so non-zero ('hole')
      components live entirely in the valid region — identical labeling.
    - objects step: the class-0 mask is additionally cut at valid_h so the
      padded rows cannot merge with (and inflate) bottom-touching class-0
      components; the boundary acts as the true image edge.
    """
    h = img.shape[0]
    vm = (jnp.arange(h) < valid_h)[:, None]
    img_v = jnp.where(vm, img, 0)
    zero_mask = img_v == 0
    filled = remove_small_holes(zero_mask, SMALL_ZONE_THRESHOLD)
    cleaned = remove_small_objects(jnp.logical_and(filled, vm),
                                   SMALL_ZONE_THRESHOLD)
    out = img_v
    out = jnp.where(jnp.logical_and(~cleaned,
                                    jnp.logical_and(img_v == 0, vm)),
                    1, out)
    out = jnp.where(jnp.logical_and(cleaned, img_v != 0), 0, out)
    return out


def remove_small_zones_ragged(img: jnp.ndarray,
                              valid_h: jnp.ndarray) -> jnp.ndarray:
    """Masked remove_small_zones on [H, W] + scalar or [B, H, W] + [B]."""
    if img.ndim == 2:
        return _remove_small_zones_masked_2d(img, valid_h)
    if img.ndim == 3:
        return jax.vmap(_remove_small_zones_masked_2d)(img, valid_h)
    raise ValueError(f"expected [H,W] or [B,H,W] class map, got {img.shape}")


def remove_small_zones(img: jnp.ndarray) -> jnp.ndarray:
    """Reference utils.py:135-148 on [H, W] or batched [B, H, W] class maps.

    NB: the reference calls skimage on the full batched array, so with B > 1
    components could merge across batch entries through the 3-D connectivity;
    in practice the reference always runs batch_size=1 (models.py:249-250),
    where per-slice labeling is equivalent. We always label per image, which
    is the meaningful semantics and vmaps cleanly.
    """
    if img.ndim == 2:
        return _remove_small_zones_2d(img)
    if img.ndim == 3:
        return jax.vmap(_remove_small_zones_2d)(img)
    raise ValueError(f"expected [H,W] or [B,H,W] class map, got {img.shape}")
