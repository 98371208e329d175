"""Separable resize operators, designed for the TPU MXU.

Both resizes the reference performs are *linear* maps of the input image, so
for fixed shapes we precompute exact 1-D operator matrices on the host once
and apply them on device as two large matmuls (``R_rows @ img @ R_cols^T``),
which XLA tiles straight onto the MXU. This replaces:

- the preprocessor's ``skimage.transform.resize(..., order=3, mode='reflect',
  anti_aliasing=False)`` (reference models.py:194-198). For multichannel
  images skimage routes through ``scipy.ndimage.map_coordinates`` with a
  prefiltered cubic B-spline and scipy's 'mirror' boundary, sampling output
  pixel *i* at input coordinate ``(i + 0.5) * in/out - 0.5``. We reproduce
  that exactly: an interpolation matrix S (4 cubic B-spline taps per row)
  composed with the inverse of the tridiagonal B-spline prefilter system.
- the model head's ``F.interpolate(mode='bicubic', align_corners=False)``
  (reference models.py:38-41): Keys cubic convolution with a = -0.75,
  half-pixel sampling, edge-clamped taps, no prefilter.

The matrices are cached per (in_size, out_size) pair; building the 4096->1024
operator takes ~0.1 s on host (banded solve), after which resizing is pure
MXU work.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy.linalg import solve_banded


def _mirror_index(idx: np.ndarray, n: int) -> np.ndarray:
    """scipy 'mirror' boundary: reflect about edge samples without repeating.

    Sequence for n=4: ... 2 1 | 0 1 2 3 | 2 1 0 1 ...  (period 2n-2).
    """
    if n == 1:
        return np.zeros_like(idx)
    period = 2 * n - 2
    idx = np.abs(idx) % period
    return np.where(idx >= n, period - idx, idx)


def _bspline3(u: np.ndarray) -> np.ndarray:
    """Cubic B-spline basis function beta^3(u)."""
    u = np.abs(u)
    out = np.zeros_like(u)
    m1 = u < 1
    out[m1] = (4.0 - 6.0 * u[m1] ** 2 + 3.0 * u[m1] ** 3) / 6.0
    m2 = (u >= 1) & (u < 2)
    out[m2] = (2.0 - u[m2]) ** 3 / 6.0
    return out


@functools.lru_cache(maxsize=32)
def bspline_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """1-D operator R (out_size x in_size): prefiltered cubic-B-spline resize.

    Matches scipy.ndimage.map_coordinates(order=3, mode='mirror',
    prefilter=True) at coords ``(i + 0.5) * in/out - 0.5`` — i.e. exactly what
    skimage 0.15 resize does for multichannel input (reference
    models.py:194-198 with mode='reflect', which skimage maps to scipy
    'mirror').
    """
    n = in_size
    scale = in_size / out_size
    x = (np.arange(out_size) + 0.5) * scale - 0.5

    # Interpolation matrix S: 4 B-spline taps around floor(x).
    base = np.floor(x).astype(np.int64)
    S = np.zeros((out_size, n), dtype=np.float64)
    for k in range(-1, 3):
        idx = _mirror_index(base + k, n)
        w = _bspline3(x - (base + k))
        np.add.at(S, (np.arange(out_size), idx), w)

    if n == 1:
        return S  # single sample: coefficients equal samples

    # Prefilter system B c = f with mirror BC: f[j] = (c[j-1]+4c[j]+c[j+1])/6,
    # c[-1] -> c[1], c[n] -> c[n-2]. Tridiagonal; solve R = S @ B^{-1} via
    # B^T R^T = S^T using a banded solver.
    lower = np.full(n - 1, 1.0 / 6.0)
    upper = np.full(n - 1, 1.0 / 6.0)
    diag = np.full(n, 4.0 / 6.0)
    upper[0] = 2.0 / 6.0  # row 0: c[-1]=c[1] folds into the (0,1) entry
    lower[-1] = 2.0 / 6.0  # row n-1: c[n]=c[n-2] folds into (n-1,n-2)
    # Banded form of B^T: (1 sub, 1 super).
    ab = np.zeros((3, n), dtype=np.float64)
    ab[0, 1:] = lower  # superdiag of B^T = subdiag of B
    ab[1, :] = diag
    ab[2, :-1] = upper  # subdiag of B^T = superdiag of B
    Rt = solve_banded((1, 1), ab, S.T)
    return np.ascontiguousarray(Rt.T)


def _bspline_taps(in_size: int,
                  out_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Evaluation taps of the cubic B-spline resize: ([4, out] mirror
    indices, [4, out] weights). Summing ``w_k * coef[idx_k]`` over k is
    exactly ``S @ coef`` (the interpolation half of
    bspline_resize_matrix)."""
    scale = in_size / out_size
    x = (np.arange(out_size) + 0.5) * scale - 0.5
    base = np.floor(x).astype(np.int64)
    idxs, ws = [], []
    for k in range(-1, 3):
        idxs.append(_mirror_index(base + k, in_size))
        ws.append(_bspline3(x - (base + k)).astype(np.float32))
    return np.stack(idxs), np.stack(ws)


def spline_resize_host(img: np.ndarray, out_h: int,
                       out_w: int) -> np.ndarray:
    """skimage-parity cubic resize on the *host*: scipy's O(n) IIR spline
    prefilter + 4-tap B-spline evaluation — the tunnel-avoiding twin of
    ``spline_resize`` for environments where host<->device bandwidth, not
    compute, bounds preprocessing (pipeline/preprocess.py picks the
    backend). Same math as the device operator (S @ B^{-1}), evaluated in
    float32 like the reference's own path (models.py:192-198 resizes the
    float32 tensor->numpy image).

    img: [H, W, C] or [H, W] float; returns float32 clipped to the input
    range (skimage clip=True default). Clip-semantics caveat: the device
    path (_preprocess_batch) clips only to [0, 1] at uint8 quantization,
    so at spline-overshoot pixels whose input range is narrower than
    [0, 1] the two backends can differ by 1 LSB after quantization.
    """
    from scipy.ndimage import spline_filter1d

    img = np.ascontiguousarray(img, dtype=np.float32)
    lo, hi = float(img.min()), float(img.max())
    coef = spline_filter1d(img, order=3, axis=0, mode="mirror",
                           output=np.float32)
    coef = spline_filter1d(coef, order=3, axis=1, mode="mirror",
                           output=np.float32)
    trail = (1,) * (img.ndim - 1)
    ridx, rw = _bspline_taps(img.shape[0], out_h)
    out = rw[0].reshape(-1, *trail) * coef[ridx[0]]
    for k in range(1, 4):
        out += rw[k].reshape(-1, *trail) * coef[ridx[k]]
    cidx, cw = _bspline_taps(img.shape[1], out_w)
    trail = (1,) * (img.ndim - 2)
    out2 = cw[0].reshape(1, -1, *trail) * out[:, cidx[0]]
    for k in range(1, 4):
        out2 += cw[k].reshape(1, -1, *trail) * out[:, cidx[k]]
    return np.clip(out2, lo, hi)


def _keys_cubic(s: np.ndarray, a: float) -> np.ndarray:
    """Keys cubic convolution kernel W(s) with parameter a."""
    s = np.abs(s)
    out = np.zeros_like(s)
    m1 = s <= 1
    out[m1] = (a + 2) * s[m1] ** 3 - (a + 3) * s[m1] ** 2 + 1
    m2 = (s > 1) & (s < 2)
    out[m2] = a * s[m2] ** 3 - 5 * a * s[m2] ** 2 + 8 * a * s[m2] - 4 * a
    return out


@functools.lru_cache(maxsize=32)
def bicubic_resize_matrix(in_size: int, out_size: int,
                          a: float = -0.75) -> np.ndarray:
    """1-D operator for torch ``interpolate(mode='bicubic',
    align_corners=False)`` (reference models.py:38-41): Keys cubic with
    a=-0.75, half-pixel mapping, taps clamped to the edge, no prefilter."""
    n = in_size
    scale = in_size / out_size
    x = (np.arange(out_size) + 0.5) * scale - 0.5
    base = np.floor(x).astype(np.int64)
    R = np.zeros((out_size, n), dtype=np.float64)
    for k in range(-1, 3):
        idx = np.clip(base + k, 0, n - 1)
        w = _keys_cubic(x - (base + k), a)
        np.add.at(R, (np.arange(out_size), idx), w)
    return R


def _apply_separable(img: jnp.ndarray, r_rows: jnp.ndarray,
                     r_cols: jnp.ndarray) -> jnp.ndarray:
    """Apply 1-D operators along H and W of ``img``.

    img: [..., H, W, C] (channels last) or [..., H, W].
    Two matmuls -> MXU. These are parity-critical (they must match scipy /
    torch within float32 rounding), so they run at Precision.HIGHEST; on TPU
    that is multi-pass bf16, still negligible next to the model convs.
    """
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.HIGHEST)
    if img.ndim == 2:
        out = jnp.einsum("oh,hw->ow", r_rows, img, **kw)
        return jnp.einsum("ow,pw->op", out, r_cols, **kw)
    # channels-last: contract H then W.
    out = jnp.einsum("oh,...hwc->...owc", r_rows, img, **kw)
    return jnp.einsum("pw,...owc->...opc", r_cols, out, **kw)


@functools.partial(jax.jit, static_argnums=(1, 2))
def spline_resize(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """skimage-parity cubic resize with output clipped to the input range
    (skimage resize clip=True default; reference models.py:194-198).

    img: [H, W, C] or [H, W] float.
    """
    h, w = img.shape[-3], img.shape[-2]
    if img.ndim == 2:
        h, w = img.shape
    r_rows = jnp.asarray(bspline_resize_matrix(h, out_h), dtype=jnp.float32)
    r_cols = jnp.asarray(bspline_resize_matrix(w, out_w), dtype=jnp.float32)
    out = _apply_separable(img.astype(jnp.float32), r_rows, r_cols)
    return jnp.clip(out, jnp.min(img), jnp.max(img))


def embedded_bicubic_rows(feat_h: int, out_h: int, pad_feat: int,
                          pad_out: int) -> np.ndarray:
    """The (feat_h -> out_h) bicubic row operator embedded top-left in a
    zero [pad_out, pad_feat] matrix.

    Used for exact ragged-height batched inference: each image's true
    ``feat_h -> trimmed_h`` torch-bicubic mapping (which depends on both
    sizes; reference models.py:38-41) is carried as a per-image operator so
    one static-shape batched einsum serves mixed heights. Zero rows/columns
    make padded feature rows inert and padded output rows zero.
    """
    if feat_h > pad_feat or out_h > pad_out:
        raise ValueError("embedded operator larger than its padding")
    base = bicubic_resize_matrix(feat_h, out_h)
    out = np.zeros((pad_out, pad_feat), dtype=np.float32)
    out[:out_h, :feat_h] = base
    return out


@functools.partial(jax.jit, static_argnums=(2,))
def bicubic_upsample_ragged(x: jnp.ndarray, row_ops: jnp.ndarray,
                            out_w: int) -> jnp.ndarray:
    """Per-image-row-operator bicubic upsample of NHWC feature maps.

    x: [N, F, Wf, C]; row_ops: [N, OH, F] (from embedded_bicubic_rows);
    width uses the static (Wf -> out_w) operator (widths never vary: the
    reference trims rows only, models.py:157-166).
    """
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.HIGHEST)
    r_cols = jnp.asarray(bicubic_resize_matrix(x.shape[2], out_w),
                         dtype=jnp.float32)
    out = jnp.einsum("nof,nfwc->nowc", row_ops, x.astype(jnp.float32), **kw)
    return jnp.einsum("pw,nowc->nopc", r_cols, out, **kw)


@functools.partial(jax.jit, static_argnums=(1, 2))
def bicubic_upsample(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """torch-parity bicubic resize of NHWC feature maps (no clipping).

    x: [N, H, W, C] float. Used by the segmentation head to bring stride-8
    logits back to input resolution (reference models.py:38-41).
    """
    n, h, w, c = x.shape
    r_rows = jnp.asarray(bicubic_resize_matrix(h, out_h), dtype=jnp.float32)
    r_cols = jnp.asarray(bicubic_resize_matrix(w, out_w), dtype=jnp.float32)
    return _apply_separable(x.astype(jnp.float32), r_rows, r_cols)
