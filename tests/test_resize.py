"""Golden tests: resize operators vs scipy.ndimage / torch.

The preprocessor resize must match skimage 0.15 semantics, which for
multichannel images is scipy.ndimage.map_coordinates(order=3, mode='mirror',
prefilter=True) sampled at half-pixel-center coordinates (see
ops/resize.py docstring). The upsample head must match
torch.nn.functional.interpolate(mode='bicubic', align_corners=False)
(reference models.py:38-41).
"""
import numpy as np
import pytest
from scipy import ndimage as ndi

from neuralbarkcalculator_tpu.ops.resize import (
    bicubic_resize_matrix,
    bicubic_upsample,
    bspline_resize_matrix,
    spline_resize,
)


def _scipy_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """skimage-0.15-equivalent multichannel cubic resize."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    chans = [
        ndi.map_coordinates(img[..., c], [yy, xx], order=3, mode="mirror",
                            prefilter=True)
        for c in range(img.shape[2])
    ]
    out = np.stack(chans, axis=-1)
    return np.clip(out, img.min(), img.max())


@pytest.mark.parametrize("in_hw,out_hw", [
    ((64, 48), (16, 12)),
    ((128, 128), (32, 32)),
    ((40, 40), (40, 40)),   # identity scale
    ((33, 57), (11, 19)),   # odd sizes
])
def test_spline_resize_matches_scipy(rng, in_hw, out_hw):
    img = rng.random((*in_hw, 3)).astype(np.float64)
    got = np.asarray(spline_resize(img.astype(np.float32), *out_hw))
    want = _scipy_resize(img, *out_hw)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_spline_resize_identity(rng):
    img = rng.random((32, 32, 3)).astype(np.float32)
    got = np.asarray(spline_resize(img, 32, 32))
    np.testing.assert_allclose(got, img, atol=1e-5)


def test_spline_matrix_rows_sum_to_one():
    # Interpolating a constant image must reproduce it exactly.
    r = bspline_resize_matrix(4096, 1024)
    np.testing.assert_allclose(r.sum(axis=1), 1.0, atol=1e-9)


def test_bicubic_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.random((2, 16, 24, 5)).astype(np.float32)
    got = np.asarray(bicubic_upsample(x, 128, 192))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = torch.nn.functional.interpolate(
        xt, size=(128, 192), mode="bicubic", align_corners=False)
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_bicubic_matrix_partition_of_unity():
    r = bicubic_resize_matrix(128, 1024)
    np.testing.assert_allclose(r.sum(axis=1), 1.0, atol=1e-9)
