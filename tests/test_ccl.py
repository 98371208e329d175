"""Golden tests: TPU connected-component ops vs scipy.ndimage.

scipy.ndimage.label with structure=ones((3,3)) is 8-connectivity, identical
to skimage connectivity=2 used by the reference (utils.py:139-143).
"""
import numpy as np
import pytest
from scipy import ndimage as ndi

from neuralbarkcalculator_tpu.ops.ccl import (
    component_areas,
    remove_small_holes,
    remove_small_objects,
    remove_small_zones,
)

_S8 = np.ones((3, 3), dtype=int)


def _scipy_areas(mask: np.ndarray) -> np.ndarray:
    lab, n = ndi.label(mask, structure=_S8)
    counts = np.bincount(lab.ravel(), minlength=n + 1)
    counts[0] = 0
    return counts[lab]


def _scipy_remove_small_objects(mask, min_size):
    return mask & (_scipy_areas(mask) >= min_size)


def _scipy_remove_small_holes(mask, thr):
    inv = ~mask
    return ~(inv & (_scipy_areas(inv) >= thr))


def _scipy_remove_small_zones(img, thr=150):
    """Reference utils.py:135-148 semantics via scipy."""
    zero_mask = img == 0
    cleaned = _scipy_remove_small_holes(zero_mask, thr)
    cleaned = _scipy_remove_small_objects(cleaned, thr)
    out = img.copy()
    out[(~cleaned) & (img == 0)] = 1
    out[cleaned & (img != 0)] = 0
    return out


@pytest.mark.parametrize("density", [0.2, 0.5, 0.8])
@pytest.mark.parametrize("shape", [(32, 32), (17, 43)])
def test_component_areas(rng, density, shape):
    mask = rng.random(shape) < density
    got = np.asarray(component_areas(mask))
    np.testing.assert_array_equal(got, _scipy_areas(mask))


def test_snake_component(rng):
    # Long winding path: worst case for naive propagation; pointer jumping
    # must still converge within the sweep budget.
    mask = np.zeros((64, 64), bool)
    for r in range(64):
        mask[r, :] = True
        if r % 2 == 0:
            mask[r, -1] = r == 62
        else:
            mask[r, 0] = r == 63
    # build a boustrophedon snake
    mask = np.zeros((64, 64), bool)
    for r in range(0, 64, 2):
        mask[r, :] = True
    for r in range(1, 64, 2):
        if (r // 2) % 2 == 0:
            mask[r, -1] = True
        else:
            mask[r, 0] = True
    got = np.asarray(component_areas(mask))
    np.testing.assert_array_equal(got, _scipy_areas(mask))


@pytest.mark.parametrize("min_size", [1, 5, 20])
def test_remove_small_objects(rng, min_size):
    mask = rng.random((48, 48)) < 0.35
    got = np.asarray(remove_small_objects(mask, min_size))
    np.testing.assert_array_equal(
        got, _scipy_remove_small_objects(mask, min_size))


@pytest.mark.parametrize("thr", [1, 5, 20])
def test_remove_small_holes(rng, thr):
    mask = rng.random((48, 48)) < 0.65
    got = np.asarray(remove_small_holes(mask, thr))
    np.testing.assert_array_equal(got, _scipy_remove_small_holes(mask, thr))


def test_remove_small_holes_border_no_exclusion():
    # skimage fills small background components even on the border.
    mask = np.ones((20, 20), bool)
    mask[0, 0:2] = False  # 2-px background blob touching the border
    got = np.asarray(remove_small_holes(mask, 5))
    assert got.all()


def test_remove_small_zones_parity(rng):
    img = rng.integers(0, 3, size=(96, 96)).astype(np.int32)
    # carve some structure so there are real zones
    img[10:40, 10:40] = 0
    img[12:14, 12:14] = 2  # small hole inside the zero zone -> filled to 0
    img[60:62, 60:62] = 0  # small zero island -> becomes bark
    got = np.asarray(remove_small_zones(img))
    np.testing.assert_array_equal(got, _scipy_remove_small_zones(img))


def test_remove_small_zones_batched(rng):
    imgs = rng.integers(0, 3, size=(3, 40, 40)).astype(np.int32)
    got = np.asarray(remove_small_zones(imgs))
    for i in range(3):
        np.testing.assert_array_equal(
            got[i], _scipy_remove_small_zones(imgs[i]))
