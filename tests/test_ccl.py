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


def test_label_components_spiral_worst_case():
    """A spiral is the adversarial case for sweep-propagation labeling
    (every arm 'turn' needs a sweep): the while_loop must still converge
    to one component within its bound."""
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.ops.ccl import label_components

    n = 64
    grid = np.zeros((n, n), bool)
    top, bottom, left, right = 0, n - 1, 0, n - 1
    while left <= right and top <= bottom:  # draw a connected spiral
        grid[top, left:right + 1] = True
        grid[top:bottom + 1, right] = True
        grid[bottom, left:right + 1] = True
        if left + 2 <= right:
            grid[top:bottom + 1, left] = False
            grid[top + 2:bottom + 1, left + 2] = True
        top += 2
        bottom -= 2
        left += 2
        right -= 2
    from scipy import ndimage
    want, n_comp = ndimage.label(grid, structure=np.ones((3, 3), bool))
    lab = np.asarray(label_components(jnp.asarray(grid)))
    got_ids = np.unique(lab[grid])
    assert len(got_ids) == n_comp  # same number of components
    # identical partition: each scipy component maps to exactly one label
    for comp in range(1, n_comp + 1):
        assert len(np.unique(lab[want == comp])) == 1


def test_remove_small_zones_random_grids_vs_native():
    """Property test: the device scan-CCL and the native C++ union-find
    must agree on random class maps across densities and seeds."""
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.ops.ccl import remove_small_zones

    native = pytest.importorskip("neuralbarkcalculator_tpu.io.native")
    if native.get_lib() is None:  # pragma: no cover
        pytest.skip("native lib unavailable")

    for seed in range(6):
        r = np.random.default_rng(seed)
        p0 = 0.3 + 0.5 * r.random()
        img = r.choice([0, 1, 2], size=(80, 96),
                       p=[p0, (1 - p0) * 0.8, (1 - p0) * 0.2]).astype(
            np.int32)
        want = np.asarray(remove_small_zones(jnp.asarray(img)))
        got = native.remove_small_zones_host(img.astype(np.uint8))
        np.testing.assert_array_equal(got, want.astype(np.uint8),
                                      err_msg=f"seed {seed}")
