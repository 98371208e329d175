"""Golden tests for dark-band trimming (reference models.py:157-166)."""
import numpy as np

from neuralbarkcalculator_tpu.ops.trim import trim_bounds, trim_bounds_batch


def _reference_bounds(image: np.ndarray) -> tuple[int, int]:
    summed = np.sum(image, axis=-1) > 1e-3
    keep = np.mean(summed, axis=-1) > 0.85
    first = int(np.argmax(keep))
    last = image.shape[0] - int(np.argmax(keep[::-1]))
    return first, last


def test_trim_dark_bands(rng):
    img = rng.random((64, 32, 3)).astype(np.float32) * 0.5 + 0.4
    img[:7] = 0.0
    img[-12:] = 0.0
    first, last = (int(v) for v in trim_bounds(img))
    assert (first, last) == _reference_bounds(img) == (7, 52)


def test_trim_partial_rows(rng):
    # A row with exactly 85% bright pixels must NOT be kept (strict >).
    img = np.zeros((10, 100, 3), np.float32)
    img[3:8] = 1.0
    img[2, :85] = 1.0  # 85% exactly -> excluded
    img[8, :86] = 1.0  # 86% -> included
    first, last = (int(v) for v in trim_bounds(img))
    assert (first, last) == _reference_bounds(img) == (3, 9)


def test_trim_all_dark_is_noop():
    img = np.zeros((16, 16, 3), np.float32)
    first, last = (int(v) for v in trim_bounds(img))
    assert (first, last) == _reference_bounds(img) == (0, 16)


def test_trim_batch(rng):
    imgs = rng.random((4, 32, 16, 3)).astype(np.float32) * 0.5 + 0.4
    imgs[0, :5] = 0
    imgs[1, -3:] = 0
    firsts, lasts = trim_bounds_batch(imgs)
    for i in range(4):
        assert (int(firsts[i]), int(lasts[i])) == _reference_bounds(imgs[i])
