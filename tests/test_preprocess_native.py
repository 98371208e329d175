"""Native C++ preprocess (barkio preprocess_image_u8) parity vs the
scipy host path — the two must agree bit for bit (same IIR prefilter
arithmetic, same f32 tap accumulation order, same trim/quantize
semantics; reference models.py:191-203)."""
from __future__ import annotations

import numpy as np
import pytest

from neuralbarkcalculator_tpu.io.native import (get_lib,
                                                preprocess_image_native)
from neuralbarkcalculator_tpu.pipeline.preprocess import Preprocessor

pytestmark = pytest.mark.skipif(
    get_lib() is None or not hasattr(get_lib(), "preprocess_image_u8"),
    reason="native library not built")


def scipy_reference(p: Preprocessor, img: np.ndarray) -> np.ndarray:
    """The scipy twin, with the native fast path disabled."""
    import neuralbarkcalculator_tpu.io.native as N

    orig = N.preprocess_image_native
    N.preprocess_image_native = lambda *a, **k: None
    try:
        return p._preprocess_host_one(img)
    finally:
        N.preprocess_image_native = orig


def structured(rng, h, w, dark_top=0, dark_bottom=0):
    img = (rng.uniform(0, 1, (h, w, 3)) * 255).astype(np.uint8)
    if dark_top:
        img[:dark_top] = 0
    if dark_bottom:
        img[-dark_bottom:] = 0
    return img


@pytest.mark.parametrize("shape,dark", [
    ((2048, 2048), (300, 250)),   # resize + trim (the production case)
    ((1500, 1100), (100, 0)),     # resize, non-square source
    ((512, 512), (60, 40)),       # no resize, square -> trim
    ((700, 512), (0, 0)),         # no resize, non-square -> no trim
    ((1024, 1024), (0, 0)),       # exactly target: no resize, trim
    ((20, 20), (0, 0)),           # shorter than the IIR init horizon
    ((2049, 1023), (0, 0)),       # odd sizes through the resize
])
def test_native_matches_scipy(rng, shape, dark):
    p = Preprocessor(backend="host")
    img = structured(rng, *shape, *dark)
    ref = scipy_reference(p, img)
    nat = p._preprocess_host_one(img, threads=1)
    assert ref.shape == nat.shape
    np.testing.assert_array_equal(ref, nat)


def test_thread_count_invariance(rng):
    p = Preprocessor(backend="host")
    img = structured(rng, 2048, 2048, 300, 250)
    one = p._preprocess_host_one(img, threads=1)
    for threads in (2, 4, 8):
        np.testing.assert_array_equal(
            one, p._preprocess_host_one(img, threads=threads))


def test_all_black_image_no_trim(rng):
    # keep is all-False -> np.argmax semantics: first=0, last=H (no trim)
    p = Preprocessor(backend="host")
    img = np.zeros((512, 512, 3), np.uint8)
    ref = scipy_reference(p, img)
    nat = p._preprocess_host_one(img)
    assert nat.shape == (512, 512, 3)
    np.testing.assert_array_equal(ref, nat)


def test_all_bright_keeps_everything(rng):
    p = Preprocessor(backend="host")
    img = np.full((512, 512, 3), 200, np.uint8)
    nat = p._preprocess_host_one(img)
    assert nat.shape == (512, 512, 3)
    np.testing.assert_array_equal(nat, img)


def test_raw_entry_reports_bounds(rng):
    img = structured(rng, 2048, 2048, 300, 250)
    res = preprocess_image_native(img, 1024, 1e-3, 0.85, threads=2)
    assert res is not None
    out, first, last = res
    assert out.shape == (1024, 1024, 3)
    # 300/2048 of the rows are dark at the top -> first ~ 150 at 1024
    assert 130 <= first <= 170
    assert 880 <= last <= 920


def test_raw_entry_rejects_bad_input():
    assert preprocess_image_native(
        np.zeros((4, 4), np.uint8), 1024, 1e-3, 0.85) is None  # not HWC
    assert preprocess_image_native(
        np.zeros((4, 4, 3), np.float32), 1024, 1e-3, 0.85) is None


def test_noncontiguous_input_handled(rng):
    p = Preprocessor(backend="host")
    big = structured(rng, 600, 600)
    view = big[::2, ::2]  # non-contiguous
    ref = scipy_reference(p, np.ascontiguousarray(view))
    nat = p._preprocess_host_one(view)
    np.testing.assert_array_equal(ref, nat)
