"""Golden tests for metrics vs sklearn / numpy references."""
import numpy as np
import pytest
from scipy import ndimage as ndi

from neuralbarkcalculator_tpu.ops.metrics import (
    confusion_matrix,
    iou,
    miou,
    pixelwise_f1,
)

C = 3
_S8 = np.ones((3, 3), dtype=int)


def _np_iou(logits, labels):
    """Reference lovasz_losses.py:54-73 semantics."""
    preds = np.argmax(logits, axis=-1)
    ious = []
    for i in range(C):
        inter = ((labels == i) & (preds == i)).sum()
        union = ((labels == i) | (preds == i)).sum()
        ious.append(1.0 if union == 0 else inter / union)
    return 100 * np.array(ious)


def _scipy_remove_small_zones(img, thr=150):
    def areas(mask):
        lab, n = ndi.label(mask, structure=_S8)
        counts = np.bincount(lab.ravel(), minlength=n + 1)
        counts[0] = 0
        return counts[lab]

    zero_mask = img == 0
    inv = ~zero_mask
    cleaned = ~(inv & (areas(inv) >= thr))
    cleaned = cleaned & (areas(cleaned) >= thr)
    out = img.copy()
    out[(~cleaned) & (img == 0)] = 1
    out[cleaned & (img != 0)] = 0
    return out


def test_confusion_matrix(rng):
    preds = rng.integers(0, C, size=(2, 16, 16))
    labels = rng.integers(0, C, size=(2, 16, 16))
    got = np.asarray(confusion_matrix(preds, labels))
    want = np.zeros((C, C), int)
    for t, p in zip(labels.ravel(), preds.ravel()):
        want[t, p] += 1
    np.testing.assert_array_equal(got, want)


def test_iou_miou(rng):
    logits = rng.normal(size=(2, 16, 16, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(2, 16, 16))
    np.testing.assert_allclose(np.asarray(iou(logits, labels)),
                               _np_iou(logits, labels), rtol=1e-5)
    assert float(miou(logits, labels)) == pytest.approx(
        _np_iou(logits, labels).mean(), rel=1e-5)


def test_iou_empty_class(rng):
    # class 2 absent in both -> IoU = 100 (EMPTY=1.)
    logits = rng.normal(size=(1, 8, 8, C)).astype(np.float32)
    logits[..., 2] = -100.0
    labels = rng.integers(0, 2, size=(1, 8, 8))
    got = np.asarray(iou(logits, labels))
    assert got[2] == pytest.approx(100.0)


def test_pixelwise_f1_vs_sklearn(rng):
    sklearn = pytest.importorskip("sklearn")
    from sklearn.metrics import f1_score

    logits = rng.normal(size=(1, 64, 64, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(1, 64, 64))
    got = np.asarray(pixelwise_f1(logits, labels))

    preds = np.argmax(logits, axis=-1)
    preds = np.stack([_scipy_remove_small_zones(p) for p in preds])
    want = f1_score(labels.ravel(), preds.ravel(), labels=[0, 1, 2],
                    average=None, zero_division=0)
    tc = np.bincount(labels.ravel(), minlength=3)
    oc = np.bincount(preds.ravel(), minlength=3)
    for i in range(3):
        if tc[i] == 0 and oc[i] == 0:
            want[i] = np.delete(want, i).mean()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_pixelwise_f1_absent_class_fixup(rng):
    sklearn = pytest.importorskip("sklearn")
    from sklearn.metrics import f1_score

    # craft logits so class 2 never wins, labels without class 2
    logits = rng.normal(size=(1, 64, 64, C)).astype(np.float32)
    logits[..., 2] = -100.0
    labels = rng.integers(0, 2, size=(1, 64, 64))
    got = np.asarray(pixelwise_f1(logits, labels))
    preds = np.argmax(logits, axis=-1)
    preds = np.stack([_scipy_remove_small_zones(p) for p in preds])
    want = f1_score(labels.ravel(), preds.ravel(), labels=[0, 1, 2],
                    average=None, zero_division=0)
    assert got[2] == pytest.approx(want[:2].mean(), abs=1e-6)


def test_pixelwise_f1_no_postprocess(rng):
    sklearn = pytest.importorskip("sklearn")
    from sklearn.metrics import f1_score

    logits = rng.normal(size=(1, 32, 32, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(1, 32, 32))
    got = np.asarray(pixelwise_f1(logits, labels, postprocess=False))
    preds = np.argmax(logits, axis=-1)
    want = f1_score(labels.ravel(), preds.ravel(), labels=[0, 1, 2],
                    average=None, zero_division=0)
    np.testing.assert_allclose(got, want, atol=1e-6)
