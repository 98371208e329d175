"""Golden tests for losses vs independent numpy/torch implementations."""
import numpy as np
import pytest

from neuralbarkcalculator_tpu.ops.losses import (
    jaccard_loss,
    lovasz_grad,
    lovasz_hinge_loss,
    lovasz_softmax_loss,
    mixed_loss,
    stable_bce_loss,
    weighted_cross_entropy,
)

C = 3


def _np_softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _np_lovasz_grad(gt_sorted):
    gts = gt_sorted.sum()
    intersection = gts - np.cumsum(gt_sorted)
    union = gts + np.cumsum(1.0 - gt_sorted)
    jac = 1.0 - intersection / union
    out = jac.copy()
    out[1:] = jac[1:] - jac[:-1]
    return out


def _np_lovasz_softmax(logits, labels):
    """Berman Alg.1, per_image=False, classes='present'."""
    probas = _np_softmax(logits, axis=-1).reshape(-1, C)
    labels = labels.reshape(-1)
    losses = []
    for c in range(C):
        fg = (labels == c).astype(np.float64)
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - probas[:, c])
        perm = np.argsort(-errors, kind="stable")
        losses.append(np.dot(errors[perm], _np_lovasz_grad(fg[perm])))
    return np.mean(losses)


def test_lovasz_grad(rng):
    gt = (rng.random(50) > 0.5).astype(np.float32)
    got = np.asarray(lovasz_grad(gt))
    np.testing.assert_allclose(got, _np_lovasz_grad(gt.astype(np.float64)),
                               atol=1e-6)


def test_lovasz_softmax(rng):
    logits = rng.normal(size=(2, 8, 8, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(2, 8, 8))
    got = float(lovasz_softmax_loss(logits, labels))
    want = _np_lovasz_softmax(logits.astype(np.float64), labels)
    assert got == pytest.approx(want, abs=1e-5)


def test_lovasz_softmax_absent_class(rng):
    # only classes 0 and 1 present -> class 2 term excluded from the mean
    logits = rng.normal(size=(1, 8, 8, C)).astype(np.float32)
    labels = rng.integers(0, 2, size=(1, 8, 8))
    got = float(lovasz_softmax_loss(logits, labels))
    want = _np_lovasz_softmax(logits.astype(np.float64), labels)
    assert got == pytest.approx(want, abs=1e-5)


def test_lovasz_softmax_gradient_flows(rng):
    import jax
    logits = rng.normal(size=(1, 4, 4, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(1, 4, 4))
    g = jax.grad(lambda l: lovasz_softmax_loss(l, labels))(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_weighted_cross_entropy_vs_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    logits = rng.normal(size=(2, 6, 6, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(2, 6, 6))
    weights = np.array([0.4004, 2.0334, 93.1921], np.float32)

    got = float(weighted_cross_entropy(logits, labels, weights))

    lt = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    yt = torch.from_numpy(labels)
    ent = F.cross_entropy(lt, yt, reduction="none")
    max_classes = torch.max(torch.argmax(lt, dim=1), yt).flatten()
    w = torch.from_numpy(weights)[max_classes].view(yt.shape)
    want = float((ent * w).mean())
    assert got == pytest.approx(want, rel=1e-5)


def test_jaccard_loss(rng):
    logits = rng.normal(size=(2, 6, 6, C)).astype(np.float64)
    labels = rng.integers(0, C, size=(2, 6, 6))
    probas = _np_softmax(logits, axis=-1)
    one_hot = np.eye(C)[labels]
    inter = (probas * one_hot).sum(axis=(0, 1, 2))
    card = (probas + one_hot).sum(axis=(0, 1, 2))
    want = 1 - (inter / (card - inter + 1e-7)).mean()
    got = float(jaccard_loss(logits.astype(np.float32), labels))
    assert got == pytest.approx(want, abs=1e-5)


def test_mixed_loss_combination(rng):
    logits = rng.normal(size=(1, 6, 6, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(1, 6, 6))
    weights = np.array([0.4, 2.0, 93.0], np.float32)
    got = float(mixed_loss(logits, labels, weights))
    want = (float(weighted_cross_entropy(logits, labels, weights)) / 4
            + float(lovasz_softmax_loss(logits, labels)))
    assert got == pytest.approx(want, rel=1e-6)


def test_lovasz_hinge(rng):
    logits = rng.normal(size=(6, 6)).astype(np.float64)
    labels = (rng.random((6, 6)) > 0.5).astype(np.int32)
    signs = 2.0 * labels.reshape(-1) - 1.0
    errors = 1.0 - logits.reshape(-1) * signs
    perm = np.argsort(-errors, kind="stable")
    want = np.dot(np.maximum(errors[perm], 0),
                  _np_lovasz_grad(labels.reshape(-1)[perm].astype(float)))
    got = float(lovasz_hinge_loss(logits.astype(np.float32), labels))
    assert got == pytest.approx(want, abs=1e-5)


def test_stable_bce_vs_torch(rng):
    torch = pytest.importorskip("torch")
    logits = rng.normal(size=(50,)).astype(np.float32)
    targets = (rng.random(50) > 0.5).astype(np.float32)
    x = torch.from_numpy(logits)
    t = torch.from_numpy(targets)
    want = float((x.clamp(min=0) - x * t + (1 + (-x.abs()).exp()).log()).mean())
    got = float(stable_bce_loss(logits, targets))
    assert got == pytest.approx(want, rel=1e-5)


def test_lovasz_per_image_variant():
    """per_image=True averages the flat loss over batch entries
    (reference lovasz_losses.py:180-184)."""
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.ops.losses import lovasz_softmax_loss

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(3, 8, 8, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, size=(3, 8, 8)))
    want = np.mean([
        float(lovasz_softmax_loss(logits[i:i + 1], labels[i:i + 1]))
        for i in range(3)])
    got = float(lovasz_softmax_loss(logits, labels, per_image=True))
    assert abs(got - want) < 1e-6
    # and differs (in general) from the flattened-batch default
    flat = float(lovasz_softmax_loss(logits, labels))
    assert abs(got - flat) > 1e-8


def test_masked_losses_equal_unpadded(rng):
    """pixel_weights parity: losses over a batch padded with garbage
    samples + a zero validity mask must equal the unpadded computation
    (the exact-padded-evaluation contract, train/step.make_eval_step)."""
    logits = rng.normal(size=(3, 8, 8, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(3, 8, 8))
    pad_logits = np.concatenate(
        [logits, rng.normal(size=(2, 8, 8, C)).astype(np.float32)])
    pad_labels = np.concatenate(
        [labels, rng.integers(0, C, size=(2, 8, 8))])
    pw = np.array([1, 1, 1, 0, 0], np.float32)[:, None, None]
    weights = np.array([0.4, 2.0, 93.0], np.float32)

    for name, fn in [
        ("lovasz", lambda lo, la, w: lovasz_softmax_loss(
            lo, la, pixel_weights=w)),
        ("lovasz_pi", lambda lo, la, w: lovasz_softmax_loss(
            lo, la, per_image=True, pixel_weights=w)),
        ("cwe", lambda lo, la, w: weighted_cross_entropy(
            lo, la, weights, pixel_weights=w)),
        ("jaccard", lambda lo, la, w: jaccard_loss(
            lo, la, pixel_weights=w)),
        ("mixed", lambda lo, la, w: mixed_loss(
            lo, la, weights, pixel_weights=w)),
    ]:
        unpadded = float(fn(logits, labels, None))
        masked = float(fn(pad_logits, pad_labels, pw))
        np.testing.assert_allclose(masked, unpadded, rtol=1e-5, atol=1e-6,
                                   err_msg=name)


def test_lovasz_hist_exact_on_quantized_errors(rng):
    """bins=K histogram Lovász == exact Lovász when every error is a
    distinct multiple of 1/K (quantization is then lossless and every
    tie block is a singleton)."""
    import jax.numpy as jnp
    K = 64
    P, C = 24, 3
    # craft probas whose per-class errors are distinct multiples of 1/K:
    # labels all class 0, probas rows built from distinct error levels
    labels = np.zeros(P, np.int64)
    e0 = (rng.permutation(np.arange(2, 2 + P)) / K)  # distinct, in (0,1)
    probas = np.zeros((P, C), np.float32)
    probas[:, 0] = 1.0 - e0
    probas[:, 1] = e0  # class-1 errors = e0 too (distinct)
    probas[:, 2] = 0.0

    from neuralbarkcalculator_tpu.ops.losses import (
        _lovasz_softmax_flat, _lovasz_softmax_flat_hist)
    exact = float(_lovasz_softmax_flat(jnp.asarray(probas),
                                       jnp.asarray(labels), C))
    hist = float(_lovasz_softmax_flat_hist(jnp.asarray(probas),
                                           jnp.asarray(labels), C, K))
    np.testing.assert_allclose(hist, exact, rtol=1e-5, atol=1e-6)


def test_lovasz_hist_close_and_grad_aligned(rng):
    """Random logits: histogram loss within ~1/bins of exact, gradient
    direction strongly aligned (it is a tie-averaged subgradient)."""
    import jax
    import jax.numpy as jnp

    logits = rng.normal(size=(2, 16, 16, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(2, 16, 16))
    exact = jax.value_and_grad(
        lambda lg: lovasz_softmax_loss(lg, labels))(jnp.asarray(logits))
    hist = jax.value_and_grad(
        lambda lg: lovasz_softmax_loss(lg, labels, bins=1024))(
        jnp.asarray(logits))
    # loss value is essentially exact (measured ~1e-6 even at 256 bins)
    assert abs(float(exact[0]) - float(hist[0])) < 1e-4
    a = np.asarray(exact[1]).ravel()
    b = np.asarray(hist[1]).ravel()
    cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.98, cos  # tie-averaged subgradient; 0.986 measured


def _np_lovasz_hinge_flat(logits, labels):
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    perm = np.argsort(-errors, kind="stable")
    return np.dot(np.maximum(errors[perm], 0),
                  _np_lovasz_grad(labels[perm].astype(np.float64)))


def test_lovasz_hinge_per_image(rng):
    """per_image=True (the reference default, lovasz_losses.py:91-95)
    averages the flat hinge over batch entries."""
    logits = rng.normal(size=(3, 6, 6)).astype(np.float32)
    labels = (rng.random((3, 6, 6)) > 0.5).astype(np.int32)
    want = np.mean([
        _np_lovasz_hinge_flat(logits[i].reshape(-1).astype(np.float64),
                              labels[i].reshape(-1).astype(np.float64))
        for i in range(3)])
    got = float(lovasz_hinge_loss(logits, labels, per_image=True))
    assert got == pytest.approx(want, abs=1e-5)


def test_lovasz_hinge_ignore_mask_matches_filtered(rng):
    """Static-shape pixel_weights == the reference's dynamic ignore
    filtering (lovasz_losses.py:122-134)."""
    logits = rng.normal(size=(2, 6, 6)).astype(np.float64)
    labels = (rng.random((2, 6, 6)) > 0.5).astype(np.int32)
    mask = (rng.random((2, 6, 6)) > 0.3)
    flat_lo = logits.reshape(-1)[mask.reshape(-1)]
    flat_la = labels.reshape(-1)[mask.reshape(-1)].astype(np.float64)
    want = _np_lovasz_hinge_flat(flat_lo, flat_la)
    got = float(lovasz_hinge_loss(logits.astype(np.float32), labels,
                                  pixel_weights=mask.astype(np.float32)))
    assert got == pytest.approx(want, abs=1e-5)


def test_binary_xloss_vs_torch(rng):
    torch = pytest.importorskip("torch")
    from neuralbarkcalculator_tpu.ops.losses import binary_xloss

    logits = rng.normal(size=(2, 6, 6)).astype(np.float32)
    labels = (rng.random((2, 6, 6)) > 0.5).astype(np.int64)
    labels[0, 0, :3] = 2  # ignore label
    # reference: filter ignore==2, then StableBCE
    keep = labels.reshape(-1) != 2
    x = torch.from_numpy(logits.reshape(-1)[keep])
    t = torch.from_numpy(labels.reshape(-1)[keep].astype(np.float32))
    want = float((x.clamp(min=0) - x * t
                  + (1 + (-x.abs()).exp()).log()).mean())
    got = float(binary_xloss(logits, labels, ignore=2))
    assert got == pytest.approx(want, rel=1e-5)


def test_iou_binary_reference_semantics(rng):
    from neuralbarkcalculator_tpu.ops.losses import iou_binary

    preds = (rng.random((3, 8, 8)) > 0.5).astype(np.int32)
    labels = (rng.random((3, 8, 8)) > 0.5).astype(np.int32)
    labels[1] = 0
    preds[1] = 0  # empty union image -> EMPTY=1.0 contribution
    labels[2, 0, :4] = 7  # ignore label

    def ref_iou(pred, label, ignore):
        inter = int(((label == 1) & (pred == 1)).sum())
        union = int(((label == 1)
                     | ((pred == 1) & (label != ignore))).sum())
        return 1.0 if union == 0 else inter / union

    want = 100.0 * np.mean([ref_iou(preds[i], labels[i], 7)
                            for i in range(3)])
    got = float(iou_binary(preds, labels, ignore=7, per_image=True))
    assert got == pytest.approx(want, rel=1e-6)
    # per_image=False flattens everything into one image
    want_flat = 100.0 * ref_iou(preds.reshape(-1), labels.reshape(-1), 7)
    got_flat = float(iou_binary(preds, labels, ignore=7, per_image=False))
    assert got_flat == pytest.approx(want_flat, rel=1e-6)


def test_xloss_vs_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from neuralbarkcalculator_tpu.ops.losses import xloss

    logits = rng.normal(size=(2, 6, 6, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(2, 6, 6))
    labels[0, :2, :] = 255  # the hardcoded ignore_index
    want = float(F.cross_entropy(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(labels), ignore_index=255))
    # the reference ignores its own `ignore` arg; ours must too
    got = float(xloss(logits, labels, ignore=1))
    assert got == pytest.approx(want, rel=1e-5)


def test_lovasz_hist_per_image_routed(rng):
    """ADVICE r2: bins + per_image must use the histogram path (not fall
    through to the slow exact sort silently); value stays close to the
    exact per-image loss at high bin counts."""
    logits = rng.normal(size=(2, 8, 8, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(2, 8, 8))
    exact = float(lovasz_softmax_loss(logits, labels, per_image=True))
    hist = float(lovasz_softmax_loss(logits, labels, per_image=True,
                                     bins=4096))
    assert hist == pytest.approx(exact, abs=2e-3)
    # masked variant agrees with unpadded
    pad_logits = np.concatenate(
        [logits, rng.normal(size=(1, 8, 8, C)).astype(np.float32)])
    pad_labels = np.concatenate([labels,
                                 rng.integers(0, C, size=(1, 8, 8))])
    pw = np.array([1, 1, 0], np.float32)[:, None, None]
    masked = float(lovasz_softmax_loss(
        pad_logits, pad_labels, per_image=True, pixel_weights=pw,
        bins=4096))
    assert masked == pytest.approx(hist, rel=1e-5, abs=1e-6)


def test_lovasz_hist_masked_matches_unpadded(rng):
    """Histogram path honors pixel_weights exactly like the sort path:
    padding garbage + zero mask == unpadded."""
    logits = rng.normal(size=(2, 8, 8, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(2, 8, 8))
    pad_logits = np.concatenate(
        [logits, rng.normal(size=(1, 8, 8, C)).astype(np.float32)])
    pad_labels = np.concatenate([labels,
                                 rng.integers(0, C, size=(1, 8, 8))])
    pw = np.array([1, 1, 0], np.float32)[:, None, None]
    unpadded = float(lovasz_softmax_loss(logits, labels, bins=128))
    masked = float(lovasz_softmax_loss(pad_logits, pad_labels,
                                       pixel_weights=pw, bins=128))
    np.testing.assert_allclose(masked, unpadded, rtol=1e-5, atol=1e-6)
