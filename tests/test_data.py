"""Tests for the data layer: manifest, label decode, pad_resize parity with
PIL, device-side paired augmentation, splits and samplers."""
import numpy as np
import pytest
from PIL import Image

from neuralbarkcalculator_tpu.data.augment import (
    augment_batch,
    color_jitter,
    pad_resize,
    paired_flips,
    paired_random_crop,
    pil_bilinear_matrix,
)
from neuralbarkcalculator_tpu.data.dataset import (
    BarkDataset,
    decode_label,
    make_dataset,
)
from neuralbarkcalculator_tpu.data.sampling import (
    PrioritizedSampler,
    get_splits,
    weighted_batch_iterator,
)


# ------------------------------------------------------------------ manifest

def _make_tree(tmp_path, with_duals=True):
    rng = np.random.default_rng(0)
    for wt in ("epinette_gelee", "sapin"):
        sdir = tmp_path / "samples" / wt
        sdir.mkdir(parents=True)
        for name in ("b.bmp", "a.bmp"):
            arr = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(sdir / name)
        if with_duals:
            ddir = tmp_path / "duals" / wt
            ddir.mkdir(parents=True)
            dual = np.zeros((16, 16), np.uint8)
            dual[:4] = 127
            dual[4:6] = 255
            Image.fromarray(dual, "L").save(ddir / "a.png")
    return tmp_path


def test_make_dataset_pairs_and_sorts(tmp_path):
    root = _make_tree(tmp_path)
    recs = make_dataset(str(root))
    assert len(recs) == 4
    # sorted per type, types in fixed order
    assert [r.fname for r in recs] == ["a.png", "b.png", "a.png", "b.png"]
    assert recs[0].wood_type == "epinette_gelee"
    assert recs[0].target_path.endswith("duals/epinette_gelee/a.png")
    assert recs[1].target_path == ""  # no dual for b


def test_make_dataset_requires_samples(tmp_path):
    with pytest.raises(IOError):
        make_dataset(str(tmp_path))


def test_dataset_items_and_label_decode(tmp_path):
    root = _make_tree(tmp_path)
    ds = BarkDataset(str(root))
    sample, target, fname, wood_type = ds[0]
    assert sample.shape == (16, 16, 3) and sample.dtype == np.float32
    assert sample.max() <= 1.0
    # dual 0/127/255 -> classes 0/1/2 (dataset.py:188-198)
    assert target.dtype == np.int32
    assert (target[:4] == 1).all() and (target[4:6] == 2).all()
    assert (target[6:] == 0).all()
    # missing dual -> zero mask (dataset.py:199-200)
    _, t2, _, _ = ds[1]
    assert (t2 == 0).all()


def test_dataset_empty_raises(tmp_path):
    (tmp_path / "samples" / "sapin").mkdir(parents=True)
    with pytest.raises(RuntimeError):
        BarkDataset(str(tmp_path))


def test_decode_label_raw_255():
    t = np.array([[0.0, 127.0, 255.0]])
    np.testing.assert_array_equal(decode_label(t, t.shape),
                                  [[0, 1, 2]])


# ---------------------------------------------------------------- pad_resize

@pytest.mark.parametrize("in_size,out_size", [(1026, 1024), (96, 128),
                                              (128, 96), (100, 100)])
def test_pil_bilinear_matrix_matches_pil(rng, in_size, out_size):
    x = rng.random((in_size, 1)).astype(np.float32)
    # PIL mode-F image, resize along one axis only
    img = Image.fromarray(x[:, 0].reshape(in_size, 1), mode="F")
    want = np.asarray(img.resize((1, out_size), Image.BILINEAR))
    got = pil_bilinear_matrix(in_size, out_size) @ x[:, 0]
    np.testing.assert_allclose(got, want.reshape(-1), atol=1e-5)


def test_pad_resize_shapes_and_reflect(rng):
    img = rng.random((1000, 1024, 3)).astype(np.float32)
    out = pad_resize(img, 1024, 1024)
    assert out.shape == (1024, 1024, 3)
    # identity case
    img2 = rng.random((64, 64)).astype(np.float32)
    np.testing.assert_array_equal(pad_resize(img2, 64, 64), img2)


# -------------------------------------------------------------- augmentation

def test_color_jitter_bounds(rng):
    import jax

    img = rng.random((16, 16, 3)).astype(np.float32)
    out = np.asarray(color_jitter(jax.random.PRNGKey(0), img, 0.1, 0.2))
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert not np.allclose(out, img)  # something happened


def test_paired_crop_alignment(rng):
    import jax

    h = w = 32
    img = np.broadcast_to(
        np.arange(h * w, dtype=np.float32).reshape(h, w)[..., None],
        (h, w, 3)).copy()
    lab = np.arange(h * w, dtype=np.int32).reshape(h, w)
    ic, lc = paired_random_crop(jax.random.PRNGKey(3), img, lab, 16)
    np.testing.assert_array_equal(np.asarray(ic)[..., 0].astype(np.int32),
                                  np.asarray(lc))


def test_paired_flips_alignment(rng):
    import jax

    img = rng.random((8, 8, 3)).astype(np.float32)
    lab = (img[..., 0] * 100).astype(np.int32)
    for seed in range(8):
        fi, fl = paired_flips(jax.random.PRNGKey(seed), img, lab)
        np.testing.assert_array_equal(
            (np.asarray(fi)[..., 0] * 100).astype(np.int32), np.asarray(fl))


def test_augment_batch_shapes(rng):
    import jax

    imgs = rng.random((4, 64, 64, 3)).astype(np.float32)
    labs = rng.integers(0, 3, size=(4, 64, 64)).astype(np.int32)
    mean = np.array([0.5, 0.5, 0.5], np.float32)
    std = np.array([0.2, 0.2, 0.2], np.float32)
    out_i, out_l = augment_batch(jax.random.PRNGKey(0), imgs, labs, 32,
                                 mean, std)
    assert out_i.shape == (4, 32, 32, 3)
    assert out_l.shape == (4, 32, 32)
    # normalized output can be negative; labels must stay classes
    assert set(np.unique(np.asarray(out_l))) <= {0, 1, 2}


# ------------------------------------------------------------------ sampling

def test_get_splits_sizes_and_weights(rng):
    n_per_type = {"epinette_gelee": 10, "epinette_non_gelee": 7, "sapin": 5}
    targets, wood_types = [], []
    for wt, n in n_per_type.items():
        for i in range(n):
            t = np.zeros((8, 8), np.int32)
            t[: i % 8 + 1] = 1
            targets.append(t)
            wood_types.append(wt)
    tr, va, te, w = get_splits(targets, wood_types,
                               np.random.default_rng(42))
    # ceil(0.8n) train / floor(0.1n) valid / rest test, per type
    assert len(tr) == 8 + 6 + 4
    assert len(va) == 1 + 0 + 0
    assert len(te) == 1 + 1 + 1
    assert len(set(tr) | set(va) | set(te)) == 22
    assert w.shape == (len(tr),)
    assert w.sum() == pytest.approx(1.0)
    # deterministic under the same seed
    tr2, _, _, w2 = get_splits(targets, wood_types,
                               np.random.default_rng(42))
    np.testing.assert_array_equal(tr, tr2)
    np.testing.assert_allclose(w, w2)


def test_weighted_batch_iterator(rng):
    w = np.array([0.1, 0.7, 0.2])
    batches = list(weighted_batch_iterator(
        w, batch_size=2, rng=np.random.default_rng(0)))
    assert len(batches) == (3 * 12) // 2
    all_idx = np.concatenate(batches)
    assert all_idx.min() >= 0 and all_idx.max() < 3
    # heavier index drawn more often
    assert (all_idx == 1).sum() > (all_idx == 0).sum()


def test_prioritized_sampler_update():
    s = PrioritizedSampler(4, batch_size=2, num_samples=8,
                           rng=np.random.default_rng(0))
    batches = list(iter(s))
    assert len(batches) == 4
    s.update(np.array([0, 1]), 0.5)
    # first visit: w = 1*0/1 + 0.5/1 = 0.5
    assert s.weights[0] == pytest.approx(0.5)
    s.update(np.array([0]), 1.0)
    # second visit: w = 0.5*1/2 + 1/2 = 0.75
    assert s.weights[0] == pytest.approx(0.75)
    stats = s.stats()
    assert stats["avg_visits"] == pytest.approx(3 / 4)


def test_split_membership_matches_reference_global_seed():
    """The reference seeds global legacy np.random
    (make_training_deterministic, utils.py:195-198) and get_splits uses
    np.random.shuffle; RandomState(seed) must reproduce the identical
    split membership."""
    from neuralbarkcalculator_tpu.data.sampling import get_splits

    counts = np.arange(1, 31) * 100
    types = (["epinette_gelee"] * 10 + ["epinette_non_gelee"] * 10
             + ["sapin"] * 10)

    np.random.seed(42)  # reference-style global seeding
    ref_order = []
    for start in (0, 10, 20):
        arr = np.arange(start, start + 10)
        np.random.shuffle(arr)
        ref_order.append(arr)

    tr, va, te, w = get_splits(counts, types, np.random.RandomState(42))
    # per type: ceil(8) train / floor(1) valid / 1 test, in shuffle order
    want_train = np.concatenate([o[:8] for o in ref_order])
    want_valid = np.concatenate([o[8:9] for o in ref_order])
    want_test = np.concatenate([o[9:] for o in ref_order])
    np.testing.assert_array_equal(tr, want_train)
    np.testing.assert_array_equal(va, want_valid)
    np.testing.assert_array_equal(te, want_test)


def test_pad_to_biggest_image():
    from neuralbarkcalculator_tpu.data.augment import pad_to_biggest_image

    rng = np.random.default_rng(0)
    samples = [rng.random((16, 20, 3)).astype(np.float32),
               rng.random((24, 12, 3)).astype(np.float32)]
    targets = [rng.integers(0, 3, (16, 20)), rng.integers(0, 3, (24, 12))]
    s, t = pad_to_biggest_image(samples, targets)
    assert s.shape == (2, 24, 20, 3)
    assert t.shape == (2, 24, 20)
    assert set(np.unique(t)).issubset({0, 1, 2})


def test_norm_color_jitter():
    import jax
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.data.augment import norm_color_jitter

    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((8, 8, 3)).astype(np.float32))
    out = norm_color_jitter(jax.random.PRNGKey(0), img, brightness=0.15,
                            contrast=0.15, saturation=0.15)
    out = np.asarray(out)
    assert out.shape == img.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert not np.allclose(out, np.asarray(img))  # actually jittered
    # zero params -> identity
    same = norm_color_jitter(jax.random.PRNGKey(0), img)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(img))
