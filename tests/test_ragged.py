"""Exactness of ragged-height batched inference.

The claim (models/resnet.py docstring): running an image zero-padded to a
static height with row masks + a per-image embedded upsample operator is
bit-equivalent (up to float associativity) to running it unpadded at its
true height — the mechanism that lets folder inference batch mixed trimmed
heights (reference models.py:200-201) under one compiled program.
"""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_model():
    import jax
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.models.segmentation import fcn_resnet50

    model = fcn_resnet50(dropout=0.0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    return model, variables


def _forward_unpadded(model, variables, img):
    import jax.numpy as jnp

    return np.asarray(model.apply(variables, jnp.asarray(img[None]),
                                  train=False))[0]


def test_ragged_forward_matches_unpadded(small_model, rng):
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.ops.resize import embedded_bicubic_rows

    model, variables = small_model
    pad_h, w = 64, 64
    heights = [56, 64, 41]
    imgs = np.zeros((len(heights), pad_h, w, 3), np.float32)
    refs = []
    row_ops = []
    for i, h in enumerate(heights):
        img = rng.random((h, w, 3), dtype=np.float32)
        imgs[i, :h] = img
        refs.append(_forward_unpadded(model, variables, img))
        feat_h = model.backbone.valid_feature_height(h)
        row_ops.append(embedded_bicubic_rows(feat_h, h, pad_h // 8, pad_h))

    out = np.asarray(model.apply(
        variables, jnp.asarray(imgs), train=False,
        valid_h=jnp.asarray(heights, jnp.int32),
        row_upsample=jnp.asarray(np.stack(row_ops))))

    for i, h in enumerate(heights):
        np.testing.assert_allclose(out[i, :h], refs[i], rtol=1e-4,
                                   atol=1e-4)
        # padded output rows are exactly zero (inert operator rows)
        assert np.all(out[i, h:] == 0.0)


def test_ragged_forward_deeplab_head(rng):
    """Same exactness for the ASPP head (masked global pooling branch)."""
    import jax
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.models.segmentation import (
        deeplabv3_resnet50)
    from neuralbarkcalculator_tpu.ops.resize import embedded_bicubic_rows

    model = deeplabv3_resnet50()
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    h, pad_h, w = 48, 64, 64
    img = rng.random((h, w, 3), dtype=np.float32)
    ref = _forward_unpadded(model, variables, img)

    padded = np.zeros((1, pad_h, w, 3), np.float32)
    padded[0, :h] = img
    feat_h = model.backbone.valid_feature_height(h)
    row_op = embedded_bicubic_rows(feat_h, h, pad_h // 8, pad_h)
    out = np.asarray(model.apply(
        variables, jnp.asarray(padded), train=False,
        valid_h=jnp.asarray([h], jnp.int32),
        row_upsample=jnp.asarray(row_op[None])))
    np.testing.assert_allclose(out[0, :h], ref, rtol=1e-4, atol=1e-4)


def test_remove_small_zones_ragged_matches_sliced(rng):
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.ops.ccl import (remove_small_zones,
                                                  remove_small_zones_ragged)

    h_pad, w = 96, 128
    for h in (96, 70, 33):
        img = (rng.random((h, w)) * 3).astype(np.int32)
        ref = np.asarray(remove_small_zones(jnp.asarray(img)))
        padded = np.zeros((h_pad, w), np.int32)
        padded[:h] = img
        # garbage in the padded rows must not affect the result
        padded[h:] = (rng.random((h_pad - h, w)) * 3).astype(np.int32)
        out = np.asarray(remove_small_zones_ragged(
            jnp.asarray(padded), jnp.int32(h)))
        np.testing.assert_array_equal(out[:h], ref)
        assert np.all(out[h:] == 0)


def test_mesh_and_shardings():
    import jax
    from neuralbarkcalculator_tpu.parallel.mesh import (ShardingRules,
                                                        make_mesh, put_batch)

    mesh = make_mesh(n_data=4, n_model=2)
    rules = ShardingRules(mesh)
    assert rules.data_size == 4 and rules.model_size == 2

    batch = {"img": np.zeros((8, 64, 64, 3), np.float32),
             "lab": np.zeros((8, 64, 64), np.int32),
             "h": np.zeros((8,), np.int32)}
    device_batch = put_batch(rules, batch)
    # images split over data (dim 0) and model/width (dim 2)
    shard_shape = device_batch["img"].sharding.shard_shape((8, 64, 64, 3))
    assert shard_shape == (2, 64, 32, 3)
    assert device_batch["lab"].sharding.shard_shape((8, 64, 64)) == \
        (2, 64, 32)
    assert device_batch["h"].sharding.shard_shape((8,)) == (2,)
    assert len(device_batch["img"].sharding.device_set) == 8
    del jax
