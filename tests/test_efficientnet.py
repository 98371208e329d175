"""EfficientNet backbone + model-zoo completeness tests."""
import numpy as np
import pytest


@pytest.mark.parametrize("variant,inplanes", [(0, 1280), (2, 1408)])
def test_feature_shapes(variant, inplanes):
    import jax
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.models.efficientnet import (
        EfficientNetFeatures)

    model = EfficientNetFeatures(variant=variant)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    feat = model.apply(variables, x, train=False)
    assert feat.shape == (1, 2, 2, inplanes)  # output stride 32


def test_fcn_efficientnet_forward():
    import jax
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.models.segmentation import fcn_efficientnet

    model = fcn_efficientnet(0, dropout=0.0)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (1, 64, 64, 3)  # upsampled back to input


def test_filter_rounding_matches_efficientnet_pytorch():
    from neuralbarkcalculator_tpu.models.efficientnet import (round_filters,
                                                              round_repeats)

    # spot values from efficientnet_pytorch.utils.round_filters
    assert round_filters(32, 1.0) == 32
    assert round_filters(32, 1.1) == 32  # b2 stem: 35.2 -> 32
    assert round_filters(32, 1.4) == 48  # b4 stem
    assert round_filters(320, 1.8) == 576  # b6 last stage
    assert round_repeats(3, 1.4) == 5
    assert round_repeats(1, 2.2) == 3


def test_train_mode_with_drop_connect():
    import jax
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.models.efficientnet import (
        EfficientNetFeatures)

    model = EfficientNetFeatures(variant=0)
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(out)).all()
