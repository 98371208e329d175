"""EfficientNet backbone + model-zoo completeness tests."""
import numpy as np
import pytest


@pytest.mark.parametrize("variant,inplanes", [(0, 1280), (2, 1408)])
@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.fixture(scope="module")
def torch_eff():
    torch = pytest.importorskip("torch")
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from efficientnet_torch import EfficientNetFeaturesTorch

    torch.manual_seed(0)
    model = EfficientNetFeaturesTorch(variant=0)
    model.train()  # perturb BN running stats so mapping bugs can't hide
    with torch.no_grad():
        for _ in range(2):
            model(torch.randn(2, 3, 64, 64))
    model.eval()
    return model


def test_efficientnet_converter_feature_parity(torch_eff):
    """efficientnet_pytorch-named checkpoint -> EfficientNetFeatures:
    extract_features outputs must match torch (validates the _blocks flat
    index table, SE/depthwise kernel layouts, TF-SAME padding, BN eps)."""
    import torch

    from neuralbarkcalculator_tpu.models.convert import (
        efficientnet_state_dict_to_backbone, infer_efficientnet_variant)
    from neuralbarkcalculator_tpu.models.efficientnet import (
        EfficientNetFeatures)

    sd = dict(torch_eff.state_dict())
    sd["_fc.weight"] = torch.randn(1000, 1280)  # dropped by conversion
    sd["_fc.bias"] = torch.randn(1000)
    assert infer_efficientnet_variant(sd) == 0
    variables = efficientnet_state_dict_to_backbone(sd, 0)

    x = np.random.default_rng(2).normal(
        size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = torch_eff(torch.from_numpy(x)).numpy()
    model = EfficientNetFeatures(variant=0)
    got = model.apply(
        {"params": variables["params"]["backbone"],
         "batch_stats": variables["batch_stats"]["backbone"]},
        x.transpose(0, 2, 3, 1), train=False)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_efficientnet_full_model_checkpoint(torch_eff, tmp_path):
    """A reference fcn_efficientnet SimpleSegmentationModel checkpoint
    (backbone.model._* keys, models.py:95-104) loads through
    load_torch_checkpoint(efficientnet_variant=n) and through the
    backbone_ckpt auto-detect loader."""
    import torch

    from neuralbarkcalculator_tpu.models.convert import (
        load_backbone_checkpoint, load_torch_checkpoint)

    # reference-style checkpoint: backbone.model.* + FCNHead classifier.*
    sd = {f"backbone.model.{k}": v for k, v in
          torch_eff.state_dict().items()}
    sd["classifier.0.weight"] = torch.randn(512, 1280, 3, 3)
    sd["classifier.1.weight"] = torch.randn(512)
    sd["classifier.1.bias"] = torch.randn(512)
    sd["classifier.1.running_mean"] = torch.randn(512)
    sd["classifier.1.running_var"] = torch.rand(512) + 0.5
    sd["classifier.4.weight"] = torch.randn(3, 512, 1, 1)
    sd["classifier.4.bias"] = torch.randn(3)
    path = str(tmp_path / "best_model.pt")
    torch.save(sd, path)

    variables = load_torch_checkpoint(path, efficientnet_variant=0)
    assert "stem_conv" in variables["params"]["backbone"]
    assert "conv1" in variables["params"]["classifier"]

    bb = load_backbone_checkpoint(path)  # auto-detects EfficientNet
    a = np.asarray(bb["params"]["backbone"]["stem_conv"]["kernel"])
    b = np.asarray(
        variables["params"]["backbone"]["stem_conv"]["kernel"])
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_efficientnet_predict_engine_mixed_heights(tmp_path):
    """fcn_efficientnet runs through the production predict engine on a
    mixed-height folder via the exact-height fallback (one compiled
    program per distinct trimmed height; TF-SAME makes row-masked ragged
    batches impossible, models/efficientnet.py) and the batched outputs
    are bit-identical to per-image execution."""
    import flax.serialization
    import jax
    import jax.numpy as jnp

    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.models.segmentation import MODEL_FACTORIES
    from neuralbarkcalculator_tpu.parallel.mesh import make_mesh
    from neuralbarkcalculator_tpu.pipeline.predict import NeuralBarkCalculator
    from neuralbarkcalculator_tpu.pipeline.preprocess import ProcessedImage

    model = MODEL_FACTORIES["fcn_efficientnet_b0"](dropout=0.0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    ckpt = str(tmp_path / "eff.msgpack")
    with open(ckpt, "wb") as f:
        f.write(flax.serialization.to_bytes(variables))

    config = PredictConfig(model_path=ckpt, batch_size=2,
                           use_bfloat16=False)
    calc = NeuralBarkCalculator(ckpt, mesh=make_mesh(n_data=2),
                                config=config,
                                model_name="fcn_efficientnet_b0")
    assert calc._exact_heights

    rng = np.random.default_rng(0)
    items = [ProcessedImage((rng.random((h, 64, 3)) * 255).astype(np.uint8),
                            f"i{k}.png", "sapin")
             for k, h in enumerate([64, 48, 64, 48])]
    got = {item.fname: cmap for item, cmap in calc.predict_images(items)}
    assert len(got) == 4
    for item in items:
        assert got[item.fname].shape == item.image.shape[:2]

    # per-image execution must match exactly (predict postprocesses with
    # remove_small_zones, so replicate that on the single-image path)
    from neuralbarkcalculator_tpu.ops.ccl import remove_small_zones

    mean = np.asarray(config.mean, np.float32)
    std = np.asarray(config.std, np.float32)
    for item in items[:2]:
        x = (item.image.astype(np.float32) / 255.0 - mean) / std
        logits = model.apply(variables, x[None], train=False)
        pred = np.asarray(jnp.argmax(logits, -1))[0]
        want = np.asarray(remove_small_zones(pred[None]))[0]
        np.testing.assert_array_equal(got[item.fname], want)
