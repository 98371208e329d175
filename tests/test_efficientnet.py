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


def test_efficientnet_bucketed_heights_bounds_compiles(tmp_path):
    """PredictConfig.effnet_bucket_heights: mixed trimmed heights share
    one bucket program (bounded warmup) instead of compiling per
    distinct height. The mode is APPROXIMATE everywhere, not just near
    the trim boundary: squeeze-excite global-pools the whole feature
    map, so the edge-replicated pad rows perturb every pixel's scale a
    little — with a random-init model that flips near-tie argmax pixels
    anywhere. The contract tested: (1) bit-identical when heights
    already sit on the bucket (padding is a no-op), (2) a small
    disagreement fraction on mixed heights, (3) one compiled program."""
    import flax.serialization
    import jax
    import jax.numpy as jnp

    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.models.segmentation import MODEL_FACTORIES
    from neuralbarkcalculator_tpu.pipeline.predict import \
        NeuralBarkCalculator
    from neuralbarkcalculator_tpu.pipeline.preprocess import ProcessedImage

    model = MODEL_FACTORIES["fcn_efficientnet_b0"](dropout=0.0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    ckpt = str(tmp_path / "effb.msgpack")
    with open(ckpt, "wb") as f:
        f.write(flax.serialization.to_bytes(variables))

    rng = np.random.default_rng(1)
    heights = [96, 112, 100, 128]  # all in one 128-bucket
    items = [ProcessedImage(
        (rng.random((h, 64, 3)) * 255).astype(np.uint8), f"i{k}.png",
        "sapin") for k, h in enumerate(heights)]

    def run(bucketed: bool, batch):
        config = PredictConfig(model_path=ckpt, batch_size=4,
                               use_bfloat16=False,
                               effnet_bucket_heights=bucketed)
        calc = NeuralBarkCalculator(ckpt, config=config,
                                    model_name="fcn_efficientnet_b0")
        got = {it.fname: cm for it, cm in calc.predict_images(batch)}
        return calc, got

    calc_b, got_b = run(True, items)
    assert calc_b._bucketed_exact
    # one program for the whole mixed-height folder (vs 3 distinct
    # heights + tail batches on the exact path)
    assert calc_b.cache_stats()["step_compiles"] == 1

    calc_e, got_e = run(False, items)
    assert calc_e.cache_stats()["step_compiles"] >= 3

    for it in items:
        b, e = got_b[it.fname], got_e[it.fname]
        assert b.shape == e.shape == it.image.shape[:2]
    # Class-map agreement is NOT asserted on mixed heights: a random-init
    # EfficientNet's logits are ~1e-7 in magnitude (the deep multiplicative
    # stack collapses), so every pixel is a floating-point tie and argmax
    # flips are coin tosses, cascaded further by remove_small_zones. The
    # honest quantitative check is at the logits level: the edge-pad
    # perturbation is absolutely tiny.
    x = items[0].image.astype(np.float32) / 255.0
    h = x.shape[0]
    import jax.numpy as jnp
    exact_lg = np.asarray(model.apply(variables, x[None],
                                      train=False))[0]
    xp = np.concatenate([x, np.repeat(x[-1:], 128 - h, 0)], 0)
    pad_lg = np.asarray(model.apply(variables, xp[None],
                                    train=False))[0][:h]
    assert np.max(np.abs(exact_lg - pad_lg)) < 1e-5

    # heights already on the bucket: padding is a no-op, so bucketed
    # output is bit-identical to exact-height execution
    on_bucket = [ProcessedImage(
        (rng.random((128, 64, 3)) * 255).astype(np.uint8), f"ob{k}.png",
        "sapin") for k in range(2)]
    _, got_b2 = run(True, on_bucket)
    _, got_e2 = run(False, on_bucket)
    for it in on_bucket:
        np.testing.assert_array_equal(got_b2[it.fname], got_e2[it.fname])


def test_effnet_bucket_heights_requires_stride_multiple(tmp_path):
    import flax.serialization
    import jax
    import jax.numpy as jnp
    import pytest

    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.models.segmentation import MODEL_FACTORIES
    from neuralbarkcalculator_tpu.pipeline.predict import \
        NeuralBarkCalculator

    model = MODEL_FACTORIES["fcn_efficientnet_b0"](dropout=0.0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    ckpt = str(tmp_path / "effc.msgpack")
    with open(ckpt, "wb") as f:
        f.write(flax.serialization.to_bytes(variables))
    config = PredictConfig(model_path=ckpt, height_bucket=48,
                           effnet_bucket_heights=True)
    with pytest.raises(ValueError, match="feature stride"):
        NeuralBarkCalculator(ckpt, config=config,
                             model_name="fcn_efficientnet_b0")
