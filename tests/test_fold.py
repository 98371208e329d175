"""BN constant-folding tests (models/fold.py, VERDICT r2 #2).

Folded inference (BN -> conv kernel+bias) must reproduce the unfolded
eval forward: logits to f32-rounding tolerance and identical argmax
class maps on realistic content.
"""
import numpy as np
import pytest


def _init_model(factory, seed=0):
    import jax
    import jax.numpy as jnp

    model = factory(dropout=0.0) if "dropout" in factory.__code__.co_varnames \
        else factory()
    variables = model.init(jax.random.PRNGKey(seed),
                          jnp.zeros((1, 64, 64, 3)), train=False)
    return model, variables


def _realistic_stats(variables, rng):
    """Random-init BN stats are mean=0/var=1 — give them non-trivial
    values so folding actually has something to fold."""
    import jax
    return {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda v: v + np.abs(rng.normal(0, 0.05, v.shape)).astype(
                v.dtype), variables["batch_stats"]),
    }


@pytest.mark.slow
@pytest.mark.parametrize("name", ["fcn_resnet50", "deeplabv3_resnet50"])
def test_folded_forward_matches_unfolded(name, rng):
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.models.fold import fold_model
    from neuralbarkcalculator_tpu.models.segmentation import MODEL_FACTORIES

    model, variables = _init_model(MODEL_FACTORIES[name])
    variables = _realistic_stats(variables, rng)
    folded, fvars = fold_model(model, variables)
    assert "batch_stats" not in fvars

    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32))
    want = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(folded.apply(fvars, x, train=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.argmax(got, -1), np.argmax(want, -1))


@pytest.mark.slow
def test_folded_ragged_forward_matches(rng):
    """Folding must preserve the ragged-batch machinery (valid_h row
    masks + embedded row upsample operators)."""
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.models.fold import fold_model
    from neuralbarkcalculator_tpu.models.segmentation import fcn_resnet50
    from neuralbarkcalculator_tpu.ops.resize import embedded_bicubic_rows

    model, variables = _init_model(fcn_resnet50)
    variables = _realistic_stats(variables, rng)
    folded, fvars = fold_model(model, variables)

    pad_h = 64
    heights = [64, 48]
    x = np.zeros((2, pad_h, 64, 3), np.float32)
    row_ops = np.zeros((2, pad_h, pad_h // 8), np.float32)
    for i, h in enumerate(heights):
        x[i, :h] = rng.normal(0, 1, (h, 64, 3))
        feat_h = model.backbone.valid_feature_height(h)
        row_ops[i] = embedded_bicubic_rows(feat_h, h, pad_h // 8, pad_h)
    vh = np.asarray(heights, np.int32)

    want = np.asarray(model.apply(variables, jnp.asarray(x), train=False,
                                  valid_h=vh, row_upsample=row_ops))
    got = np.asarray(folded.apply(fvars, jnp.asarray(x), train=False,
                                  valid_h=vh, row_upsample=row_ops))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.argmax(got, -1), np.argmax(want, -1))


def test_folded_train_mode_rejected(rng):
    """Uses a one-stage backbone: the rejection raises at trace time in
    FCNHead, so paying a full ResNet-50 init compile (~2 min on a 1-core
    CPU host) would buy nothing over this 3-layer stand-in."""
    import jax
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.models.fold import fold_model
    from neuralbarkcalculator_tpu.models.heads import FCNHead
    from neuralbarkcalculator_tpu.models.resnet import DilatedResNet
    from neuralbarkcalculator_tpu.models.segmentation import SegmentationModel

    model = SegmentationModel(backbone=DilatedResNet(stage_sizes=(1,)),
                              classifier=FCNHead(3, dropout=0.5))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 3)), train=False)
    folded, fvars = fold_model(model, variables)
    with pytest.raises(ValueError, match="inference-only"):
        folded.apply(fvars, jnp.zeros((1, 16, 16, 3)), train=True)


def test_folded_efficientnet_matches_unfolded(rng):
    """EfficientNet folds too: MBConv bn0/bn1/bn2 (eps 1e-3, incl. the
    depthwise conv) + stem/head BNs map via the explicit table, while
    the FCN head keeps its torchvision eps 1e-5."""
    import jax
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.models.fold import fold_model
    from neuralbarkcalculator_tpu.models.segmentation import fcn_efficientnet

    model = fcn_efficientnet(0, dropout=0.0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    variables = _realistic_stats(variables, rng)
    folded, fvars = fold_model(model, variables)
    assert "batch_stats" not in fvars

    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32))
    want = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(folded.apply(fvars, x, train=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.argmax(got, -1), np.argmax(want, -1))


def test_predict_engine_fold_matches_unfolded(tmp_path):
    """End-to-end: the engine with fold_bn=True produces the same class
    maps as fold_bn=False (f32).

    Uses a local fixed-seed generator (not the session `rng` fixture):
    these class-map comparisons are statistical on tie-prone random
    logits, so the data must not depend on how many draws earlier tests
    consumed (suite order) for the assertion to be reproducible."""
    import flax.serialization
    rng = np.random.default_rng(7)
    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.parallel.mesh import make_mesh
    from neuralbarkcalculator_tpu.pipeline.predict import NeuralBarkCalculator
    from neuralbarkcalculator_tpu.pipeline.preprocess import ProcessedImage

    model, variables = _init_model(
        __import__("neuralbarkcalculator_tpu.models.segmentation",
                   fromlist=["fcn_resnet50"]).fcn_resnet50)
    variables = _realistic_stats(variables, rng)
    ckpt = str(tmp_path / "m.msgpack")
    with open(ckpt, "wb") as f:
        f.write(flax.serialization.to_bytes(variables))

    items = [ProcessedImage(
        (rng.random((h, 64, 3)) * 255).astype(np.uint8), f"i{k}.png",
        "sapin") for k, h in enumerate([64, 48, 64, 32])]
    maps = {}
    for fold in (True, False):
        config = PredictConfig(model_path=ckpt, batch_size=2,
                               use_bfloat16=False, height_bucket=32,
                               fold_bn=fold)
        calc = NeuralBarkCalculator(ckpt, mesh=make_mesh(n_data=2),
                                    config=config)
        maps[fold] = [m for _, m in calc.predict_images(items)]
    for a, b in zip(maps[True], maps[False]):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_predict_engine_default_bf16_fold_budget(tmp_path):
    """The shipped default config combines use_bfloat16=True with
    fold_bn=True; folding bakes the BN scale into bf16-cast conv kernels
    instead of applying it as an f32 elementwise pass, so the combination
    needs its own budget check: against the f32 unfolded ground truth,
    folded-bf16 class maps may not disagree materially more than
    unfolded-bf16 ones do (fold must not compound the bf16 error).

    Local fixed-seed generator, not the session `rng` fixture: the
    mismatch budget is statistical on tie-prone random logits, so the
    data must be identical no matter which tests ran first.

    Budget calibration: random-init logits are near-tie almost
    everywhere, so bf16 rounding flips an O(0.3-1%) data-dependent pixel
    fraction on EITHER path — the two paths round in different places
    (fold bakes scale/sqrt(var+eps) into the kernel before the bf16
    cast; unfolded casts kernel and BN constants separately), so their
    flip fractions differ by small factors even with correct math
    (observed up to ~4x across data draws). A genuinely broken fold
    (wrong scale, misplaced bias) flips tens of percent. The bounds
    below are sized to separate those regimes; exact f32 map equality is
    covered by test_predict_engine_fold_matches_unfolded."""
    import flax.serialization
    rng = np.random.default_rng(7)
    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.models.segmentation import fcn_resnet50
    from neuralbarkcalculator_tpu.parallel.mesh import make_mesh
    from neuralbarkcalculator_tpu.pipeline.predict import NeuralBarkCalculator
    from neuralbarkcalculator_tpu.pipeline.preprocess import ProcessedImage

    model, variables = _init_model(fcn_resnet50)
    variables = _realistic_stats(variables, rng)
    ckpt = str(tmp_path / "m.msgpack")
    with open(ckpt, "wb") as f:
        f.write(flax.serialization.to_bytes(variables))

    items = [ProcessedImage(
        (rng.random((h, 64, 3)) * 255).astype(np.uint8), f"i{k}.png",
        "sapin") for k, h in enumerate([64, 48, 64, 32])]

    def run(use_bf16, fold):
        config = PredictConfig(model_path=ckpt, batch_size=2,
                               use_bfloat16=use_bf16, height_bucket=32,
                               fold_bn=fold)
        calc = NeuralBarkCalculator(ckpt, mesh=make_mesh(n_data=2),
                                    config=config)
        return [m for _, m in calc.predict_images(items)]

    truth = run(False, False)
    unfolded_bf16 = run(True, False)
    folded_bf16 = run(True, True)
    n = sum(m.size for m in truth)
    mism_unfolded = sum(int((a != b).sum())
                        for a, b in zip(unfolded_bf16, truth)) / n
    mism_folded = sum(int((a != b).sum())
                      for a, b in zip(folded_bf16, truth)) / n
    # fold may move bf16 rounding around but not compound it
    assert mism_folded <= max(4.0 * mism_unfolded, 0.02), \
        (mism_folded, mism_unfolded)
    assert mism_folded <= 0.03, mism_folded


def test_s2d_stem_matches_plain_conv(rng):
    """The space-to-depth stem (models/resnet._S2DStemConv) must match
    the plain 7x7/s2 conv to f32 rounding, including at zero-padded
    borders, with identical parameter trees."""
    import jax
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.models.resnet import DilatedResNet

    plain = DilatedResNet(stage_sizes=(1,), s2d_stem=False)
    s2d = DilatedResNet(stage_sizes=(1,), s2d_stem=True)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32))
    variables = plain.init(jax.random.PRNGKey(0), x, train=False)
    # identical param trees -> same checkpoints load into both
    v2 = s2d.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(v2)

    want = np.asarray(plain.apply(variables, x, train=False))
    got = np.asarray(s2d.apply(variables, x, train=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # ragged: zero rows beyond valid_h stay exact
    vh = np.array([64, 48], np.int32)
    xm = np.asarray(x).copy()
    xm[1, 48:] = 0.0
    want = np.asarray(plain.apply(variables, jnp.asarray(xm),
                                  train=False, valid_h=vh))
    got = np.asarray(s2d.apply(variables, jnp.asarray(xm), train=False,
                               valid_h=vh))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
