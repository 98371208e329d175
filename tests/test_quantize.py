"""int8 post-training quantization tests (models/quantize.py, qops.py).

The int8 mode is opt-in and approximate; what must hold:
- the requant epilogue math is exactly the documented formula,
- quantized logits track the folded f32 logits closely (small rel error),
- the ragged-batch invariant stays BIT-exact (quantization is
  deterministic and zero-preserving, so padded batches must equal
  per-image runs exactly, like every other inference path),
- train mode and unsupported heads are rejected,
- the predict engine calibrates on its first chunk and swaps to the
  int8 model.
"""
import numpy as np
import pytest


def _small_model():
    from neuralbarkcalculator_tpu.models.heads import FCNHead
    from neuralbarkcalculator_tpu.models.resnet import DilatedResNet
    from neuralbarkcalculator_tpu.models.segmentation import \
        SegmentationModel
    return SegmentationModel(backbone=DilatedResNet(stage_sizes=(1, 1, 1, 1)),
                             classifier=FCNHead(3))


def _init(model, rng, shape=(2, 64, 64, 3)):
    import jax
    import jax.numpy as jnp
    x = jnp.asarray(rng.normal(0, 1.2, shape), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # non-trivial BN stats so folding/quantization sees realistic scales
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda v: v + np.abs(np.random.default_rng(3).normal(
                0, 0.05, v.shape)).astype(v.dtype),
            variables["batch_stats"]),
    }
    return x, variables


def test_requant_epilogue_golden():
    """qops.requant_relu/dequant vs literal numpy formulas."""
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.models import qops

    rng = np.random.default_rng(0)
    acc = rng.integers(-3_000_000, 3_000_000, (2, 4, 4, 8), np.int32)
    m = rng.uniform(1e-6, 1e-4, 8).astype(np.float32)
    b = rng.normal(0, 20, 8).astype(np.float32)
    got = np.asarray(qops.requant_relu(jnp.asarray(acc), jnp.asarray(m),
                                       jnp.asarray(b)))
    want = np.clip(np.round(acc.astype(np.float32) * m + b),
                   0, 127).astype(np.int8)
    np.testing.assert_array_equal(got, want)
    got = np.asarray(qops.dequant(jnp.asarray(acc), jnp.asarray(m),
                                  jnp.asarray(b)))
    np.testing.assert_allclose(got, acc.astype(np.float32) * m + b,
                               rtol=1e-6)
    # quantize_act preserves zeros exactly (ragged padding invariant)
    x = np.zeros((1, 4, 4, 3), np.float32)
    assert not np.asarray(
        qops.quantize_act(jnp.asarray(x), jnp.float32(37.0))).any()


def test_quantized_logits_track_f32_and_ragged_bit_exact():
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.models.fold import fold_model
    from neuralbarkcalculator_tpu.models.quantize import quantize_model
    from neuralbarkcalculator_tpu.models.segmentation import \
        SegmentationModel

    rng = np.random.default_rng(0)
    model = _small_model()
    x, variables = _init(model, rng)
    fm, fv = fold_model(model, variables)
    ref = np.asarray(fm.apply(fv, x, train=False,
                              method=SegmentationModel.head_logits))
    qm, qv = quantize_model(model, variables, [x])
    assert qm.backbone.quantized and qm.classifier.quantized
    ql = np.asarray(qm.apply(qv, x, train=False,
                             method=SegmentationModel.head_logits))
    rel = np.linalg.norm(ql - ref) / np.linalg.norm(ref)
    assert rel < 0.06, rel  # observed ~0.03 at these shapes

    # ragged: padded batch == per-image, bit exact (int8 arithmetic is
    # deterministic; masks keep padded rows at exactly zero)
    xm = np.asarray(x).copy()
    xm[1, 48:] = 0.0
    pad = np.asarray(qm.apply(qv, jnp.asarray(xm), train=False,
                              valid_h=jnp.asarray([64, 48]),
                              method=SegmentationModel.head_logits))
    solo = np.asarray(qm.apply(qv, jnp.asarray(xm[1:, :48]), train=False,
                               method=SegmentationModel.head_logits))
    fh = qm.backbone.valid_feature_height(48)
    np.testing.assert_array_equal(pad[1, :fh], solo[0])


def test_quantized_full_forward_upsamples():
    """The full __call__ (bicubic upsample to input resolution) works on
    the quantized model — logits come back f32 at the input size."""
    from neuralbarkcalculator_tpu.models.quantize import quantize_model

    rng = np.random.default_rng(1)
    model = _small_model()
    x, variables = _init(model, rng)
    qm, qv = quantize_model(model, variables, [x])
    y = np.asarray(qm.apply(qv, x, train=False))
    assert y.shape == (2, 64, 64, 3) and y.dtype == np.float32


def test_quantized_deeplab_tracks_f32_and_ragged_bit_exact():
    """DeepLabHead/ASPP int8: logits track folded f32; ragged stays
    bit-exact (the pooled branch divides by the true row count)."""
    import jax
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.models.fold import fold_model
    from neuralbarkcalculator_tpu.models.heads import DeepLabHead
    from neuralbarkcalculator_tpu.models.quantize import quantize_model
    from neuralbarkcalculator_tpu.models.segmentation import \
        SegmentationModel

    rng = np.random.default_rng(4)
    model = _small_model().clone(classifier=DeepLabHead(3))
    x = jnp.asarray(rng.normal(0, 1.2, (2, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda v: v + np.abs(np.random.default_rng(5).normal(
                0, 0.05, v.shape)).astype(v.dtype),
            variables["batch_stats"]),
    }
    fm, fv = fold_model(model, variables)
    ref = np.asarray(fm.apply(fv, x, train=False,
                              method=SegmentationModel.head_logits))
    qm, qv = quantize_model(model, variables, [x])
    assert qm.classifier.quantized
    ql = np.asarray(qm.apply(qv, x, train=False,
                             method=SegmentationModel.head_logits))
    rel = np.linalg.norm(ql - ref) / np.linalg.norm(ref)
    assert rel < 0.08, rel

    xm = np.asarray(x).copy()
    xm[1, 48:] = 0.0
    pad = np.asarray(qm.apply(qv, jnp.asarray(xm), train=False,
                              valid_h=jnp.asarray([64, 48]),
                              method=SegmentationModel.head_logits))
    solo = np.asarray(qm.apply(qv, jnp.asarray(xm[1:, :48]), train=False,
                               method=SegmentationModel.head_logits))
    fh = qm.backbone.valid_feature_height(48)
    np.testing.assert_array_equal(pad[1, :fh], solo[0])


def test_quantize_rejections():
    import pytest as _pytest
    from neuralbarkcalculator_tpu.models.quantize import quantize_model

    rng = np.random.default_rng(2)
    model = _small_model()
    x, variables = _init(model, rng)

    # unsupported backbone (EfficientNet has no int8 mode)
    from neuralbarkcalculator_tpu.models.efficientnet import \
        EfficientNetFeatures
    bad = model.clone(backbone=EfficientNetFeatures(variant=0))
    with _pytest.raises(ValueError, match="int8"):
        quantize_model(bad, variables, [x])

    # train mode on a quantized model
    qm, qv = quantize_model(model, variables, [x])
    with _pytest.raises(ValueError, match="inference-only"):
        qm.apply(qv, x, train=True)

    # neither batch_stats nor folded
    with _pytest.raises(ValueError, match="batch_stats"):
        quantize_model(model, {"params": variables["params"]}, [x])


def test_old_version_checkpoint_rejected(tmp_path):
    """A v0 int8 checkpoint (f32-residual parameter layout) is detected
    as an int8 file but refused with a re-export pointer — silently
    loading it under the v1 (s_out-units) math would be wrong."""
    from neuralbarkcalculator_tpu.models.quantize import (
        QCKPT_TAG, is_quantized_checkpoint, load_quantized)

    old = tmp_path / "old.int8.msgpack"
    old.write_bytes(QCKPT_TAG + b"\x00" + b"not-real-msgpack")
    assert is_quantized_checkpoint(str(old))
    with pytest.raises(ValueError, match="re-export"):
        load_quantized(str(old))


def test_predict_engine_int8(tmp_path):
    """End-to-end: quantize_int8=True calibrates on the first chunk,
    swaps to the int8 model, and yields valid class maps for a ragged
    image mix. Agreement with the f32 engine is checked loosely — random
    -init logits are near-tie everywhere, so int8 rounding legitimately
    flips a visible pixel fraction there (trained models separate
    classes by far more than the ~3% quantization noise)."""
    import flax.serialization
    rng = np.random.default_rng(7)
    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.models.segmentation import fcn_resnet50
    from neuralbarkcalculator_tpu.parallel.mesh import make_mesh
    from neuralbarkcalculator_tpu.pipeline.predict import \
        NeuralBarkCalculator
    from neuralbarkcalculator_tpu.pipeline.preprocess import ProcessedImage

    import jax
    model = fcn_resnet50()
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 64, 3), np.float32),
                           train=False)
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda v: v + np.abs(rng.normal(0, 0.05, v.shape)).astype(
                v.dtype), variables["batch_stats"]),
    }
    ckpt = str(tmp_path / "m.msgpack")
    with open(ckpt, "wb") as f:
        f.write(flax.serialization.to_bytes(variables))

    items = [ProcessedImage(
        (rng.random((h, 64, 3)) * 255).astype(np.uint8), f"i{k}.png",
        "sapin") for k, h in enumerate([64, 48, 64, 32])]

    def run(int8):
        config = PredictConfig(model_path=ckpt, batch_size=2,
                               use_bfloat16=False, height_bucket=32,
                               quantize_int8=int8)
        calc = NeuralBarkCalculator(ckpt, mesh=make_mesh(n_data=2),
                                    config=config)
        # yields in bucket order, so key the maps by filename
        maps = {it.fname: (it, m) for it, m in calc.predict_images(items)}
        return calc, maps

    calc, qmaps = run(True)
    assert calc.model.backbone.quantized and not calc._quantize_pending
    assert not hasattr(calc, "_host_variables")  # freed after calibration
    assert len(qmaps) == len(items)
    for item, m in qmaps.values():
        assert m.shape == item.image.shape[:2]
        assert set(np.unique(m)) <= {0, 1, 2}

    _, fmaps = run(False)
    n = sum(m.size for _, m in fmaps.values())
    agree = sum(int((qmaps[k][1] == fmaps[k][1]).sum())
                for k in fmaps) / n
    assert agree > 0.5, agree  # near-tie random logits; see docstring

    # offline int8 checkpoint roundtrip: exporting the calibrated engine's
    # variables and reloading through the engine must reproduce the lazy
    # path's maps bit-for-bit (same quantized params, same programs)
    import jax as _jax
    from neuralbarkcalculator_tpu.models.quantize import (
        is_quantized_checkpoint, save_quantized)
    qpath = str(tmp_path / "m.int8.msgpack")
    save_quantized(qpath, _jax.tree.map(np.asarray, calc.variables))
    assert is_quantized_checkpoint(qpath)
    assert not is_quantized_checkpoint(ckpt)
    config = PredictConfig(model_path=qpath, batch_size=2,
                           use_bfloat16=False, height_bucket=32)
    calc2 = NeuralBarkCalculator(qpath, mesh=make_mesh(n_data=2),
                                 config=config)
    assert calc2.model.backbone.quantized and calc2.model.classifier.quantized
    assert not calc2._quantize_pending  # no first-chunk calibration
    maps2 = {it.fname: m for it, m in calc2.predict_images(items)}
    for k, (_, m) in qmaps.items():
        np.testing.assert_array_equal(maps2[k], m)


def test_quantize_checkpoint_tool(tmp_path):
    """tools/quantize_checkpoint.py: calibrate on a folder of PNGs, write
    an offline int8 checkpoint, load it back."""
    import os
    import sys
    from pathlib import Path

    import flax.serialization
    import jax
    from PIL import Image

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import quantize_checkpoint

    from neuralbarkcalculator_tpu.models.quantize import load_quantized
    from neuralbarkcalculator_tpu.models.segmentation import fcn_resnet50

    rng = np.random.default_rng(11)
    model = fcn_resnet50()
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 64, 3), np.float32),
                           train=False)
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda v: v + np.abs(rng.normal(0, 0.05, v.shape)).astype(
                v.dtype), variables["batch_stats"]),
    }
    ckpt = str(tmp_path / "m.msgpack")
    with open(ckpt, "wb") as f:
        f.write(flax.serialization.to_bytes(variables))
    imgdir = tmp_path / "imgs" / "sapin"
    imgdir.mkdir(parents=True)
    for i in range(3):
        Image.fromarray((rng.random((48, 64, 3)) * 255).astype(
            np.uint8)).save(imgdir / f"c{i}.png")

    out = quantize_checkpoint.main([str(tmp_path / "imgs"),
                                    "--model_path", ckpt, "--n", "2"])
    assert out.endswith(".int8.msgpack") and os.path.exists(out)
    qm, qv = load_quantized(out, "fcn_resnet50")
    assert qm.backbone.quantized
    y = np.asarray(qm.apply(qv, np.zeros((1, 64, 64, 3), np.float32),
                            train=False))
    assert y.shape == (1, 64, 64, 3)


def test_committed_int8_agreement_floor():
    """Gate the COMMITTED benchmarks/int8_agreement.json (VERDICT r4
    item 1c): the int8 engine must agree with bf16 on >= 99.5% of pixels
    on the structured bench folder (measured 99.88% with the checkpoint's
    training normalization), and the mIoU accuracy anchor must be
    meaningful — a model that actually segments (>= 40), with int8
    within 1 mIoU point of bf16. Regenerate with
    tools/int8_agreement.py on TPU if the engine's numerics change."""
    import json
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "int8_agreement.json")
    with open(path) as f:
        rec = json.load(f)
    assert rec["normalization"] == "checkpoint training stats", rec
    assert rec["pixel_agreement_pct"] >= 99.5, rec
    miou = rec["miou_vs_generated_duals"]
    assert miou["bf16_fold"] >= 40.0, miou
    assert abs(miou["bf16_fold"] - miou["int8"]) <= 1.0, miou
