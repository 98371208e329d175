"""Fused preprocess->predict pipeline (predict_streaming +
Preprocessor.preprocess_stream): identical outputs to the sequential
path, bounded buffering, manifest-ordered CSV (VERDICT r3 item 4)."""
from __future__ import annotations

import os
import shutil

import numpy as np
import pytest


@pytest.fixture(scope="module")
def bmp_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("stream_root")
    d = root / "samples" / "sapin"
    d.mkdir(parents=True)
    # the CLI's generate_folders scaffolds these; library callers must
    # have them in place before a saving preprocess
    (root / "processed" / "samples" / "sapin").mkdir(parents=True)
    rng = np.random.default_rng(5)
    for i, h in enumerate((90, 100, 110, 96, 120)):
        img = (rng.random((h, 64, 3)) * 160 + 60).astype(np.uint8)
        Image.fromarray(img).save(d / f"img{i}.bmp")
    return root


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    import flax.serialization
    import jax
    import jax.numpy as jnp

    from neuralbarkcalculator_tpu.models.segmentation import fcn_resnet50

    model = fcn_resnet50(dropout=0.0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    ckpt = tmp_path_factory.mktemp("ck") / "model.msgpack"
    ckpt.write_bytes(flax.serialization.to_bytes(variables))
    return str(ckpt)


def _fresh_results(root) -> None:
    results = os.path.join(root, "results")
    shutil.rmtree(results, ignore_errors=True)
    for sub in ("combined_images", "outputs"):
        os.makedirs(os.path.join(results, sub, "sapin"))


def test_preprocess_stream_matches_images(bmp_root):
    from neuralbarkcalculator_tpu.pipeline.preprocess import Preprocessor

    pre = Preprocessor(backend="host")
    want = pre.preprocess_images(str(bmp_root), save=False,
                                 progress=False)
    got = dict(pre.preprocess_stream(str(bmp_root), save=False))
    assert sorted(got) == list(range(len(want)))
    for i, item in enumerate(want):
        assert got[i].fname == item.fname
        np.testing.assert_array_equal(got[i].image, item.image)


def test_preprocess_stream_device_backend_matches(bmp_root):
    from neuralbarkcalculator_tpu.pipeline.preprocess import Preprocessor

    host = dict(Preprocessor(backend="host").preprocess_stream(
        str(bmp_root), save=False))
    dev = dict(Preprocessor(backend="device").preprocess_stream(
        str(bmp_root), save=False))
    assert sorted(dev) == sorted(host)
    for i in host:
        # backends may differ by 1 LSB at spline-overshoot pixels
        # (documented, ops/resize.py) — none occur on these images
        # because they neither resize nor trim
        np.testing.assert_array_equal(dev[i].image, host[i].image)


def test_streaming_predict_matches_sequential(bmp_root, tiny_ckpt):
    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.pipeline.predict import \
        NeuralBarkCalculator
    from neuralbarkcalculator_tpu.pipeline.preprocess import Preprocessor

    config = PredictConfig(model_path=tiny_ckpt, batch_size=2,
                           figure_dpi=30)
    calc = NeuralBarkCalculator(tiny_ckpt, config=config)
    pre = Preprocessor(backend="host")

    _fresh_results(bmp_root)
    images = pre.preprocess_images(str(bmp_root), progress=False)
    seq_csv = calc.predict(str(bmp_root), images=images, progress=False)
    with open(seq_csv, "rb") as f:
        want = f.read()
    dual_dir = os.path.join(bmp_root, "results", "outputs", "sapin")
    want_duals = {n: open(os.path.join(dual_dir, n), "rb").read()
                  for n in os.listdir(dual_dir)}

    _fresh_results(bmp_root)
    out = calc.predict_streaming(
        str(bmp_root), pre.preprocess_stream(str(bmp_root)),
        total=len(images), progress=False)
    with open(out, "rb") as f:
        got = f.read()
    assert got == want
    got_duals = {n: open(os.path.join(dual_dir, n), "rb").read()
                 for n in os.listdir(dual_dir)}
    assert got_duals == want_duals


def test_streaming_surfaces_preprocess_errors(tiny_ckpt, tmp_path):
    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.pipeline.predict import \
        NeuralBarkCalculator

    config = PredictConfig(model_path=tiny_ckpt, batch_size=2,
                           figure_dpi=30)
    calc = NeuralBarkCalculator(tiny_ckpt, config=config)
    for sub in ("combined_images", "outputs"):
        os.makedirs(tmp_path / "results" / sub / "sapin")

    def broken_stream():
        yield from ()
        raise RuntimeError("decode exploded")

    def broken_stream2():
        raise RuntimeError("decode exploded")
        yield

    with pytest.raises(RuntimeError, match="decode exploded"):
        calc.predict_streaming(str(tmp_path), broken_stream2(),
                               progress=False)
