"""End-to-end pipeline tests: folders, preprocess, batched predict, report.

Runs the real surfaces on the virtual CPU mesh with small synthetic wood
images. The predict parity test is the important one: the batched, bucketed,
mesh-sharded engine must reproduce, pixel-exactly, what per-image unpadded
execution (= reference semantics, models.py:263-276) produces.
"""
import os

import numpy as np
import pytest
from PIL import Image


def _wood_image(h, w, dark_top=0, dark_bottom=0, seed=0):
    """Synthetic log: texture with dark bands (below trim threshold)."""
    rng = np.random.default_rng(seed)
    img = (rng.random((h, w, 3)) * 120 + 90).astype(np.uint8)
    if dark_top:
        img[:dark_top] = 0
    if dark_bottom:
        img[-dark_bottom:] = 0
    return img


@pytest.fixture()
def root(tmp_path):
    root = tmp_path / "rootdir"
    for wood_type, specs in {
        "sapin": [("a.bmp", 192, 192, 32, 32), ("b.bmp", 256, 160, 0, 0)],
        "epinette_gelee": [("c.bmp", 192, 192, 16, 48)],
    }.items():
        d = root / "samples" / wood_type
        d.mkdir(parents=True)
        for i, (name, h, w, dt, db) in enumerate(specs):
            Image.fromarray(_wood_image(h, w, dt, db, seed=i)).save(d / name)
    return str(root)


def test_generate_folders(root):
    from neuralbarkcalculator_tpu.pipeline.folders import generate_folders

    types = generate_folders(root, only_preprocess=False)
    assert types == ["epinette_gelee", "sapin"]
    assert os.path.isdir(os.path.join(root, "processed", "samples", "sapin"))
    assert os.path.isdir(
        os.path.join(root, "results", "combined_images", "epinette_gelee"))
    assert not os.path.isdir(
        os.path.join(root, "results", "outputs", "epinette_non_gelee"))


def test_preprocess(root):
    from neuralbarkcalculator_tpu.pipeline.folders import generate_folders
    from neuralbarkcalculator_tpu.pipeline.preprocess import Preprocessor

    generate_folders(root, only_preprocess=True)
    images = Preprocessor().preprocess_images(root, progress=False)
    by_name = {im.fname: im for im in images}
    # a.bmp: square -> trimmed to the lit 128 rows
    assert by_name["a.png"].image.shape == (128, 192, 3)
    # b.bmp: non-square, <= target: untouched
    assert by_name["b.png"].image.shape == (256, 160, 3)
    # c.bmp: square -> trimmed 192-16-48 = 128
    assert by_name["c.png"].image.shape == (128, 192, 3)
    # PNGs written and identical to returned arrays
    p = os.path.join(root, "processed", "samples", "sapin", "a.png")
    on_disk = np.asarray(Image.open(p))
    np.testing.assert_array_equal(on_disk, by_name["a.png"].image)
    # manifest order preserved (epinette before sapin)
    assert [im.fname for im in images] == ["c.png", "a.png", "b.png"]


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    """Random-weights flax msgpack checkpoint (predict loads all formats)."""
    import flax.serialization
    import jax
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.models.segmentation import fcn_resnet50

    model = fcn_resnet50(dropout=0.0)
    variables = model.init(jax.random.PRNGKey(7),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    path = tmp_path_factory.mktemp("ckpt") / "model.msgpack"
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(variables))
    return str(path), model, variables


def test_predict_end_to_end(root, checkpoint):
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.ops.ccl import remove_small_zones
    from neuralbarkcalculator_tpu.parallel.mesh import make_mesh
    from neuralbarkcalculator_tpu.pipeline.folders import generate_folders
    from neuralbarkcalculator_tpu.pipeline.predict import NeuralBarkCalculator
    from neuralbarkcalculator_tpu.pipeline.preprocess import Preprocessor

    ckpt_path, model, variables = checkpoint
    generate_folders(root, only_preprocess=False)
    images = Preprocessor().preprocess_images(root, progress=False)

    config = PredictConfig(model_path=ckpt_path, batch_size=2,
                           use_bfloat16=False, figure_dpi=50)
    calc = NeuralBarkCalculator(ckpt_path, mesh=make_mesh(n_data=2),
                                config=config)
    csv_path = calc.predict(root, images=images, progress=False)

    # ---- artifacts
    assert os.path.isfile(csv_path)
    rows = [line.split("\t") for line in
            open(csv_path).read().strip().split("\n")]
    assert rows[0] == ["Name", "Type", "Image Size", "Output Bark %",
                       "Bark area (mm^2)", "Output Node %",
                       "Node area (mm^2)"]
    assert len(rows) == 4 and all(len(r) == 6 for r in rows[1:])
    for wood_type, fname in [("epinette_gelee", "c.png"), ("sapin", "a.png"),
                             ("sapin", "b.png")]:
        assert os.path.isfile(os.path.join(
            root, "results", "combined_images", wood_type, fname))
        assert os.path.isfile(os.path.join(
            root, "results", "outputs", wood_type, fname))

    # ---- pixel parity: batched+bucketed+padded engine == per-image run
    mean = np.asarray(config.mean, np.float32)
    std = np.asarray(config.std, np.float32)
    for item, got in calc.predict_images(images):
        x = (item.image.astype(np.float32) / 255.0 - mean) / std
        logits = model.apply(variables, jnp.asarray(x[None]), train=False)
        want = np.asarray(remove_small_zones(
            jnp.argmax(logits, axis=-1)[0]))
        np.testing.assert_array_equal(got, want.astype(np.uint8))

    # ---- dual PNG encodes {0,127,255} of the same map
    dual = np.asarray(Image.open(os.path.join(
        root, "results", "outputs", "sapin", "b.png")))
    assert set(np.unique(dual)).issubset({0, 127, 255})

    # ---- CSV percentages recompute from the dual mask
    name_to_row = {r[0]: r for r in rows[1:]}
    bark_pct = float(name_to_row["b.png"][2])
    assert abs(bark_pct - 100.0 * np.mean(dual == 127)) < 1e-3


def test_predict_resume(root, checkpoint, tmp_path):
    """Interrupted-run resume: existing artifacts are not recomputed, CSV
    is complete and in dataset order (SURVEY.md §5.3)."""
    import csv as csvmod

    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.parallel.mesh import make_mesh
    from neuralbarkcalculator_tpu.pipeline.folders import generate_folders
    from neuralbarkcalculator_tpu.pipeline.predict import NeuralBarkCalculator
    from neuralbarkcalculator_tpu.pipeline.preprocess import Preprocessor

    ckpt_path, _, _ = checkpoint
    generate_folders(root, only_preprocess=False)
    images = Preprocessor().preprocess_images(root, progress=False)
    config = PredictConfig(model_path=ckpt_path, batch_size=2,
                           use_bfloat16=False, figure_dpi=40)
    calc = NeuralBarkCalculator(ckpt_path, mesh=make_mesh(n_data=2),
                                config=config)

    # full run, snapshot csv + one dual artifact's mtime
    csv_path = calc.predict(root, images=images, progress=False)
    full_rows = list(csvmod.reader(open(csv_path), delimiter="\t"))
    dual_path = os.path.join(root, "results", "outputs", "sapin", "a.png")
    mtime = os.path.getmtime(dual_path)

    # delete one artifact pair; resume run recomputes only that image
    os.remove(os.path.join(root, "results", "outputs", "sapin", "b.png"))
    csv_path = calc.predict(root, images=images, progress=False,
                            resume=True)
    resumed_rows = list(csvmod.reader(open(csv_path), delimiter="\t"))
    assert resumed_rows == full_rows
    assert os.path.getmtime(dual_path) == mtime  # untouched artifact
    assert os.path.isfile(
        os.path.join(root, "results", "outputs", "sapin", "b.png"))
    # CSV rows follow dataset (manifest) order
    assert [r[0] for r in resumed_rows[1:]] == ["c.png", "a.png", "b.png"]


def test_exclude_nodes(root, checkpoint):
    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.parallel.mesh import make_mesh
    from neuralbarkcalculator_tpu.pipeline.predict import NeuralBarkCalculator
    from neuralbarkcalculator_tpu.pipeline.preprocess import Preprocessor
    from neuralbarkcalculator_tpu.pipeline.folders import generate_folders

    ckpt_path, _, _ = checkpoint
    generate_folders(root, only_preprocess=True)
    images = Preprocessor().preprocess_images(root, save=False,
                                              progress=False)
    config = PredictConfig(model_path=ckpt_path, batch_size=2,
                           use_bfloat16=False)
    calc = NeuralBarkCalculator(ckpt_path, mesh=make_mesh(n_data=2),
                                config=config)
    for _, cmap in calc.predict_images(images[:1], exclude_nodes=True):
        assert not np.any(cmap == 2)


def test_predict_streaming_from_disk(root, checkpoint):
    """The streaming (no preloaded images) path must produce the same CSV
    as the in-memory path and the same artifacts."""
    import csv as csvmod

    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.parallel.mesh import make_mesh
    from neuralbarkcalculator_tpu.pipeline.folders import generate_folders
    from neuralbarkcalculator_tpu.pipeline.predict import NeuralBarkCalculator
    from neuralbarkcalculator_tpu.pipeline.preprocess import Preprocessor

    ckpt_path, _, _ = checkpoint
    generate_folders(root, only_preprocess=False)
    images = Preprocessor().preprocess_images(root, progress=False)
    config = PredictConfig(model_path=ckpt_path, batch_size=2,
                           use_bfloat16=False, figure_dpi=40)
    calc = NeuralBarkCalculator(ckpt_path, mesh=make_mesh(n_data=2),
                                config=config)
    csv_mem = calc.predict(root, images=images, progress=False)
    rows_mem = list(csvmod.reader(open(csv_mem), delimiter="\t"))

    csv_stream = calc.predict(root, progress=False)  # images=None
    rows_stream = list(csvmod.reader(open(csv_stream), delimiter="\t"))
    assert rows_stream == rows_mem
    # streaming + resume combination
    os.remove(os.path.join(root, "results", "outputs", "sapin", "a.png"))
    csv_resume = calc.predict(root, progress=False, resume=True)
    assert list(csvmod.reader(open(csv_resume), delimiter="\t")) == rows_mem


@pytest.mark.slow
def test_predict_equivalent_across_meshes(root, checkpoint):
    """Ragged bucketed inference must give identical class maps on a
    (1,1) mesh and a (2,2) spatially-partitioned mesh (GSPMD width
    sharding + row masks composed)."""
    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.parallel.mesh import make_mesh
    from neuralbarkcalculator_tpu.pipeline.folders import generate_folders
    from neuralbarkcalculator_tpu.pipeline.predict import NeuralBarkCalculator
    from neuralbarkcalculator_tpu.pipeline.preprocess import Preprocessor

    ckpt_path, _, _ = checkpoint
    generate_folders(root, only_preprocess=True)
    images = Preprocessor().preprocess_images(root, save=False,
                                              progress=False)
    config = PredictConfig(model_path=ckpt_path, batch_size=4,
                           use_bfloat16=False)
    maps = {}
    for name, mesh in [("single", make_mesh(n_data=1, n_model=1)),
                       ("2x2", make_mesh(n_data=2, n_model=2))]:
        calc = NeuralBarkCalculator(ckpt_path, mesh=mesh, config=config)
        maps[name] = {item.fname: m for item, m in
                      calc.predict_images(images)}
    for fname in maps["single"]:
        np.testing.assert_array_equal(maps["single"][fname],
                                      maps["2x2"][fname])


@pytest.mark.slow
def test_pallas_sharded_matches_unfused(root, checkpoint):
    """The fused upsample+argmax kernel under shard_map (interpret mode
    on the CPU mesh) must reproduce the unfused XLA path exactly on a
    multi-device mesh — VERDICT r2 #3: no silent regression to the
    logits-materializing path when n_devices > 1."""
    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.parallel.mesh import make_mesh
    from neuralbarkcalculator_tpu.pipeline.folders import generate_folders
    from neuralbarkcalculator_tpu.pipeline.predict import NeuralBarkCalculator
    from neuralbarkcalculator_tpu.pipeline.preprocess import Preprocessor

    ckpt_path, _, _ = checkpoint
    generate_folders(root, only_preprocess=True)
    images = Preprocessor().preprocess_images(root, save=False,
                                              progress=False)
    maps = {}
    for name, use_pallas in [("fused", True), ("unfused", False)]:
        config = PredictConfig(model_path=ckpt_path, batch_size=2,
                               use_bfloat16=False, use_pallas=use_pallas,
                               pallas_interpret=use_pallas)
        calc = NeuralBarkCalculator(ckpt_path,
                                    mesh=make_mesh(n_data=2, n_model=2),
                                    config=config)
        maps[name] = {item.fname: m for item, m in
                      calc.predict_images(images)}
    assert maps["fused"].keys() == maps["unfused"].keys()
    for fname in maps["fused"]:
        np.testing.assert_array_equal(maps["fused"][fname],
                                      maps["unfused"][fname])


@pytest.mark.slow
def test_ccl_fallback_warns(checkpoint, monkeypatch):
    """When the native library is unavailable, the device-CCL fallback
    must warn about its ~100x cost (VERDICT r2 #7)."""
    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.pipeline import predict as predict_mod
    from neuralbarkcalculator_tpu.pipeline.predict import NeuralBarkCalculator

    ckpt_path, _, _ = checkpoint
    calc = NeuralBarkCalculator(
        ckpt_path, config=PredictConfig(model_path=ckpt_path))
    monkeypatch.setattr(predict_mod, "remove_small_zones_host",
                        lambda *a, **k: None)
    preds = np.zeros((1, 16, 16), np.uint8)
    with pytest.warns(RuntimeWarning, match="libbarkio"):
        out = calc._postprocess(preds, np.array([16], np.int32),
                                exclude_nodes=False)
    assert out.shape == preds.shape


def test_missing_checkpoint_clear_error(tmp_path):
    from neuralbarkcalculator_tpu.pipeline.predict import NeuralBarkCalculator

    with pytest.raises(FileNotFoundError, match="best_model.pt"):
        NeuralBarkCalculator(str(tmp_path / "nope.msgpack"))


def test_preprocess_resume_incremental(root):
    """Incremental preprocess (serving mode): only new images processed."""
    from neuralbarkcalculator_tpu.pipeline.folders import generate_folders
    from neuralbarkcalculator_tpu.pipeline.preprocess import Preprocessor

    generate_folders(root, only_preprocess=True)
    p = Preprocessor()
    first = p.preprocess_images(root, progress=False)
    assert len(first) == 3
    # nothing new -> nothing processed
    assert p.preprocess_images(root, progress=False, resume=True) == []
    # add one image -> only it is processed
    Image.fromarray(_wood_image(192, 192, 8, 8, seed=9)).save(
        os.path.join(root, "samples", "sapin", "new.bmp"))
    second = p.preprocess_images(root, progress=False, resume=True)
    assert [im.fname for im in second] == ["new.png"]
    assert os.path.isfile(os.path.join(root, "processed", "samples",
                                       "sapin", "new.png"))


def test_preprocess_host_backend_matches_device(root):
    """backend='host' (scipy-IIR spline + host trim, the tunnel-avoiding
    path) must match the device pipeline: identical trim decisions and
    u8 outputs equal up to 1 LSB of quantization on a vanishing fraction
    of pixels (f32 IIR vs f64-operator matmul rounding)."""
    from neuralbarkcalculator_tpu.pipeline.folders import generate_folders
    from neuralbarkcalculator_tpu.pipeline.preprocess import Preprocessor

    generate_folders(root, only_preprocess=True)
    # target below the image sizes so the resize path runs too
    dev = Preprocessor(target_size=96, backend="device").preprocess_images(
        root, progress=False, save=False)
    host = Preprocessor(target_size=96, backend="host").preprocess_images(
        root, progress=False, save=False)
    assert len(dev) == len(host) and len(dev) == 3
    for d, h in zip(dev, host):
        assert d.fname == h.fname
        assert d.image.shape == h.image.shape  # same trim decisions
        diff = np.abs(d.image.astype(np.int16) - h.image.astype(np.int16))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 1e-3


def test_preprocess_backend_env_override(root, monkeypatch):
    from neuralbarkcalculator_tpu.pipeline.preprocess import Preprocessor

    monkeypatch.setenv("NEURALBARK_PREPROCESS", "host")
    p = Preprocessor(backend="auto")
    assert p._resolve_backend() == "host"
    monkeypatch.setenv("NEURALBARK_PREPROCESS", "device")
    assert Preprocessor(backend="auto")._resolve_backend() == "device"


def test_pipelined_upload_matches_sequential(checkpoint):
    """The single-device pipelined group-upload path in _run_chunks
    (decode/upload overlap: the chunk uploads as two device_put groups
    concatenated on device) is bit-equal to the simple whole-chunk path
    (batch_size=1 never meets the len>=4 gate)."""
    import numpy as np
    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.parallel.mesh import make_mesh
    from neuralbarkcalculator_tpu.pipeline.predict import NeuralBarkCalculator
    from neuralbarkcalculator_tpu.pipeline.preprocess import ProcessedImage

    ckpt_path, _, _ = checkpoint
    rng = np.random.default_rng(5)
    # four images land in the 64-bucket (one chunk, pipelined), one in 32
    items = [ProcessedImage(
        (rng.random((h, 64, 3)) * 255).astype(np.uint8), f"i{k}.png",
        "sapin") for k, h in enumerate([64, 48, 62, 40, 32])]
    maps = {}
    for bs in (5, 1):
        config = PredictConfig(model_path=ckpt_path, batch_size=bs,
                               use_bfloat16=False, height_bucket=32)
        calc = NeuralBarkCalculator(
            ckpt_path, mesh=make_mesh(n_data=1, n_model=1), config=config)
        maps[bs] = {item.fname: m for item, m in
                    calc.predict_images(items)}
    assert maps[5].keys() == maps[1].keys()
    for fname in maps[5]:
        np.testing.assert_array_equal(maps[5][fname], maps[1][fname])


def test_predict_odd_width_unpacked(checkpoint):
    """Widths not divisible by 4 skip the 2-bit packed pull and still
    produce correct maps through the unpacked path."""
    import numpy as np
    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.parallel.mesh import make_mesh
    from neuralbarkcalculator_tpu.pipeline.predict import NeuralBarkCalculator
    from neuralbarkcalculator_tpu.pipeline.preprocess import ProcessedImage

    ckpt_path, _, _ = checkpoint
    config = PredictConfig(model_path=ckpt_path, batch_size=2,
                           use_bfloat16=False, height_bucket=32)
    calc = NeuralBarkCalculator(ckpt_path, mesh=make_mesh(n_data=2),
                                config=config)
    rng = np.random.default_rng(3)
    items = [ProcessedImage(
        (rng.random((48, w, 3)) * 255).astype(np.uint8), f"i{k}.png",
        "sapin") for k, w in enumerate([66, 66])]
    outs = list(calc.predict_images(items))
    assert len(outs) == 2
    for item, cmap in outs:
        assert cmap.shape == (48, 66) and cmap.dtype == np.uint8
        assert set(np.unique(cmap)).issubset({0, 1, 2})


def test_predict_prefetch_saturating_pool_completes(checkpoint, tmp_path):
    """prefetch >= the pump pool size must not deadlock: pump tasks used
    to submit their pipelined device_put subtasks to the same 8-worker
    pool, so 8 in-flight pump tasks blocked forever on subtasks queued
    behind them. The uploads now go to a dedicated pool; this drives the
    exact trigger (single-device mesh, pipelined uploads, chunks of >= 4,
    prefetch 8, > 8 chunks) through a tiny model under a watchdog."""
    import threading

    import flax.serialization
    import jax
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.models.heads import FCNHead
    from neuralbarkcalculator_tpu.models.resnet import DilatedResNet
    from neuralbarkcalculator_tpu.models.segmentation import (
        MODEL_FACTORIES, SegmentationModel)
    from neuralbarkcalculator_tpu.parallel.mesh import make_mesh
    from neuralbarkcalculator_tpu.pipeline.predict import NeuralBarkCalculator
    from neuralbarkcalculator_tpu.pipeline.preprocess import ProcessedImage

    def tiny(dtype=jnp.float32):
        # 4 stages of one block: the engine's ragged machinery assumes
        # the production output stride 8 (pad_h // 8 row operators)
        return SegmentationModel(
            backbone=DilatedResNet(stage_sizes=(1, 1, 1, 1), dtype=dtype),
            classifier=FCNHead(3, dropout=0.0, dtype=dtype))

    MODEL_FACTORIES["_tiny_test"] = tiny
    try:
        variables = tiny().init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 32, 32, 3)), train=False)
        ckpt = str(tmp_path / "tiny.msgpack")
        with open(ckpt, "wb") as f:
            f.write(flax.serialization.to_bytes(variables))

        rng = np.random.default_rng(11)
        # 36 same-height images, batch 4 -> 9 chunks of exactly 4
        items = [ProcessedImage(
            (rng.random((32, 32, 3)) * 255).astype(np.uint8),
            f"i{k}.png", "sapin") for k in range(36)]
        config = PredictConfig(model_path=ckpt, batch_size=4,
                               use_bfloat16=False, height_bucket=32,
                               prefetch=8, pipelined_uploads=True)
        calc = NeuralBarkCalculator(ckpt, mesh=make_mesh(n_data=1),
                                    config=config, model_name="_tiny_test")

        got = []
        err = []

        def run():
            try:
                got.extend(m for _, m in calc.predict_images(items))
            except BaseException as e:  # surfaces in the assert below
                err.append(e)

        t = threading.Thread(target=run, daemon=True)
        t.start()
        t.join(timeout=240)
        assert not t.is_alive(), "predict deadlocked with prefetch=8"
        assert not err, err
        assert len(got) == 36
    finally:
        MODEL_FACTORIES.pop("_tiny_test", None)
