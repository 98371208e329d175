"""Training harness tests on a tiny synthetic dataset (CPU mesh).

Covers: Experiment construction (stats, splits, device-resident data),
the fused gather+augment+train step (loss decreases / stays finite,
params update), checkpointing + best export -> predict engine loading,
plateau/early-stop controllers, torch-Adam parity, and the evaluation
report artifacts.
"""
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    """10 images per wood type, 64x64, with duals (0/127/255)."""
    root = tmp_path_factory.mktemp("trainroot")
    rng = np.random.default_rng(3)
    for wood_type in ("epinette_gelee", "epinette_non_gelee", "sapin"):
        sdir = root / "samples" / wood_type
        ddir = root / "duals" / wood_type
        sdir.mkdir(parents=True)
        ddir.mkdir(parents=True)
        for i in range(10):
            img = (rng.random((64, 64, 3)) * 200 + 30).astype(np.uint8)
            Image.fromarray(img).save(sdir / f"img{i}.bmp")
            dual = rng.choice([0, 127, 255], size=(64, 64),
                              p=[0.6, 0.35, 0.05]).astype(np.uint8)
            Image.fromarray(dual, mode="L").save(ddir / f"img{i}.png")
    return str(root)


@pytest.fixture(scope="module")
def experiment(data_root, tmp_path_factory):
    from neuralbarkcalculator_tpu.config import TrainConfig
    from neuralbarkcalculator_tpu.parallel.mesh import make_mesh
    from neuralbarkcalculator_tpu.train.loop import Experiment

    config = TrainConfig(seed=42, crop_size=32, batch_size=4, epochs=2,
                         samples_per_epoch_factor=1, pad_resize_size=64,
                         dropout=0.1)
    ckpt_dir = str(tmp_path_factory.mktemp("ckpts"))
    return Experiment(data_root, ckpt_dir, config=config,
                      mesh=make_mesh(n_data=2))


def test_splits_and_stats(experiment):
    # 10 per type: ceil(8) train / floor(1) valid / 1 test, stratified
    assert len(experiment.train_split) == 24
    assert len(experiment.valid_split) == 3
    assert len(experiment.test_split) == 3
    assert len(set(experiment.train_split) | set(experiment.valid_split)
               | set(experiment.test_split)) == 30
    assert np.isclose(experiment.train_weights.sum(), 1.0)
    assert all(0 < m < 1 for m in experiment.mean)
    assert experiment.pos_weight[0] < experiment.pos_weight[1] < \
        experiment.pos_weight[2]  # inverse frequency ordering


@pytest.mark.slow
def test_train_runs_and_checkpoints(experiment):
    import jax

    p0 = jax.tree.map(np.asarray, experiment.state.params)
    history = experiment.train(epochs=2)
    assert len(history) == 2
    for log in history:
        assert np.isfinite(log.loss) and np.isfinite(log.val_miou)
    p1 = jax.tree.map(np.asarray, experiment.state.params)
    changed = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(a - b).max()), p0, p1))
    assert max(changed) > 0  # params actually moved

    assert experiment.ckpts.best_epoch in (1, 2)
    assert experiment.ckpts.last_epoch == 2

    # reload an epoch checkpoint
    experiment.load_checkpoint(1)
    experiment.load_best()

    metrics = experiment.test()
    assert np.isfinite(metrics["loss"])


def test_best_model_loads_in_predict_engine(experiment, tmp_path):
    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.parallel.mesh import make_mesh
    from neuralbarkcalculator_tpu.pipeline.predict import NeuralBarkCalculator
    from neuralbarkcalculator_tpu.pipeline.preprocess import ProcessedImage

    path = experiment.ckpts.export_best_model(experiment.variables)
    config = PredictConfig(model_path=path, batch_size=2,
                           use_bfloat16=False, height_bucket=32)
    calc = NeuralBarkCalculator(path, mesh=make_mesh(n_data=2),
                                config=config)
    img = ProcessedImage(
        np.full((48, 64, 3), 128, np.uint8), "x.png", "sapin")
    outs = list(calc.predict_images([img]))
    assert outs[0][1].shape == (48, 64)


@pytest.mark.slow
def test_evaluation_report(experiment, tmp_path):
    from neuralbarkcalculator_tpu.train.evaluate import evaluation_report

    root_dir = str(tmp_path / "reportroot")
    csv_file = evaluation_report(experiment, root_dir, dpi=40)
    rows = [line.split("\t") for line in
            open(csv_file).read().strip().split("\n")]
    assert len(rows) == 31  # header + 30 images
    assert len(rows[0]) == 15 and all(len(r) == 15 for r in rows[1:])
    # artifacts exist in per-split folders
    fname, wood_type, split = rows[1][0], rows[1][1], rows[1][2]
    base = os.path.join(root_dir, "Images", "results", "moar")
    assert os.path.isfile(os.path.join(base, "combined_images", wood_type,
                                       split, fname))
    assert os.path.isfile(os.path.join(base, "outputs", wood_type, split,
                                       fname))


def test_adam_torch_parity():
    """Our optax chain must match torch.optim.Adam(lr, weight_decay)."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.train.optim import adam

    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    g = np.array([0.1, 0.2, -0.3], np.float32)

    p = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.Adam([p], lr=5e-4, weight_decay=2e-3)
    for _ in range(3):
        opt.zero_grad()
        p.grad = torch.tensor(g)
        opt.step()
    want = p.detach().numpy()

    tx = adam(5e-4, 2e-3)
    params = jnp.asarray(w0)
    state = tx.init(params)
    for _ in range(3):
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = params + updates
    np.testing.assert_allclose(np.asarray(params), want, rtol=1e-6,
                               atol=1e-7)


def test_plateau_and_early_stop():
    from neuralbarkcalculator_tpu.train.optim import (EarlyStopping,
                                                      ReduceLROnPlateau)

    plateau = ReduceLROnPlateau(mode="max", factor=0.2, patience=3,
                                threshold=1e-1, threshold_mode="abs")
    lr = 5e-4
    # improving: no reduction
    for m in (0.5, 0.7, 0.9):
        lr = plateau.step(m, lr)
    assert lr == 5e-4
    # stagnating: reduce after patience+1 bad epochs
    for m in (0.91, 0.92, 0.93):
        lr = plateau.step(m, lr)
    assert lr == 5e-4
    lr = plateau.step(0.94, lr)
    assert np.isclose(lr, 1e-4)

    early = EarlyStopping(mode="max", min_delta=1e-1, patience=3,
                          verbose=False)
    assert not early.step(0.5, 1)
    assert not early.step(0.55, 2)  # < min_delta improvement
    assert not early.step(0.56, 3)
    assert early.step(0.57, 4)


@pytest.mark.slow
def test_prioritized_sampler_training(data_root, tmp_path):
    """Optional prioritized-replay sampler (reference utils.py:354-456)
    trains end to end and updates its weights."""
    from neuralbarkcalculator_tpu.config import TrainConfig
    from neuralbarkcalculator_tpu.parallel.mesh import make_mesh
    from neuralbarkcalculator_tpu.train.loop import Experiment

    config = TrainConfig(seed=1, crop_size=32, batch_size=4, epochs=1,
                         samples_per_epoch_factor=1, pad_resize_size=64,
                         dropout=0.1)
    exp = Experiment(data_root, str(tmp_path / "ck"), config=config,
                     mesh=make_mesh(n_data=2), sampler="prioritized")
    history = exp.train(epochs=1)
    assert len(history) == 1 and np.isfinite(history[0].loss)


@pytest.mark.slow
def test_training_resume(data_root, tmp_path):
    """Interrupted training resumes with optimizer state + scheduler
    history intact and continues from the next epoch."""
    from neuralbarkcalculator_tpu.config import TrainConfig
    from neuralbarkcalculator_tpu.parallel.mesh import make_mesh
    from neuralbarkcalculator_tpu.train.loop import Experiment

    config = TrainConfig(seed=7, crop_size=32, batch_size=4, epochs=3,
                         samples_per_epoch_factor=1, pad_resize_size=64,
                         dropout=0.1)
    ckpt_dir = str(tmp_path / "ck")
    exp = Experiment(data_root, ckpt_dir, config=config,
                     mesh=make_mesh(n_data=2))
    exp.train(epochs=2)
    assert exp.ckpts.last_epoch == 2

    # fresh process simulation: new Experiment over the same directory
    exp2 = Experiment(data_root, ckpt_dir, config=config,
                      mesh=make_mesh(n_data=2))
    history = exp2.train(epochs=3, resume=True)
    assert [h.epoch for h in history] == [3]
    assert exp2.ckpts.last_epoch == 3
    assert len(exp2.ckpts.log["epochs"]) == 3


@pytest.mark.slow
def test_host_resident_data_mode(data_root, tmp_path):
    """device_resident_data=False streams batches host->device per step;
    training must behave identically in structure (finite metrics,
    checkpoints)."""
    from neuralbarkcalculator_tpu.config import TrainConfig
    from neuralbarkcalculator_tpu.parallel.mesh import make_mesh
    from neuralbarkcalculator_tpu.train.loop import Experiment

    config = TrainConfig(seed=5, crop_size=32, batch_size=4, epochs=1,
                         samples_per_epoch_factor=1, pad_resize_size=64,
                         dropout=0.1, device_resident_data=False)
    exp = Experiment(data_root, str(tmp_path / "ck"), config=config,
                     mesh=make_mesh(n_data=2))
    assert isinstance(exp.images, np.ndarray)  # stayed on host
    history = exp.train(epochs=1)
    assert np.isfinite(history[0].loss) and np.isfinite(history[0].val_miou)


def test_compute_mean_std_matches_torch_formula():
    """Reference compute_mean_std (utils.py:23-39): per-image channel
    mean / unbiased std over pixels, averaged over images."""
    torch = pytest.importorskip("torch")
    from neuralbarkcalculator_tpu.train.loop import (compute_mean_std,
                                                     compute_pos_weight)

    rng = np.random.default_rng(0)
    imgs = (rng.random((4, 16, 16, 3)) * 255).astype(np.uint8)

    want_mean = torch.zeros(3)
    want_std = torch.zeros(3)
    for im in imgs:
        t = torch.tensor(im.transpose(2, 0, 1), dtype=torch.float64) / 255
        flat = t.reshape(1, 3, -1)
        want_mean += flat.mean(2).sum(0)
        want_std += flat.std(2).sum(0)
    want_mean /= len(imgs)
    want_std /= len(imgs)

    mean, std = compute_mean_std(imgs)
    np.testing.assert_allclose(mean, want_mean.numpy(), rtol=1e-6)
    np.testing.assert_allclose(std, want_std.numpy(), rtol=1e-6)

    labels = rng.choice([0, 1, 2], size=(4, 16, 16), p=[.7, .2, .1])
    pw = compute_pos_weight(labels)
    counts = np.bincount(labels.reshape(-1), minlength=3)
    np.testing.assert_allclose(pw, counts.sum() / (3.0 * counts))


def test_profiling_utils(capsys):
    from neuralbarkcalculator_tpu.utils import profiling

    profiling.report(reset=True)
    with profiling.stage_timer("unit/a"):
        pass
    with profiling.stage_timer("unit/a"):
        pass
    rep = profiling.report()
    assert rep["unit/a"]["calls"] == 2
    profiling.print_report(reset=True)
    assert "unit/a" in capsys.readouterr().out
    assert profiling.report() == {}


@pytest.mark.slow
def test_experiment_with_deeplab_model(data_root, tmp_path):
    """Model-zoo selection: deeplab factories take no dropout kwarg
    (Experiment inspects the signature)."""
    from neuralbarkcalculator_tpu.config import TrainConfig
    from neuralbarkcalculator_tpu.parallel.mesh import make_mesh
    from neuralbarkcalculator_tpu.train.loop import Experiment

    config = TrainConfig(seed=2, crop_size=32, batch_size=4, epochs=1,
                         samples_per_epoch_factor=1, pad_resize_size=64)
    exp = Experiment(data_root, str(tmp_path / "ck"), config=config,
                     mesh=make_mesh(n_data=2),
                     model_name="deeplabv3_resnet50")
    history = exp.train(epochs=1)
    assert np.isfinite(history[0].loss)


@pytest.mark.slow
def test_evaluate_exact_across_meshes(data_root, tmp_path):
    """Padded eval batches must not bias metrics: evaluate() returns
    identical results on a (1,1) and a (4,1) mesh for a split size
    coprime to the batch size (last batch = 3 real samples, padded by 1
    on the 4-device mesh; padding is masked out inside the eval step)."""
    from neuralbarkcalculator_tpu.config import TrainConfig
    from neuralbarkcalculator_tpu.parallel.mesh import make_mesh
    from neuralbarkcalculator_tpu.train.loop import Experiment

    config = TrainConfig(seed=11, crop_size=32, batch_size=4, epochs=1,
                         samples_per_epoch_factor=1, pad_resize_size=64,
                         dropout=0.1)
    exp1 = Experiment(data_root, str(tmp_path / "a"), config=config,
                      mesh=make_mesh(n_data=1))
    exp4 = Experiment(data_root, str(tmp_path / "b"), config=config,
                      mesh=make_mesh(n_data=4))
    split = exp1.train_split[:7]  # same split: same seed on both
    np.testing.assert_array_equal(split, exp4.train_split[:7])
    m1 = exp1.evaluate(split, batch_size=4)
    m4 = exp4.evaluate(split, batch_size=4)
    for k in ("loss", "miou", "f1"):
        np.testing.assert_allclose(m1[k], m4[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)


@pytest.mark.slow
def test_experiment_starts_from_backbone_ckpt(data_root, tmp_path):
    """TrainConfig.backbone_ckpt: the Experiment's initial backbone params
    are the converted ImageNet weights (reference pretrained=True,
    __main__.py:231), while the head stays freshly initialized."""
    torch = pytest.importorskip("torch")
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from torch_ref import fcn_resnet50_torch

    from neuralbarkcalculator_tpu.config import TrainConfig
    from neuralbarkcalculator_tpu.parallel.mesh import make_mesh
    from neuralbarkcalculator_tpu.train.loop import Experiment

    torch.manual_seed(3)
    replica = fcn_resnet50_torch()
    bare = dict(replica.backbone.state_dict())
    path = str(tmp_path / "imagenet_resnet50.pth")
    torch.save(bare, path)

    config = TrainConfig(seed=5, crop_size=32, batch_size=4, epochs=1,
                         samples_per_epoch_factor=1, pad_resize_size=64,
                         dropout=0.1, backbone_ckpt=path)
    exp = Experiment(data_root, str(tmp_path / "ck"), config=config,
                     mesh=make_mesh(n_data=2))
    got = np.asarray(
        exp.state.params["backbone"]["conv1"]["kernel"])
    want = bare["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=0)
    # and it trains from there
    history = exp.train(epochs=1)
    assert np.isfinite(history[0].loss)
