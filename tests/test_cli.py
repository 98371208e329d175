"""CLI argument-surface tests (reference flag compatibility)."""
import pytest


def test_predict_parser_reference_flags():
    from neuralbarkcalculator_tpu.cli.predict import build_parser

    p = build_parser()
    args = p.parse_args(["/some/root"])
    # reference defaults (predict.py:61-80)
    assert args.root_path == "/some/root"
    assert args.exclude_nodes is False
    assert args.only_preprocess is False
    assert args.model_path == "./best_model.pt"

    args = p.parse_args(["/r", "--exclude_nodes", "--only_preprocess",
                         "--device", "cuda:0"])  # accepted for drop-in use
    assert args.exclude_nodes and args.only_preprocess

    with pytest.raises(SystemExit):
        p.parse_args(["/r", "--device", "rocm"])


def test_train_parser_reference_flags():
    from neuralbarkcalculator_tpu.cli.train import build_parser

    p = build_parser()
    args = p.parse_args(["/some/root"])
    assert args.root_dir == "/some/root"
    assert args.seed == 42  # __main__.py:484-487
    assert args.loss is None  # resolves to "lovasz" (reference parity)
    assert args.tpu_native_recipe is False
    args = p.parse_args(["/r", "--seed", "7", "--loss", "cwe",
                         "--monitor", "val_f1"])
    assert args.seed == 7 and args.loss == "cwe"
    args = p.parse_args(["/r", "--tpu-native-recipe"])
    assert args.tpu_native_recipe and args.loss is None


def test_config_defaults_match_reference():
    """Every pinned constant (SURVEY.md §6) in one place."""
    from neuralbarkcalculator_tpu import config as C

    assert C.DEFAULT_MEAN == (0.7399, 0.6139, 0.4401)
    assert C.DEFAULT_STD == (0.1068, 0.1272, 0.1271)
    assert C.DEFAULT_MM_PER_PIXEL == pytest.approx(12.96)
    assert C.CLASS_WEIGHTS == (0.4004, 2.0334, 93.1921)
    assert C.SMALL_ZONE_THRESHOLD == 150  # code wins over README's 100
    assert C.PREPROCESS_TARGET_SIZE == 1024
    assert C.WOOD_TYPES == ("epinette_gelee", "epinette_non_gelee",
                            "sapin")
    t = C.TrainConfig()
    assert (t.lr, t.weight_decay) == (5e-4, 2e-3)
    assert (t.crop_size, t.batch_size, t.epochs) == (512, 5, 30)
    assert t.dropout == 0.8
    assert (t.plateau_factor, t.plateau_patience) == (0.2, 3)
    assert (t.early_stop_min_delta, t.early_stop_patience) == (1e-1, 8)
    assert (t.monitor, t.monitor_mode) == ("val_miou", "max")
    assert t.samples_per_epoch_factor == 12


@pytest.mark.slow
def test_predict_cli_main_end_to_end(tmp_path):
    """Full cli.predict main() on the CPU mesh: scaffold, incremental
    preprocess, predict, artifacts — the same plumbing --watch loops."""
    import flax.serialization
    import jax
    import jax.numpy as jnp
    import numpy as np
    import os
    from PIL import Image

    from neuralbarkcalculator_tpu.cli.predict import build_parser, main
    from neuralbarkcalculator_tpu.models.segmentation import fcn_resnet50

    root = tmp_path / "cliroot"
    d = root / "samples" / "sapin"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    img = (rng.random((96, 64, 3)) * 120 + 90).astype(np.uint8)
    Image.fromarray(img).save(d / "one.bmp")

    model = fcn_resnet50(dropout=0.0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    ckpt = str(tmp_path / "m.msgpack")
    with open(ckpt, "wb") as f:
        f.write(flax.serialization.to_bytes(variables))

    main(build_parser().parse_args(
        [str(root), "--model_path", ckpt, "--dpi", "40",
         "--batch_size", "8", "--float32", "--profile"]))
    assert os.path.isfile(root / "results" / "final_stats.csv")
    assert os.path.isfile(root / "results" / "outputs" / "sapin" /
                          "one.png")
    # second run with --resume is a no-op recompute (watch-mode step)
    main(build_parser().parse_args(
        [str(root), "--model_path", ckpt, "--dpi", "40", "--float32",
         "--resume"]))
    rows = open(root / "results" / "final_stats.csv").read().strip()
    assert len(rows.split("\n")) == 2
