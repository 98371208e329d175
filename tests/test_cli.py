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
    assert args.loss == "lovasz"
    args = p.parse_args(["/r", "--seed", "7", "--loss", "cwe",
                         "--monitor", "val_f1"])
    assert args.seed == 7 and args.loss == "cwe"


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
