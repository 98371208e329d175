"""Training CLI (reference __main__.py:467-494 parity).

Usage: ``python -m neuralbarkcalculator_tpu.cli.train ROOT_DIR
[--device] [--seed]``

Reference flow (__main__.py:199-311): dataset at
ROOT_DIR/Images/1024_with_jedi, checkpoints under ROOT_DIR/moar, train
fcn_resnet50(dropout=0.8) for 30 epochs, test, then render the evaluation
report. Additive flags let CI/tests shrink the run and pick the
README-variant recipe (weighted CE + pixel-F1 selection, README.md:66).
"""
from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="TPU-native bark calculator training")
    parser.add_argument("root_dir", type=str, help="root directory path.")
    parser.add_argument("--device", type=str, default="default",
                        choices=["default", "tpu", "cpu", "cuda:0",
                                 "cuda:1"])
    parser.add_argument("--seed", type=int, default=42,
                        help="Which random seed to use.")
    # additive flags (defaults = reference recipe)
    parser.add_argument("--data_dir", type=str, default=None,
                        help="dataset dir (default "
                             "ROOT_DIR/Images/1024_with_jedi, "
                             "__main__.py:200-202)")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--crop_size", type=int, default=None)
    parser.add_argument("--pad_size", type=int, default=None,
                        help="pad_resize target (reference: 1024)")
    parser.add_argument("--samples_factor", type=int, default=None,
                        help="sampler num_samples = len(train) * factor "
                             "(reference: 12)")
    parser.add_argument("--resume", action="store_true", default=False,
                        help="continue from the last epoch checkpoint")
    parser.add_argument("--bf16", action="store_true", default=False,
                        help="run the conv stack in bfloat16 (params stay "
                             "f32); the reference recipe trains f32")
    parser.add_argument("--model", type=str, default="fcn_resnet50")
    parser.add_argument("--backbone_ckpt", type=str, default=None,
                        help="ImageNet backbone init: bare torchvision "
                             "resnet50/101 state_dict (.pth/.pt/.npz) — "
                             "the reference's pretrained=True "
                             "(models.py:127-130)")
    parser.add_argument("--loss", type=str, default=None,
                        choices=["lovasz", "lovasz_hist", "cwe", "mixed",
                                 "jaccard"],
                        help="lovasz = exact sort (reference parity, the "
                             "default); lovasz_hist = sort-free "
                             "histogram TPU fast path (~5x cheaper loss, "
                             "tie-averaged subgradient). An explicit "
                             "choice overrides --tpu-native-recipe")
    parser.add_argument("--tpu-native-recipe", dest="tpu_native_recipe",
                        action="store_true", default=False,
                        help="the measured-fastest training recipe on "
                             "TPU: lovasz_hist (sort-free histogram "
                             "Lovasz, ~exact value, tie-averaged "
                             "subgradient) + bfloat16 conv stack — "
                             "169 -> 111 ms/step at the reference shapes "
                             "(docs/SCALING.md). The remaining gap to "
                             "the conv floor is the dropout layout "
                             "cliff, closed as unfixable on current "
                             "XLA:TPU after three rounds of probes "
                             "(benchmarks/dropout_cliff_r4.json). "
                             "Checkpoints remain fully compatible; "
                             "explicit --loss/--bf16 flags win")
    parser.add_argument("--monitor", type=str, default=None,
                        help="val_miou (code default, __main__.py:241) or "
                             "val_f1 (README-described selection)")
    parser.add_argument("--no_report", action="store_true", default=False,
                        help="skip the per-image evaluation report")
    parser.add_argument("--report_dpi", type=int, default=200)
    parser.add_argument("--mpl", action="store_true", default=False,
                        help="render report figures with matplotlib Agg "
                             "instead of the first-party compositor")
    return parser


def main(args: argparse.Namespace) -> None:
    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    from .predict import _enable_compile_cache
    _enable_compile_cache()

    from ..config import TrainConfig
    from ..train.evaluate import evaluation_report
    from ..train.loop import Experiment

    config = TrainConfig(seed=args.seed)
    if args.epochs is not None:
        config.epochs = args.epochs
    if args.batch_size is not None:
        config.batch_size = args.batch_size
    if args.crop_size is not None:
        config.crop_size = args.crop_size
    if args.pad_size is not None:
        config.pad_resize_size = args.pad_size
    if args.samples_factor is not None:
        config.samples_per_epoch_factor = args.samples_factor
    if args.backbone_ckpt is not None:
        config.backbone_ckpt = args.backbone_ckpt
    if args.tpu_native_recipe:
        # promoted TPU-fast defaults; an explicit --loss choice wins
        config.use_bfloat16 = True
    loss_name = args.loss or (
        "lovasz_hist" if args.tpu_native_recipe else "lovasz")
    if args.bf16:
        config.use_bfloat16 = True

    data_dir = args.data_dir or os.path.join(args.root_dir, "Images",
                                             "1024_with_jedi")
    exp = Experiment(data_dir, os.path.join(args.root_dir, "moar"),
                     config=config, model_name=args.model,
                     loss_name=loss_name, monitor=args.monitor)
    exp.train(resume=args.resume)
    exp.test()
    try:
        exp.load_best()
    except FileNotFoundError:
        pass
    if not args.no_report:
        evaluation_report(exp, args.root_dir, dpi=args.report_dpi,
                          renderer="mpl" if args.mpl else "fast")


if __name__ == "__main__":
    main(build_parser().parse_args())


def entrypoint() -> None:
    """console_scripts entry (pyproject: bark-train)."""
    main(build_parser().parse_args())
