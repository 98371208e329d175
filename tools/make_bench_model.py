"""Train the bench model: a seeded quick fit on structured bark data.

bench.py's headline metric includes the host-side connected-component
postprocess and figure rendering, whose cost depends on the *content* of
the predicted class maps. Random weights on noise produce unrepresentative
maps, so the bench uses a model actually trained (deterministically
seeded, ~a minute on one TPU chip) to segment the structured log images
from tools/bench_data.py — its predictions then carry realistic component
statistics (validated against the generated duals in
benchmarks/bench_mask_stats.json).

The trained checkpoint is cached (default
``~/.cache/neuralbarkcalculator_tpu/bench_model.msgpack``) so repeat bench
runs skip training; delete it to retrain.

Usage:
  python tools/make_bench_model.py [--out PATH.msgpack] [--torch OUT.pt]
"""
from __future__ import annotations

import contextlib
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

DEFAULT_CACHE = os.path.join(
    os.path.expanduser("~"), ".cache", "neuralbarkcalculator_tpu",
    "bench_model.msgpack")

TRAIN_SIZE = 256  # training images are small: it's a texture task
N_PER_TYPE = 6
MIN_TRAIN_MIOU = 55.0  # sanity floor: the classes are color-separable


def build_training_set(root: str, seed: int = 7) -> None:
    from PIL import Image

    from bench_data import structured_dual_mask, structured_image

    rng = np.random.default_rng(seed)
    for wood_type in ("epinette_gelee", "epinette_non_gelee", "sapin"):
        sdir = os.path.join(root, "samples", wood_type)
        ddir = os.path.join(root, "duals", wood_type)
        os.makedirs(sdir, exist_ok=True)
        os.makedirs(ddir, exist_ok=True)
        for i in range(N_PER_TYPE):
            mask = structured_dual_mask(rng, TRAIN_SIZE, TRAIN_SIZE)
            img = structured_image(rng, mask)
            Image.fromarray(img).save(
                os.path.join(sdir, f"img{i}.bmp"))
            dual = np.zeros(mask.shape, np.uint8)
            dual[mask == 1] = 127
            dual[mask == 2] = 255
            Image.fromarray(dual, mode="L").save(
                os.path.join(ddir, f"img{i}.png"))


def train_bench_model(out_path: str, epochs: int = 4) -> str:
    """Train and export the bench checkpoint; returns the msgpack path.

    Training output goes to stderr so callers (bench.py) keep a clean
    stdout.
    """
    import tempfile

    from neuralbarkcalculator_tpu.cli.predict import _enable_compile_cache
    from neuralbarkcalculator_tpu.config import TrainConfig
    from neuralbarkcalculator_tpu.train.loop import Experiment

    _enable_compile_cache()

    data_root = tempfile.mkdtemp(prefix="bench_train_data_")
    build_training_set(data_root)
    config = TrainConfig(seed=7, crop_size=128, batch_size=4,
                         epochs=epochs, samples_per_epoch_factor=4,
                         pad_resize_size=TRAIN_SIZE, dropout=0.1)
    ckpt_dir = tempfile.mkdtemp(prefix="bench_train_ck_")
    with contextlib.redirect_stdout(sys.stderr):
        exp = Experiment(data_root, ckpt_dir, config=config)
        history = exp.train()
        miou = history[-1].miou
        print(f"bench model: final train miou {miou:.1f}", flush=True)
        if miou < MIN_TRAIN_MIOU:
            raise RuntimeError(
                f"bench model failed to fit the structured data "
                f"(train miou {miou:.1f} < {MIN_TRAIN_MIOU}) — the bench "
                f"class maps would be unrepresentative")
        import flax.serialization
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "wb") as f:
            f.write(flax.serialization.to_bytes(exp.variables))
        # inference must normalize with the TRAINING stats, not the
        # reference wood constants (config.DEFAULT_MEAN/STD) — the
        # synthetic palette is different
        import json
        with open(stats_path(out_path), "w") as f:
            json.dump({"mean": exp.mean, "std": exp.std,
                       "train_miou": miou}, f)
    return out_path


def stats_path(msgpack_path: str) -> str:
    return msgpack_path + ".stats.json"


def ensure_bench_model(path: str = DEFAULT_CACHE) -> str:
    """Return a trained bench checkpoint path, training it if absent."""
    if os.path.isfile(path):
        return path
    return train_bench_model(path)


def export_torch(msgpack_path: str, out_pt: str) -> None:
    import torch

    from neuralbarkcalculator_tpu.models.convert import (
        variables_to_torch_state_dict)
    from neuralbarkcalculator_tpu.pipeline.predict import _load_variables

    variables = _load_variables(msgpack_path, "fcn_resnet50")
    state = {k: torch.from_numpy(v.copy()) for k, v in
             variables_to_torch_state_dict(variables).items()}
    torch.save(state, out_pt)


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default=DEFAULT_CACHE)
    parser.add_argument("--torch", default=None,
                        help="also export a torchvision-named .pt (for "
                             "tools/measure_reference_baseline.py)")
    parser.add_argument("--epochs", type=int, default=4)
    parser.add_argument("--force", action="store_true")
    args = parser.parse_args()

    if args.force or not os.path.isfile(args.out):
        train_bench_model(args.out, epochs=args.epochs)
    print(f"bench model at {args.out}")
    if args.torch:
        export_torch(args.out, args.torch)
        print(f"torch export at {args.torch}")


if __name__ == "__main__":
    main()
