"""Offline int8 checkpoint export (models/quantize.py).

Calibrates post-training quantization on a handful of representative
processed images and writes an offline int8 checkpoint (QCKPT_MAGIC +
quantized params, ~4x smaller than f32) that the predict engine and the
serving CLI load directly — no batch_stats, no BN folding, no
first-chunk calibration at startup::

    python tools/quantize_checkpoint.py IMAGES_DIR \
        --model_path best_model.msgpack --out best_model.int8.msgpack
    python -m neuralbarkcalculator_tpu.cli.predict ROOT \
        --model_path best_model.int8.msgpack

IMAGES_DIR is searched recursively for processed PNGs (point it at a
ROOT/processed/samples tree or any folder of representative inputs).
No reference equivalent; the int8 mode is opt-in and approximate
(docs/SCALING.md, benchmarks/int8_step.json).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMAGE_EXTS = (".png", ".bmp", ".jpg", ".jpeg")


def find_images(root: str, limit: int) -> list[str]:
    paths = []
    for dirpath, _, fnames in sorted(os.walk(root)):
        for fname in sorted(fnames):
            if fname.lower().endswith(IMAGE_EXTS):
                paths.append(os.path.join(dirpath, fname))
    if not paths:
        raise SystemExit(f"no images under {root!r} (looked for "
                         f"{'/'.join(IMAGE_EXTS)})")
    # spread the picks across the folder rather than taking the head
    step = max(1, len(paths) // limit)
    return paths[::step][:limit]


def main(argv=None) -> str:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("images", help="directory of representative processed "
                                   "images (searched recursively)")
    ap.add_argument("--model_path", required=True,
                    help=".pt / .msgpack / orbax checkpoint to quantize")
    ap.add_argument("--model", default="fcn_resnet50",
                    help="model factory name (must match the checkpoint)")
    ap.add_argument("--out", default=None,
                    help="output path (default: <model_path>.int8.msgpack)")
    ap.add_argument("--n", type=int, default=4,
                    help="calibration images (max-abs saturates fast; "
                         "4 is plenty)")
    ap.add_argument("--mean", default=None,
                    help="normalization mean, comma-separated (default: "
                         "the reference constants)")
    ap.add_argument("--std", default=None)
    args = ap.parse_args(argv)

    from PIL import Image

    from neuralbarkcalculator_tpu import config as cfg
    from neuralbarkcalculator_tpu.models.quantize import (quantize_model,
                                                          save_quantized)
    from neuralbarkcalculator_tpu.models.segmentation import MODEL_FACTORIES
    from neuralbarkcalculator_tpu.pipeline.predict import _load_variables

    mean = np.asarray([float(v) for v in args.mean.split(",")]
                      if args.mean else cfg.DEFAULT_MEAN, np.float32)
    std = np.asarray([float(v) for v in args.std.split(",")]
                     if args.std else cfg.DEFAULT_STD, np.float32)

    model = MODEL_FACTORIES[args.model]()
    variables = _load_variables(args.model_path, args.model)

    batches = []
    for path in find_images(args.images, args.n):
        img = np.asarray(Image.open(path).convert("RGB"), np.float32)
        batches.append(((img / 255.0 - mean) / std)[None])
        print(f"calibrating on {path} {batches[-1].shape}", file=sys.stderr)

    qmodel, qvars = quantize_model(model, variables, batches)
    out = args.out or os.path.splitext(args.model_path)[0] + ".int8.msgpack"
    save_quantized(out, qvars)
    print(f"wrote {out} ({os.path.getsize(out) / 1e6:.1f} MB, "
          f"{type(qmodel.classifier).__name__})", file=sys.stderr)
    return out


if __name__ == "__main__":
    main()
