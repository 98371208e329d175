"""End-to-end BMP-folder -> final_stats.csv benchmark (fused pipeline).

VERDICT r3 item 4's deliverable: one published 4096^2-BMP -> CSV img/s
number for the FULL production pipeline — native BMP decode ->
preprocess (resize 1024^2 + trim) -> predict engine -> native
postprocess -> artifacts + CSV — comparing the sequential
two-stage path (preprocess fully, then predict) against the fused
streaming path (cli.predict's default: preprocess chunks stream
straight into the predict pump), on the same folder and weights.

Writes benchmarks/e2e_pipeline.json.
Run: python tools/e2e_pipeline_bench.py [--images 8] [--passes 2]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

SRC = 4096
DPI = 100


def build_folder(root: str, n: int) -> None:
    from PIL import Image

    from bench_data import structured_dual_mask, structured_image

    rng = np.random.default_rng(0)
    d = os.path.join(root, "samples", "sapin")
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        img = structured_image(rng, structured_dual_mask(rng, 1024, 1024))
        big = np.repeat(np.repeat(img, SRC // 1024, 0), SRC // 1024, 1)
        big[:300] = 0
        big[-200:] = 0
        Image.fromarray(big).save(os.path.join(d, f"img{i:02d}.bmp"))


def reset_outputs(root: str) -> None:
    for sub in ("processed", "results"):
        shutil.rmtree(os.path.join(root, sub), ignore_errors=True)
    os.makedirs(os.path.join(root, "processed", "samples", "sapin"))
    for sub in ("combined_images", "outputs"):
        os.makedirs(os.path.join(root, "results", sub, "sapin"))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--model_path", default=os.path.expanduser(
        "~/.cache/neuralbarkcalculator_tpu/bench_model.msgpack"))
    args = ap.parse_args()

    import jax

    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.pipeline.predict import \
        NeuralBarkCalculator
    from neuralbarkcalculator_tpu.pipeline.preprocess import Preprocessor

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    np.asarray(jax.numpy.ones((8, 128)))

    root = tempfile.mkdtemp(prefix="e2e_bench_")
    build_folder(root, args.images)

    import make_bench_model
    stats = None
    sp = make_bench_model.stats_path(args.model_path)
    if os.path.isfile(sp):
        with open(sp) as f:
            s = json.load(f)
        stats = (s["mean"], s["std"])

    config = PredictConfig(model_path=args.model_path, figure_dpi=DPI)
    if stats:
        config.mean, config.std = stats
    calc = NeuralBarkCalculator(args.model_path, config=config)
    pre = Preprocessor()  # auto backend, like the CLI default

    def run_sequential() -> float:
        reset_outputs(root)
        t0 = time.perf_counter()
        images = pre.preprocess_images(root, progress=False)
        calc.predict(root, images=images, progress=False)
        return time.perf_counter() - t0

    def run_streaming() -> float:
        reset_outputs(root)
        t0 = time.perf_counter()
        calc.predict_streaming(root, pre.preprocess_stream(root),
                               total=args.images, progress=False)
        return time.perf_counter() - t0

    # warmup pass compiles every program + warms transfer shapes.
    # Passes INTERLEAVE the two variants so slow tunnel drift hits both
    # sides equally, and the headline is the MEDIAN pass with the full
    # spread on the record (VERDICT r4 item 3: round-4's best-of-2 with
    # overlapping pass distributions could not establish a direction).
    run_streaming()
    seq, stream = [], []
    for _ in range(args.passes):
        seq.append(run_sequential())
        stream.append(run_streaming())

    med_seq = sorted(seq)[len(seq) // 2]
    med_stream = sorted(stream)[len(stream) // 2]
    result = {
        "tool": "tools/e2e_pipeline_bench.py",
        "protocol": f"{args.images}x {SRC}^2 BMP -> native decode -> "
                    f"preprocess (resize 1024^2 + trim) -> predict -> "
                    f"postprocess -> figures(dpi={DPI}) + duals + CSV; "
                    f"median of {args.passes} interleaved timed passes "
                    f"after warmup (spread recorded)",
        "backend": jax.default_backend(),
        "host_cpus": os.cpu_count(),
        "sequential_sec_per_image": round(med_seq / args.images, 3),
        "streaming_sec_per_image": round(med_stream / args.images, 3),
        "sequential_img_per_sec": round(args.images / med_seq, 3),
        "streaming_img_per_sec": round(args.images / med_stream, 3),
        "fusion_speedup": round(med_seq / med_stream, 2),
        "passes_sequential_s": [round(t, 2) for t in seq],
        "passes_streaming_s": [round(t, 2) for t in stream],
    }
    path = os.path.join(REPO, "benchmarks", "e2e_pipeline.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
