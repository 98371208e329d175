"""Headline benchmark: end-to-end folder prediction throughput.

Measures images/sec/chip for the full predict stage — processed 1024-wide
images -> normalize -> FCN-ResNet50 forward -> argmax -> connected-component
postprocess -> artifacts (combined figure, dual PNG, CSV) — against the
reference's strictly-sequential CPU pipeline (reference models.py:247-364,
batch_size=1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Content realism: the bench folder is *structured* log imagery
(tools/bench_data.py — blobby bark, dark trim bands, node islands,
sub-threshold speckles) and the model is actually *trained* on that
distribution (tools/make_bench_model.py, cached after the first run), so
the content-dependent stages — the host union-find postprocess and the
figure rendering — run over class maps with realistic component
statistics. The warmup pass records predicted-vs-generated component
stats in benchmarks/bench_mask_stats.json.

The baseline denominator is the measured reference-architecture CPU
pipeline on this host (tools/measure_reference_baseline.py --structured,
same content + the same trained weights exported to torch; cached in
benchmarks/reference_baseline.json with provenance). Both sides render
figures at dpi=100 so the comparison measures the compute pipeline, not
matplotlib rasterization settings (the reference hardcodes 900,
models.py:346, which would dominate either side).
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

import numpy as np  # noqa: E402

N_IMAGES = 16
DPI = 100
HEIGHTS = (896, 960, 1024)  # mixed trimmed heights, like real folders
TIMED_PASSES = 3  # report the MEDIAN as the headline (the dev tunnel's
# throughput varies run to run, +-20% observed); the best pass and the
# full per-pass list ship alongside so the spread is on the record


def build_folder(root: str) -> list[np.ndarray]:
    """Structured bench folder; returns the generated dual masks."""
    from PIL import Image

    from bench_data import structured_dual_mask, structured_image

    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "samples", "sapin"), exist_ok=True)
    os.makedirs(os.path.join(root, "processed", "samples", "sapin"),
                exist_ok=True)
    for sub in ("combined_images", "outputs"):
        os.makedirs(os.path.join(root, "results", sub, "sapin"),
                    exist_ok=True)
    masks = []
    for i in range(N_IMAGES):
        h = HEIGHTS[i % len(HEIGHTS)]
        mask = structured_dual_mask(rng, h, 1024)
        img = structured_image(rng, mask)
        masks.append(mask)
        Image.fromarray(img).save(os.path.join(
            root, "processed", "samples", "sapin", f"img{i:02d}.png"))
    return masks


def record_mask_stats(root: str, generated: list[np.ndarray]) -> None:
    """Predicted-vs-generated component statistics -> benchmarks/ (the
    bench-realism proof: the maps the postprocess+figures actually see
    must look like real duals)."""
    from PIL import Image

    from bench_data import component_stats

    def avg(stats_list):
        out = {}
        for cls_key in stats_list[0]:
            out[cls_key] = {
                k: float(np.mean([s[cls_key][k] for s in stats_list]))
                for k in stats_list[0][cls_key]}
        return out

    pred_dir = os.path.join(root, "results", "outputs", "sapin")
    preds = []
    for fname in sorted(os.listdir(pred_dir)):
        dual = np.asarray(Image.open(os.path.join(pred_dir, fname)))
        preds.append(component_stats(
            ((dual == 127) * 1 + (dual == 255) * 2).astype(np.uint8)))
    payload = {
        "generated_duals": avg([component_stats(m) for m in generated]),
        "predicted_class_maps": avg(preds),
        "note": "predicted stats are measured on the warmup pass's dual "
                "PNGs (post remove_small_zones); generated stats are the "
                "synthetic ground truth before postprocess",
    }
    with open(os.path.join(_REPO, "benchmarks",
                           "bench_mask_stats.json"), "w") as f:
        json.dump(payload, f, indent=1)


def make_checkpoint(path: str) -> None:
    """Trained-on-structured-data weights (cached; see module docstring).
    Set NEURALBARK_BENCH_RANDOM=1 to fall back to random init (forward
    cost is identical; postprocess/figure content is not)."""
    if os.environ.get("NEURALBARK_BENCH_RANDOM") == "1":
        import flax.serialization
        import jax
        import jax.numpy as jnp

        from neuralbarkcalculator_tpu.models.segmentation import fcn_resnet50
        model = fcn_resnet50(dropout=0.0)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), train=False)
        with open(path, "wb") as f:
            f.write(flax.serialization.to_bytes(variables))
        return
    from make_bench_model import ensure_bench_model, stats_path

    cached = ensure_bench_model(
        os.environ.get("NEURALBARK_BENCH_MODEL",
                       os.path.join(os.path.expanduser("~"), ".cache",
                                    "neuralbarkcalculator_tpu",
                                    "bench_model.msgpack")))
    import shutil
    shutil.copyfile(cached, path)
    if os.path.isfile(stats_path(cached)):
        shutil.copyfile(stats_path(cached), stats_path(path))


def model_norm_stats(ckpt: str):
    """(mean, std) the checkpoint was trained with, or None (random-init
    fallback keeps the reference constants)."""
    from make_bench_model import stats_path

    if os.path.isfile(stats_path(ckpt)):
        with open(stats_path(ckpt)) as f:
            stats = json.load(f)
        return stats["mean"], stats["std"]
    return None


def _timed_pass(calc, root: str) -> float:
    t0 = time.time()
    calc.predict(root, progress=False)
    return time.time() - t0


def main() -> None:
    # persistent XLA compile cache: cold driver runs pay each program's
    # compile once per container, not once per pass (and the bench-model
    # training reuses the cached train step on any rerun)
    from neuralbarkcalculator_tpu.cli.predict import _enable_compile_cache
    _enable_compile_cache()

    import jax
    import jax.numpy as jnp

    # tunnel warmup: never time the first device->host pull (axon pays a
    # large one-time cost; see .claude/skills/verify/SKILL.md)
    np.asarray(jnp.ones((8, 128)))

    root = tempfile.mkdtemp(prefix="bench_root_")
    generated_masks = build_folder(root)
    ckpt = os.path.join(root, "model.msgpack")
    make_checkpoint(ckpt)

    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.pipeline.predict import NeuralBarkCalculator

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    config = PredictConfig(model_path=ckpt, figure_dpi=DPI,
                           batch_size=batch,
                           prefetch=int(os.environ.get("BENCH_PREFETCH",
                                                       "2")))
    stats = model_norm_stats(ckpt)
    if stats is not None:
        config.mean, config.std = stats
    calc = NeuralBarkCalculator(ckpt, config=config)

    # warmup pass: compiles every bucket step and warms transfer shapes
    calc.predict(root, progress=False)
    try:
        record_mask_stats(root, generated_masks)
    except Exception as e:  # stats are evidence, not the metric
        print(f"bench_mask_stats skipped: {e}", file=sys.stderr)
    # timed passes: best-of-N is the metric (steady-state per-chip
    # throughput on a +-20% run-to-run tunnel), but the median and the
    # per-pass samples ship alongside so BENCH_r* records the spread,
    # not just a best-case sample (VERDICT r3 item 6)
    times = sorted(_timed_pass(calc, root) for _ in range(TIMED_PASSES))
    best_ips = N_IMAGES / times[0]
    median_ips = N_IMAGES / times[len(times) // 2]

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "benchmarks", "reference_baseline.json")
    vs_baseline = vs_baseline_best = None
    if os.path.isfile(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        ref_ips = 1.0 / ref["sec_per_image"]
        # headline = MEDIAN pass (VERDICT r4 item 7: best-of-N on a
        # +-15% tunnel is not the defensible ratio); best kept alongside
        vs_baseline = median_ips / ref_ips
        vs_baseline_best = best_ips / ref_ips

    print(json.dumps({
        "metric": "folder_predict_1024_images_per_sec_per_chip",
        "value": round(median_ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "best": round(best_ips, 3),
        "vs_baseline_best": (round(vs_baseline_best, 2)
                             if vs_baseline_best else None),
        "passes": [round(N_IMAGES / t, 3) for t in times],
    }))


if __name__ == "__main__":
    main()
