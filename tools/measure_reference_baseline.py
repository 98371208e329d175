"""Measure the reference CPU folder-prediction pipeline on this host.

Reconstructs the reference's per-image predict loop (models.py:247-364)
faithfully in plain torch + scipy + matplotlib (torchvision/poutyne are
not installed; tools/torch_ref.py is a key-compatible replica of the
torchvision model) and times it sequentially at batch_size=1 exactly like
the reference: normalize -> forward -> argmax -> remove_small_zones ->
combined figure -> dual PNG.

Writes benchmarks/reference_baseline.json, the denominator used by
bench.py. Figures render at dpi=100 on both sides of the comparison (the
reference hardcodes 900, models.py:346 — rasterization would dominate and
hide the compute difference).

Usage: python tools/measure_reference_baseline.py [--images N] [--dpi D]
"""
from __future__ import annotations

import argparse
import json
import multiprocessing
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MEAN = np.array([0.7399, 0.6139, 0.4401], np.float32)  # models.py:208
STD = np.array([0.1068, 0.1272, 0.1271], np.float32)  # models.py:209


def remove_small_zones_np(img: np.ndarray) -> np.ndarray:
    """Reference utils.py:135-148 via scipy.ndimage (skimage-equivalent:
    connectivity 2, strict < 150 thresholds, islands->bark write-back)."""
    from scipy import ndimage
    structure = np.ones((3, 3), bool)
    zero = img == 0
    inv = ~zero
    lab, n = ndimage.label(inv, structure=structure)
    sizes = ndimage.sum(inv, lab, range(1, n + 1))
    filled = zero | np.isin(lab, np.nonzero(sizes < 150)[0] + 1)
    lab, n = ndimage.label(filled, structure=structure)
    sizes = ndimage.sum(filled, lab, range(1, n + 1))
    cleaned = filled & ~np.isin(lab, np.nonzero(sizes < 150)[0] + 1)
    out = img.copy()
    out[(~cleaned) & (img == 0)] = 1
    out[cleaned & (img != 0)] = 0
    return out


def render_artifacts(img_u8, class_map, outdir, dpi):
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.patches as mpatches
    import matplotlib.pyplot as plt
    from PIL import Image

    fig, axs = plt.subplots(1, 2)
    patches = []
    for i, ax in enumerate(axs.flatten()):
        im = img_u8 if i == 0 else class_map
        plotted = ax.imshow(im, vmax=2)
        ax.set_title(["Input", "Generated image"][i])
        ax.axis("off")
        if im.ndim == 2:
            patches = [mpatches.Patch(color=plotted.cmap(plotted.norm(v)),
                                      label=f"{v} zone")
                       for v in np.unique(im)]
    fig.legend(handles=patches, title="Classes",
               bbox_to_anchor=(0.4, -0.2, 0.5, 0.5))
    plt.suptitle("Estimated composition percentages")
    plt.tight_layout()
    plt.savefig(os.path.join(outdir, "fig.png"), format="png", dpi=dpi)
    plt.close(fig)
    dual = np.zeros(class_map.shape, np.uint8)
    dual[class_map == 1] = 127
    dual[class_map == 2] = 255
    Image.fromarray(dual, mode="L").save(os.path.join(outdir, "dual.png"))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", type=int, default=3)
    parser.add_argument("--dpi", type=int, default=100)
    parser.add_argument("--content", choices=["structured", "noise"],
                        default="structured",
                        help="structured = bench_data log imagery (the "
                             "bench.py protocol); noise = the round-1 "
                             "uniform-noise protocol")
    parser.add_argument("--ckpt", default=None,
                        help="torchvision-named .pt to load (use "
                             "make_bench_model.py --torch so both sides "
                             "run the same trained weights); default: "
                             "random init")
    parser.add_argument("--stats", default=None,
                        help="JSON with the checkpoint's training "
                             "mean/std (make_bench_model sidecar); "
                             "default: the reference constants")
    args = parser.parse_args()

    global MEAN, STD
    if args.stats:
        with open(args.stats) as f:
            stats = json.load(f)
        MEAN = np.asarray(stats["mean"], np.float32)
        STD = np.asarray(stats["std"], np.float32)

    import torch

    from torch_ref import fcn_resnet50_torch

    torch.set_num_threads(multiprocessing.cpu_count())  # predict.py:78-79
    model = fcn_resnet50_torch()
    if args.ckpt:
        model.load_state_dict(torch.load(args.ckpt, map_location="cpu"))
    model.eval()

    def make_image(rng, h):
        if args.content == "structured":
            from bench_data import structured_dual_mask, structured_image
            return structured_image(rng, structured_dual_mask(rng, h, 1024))
        return (rng.random((h, 1024, 3)) * 120 + 90).astype(np.uint8)

    rng = np.random.default_rng(0)
    outdir = tempfile.mkdtemp(prefix="ref_baseline_")
    heights = [1024, 960, 896]
    times = []
    for i in range(args.images + 1):  # +1 cold image, discarded
        h = heights[i % len(heights)]
        img = make_image(rng, h)
        t0 = time.time()
        x = (img.astype(np.float32) / 255.0 - MEAN) / STD
        with torch.no_grad():
            logits = model(torch.from_numpy(x.transpose(2, 0, 1)[None]))
        out = logits.argmax(1)[0].numpy().astype(np.int32)
        out = remove_small_zones_np(out)
        render_artifacts(img, out, outdir, args.dpi)
        dt = time.time() - t0
        print(f"image {i} ({h}x1024): {dt:.2f} s"
              + (" [cold, discarded]" if i == 0 else ""), flush=True)
        if i > 0:
            times.append(dt)

    result = {
        "sec_per_image": float(np.mean(times)),
        "images_measured": len(times),
        "dpi": args.dpi,
        "host_cpus": multiprocessing.cpu_count(),
        "torch_threads": torch.get_num_threads(),
        "content": args.content,
        "weights": ("trained bench model (" + args.ckpt + ")"
                    if args.ckpt else "random init"),
        "protocol": "sequential batch_size=1 predict loop "
                    "(models.py:247-364): normalize, fcn_resnet50 forward, "
                    "argmax, remove_small_zones, combined figure + dual "
                    "PNG at --dpi",
    }
    os.makedirs(os.path.join(REPO, "benchmarks"), exist_ok=True)
    path = os.path.join(REPO, "benchmarks", "reference_baseline.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", path, "->", json.dumps(result))


if __name__ == "__main__":
    main()
