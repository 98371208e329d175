"""Post-training per-image evaluation report (reference __main__.py:294-437).

Renders, for every image across train/valid/test splits, a 3-panel
Input/Target/Generated figure with per-class IoU/F1 suptitle, the dual
mask PNG, and a 15-column tab-delimited final_stats.csv, under
``root_dir/Images/results/moar/...`` exactly like the reference
(generate_output_folders, __main__.py:30-54).

Reference quirk preserved: the eval loop calls remove_small_zones on the
*logits* tensor (__main__.py:324) — on float logits the (img == 0) masks
are empty, making it a no-op — so metrics and figures here use the raw
argmax (no postprocess), unlike predict's argmax-first postprocess
(models.py:270-271). PixelWiseF1 still postprocesses internally
(utils.py:211-219).
"""
from __future__ import annotations

import csv
import os
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLASS_NAMES, NUM_CLASSES, WOOD_TYPES
from ..data.dataset import save_image_u8
from ..ops.metrics import (confusion_matrix, iou_from_confusion,
                           pixelwise_f1)

EVAL_CSV_HEADER = [
    "Name", "Type", "Split", "iou_nothing", "iou_bark", "iou_node",
    "iou_mean", "f1_nothing", "f1_bark", "f1_node", "f1_mean",
    "Output Bark %", "Output Node %", "Target Bark %", "Target Node %",
]


def generate_output_folders(root_dir: str) -> str:
    """Reference generate_output_folders parity (__main__.py:30-54)."""
    results_dir = os.path.join(root_dir, "Images", "results", "moar")
    for folder in ("combined_images", "outputs"):
        for wood_type in WOOD_TYPES:
            for child in ("train", "valid", "test"):
                os.makedirs(os.path.join(results_dir, folder, wood_type,
                                         child), exist_ok=True)
    return results_dir


@jax.jit
def _eval_image_metrics(logits, target):
    """Per-image metrics on device: per-class IoU x100 (raw argmax — see
    module docstring) and PixelWiseF1 x100 (postprocessed internally)."""
    preds = jnp.argmax(logits, axis=-1)
    cm = confusion_matrix(preds, target, NUM_CLASSES)
    return {"iou": iou_from_confusion(cm),
            "f1": pixelwise_f1(logits, target) * 100.0,
            "preds": preds.astype(jnp.uint8)}


def render_eval_image(input_img, target, preds, fname, wood_type, split,
                      ious, f1s, results_dir, dpi: int = 200,
                      renderer: str = "fast") -> list[str]:
    """One image's figure + dual PNG; returns its CSV row. ``renderer``
    as in pipeline/report.py: 'fast' = first-party compositor, 'mpl' =
    matplotlib Agg (reference byte-style)."""
    names = ["Input", "Target", "Generated image"]
    values = np.unique(preds.ravel())

    row = [fname, wood_type, split]
    suptitle = "Mean iou : {:.3f}\n".format(float(np.mean(ious)))
    for c, c_acc in zip(CLASS_NAMES, ious):
        suptitle += "{} : {:.3f};  ".format("iou_" + c, c_acc)
        row.append("{:.3f}".format(c_acc))
    row.append("{:.3f}".format(float(np.mean(ious))))
    suptitle += "\nMean f1 : {:.3f}\n".format(float(np.mean(f1s)))
    for c, c_f1 in zip(CLASS_NAMES, f1s):
        suptitle += "{} : {:.3f};  ".format("f1_" + c, c_f1)
        row.append("{:.3f}".format(c_f1))
    row.append("{:.3f}".format(float(np.mean(f1s))))
    for class_idx in (1, 2):
        row.append("{:.5f}".format(100.0 * float(np.mean(
            preds == class_idx))))
    for class_idx in (1, 2):
        row.append("{:.5f}".format(100.0 * float(np.mean(
            target == class_idx))))

    fig_path = os.path.join(results_dir, "combined_images", wood_type,
                            split, fname)
    if renderer == "fast":
        from ..pipeline.compositor import render_figure_fast
        render_figure_fast((input_img, target, preds), names,
                           suptitle.rstrip("\n"),
                           [int(v) for v in values], fig_path, dpi)
    else:
        _render_eval_mpl(input_img, target, preds, names, values,
                         suptitle, fig_path, dpi)

    dual = np.zeros(preds.shape, np.uint8)
    dual[preds == 1] = 127
    dual[preds == 2] = 255
    save_image_u8(os.path.join(results_dir, "outputs", wood_type, split,
                               fname), dual)
    return row


def _render_eval_mpl(input_img, target, preds, names, values, suptitle,
                     fig_path, dpi):
    """matplotlib Agg 3-panel eval figure (lazy import; thread-safe
    object-oriented Figure API — pyplot's global state is not)."""
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.patches as mpatches
    from matplotlib.figure import Figure

    from ..pipeline.report import display_subsample

    imgs = [display_subsample(x, dpi) for x in (input_img, target, preds)]
    fig = Figure()
    axs = fig.subplots(1, 3)
    patches = []
    for i, ax in enumerate(axs.flatten()):
        img = imgs[i]
        plotted = ax.imshow(img, vmax=2)
        ax.set_title(names[i])
        ax.axis("off")
        if img.ndim == 2:
            patches = [
                mpatches.Patch(color=plotted.cmap(plotted.norm(v)),
                               label="{} zone".format(CLASS_NAMES[v]))
                for v in values
            ]
    fig.legend(handles=patches, title="Classes",
               bbox_to_anchor=(0.4, -0.2, 0.5, 0.5))
    fig.suptitle(suptitle)
    try:
        fig.tight_layout()
    except Exception:
        pass
    fig.savefig(fig_path, format="png", dpi=dpi)


def evaluation_report(experiment, root_dir: str, dpi: int = 200,
                      workers: int = 8, renderer: str = "fast") -> str:
    """Render the full report over all splits with the experiment's current
    weights (reference runs it on load_checkpoint(11), __main__.py:298).

    Uses the experiment's HBM-resident dataset; the forward runs per image
    at the padded training size — matching the reference's use of the
    pad_resize'd dataset for evaluation (test_dataset, __main__.py:210-216).
    """
    results_dir = generate_output_folders(root_dir)
    split_of = {}
    for idxs, name in [(experiment.train_split, "train"),
                       (experiment.valid_split, "valid"),
                       (experiment.test_split, "test")]:
        for i in idxs:
            split_of[int(i)] = name

    mean = np.asarray(experiment.mean, np.float32)
    std = np.asarray(experiment.std, np.float32)
    model = experiment.model
    variables = experiment.variables

    @jax.jit
    def forward(batch_u8):
        x = (batch_u8.astype(jnp.float32) / 255.0 - mean) / std
        return model.apply(variables, x, train=False)

    n = len(experiment.fnames)
    batch = 8  # images per device forward (all pad_resize'd alike);
    # metrics stay per-image (each is a tiny device program)
    rows: list[list[str]] = []
    with ThreadPoolExecutor(max_workers=workers) as pool:
        futures = []
        for start in range(0, n, batch):
            idxs = list(range(start, min(n, start + batch)))
            # works for both HBM-resident and host-resident datasets
            imgs = [np.asarray(experiment.images[i]) for i in idxs]
            stack = np.stack(imgs)
            if len(idxs) < batch:  # pad the tail chunk: one compiled
                # program shape instead of a ~30 s remainder recompile
                pad = np.repeat(stack[-1:], batch - len(idxs), axis=0)
                stack = np.concatenate([stack, pad], axis=0)
            logits = forward(jnp.asarray(stack))
            for k, i in enumerate(idxs):
                target = np.asarray(experiment.labels[i]).astype(np.int32)
                m = _eval_image_metrics(logits[k], jnp.asarray(target))
                futures.append(pool.submit(
                    render_eval_image, imgs[k], target,
                    np.asarray(m["preds"]), experiment.fnames[i],
                    experiment.wood_types[i], split_of[i],
                    np.asarray(m["iou"]), np.asarray(m["f1"]),
                    results_dir, dpi, renderer))
        rows = [f.result() for f in futures]

    csv_file = os.path.join(results_dir, "final_stats.csv")
    with open(csv_file, "w") as f:
        writer = csv.writer(f, delimiter="\t")
        writer.writerow(EVAL_CSV_HEADER)
        writer.writerows(rows)
    return csv_file
