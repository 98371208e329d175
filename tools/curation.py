"""Label-preparation / data-curation utilities (reference C13).

Generalized ports of the reference's one-off scripts (which hardcode the
author's absolute paths; __main__.py:57-123, 440-464) as reusable CLI
subcommands operating on caller-supplied directories:

- ``make-duals``: merge binary bark + node masks into 0/127/255 dual PNGs
  (__main__.py:57-78; bark=127, node=255, node wins on overlap).
- ``fine-tune``: apply remove_small_zones to dual label masks
  (__main__.py:81-107).
- ``adjust``: nearest-resize duals to their sample's size
  (__main__.py:110-123).
- ``fix-image``: shave 1 (bottom) or 2 (top+bottom) rows off an image
  (__main__.py:440-464).

Usage: python tools/curation.py <subcommand> --help
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from neuralbarkcalculator_tpu.config import WOOD_TYPES  # noqa: E402


def _load_gray(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return np.asarray(Image.open(f).convert("L"))


def make_duals(barks_dir: str, nodes_dir: str, duals_dir: str) -> None:
    os.makedirs(duals_dir, exist_ok=True)
    for _, _, fnames in sorted(os.walk(barks_dir)):
        for fname in sorted(fnames):
            bark = _load_gray(os.path.join(barks_dir, fname)) / 255.0
            node = _load_gray(os.path.join(nodes_dir, fname)) / 255.0
            dual = np.zeros(bark.shape, np.uint8)
            dual[bark == 1.0] = 127
            dual[node == 1.0] = 255  # node overrides bark (reference order)
            Image.fromarray(dual, mode="L").save(
                os.path.join(duals_dir, fname.replace("bmp", "png")))


def fine_tune(duals_dir: str, output_dir: str) -> None:
    import jax.numpy as jnp

    from neuralbarkcalculator_tpu.ops.ccl import remove_small_zones

    for wood_type in WOOD_TYPES:
        src = os.path.join(duals_dir, wood_type)
        dst = os.path.join(output_dir, wood_type)
        if not os.path.isdir(src):
            continue
        os.makedirs(dst, exist_ok=True)
        for _, _, fnames in sorted(os.walk(src)):
            for fname in sorted(fnames):
                print(fname)
                # /127 integer classes {0,1,2} (255//127 == 2), as the
                # reference's numpy divide + .long() does
                classes = (_load_gray(os.path.join(src, fname))
                           // 127).astype(np.int32)
                cleaned = np.asarray(remove_small_zones(
                    jnp.asarray(classes))).astype(np.uint8)
                cleaned[cleaned == 1] = 127
                cleaned[cleaned == 2] = 255
                Image.fromarray(cleaned, mode="L").save(
                    os.path.join(dst, fname))


def adjust(duals_folder: str, samples_folder: str, out_folder: str) -> None:
    os.makedirs(out_folder, exist_ok=True)
    for _, _, fnames in sorted(os.walk(duals_folder)):
        for fname in sorted(fnames):
            sample_path = os.path.join(samples_folder,
                                       fname.replace(".png", ".bmp"))
            with open(sample_path, "rb") as f:
                sample_size = Image.open(f).size  # (W, H)
            dual = Image.open(os.path.join(duals_folder, fname))
            # order=0 (nearest) resize to the sample's H, W
            dual = dual.resize(sample_size, resample=Image.NEAREST)
            try:
                dual.convert("L").save(os.path.join(out_folder, fname))
            except ValueError:
                print(fname)


def fix_image(path: str, n_pixels_to_fix: int) -> None:
    with open(path, "rb") as f:
        img = np.asarray(Image.open(f))
    if n_pixels_to_fix == 1:
        img = img[:-1]
    elif n_pixels_to_fix == 2:
        img = img[1:-1]
    else:
        raise ValueError()
    Image.fromarray(img).save(path)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("make-duals")
    p.add_argument("--barks_dir", required=True)
    p.add_argument("--nodes_dir", required=True)
    p.add_argument("--duals_dir", required=True)

    p = sub.add_parser("fine-tune")
    p.add_argument("--duals_dir", required=True)
    p.add_argument("--output_dir", required=True)

    p = sub.add_parser("adjust")
    p.add_argument("--duals_folder", required=True)
    p.add_argument("--samples_folder", required=True)
    p.add_argument("--out_folder", required=True)

    p = sub.add_parser("fix-image")
    p.add_argument("path")
    p.add_argument("--n_pixels", type=int, choices=(1, 2), required=True)

    p = sub.add_parser("preview-augment")
    p.add_argument("--root_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=6)
    p.add_argument("--crop", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)

    args = parser.parse_args()
    if args.cmd == "make-duals":
        make_duals(args.barks_dir, args.nodes_dir, args.duals_dir)
    elif args.cmd == "fine-tune":
        fine_tune(args.duals_dir, args.output_dir)
    elif args.cmd == "adjust":
        adjust(args.duals_folder, args.samples_folder, args.out_folder)
    elif args.cmd == "fix-image":
        fix_image(args.path, args.n_pixels)
    elif args.cmd == "preview-augment":
        preview_augment(args.root_dir, args.out, args.n, args.crop,
                        args.seed)


def preview_augment(root_dir: str, out_path: str, n: int = 6,
                    crop: int = 256, seed: int = 0) -> None:
    """Visual augmentation debugger (reference test_color_jitter,
    __main__.py:126-150, which plt.show()s augmented crops): renders a
    grid of device-augmented sample/label pairs to a PNG instead of an
    interactive window."""
    import jax
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    from neuralbarkcalculator_tpu.data.augment import (augment_batch,
                                                       pad_resize_pair)
    from neuralbarkcalculator_tpu.data.dataset import BarkDataset

    size = max(crop, 512)
    dataset = BarkDataset(
        root_dir, host_transform=lambda s, t: pad_resize_pair(s, t, size))
    n = min(n, len(dataset))
    imgs = np.stack([dataset[i][0] for i in range(n)]).astype(np.float32)
    labs = np.stack([dataset[i][1] for i in range(n)])
    out_imgs, out_labs = augment_batch(
        jax.random.PRNGKey(seed), jnp.asarray(imgs), jnp.asarray(labs),
        crop, jnp.zeros((3,)), jnp.ones((3,)))  # identity normalize
    fig, axs = plt.subplots(2, n, figsize=(3 * n, 6))
    for i in range(n):
        axs[0][i].imshow(np.clip(np.asarray(out_imgs[i]), 0, 1))
        axs[0][i].axis("off")
        axs[1][i].imshow(np.asarray(out_labs[i]), vmax=2)
        axs[1][i].axis("off")
    plt.tight_layout()
    plt.savefig(out_path, dpi=120)
    plt.close(fig)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
