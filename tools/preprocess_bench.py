"""Preprocess-stage benchmark with a transfer roofline proof.

BASELINE config 1 (SURVEY.md §3.5): 4096x4096 BMP -> decode -> cubic
resize to 1024^2 -> dark-band trim -> PNG. Three measurements:

1. the reference CPU path (PIL decode + scipy map_coordinates resize, the
   exact skimage semantics, sequential 1 thread — models.py:191-203);
2. this framework's *device* backend (uint8 upload + MXU-matmul resize);
3. this framework's *host* backend (scipy-IIR + 4-tap spline, identical
   math, zero device traffic).

For the device backend it also measures the host->device bandwidth and
computes the transfer roofline (bytes moved / bandwidth): on a
tunnel-bound environment the device path's wall time should match the
roofline, proving the stage is transfer-bound, not compute-bound — and
the auto backend picks the host path there instead.

Writes benchmarks/preprocess.json. Run on the bench host:
    python tools/preprocess_bench.py [--images 4]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

SRC = 4096
TARGET = 1024


def build_folder(root: str, n: int) -> None:
    from PIL import Image

    from bench_data import structured_dual_mask, structured_image

    rng = np.random.default_rng(0)
    d = os.path.join(root, "samples", "sapin")
    os.makedirs(d, exist_ok=True)
    os.makedirs(os.path.join(root, "processed", "samples", "sapin"),
                exist_ok=True)
    for i in range(n):
        # structured content at 1024, upscaled to 4096 (generating at
        # 4096 directly is minutes of host time; resize input content
        # doesn't change the measured work)
        img = structured_image(rng,
                               structured_dual_mask(rng, TARGET, TARGET))
        big = np.repeat(np.repeat(img, SRC // TARGET, 0), SRC // TARGET, 1)
        # dark bands so the trim stage has real work
        big[:300] = 0
        big[-200:] = 0
        Image.fromarray(big).save(os.path.join(d, f"img{i:02d}.bmp"))


def measure_reference(root: str, n: int) -> float:
    """Reference host preprocess (models.py:191-203): PIL decode, scipy
    cubic spline resize (what skimage routes to), trim, PIL PNG encode —
    sequential, single image at a time."""
    from PIL import Image
    from scipy.ndimage import map_coordinates, spline_filter

    d = os.path.join(root, "samples", "sapin")
    out = tempfile.mkdtemp(prefix="ref_pre_")
    files = sorted(os.listdir(d))[:n]
    times = []
    for i, fname in enumerate(files):
        t0 = time.time()
        with open(os.path.join(d, fname), "rb") as f:
            img = np.asarray(Image.open(f).convert("RGB"),
                             dtype=np.float32) / 255.0
        coords = np.meshgrid(
            (np.arange(TARGET) + 0.5) * (SRC / TARGET) - 0.5,
            (np.arange(TARGET) + 0.5) * (SRC / TARGET) - 0.5,
            indexing="ij")
        resized = np.stack([
            map_coordinates(spline_filter(img[..., c], order=3,
                                          mode="mirror"),
                            coords, order=3, prefilter=False,
                            mode="mirror") for c in range(3)], axis=-1)
        resized = np.clip(resized, img.min(), img.max())
        nonblack = resized.sum(-1) > 1e-3
        keep = nonblack.mean(-1) > 0.85
        first = int(np.argmax(keep))
        last = len(keep) - int(np.argmax(keep[::-1]))
        resized = resized[first:last]
        u8 = np.rint(np.clip(resized, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(u8).save(os.path.join(out, fname + ".png"))
        times.append(time.time() - t0)
        print(f"reference image {i}: {times[-1]:.2f}s", file=sys.stderr)
    return float(np.mean(times))


def measure_backend(root: str, backend: str, n: int) -> float:
    import shutil

    from neuralbarkcalculator_tpu.pipeline.preprocess import Preprocessor

    processed = os.path.join(root, "processed")
    best = float("inf")
    for _ in range(2):  # warm (compiles/caches) + timed
        shutil.rmtree(processed, ignore_errors=True)
        os.makedirs(os.path.join(processed, "samples", "sapin"))
        pre = Preprocessor(backend=backend)
        t0 = time.time()
        images = pre.preprocess_images(root, progress=False)
        dt = time.time() - t0
        assert len(images) == n
        best = min(best, dt)
    return best / n


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--images", type=int, default=4)
    parser.add_argument("--skip-reference", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    np.asarray(jnp.ones((8, 128)))  # warm the device->host path

    from neuralbarkcalculator_tpu.pipeline.preprocess import (
        measure_transfer_bandwidth)

    root = tempfile.mkdtemp(prefix="pre_bench_")
    build_folder(root, args.images)

    bw = measure_transfer_bandwidth(48 << 20)  # a 4096^2x3 image's size
    bytes_up = SRC * SRC * 3  # uint8 upload per image
    bytes_down = TARGET * TARGET * 3  # uint8 result pull per image
    roofline_s = bytes_up / bw + bytes_down / bw

    device_s = measure_backend(root, "device", args.images)
    host_s = measure_backend(root, "host", args.images)
    ref_s = (None if args.skip_reference
             else measure_reference(root, min(2, args.images)))

    from neuralbarkcalculator_tpu.pipeline.preprocess import Preprocessor
    auto = Preprocessor(backend="auto")._resolve_backend()
    result = {
        "backend_device_sec_per_image": round(device_s, 3),
        "backend_host_sec_per_image": round(host_s, 3),
        "reference_cpu_sec_per_image":
            round(ref_s, 3) if ref_s else None,
        "auto_backend_picks": auto,
        "speedup_vs_reference":
            round(ref_s / min(device_s, host_s), 2) if ref_s else None,
        "transfer_bandwidth_MBps": round(bw / 1e6, 1),
        "transfer_roofline_sec_per_image": round(roofline_s, 3),
        "device_backend_transfer_bound":
            bool(roofline_s > 0.5 * device_s),
        "protocol": f"{args.images}x {SRC}x{SRC} BMP -> decode -> cubic "
                    f"resize {TARGET}^2 -> trim -> PNG; best-of-2 full "
                    f"folder passes; reference = sequential PIL+scipy "
                    f"single-thread (models.py:191-203)",
        "host_cpus": os.cpu_count(),
    }
    os.makedirs(os.path.join(REPO, "benchmarks"), exist_ok=True)
    path = os.path.join(REPO, "benchmarks", "preprocess.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
