"""Bench plumbing tests (driver-critical: bench.py must not break).

Covers the structured data generator's statistical contract, the bench
folder builder, and the checkpoint stats sidecar — all host-side, no
TPU.
"""
import json
import os
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))


def test_structured_dual_mask_statistics():
    from bench_data import component_stats, structured_dual_mask

    rng = np.random.default_rng(0)
    mask = structured_dual_mask(rng, 960, 1024)
    assert mask.shape == (960, 1024) and mask.dtype == np.uint8
    assert set(np.unique(mask)) <= {0, 1, 2}
    stats = component_stats(mask)
    # a real dual: dominant bark, minority background, rare nodes
    assert stats["class1"]["pixel_fraction"] > 0.5
    assert 0.05 < stats["class0"]["pixel_fraction"] < 0.45
    assert 0.001 < stats["class2"]["pixel_fraction"] < 0.08
    # sub-150-px speckles exist in every class (the postprocess workload)
    for cls in ("class0", "class1", "class2"):
        assert stats[cls]["small_lt150"] >= 1


def test_structured_image_follows_mask():
    from bench_data import structured_dual_mask, structured_image

    rng = np.random.default_rng(1)
    mask = structured_dual_mask(rng, 256, 256)
    img = structured_image(rng, mask)
    assert img.shape == (256, 256, 3) and img.dtype == np.uint8
    # classes must be brightness-separable (what the bench model learns)
    lum = img.astype(np.float32).mean(-1)
    m0 = lum[mask == 0].mean()
    m1 = lum[mask == 1].mean()
    m2 = lum[mask == 2].mean()
    assert m0 < m1 < m2


@pytest.mark.slow
def test_bench_build_folder_and_stats_sidecar(tmp_path, monkeypatch):
    import bench

    masks = bench.build_folder(str(tmp_path))
    files = sorted(os.listdir(
        tmp_path / "processed" / "samples" / "sapin"))
    assert len(files) == bench.N_IMAGES == len(masks)
    for mask, expected_h in zip(masks, [896, 960, 1024] * 6):
        assert mask.shape == (bench.HEIGHTS[
            list(bench.HEIGHTS).index(mask.shape[0])], 1024)

    # stats sidecar: bench must normalize with the model's training stats
    ckpt = tmp_path / "model.msgpack"
    ckpt.write_bytes(b"")
    sidecar = str(ckpt) + ".stats.json"
    with open(sidecar, "w") as f:
        json.dump({"mean": [0.5, 0.4, 0.3], "std": [0.2, 0.2, 0.2],
                   "train_miou": 80.0}, f)
    stats = bench.model_norm_stats(str(ckpt))
    assert stats == ([0.5, 0.4, 0.3], [0.2, 0.2, 0.2])
    os.remove(sidecar)
    assert bench.model_norm_stats(str(ckpt)) is None


def test_training_set_builder(tmp_path):
    from make_bench_model import N_PER_TYPE, build_training_set

    build_training_set(str(tmp_path))
    for wt in ("epinette_gelee", "epinette_non_gelee", "sapin"):
        samples = os.listdir(tmp_path / "samples" / wt)
        duals = os.listdir(tmp_path / "duals" / wt)
        assert len(samples) == len(duals) == N_PER_TYPE
    from PIL import Image
    dual = np.asarray(Image.open(
        tmp_path / "duals" / "sapin" / "img0.png"))
    assert set(np.unique(dual)) <= {0, 127, 255}
