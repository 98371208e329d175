"""Contract tests for the first-party figure compositor
(pipeline/compositor.py): same canvas geometry and content elements as
the matplotlib renderer it replaces (reference models.py:280-347)."""
import os

import numpy as np
import pytest
from PIL import Image

from neuralbarkcalculator_tpu.pipeline.compositor import (
    VIRIDIS3, render_combined_fast)


@pytest.fixture()
def sample():
    rng = np.random.default_rng(1)
    img = (rng.random((200, 256, 3)) * 120 + 90).astype(np.uint8)
    cmap = np.zeros((200, 256), np.uint8)
    cmap[40:160, 30:220] = 1
    cmap[80:120, 100:140] = 2
    pct = [float((cmap == 1).mean() * 100), float((cmap == 2).mean() * 100)]
    return img, cmap, pct


def test_canvas_geometry(sample, tmp_path):
    """6.4 x 4.8 in canvas at the requested dpi — identical to the
    matplotlib default figsize the reference uses."""
    img, cmap, pct = sample
    for dpi in (100, 200):
        out = str(tmp_path / f"fig{dpi}.png")
        render_combined_fast(img, cmap, out, pct, dpi=dpi)
        w, h = Image.open(out).size
        assert (w, h) == (round(6.4 * dpi), round(4.8 * dpi))


def test_panels_and_legend_colors_present(sample, tmp_path):
    """The canvas must contain all three viridis class colors (class
    panel + legend swatches) and non-white photo content in the left
    panel area."""
    img, cmap, pct = sample
    out = str(tmp_path / "fig.png")
    render_combined_fast(img, cmap, out, pct, dpi=100)
    arr = np.asarray(Image.open(out).convert("RGB"))
    flat = arr.reshape(-1, 3)
    for color in VIRIDIS3:
        assert (np.all(flat == color, axis=1)).sum() > 50, color
    # left panel area holds the photo (mid-gray wood texture, not white)
    left = arr[150:400, 20:300]
    assert left.mean() < 240


def test_legend_lists_present_classes_only(sample, tmp_path):
    """models.py:298-311: legend patches come from np.unique(class_map) —
    a bark-only map must not draw the node (yellow) swatch."""
    img, cmap, pct = sample
    cmap = np.where(cmap == 2, 1, cmap).astype(np.uint8)  # drop node
    out = str(tmp_path / "fig.png")
    render_combined_fast(img, cmap, out, pct, dpi=100)
    arr = np.asarray(Image.open(out).convert("RGB")).reshape(-1, 3)
    assert (np.all(arr == VIRIDIS3[2], axis=1)).sum() == 0  # no yellow
    assert (np.all(arr == VIRIDIS3[1], axis=1)).sum() > 50


def test_three_panel_eval_figure(sample, tmp_path):
    """The generic renderer also draws the eval report's 3-panel
    Input/Target/Generated layout, and render_eval_image produces the
    same CSV row under both renderers."""
    from neuralbarkcalculator_tpu.train.evaluate import render_eval_image

    img, cmap, _ = sample
    target = np.roll(cmap, 7, axis=0)
    ious = np.array([50.0, 60.0, 70.0])
    f1s = np.array([55.0, 65.0, 75.0])
    rows = {}
    for renderer, fname in (("fast", "a.png"), ("mpl", "b.png")):
        for sub in ("combined_images", "outputs"):
            os.makedirs(os.path.join(tmp_path, sub, "sapin", "test"),
                        exist_ok=True)
        rows[renderer] = render_eval_image(
            img, target, cmap, fname, "sapin", "test", ious, f1s,
            str(tmp_path), dpi=80, renderer=renderer)
        out = os.path.join(tmp_path, "combined_images", "sapin", "test",
                           fname)
        w, h = Image.open(out).size
        assert (w, h) == (512, 384)
    assert rows["fast"][3:] == rows["mpl"][3:]


def test_reporter_renderer_switch(sample, tmp_path):
    """PredictReporter(renderer=...) routes to the right backend and both
    produce the artifact set."""
    from neuralbarkcalculator_tpu.pipeline.report import PredictReporter

    img, cmap, pct = sample
    for renderer in ("fast", "mpl"):
        rdir = str(tmp_path / renderer)
        os.makedirs(os.path.join(rdir, "combined_images", "sapin"))
        os.makedirs(os.path.join(rdir, "outputs", "sapin"))
        rep = PredictReporter(rdir, dpi=60, renderer=renderer)
        rep.add(img, cmap, "x.png", "sapin")
        csv_path = rep.finalize()
        assert os.path.isfile(csv_path)
        assert os.path.isfile(
            os.path.join(rdir, "combined_images", "sapin", "x.png"))
        assert os.path.isfile(
            os.path.join(rdir, "outputs", "sapin", "x.png"))
    with pytest.raises(ValueError):
        PredictReporter(str(tmp_path), renderer="nope")


def test_lut3_matches_matplotlib_autoscaled_norm():
    """The reference never pins vmin (imshow(img, vmax=2), models.py:300),
    so matplotlib autoscales it to the map's min; the fast LUT must
    reproduce viridis(Normalize(vmin, 2)(v)) for every present-class set."""
    from matplotlib import colormaps
    from matplotlib.colors import Normalize

    from neuralbarkcalculator_tpu.pipeline.compositor import _lut3

    viridis = colormaps["viridis"]
    for vmin in (0, 1, 2):
        lut = _lut3(vmin)
        for v in range(vmin, 3):
            expect = np.array(viridis(Normalize(vmin, 2)(v))[:3]) * 255
            got = lut[v].astype(np.float64)
            assert np.abs(got - np.round(expect)).max() <= 1, (vmin, v)


def test_no_background_map_uses_renormalized_colors(sample, tmp_path):
    """A class map with no background pixels autoscales to vmin=1: class 1
    renders as viridis(0) dark purple (not teal) and class 2 as yellow —
    matching what matplotlib draws for the same map."""
    img, cmap, pct = sample
    cmap = np.maximum(cmap, 1).astype(np.uint8)  # classes {1, 2} only
    out = str(tmp_path / "fig.png")
    render_combined_fast(img, cmap, out, pct, dpi=100)
    arr = np.asarray(Image.open(out).convert("RGB")).reshape(-1, 3)
    assert (np.all(arr == VIRIDIS3[1], axis=1)).sum() == 0  # no teal
    assert (np.all(arr == VIRIDIS3[0], axis=1)).sum() > 50  # purple class 1
    assert (np.all(arr == VIRIDIS3[2], axis=1)).sum() > 50  # yellow class 2
