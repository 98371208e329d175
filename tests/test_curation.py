"""Data-curation tool tests (tools/curation.py, reference C13)."""
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

TOOLS = str(Path(__file__).resolve().parents[1] / "tools")
sys.path.insert(0, TOOLS)

import curation  # noqa: E402


def test_make_duals(tmp_path, rng):
    barks = tmp_path / "bark"
    nodes = tmp_path / "nodes"
    duals = tmp_path / "duals"
    barks.mkdir()
    nodes.mkdir()
    bark = (rng.random((32, 32)) > 0.5).astype(np.uint8) * 255
    node = np.zeros((32, 32), np.uint8)
    node[5:10, 5:10] = 255
    Image.fromarray(bark, "L").save(barks / "a.bmp")
    Image.fromarray(node, "L").save(nodes / "a.bmp")

    curation.make_duals(str(barks), str(nodes), str(duals))
    out = np.asarray(Image.open(duals / "a.png"))
    # node wins on overlap (reference write order, __main__.py:73-74)
    assert np.all(out[5:10, 5:10] == 255)
    assert set(np.unique(out)).issubset({0, 127, 255})
    np.testing.assert_array_equal(
        out == 127, (bark == 255) & ~(node == 255))


def test_fine_tune(tmp_path):
    duals = tmp_path / "duals" / "sapin"
    out = tmp_path / "tuned"
    duals.mkdir(parents=True)
    dual = np.zeros((64, 64), np.uint8)
    dual[10:40, 10:40] = 127   # 900 px bark: kept
    dual[50:53, 50:53] = 255   # 9 px node: filled to 0
    Image.fromarray(dual, "L").save(duals / "x.png")

    curation.fine_tune(str(tmp_path / "duals"), str(out))
    tuned = np.asarray(Image.open(out / "sapin" / "x.png"))
    assert np.all(tuned[10:40, 10:40] == 127)
    assert np.all(tuned[50:53, 50:53] == 0)


def test_adjust(tmp_path, rng):
    duals = tmp_path / "duals"
    samples = tmp_path / "samples"
    out = tmp_path / "adjusted"
    duals.mkdir()
    samples.mkdir()
    dual = rng.choice([0, 127, 255], size=(16, 16)).astype(np.uint8)
    Image.fromarray(dual, "L").save(duals / "y.png")
    Image.fromarray(np.zeros((32, 24, 3), np.uint8)).save(samples / "y.bmp")

    curation.adjust(str(duals), str(samples), str(out))
    adjusted = np.asarray(Image.open(out / "y.png"))
    assert adjusted.shape == (32, 24)  # resized to sample H, W
    assert set(np.unique(adjusted)).issubset(set(np.unique(dual)))


def test_fix_image(tmp_path, rng):
    img = (rng.random((20, 10, 3)) * 255).astype(np.uint8)
    p = tmp_path / "f.png"
    Image.fromarray(img).save(p)
    curation.fix_image(str(p), 1)
    assert np.asarray(Image.open(p)).shape == (19, 10, 3)
    curation.fix_image(str(p), 2)
    out = np.asarray(Image.open(p))
    assert out.shape == (17, 10, 3)
    # [:-1] then [1:-1]: rows 1..17 of the original remain
    np.testing.assert_array_equal(out, img[1:18])
    with pytest.raises(ValueError):
        curation.fix_image(str(p), 3)


def test_cli_help():
    r = subprocess.run([sys.executable,
                        os.path.join(TOOLS, "curation.py"), "--help"],
                       capture_output=True, text=True)
    assert r.returncode == 0
    for cmd in ("make-duals", "fine-tune", "adjust", "fix-image",
                "preview-augment"):
        assert cmd in r.stdout
