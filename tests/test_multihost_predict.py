"""Sharded folder inference (pipeline/multihost.py): the merged CSV of
an N-way sharded run must be byte-identical to the single-process run,
and artifacts must land exactly once (SURVEY.md §2.4; reference
predict.py:51-58). The 2-process jax.distributed variant lives in
tests/test_multihost.py (NEURALBARK_MULTIHOST=1 lane); this one drives
the same shard/merge machinery in-process so it runs in the fast suite.
"""
from __future__ import annotations

import os
import shutil

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_root(tmp_path_factory):
    """A processed folder of 5 small images (one height bucket) + a tiny
    trained-nothing checkpoint, plus the engine to run them."""
    import flax.serialization
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.models.segmentation import fcn_resnet50
    from neuralbarkcalculator_tpu.pipeline.predict import \
        NeuralBarkCalculator

    root = tmp_path_factory.mktemp("mh_root")
    d = root / "processed" / "samples" / "sapin"
    d.mkdir(parents=True)
    rng = np.random.default_rng(3)
    for i, h in enumerate((90, 100, 110, 96, 120)):
        img = (rng.random((h, 64, 3)) * 160 + 60).astype(np.uint8)
        Image.fromarray(img).save(d / f"img{i}.png")

    model = fcn_resnet50(dropout=0.0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    ckpt = root / "model.msgpack"
    ckpt.write_bytes(flax.serialization.to_bytes(variables))

    config = PredictConfig(model_path=str(ckpt), batch_size=1,
                           figure_dpi=30)
    calc = NeuralBarkCalculator(str(ckpt), config=config)
    return root, calc


def _reset_results(root) -> str:
    results = os.path.join(root, "results")
    shutil.rmtree(results, ignore_errors=True)
    for sub in ("combined_images", "outputs"):
        os.makedirs(os.path.join(results, sub, "sapin"))
    return results


def test_sharded_predict_merges_byte_identical(tiny_root):
    from neuralbarkcalculator_tpu.pipeline.multihost import \
        merge_shard_stats

    root, calc = tiny_root
    _reset_results(root)
    single = calc.predict(str(root), progress=False)
    with open(single, "rb") as f:
        want_csv = f.read()
    want_duals = sorted(os.listdir(
        os.path.join(root, "results", "outputs", "sapin")))

    results = _reset_results(root)
    for k in (1, 0):  # order must not matter
        out = calc.predict(str(root), progress=False, shard=(k, 2))
        assert os.path.basename(out).startswith("final_stats.shard-")
    merged = merge_shard_stats(results, 2, timeout=5.0)
    with open(merged, "rb") as f:
        got_csv = f.read()
    assert got_csv == want_csv
    assert sorted(os.listdir(
        os.path.join(results, "outputs", "sapin"))) == want_duals
    # shard files are cleaned up after the merge
    assert not [p for p in os.listdir(results) if ".shard-" in p]


def test_shard_partition_is_disjoint_and_complete(tiny_root):
    root, calc = tiny_root
    results = _reset_results(root)
    n = 3
    seen: list[str] = []
    for k in range(n):
        calc.predict(str(root), progress=False, shard=(k, n))
    from neuralbarkcalculator_tpu.pipeline.multihost import \
        merge_shard_stats
    merged = merge_shard_stats(results, n, timeout=5.0)
    with open(merged) as f:
        seen = [line.split("\t")[0] for line in f.read().splitlines()[1:]]
    assert seen == [f"img{i}.png" for i in range(5)]  # manifest order


def test_merge_times_out_on_missing_shard(tiny_root, tmp_path):
    from neuralbarkcalculator_tpu.pipeline.multihost import \
        merge_shard_stats

    with pytest.raises(TimeoutError):
        merge_shard_stats(str(tmp_path), 2, timeout=0.3,
                          poll_interval=0.05)


def test_merge_rejects_overlapping_shards(tiny_root, tmp_path):
    from neuralbarkcalculator_tpu.pipeline.multihost import \
        merge_shard_stats
    from neuralbarkcalculator_tpu.pipeline.report import shard_stats_name

    for k in range(2):  # both shards claim manifest order 0
        with open(tmp_path / shard_stats_name(k, 2), "w") as f:
            f.write("0\timg0.png\tsapin\t1\t2\t3\t4\n")
    with pytest.raises(ValueError, match="duplicate manifest orders"):
        merge_shard_stats(str(tmp_path), 2, timeout=1.0)


def test_shard_validation(tiny_root):
    root, calc = tiny_root
    with pytest.raises(ValueError, match="shard"):
        calc.predict(str(root), progress=False, shard=(2, 2))
