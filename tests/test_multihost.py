"""Multi-host (DCN code path) dry run — skipped by default.

tools/multihost_dryrun.py spawns 2 jax.distributed processes on the CPU
platform (4 virtual devices each), builds the global mesh through
parallel.mesh.initialize_distributed, and runs a pjit step whose psum
crosses the process boundary. It takes ~1 min on a 1-core host, so it
only runs when requested:

    NEURALBARK_MULTIHOST=1 python -m pytest tests/test_multihost.py
"""
import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("NEURALBARK_MULTIHOST") != "1",
    reason="set NEURALBARK_MULTIHOST=1 to run the 2-process DCN dry run")


def test_two_process_pjit_matches_single_process():
    tool = Path(__file__).resolve().parents[1] / "tools" / \
        "multihost_dryrun.py"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out = subprocess.run(
        [sys.executable, "-u", str(tool), "--port", "29527"],
        env=env, capture_output=True, text=True, timeout=360)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MULTIHOST DRYRUN OK" in out.stdout


def test_two_process_folder_predict_matches_single_process():
    """Sharded folder inference across 2 jax.distributed processes:
    merged final_stats.csv must be byte-identical to single-process
    (VERDICT r3 item 5; the in-process shard/merge tests run in the
    fast suite, tests/test_multihost_predict.py)."""
    tool = Path(__file__).resolve().parents[1] / "tools" / \
        "multihost_predict_dryrun.py"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out = subprocess.run(
        [sys.executable, "-u", str(tool), "--port", "29533"],
        env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MULTIHOST PREDICT DRYRUN OK" in out.stdout
