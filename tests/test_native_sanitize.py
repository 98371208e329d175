"""The native runtime's sanitizer fuzz pass (tools/native_sanitize.py)
stays green: ASan+UBSan-instrumented libbarkio driven with randomized
and adversarial inputs. Slow (builds the instrumented .so + ~1 min of
fuzzing); the semantics goldens vs scipy/PIL live in test_ccl.py and
test_native_io.py — this asserts memory safety under hostile inputs."""
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_native_sanitize_pass():
    if shutil.which("g++") is None:
        pytest.skip("g++ unavailable")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "native_sanitize.py"),
         "--iters", "40"],
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "SANITIZE_OK" in proc.stdout, proc.stdout + proc.stderr
