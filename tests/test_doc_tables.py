"""Docs must match the committed benchmark JSONs (VERDICT r4 item 4).

Round 3 and round 4 both ended with doc tables quoting numbers their
own committed benchmark JSONs contradicted. The structural fix: every
benchmark-derived doc number lives in a GEN-marked region owned by
tools/update_doc_tables.py, and this test fails the moment a region's
content diverges from what the JSONs generate.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_doc_tables_match_benchmark_jsons():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "update_doc_tables.py"), "--check"],
        capture_output=True, text=True)
    assert proc.returncode == 0, (
        "doc GEN blocks drifted from benchmarks/*.json — run "
        "python tools/update_doc_tables.py\n" + proc.stdout + proc.stderr)


def test_every_generator_is_referenced():
    """A generator nobody references is dead weight or a misspelled
    marker; flag it (serving_soak lands with the r5 hardware soak)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import re

    import update_doc_tables as udt
    referenced = set()
    for rel in udt.DOC_FILES:
        with open(os.path.join(REPO, rel)) as f:
            referenced |= set(re.findall(r"<!-- GEN:([a-z0-9_]+) -->",
                                         f.read()))
    unknown = referenced - set(udt.GENERATORS)
    assert not unknown, f"doc references unknown generators: {unknown}"
