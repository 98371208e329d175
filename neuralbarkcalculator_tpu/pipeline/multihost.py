"""Multi-host folder inference: shard a folder across processes, merge
per-shard CSVs (SURVEY.md §2.4; reference surface predict.py:51-58).

Design: folder inference is per-image independent — no activations or
gradients ever cross hosts (docs/SCALING.md "Where the collectives
are") — so the TPU-idiomatic multi-host layout is N fully independent
processes, each running the ordinary single-process engine over its
LOCAL devices on a deterministic round-robin slice of the manifest
(``i % n == k``; round-robin keeps height buckets balanced so no host
gets stuck with all the tall images). No DCN traffic at all: the only
cross-host coordination is the shared filesystem.

Each process writes its artifacts (dual PNGs / figures are per-image
files, so shards never collide) and an atomically-renamed
``final_stats.shard-k-of-n.csv`` whose rows carry their manifest order.
Process 0 then waits for all n shard files and stitches them into the
``final_stats.csv`` a single-process run would have produced — byte
for byte (tests/test_multihost.py asserts equality).

Process identity comes from ``jax.process_index()/process_count()``
when ``jax.distributed`` is initialized (parallel/mesh.py:
initialize_distributed), or explicitly via arguments — the explicit
form also serves mpirun/GNU-parallel launches that never initialize a
JAX coordinator (there are no collectives to coordinate).
"""
from __future__ import annotations

import csv
import os
import time

from .report import CSV_HEADER, shard_stats_name


def merge_shard_stats(results_dir: str, num_shards: int,
                      timeout: float = 3600.0,
                      poll_interval: float = 0.5,
                      cleanup: bool = True) -> str:
    """Merge ``num_shards`` per-shard CSVs into final_stats.csv.

    Waits (up to ``timeout`` seconds) for every shard file to appear —
    shard writers rename into place atomically, so an existing file is
    always complete. Rows are re-ordered by their manifest-order column,
    which is then stripped; the result is byte-identical to a
    single-process run's CSV. Shard files are removed after a
    successful merge unless ``cleanup=False``.
    """
    paths = [os.path.join(results_dir, shard_stats_name(k, num_shards))
             for k in range(num_shards)]
    deadline = time.monotonic() + timeout
    missing = list(paths)
    while missing:
        missing = [p for p in missing if not os.path.isfile(p)]
        if not missing:
            break
        if time.monotonic() > deadline:
            raise TimeoutError(
                f"merge_shard_stats: {len(missing)} shard file(s) never "
                f"appeared within {timeout:.0f}s: {missing[:3]}")
        time.sleep(poll_interval)

    rows: list[tuple[int, list[str]]] = []
    for p in paths:
        with open(p, newline="") as f:
            for rec in csv.reader(f, delimiter="\t"):
                if rec:
                    rows.append((int(rec[0]), rec[1:]))
    orders = [o for o, _ in rows]
    if len(set(orders)) != len(orders):
        raise ValueError("merge_shard_stats: duplicate manifest orders "
                         "across shards (overlapping shard runs?)")
    out = os.path.join(results_dir, "final_stats.csv")
    tmp = out + ".tmp"
    with open(tmp, "w") as f:
        writer = csv.writer(f, delimiter="\t")
        writer.writerow(CSV_HEADER)
        writer.writerows(r for _, r in sorted(rows))
    os.replace(tmp, out)
    if cleanup:
        for p in paths:
            try:
                os.remove(p)
            except OSError:
                pass
    return out


def wait_for_processed(root_path: str, timeout: float = 3600.0,
                       poll_interval: float = 1.0) -> None:
    """Block until every source record's processed PNG exists.

    Non-zero shards call this instead of preprocessing (PNG writes are
    not atomic, so exactly one process — shard 0 — owns the preprocess
    stage); it doubles as the guarantee that every shard derives its
    indices from the identical processed manifest.
    """
    from ..data.dataset import make_dataset

    records = make_dataset(root_path)
    want = [os.path.join(root_path, "processed", "samples",
                         r.wood_type, r.fname) for r in records]
    deadline = time.monotonic() + timeout
    missing = want
    while missing:
        missing = [p for p in missing if not os.path.isfile(p)]
        if not missing:
            return
        if time.monotonic() > deadline:
            raise TimeoutError(
                f"wait_for_processed: {len(missing)} processed file(s) "
                f"never appeared within {timeout:.0f}s (is shard 0 "
                f"running?): {missing[:3]}")
        time.sleep(poll_interval)


def predict_folder_multihost(model_path: str, root_path: str,
                             exclude_nodes: bool = False,
                             config=None, model_name: str = "fcn_resnet50",
                             process_id: int | None = None,
                             num_processes: int | None = None,
                             resume: bool = False,
                             progress: bool = True,
                             merge_timeout: float = 3600.0) -> str:
    """Run this process's shard of a folder prediction; process 0 merges.

    Returns the final_stats.csv path on process 0, this process's shard
    CSV path elsewhere. With ``num_processes`` unset, identity comes
    from jax.process_index()/process_count() (requires
    initialize_distributed on real multi-host jobs); 1 process
    degenerates to the ordinary single-process predict.
    """
    import jax

    from ..parallel.mesh import make_mesh
    from .predict import NeuralBarkCalculator

    if num_processes is None:
        num_processes = jax.process_count()
        process_id = jax.process_index()
    if process_id is None:
        raise ValueError("process_id required when num_processes is set")

    # LOCAL devices only: per-image-independent work must not build a
    # global mesh (a global jit would make every step a lockstep
    # collective across hosts for zero benefit)
    mesh = make_mesh(devices=jax.local_devices())
    calc = NeuralBarkCalculator(model_path, mesh=mesh, config=config,
                                model_name=model_name)
    if num_processes == 1:
        return calc.predict(root_path, exclude_nodes, resume=resume,
                            progress=progress)
    calc.predict(root_path, exclude_nodes, resume=resume,
                 progress=progress and process_id == 0,
                 shard=(process_id, num_processes))
    results_dir = os.path.join(root_path, "results")
    if process_id == 0:
        return merge_shard_stats(results_dir, num_processes,
                                 timeout=merge_timeout)
    return os.path.join(results_dir,
                        shard_stats_name(process_id, num_processes))


__all__ = ["merge_shard_stats", "predict_folder_multihost",
           "wait_for_processed"]
