"""Tracing / profiling hooks (SURVEY.md §5.1 — the reference has only tqdm
bars; this is new TPU-side observability).

- ``stage_timer``: lightweight wall-clock stage timing with a process-wide
  report (used by the pipelines; near-zero overhead when disabled).
- ``device_trace``: context manager around ``jax.profiler.trace`` for
  capturing XLA/TPU traces viewable in TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

_STAGES: dict[str, list[float]] = defaultdict(list)
_ENABLED = True


def enable(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = on


@contextlib.contextmanager
def stage_timer(name: str):
    """Accumulate wall time under ``name`` (see ``report()``)."""
    if not _ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _STAGES[name].append(time.perf_counter() - t0)


def report(reset: bool = False) -> dict[str, dict[str, float]]:
    """{stage: {calls, total_s, mean_s}} for all stages so far."""
    out = {}
    for name, times in _STAGES.items():
        out[name] = {"calls": len(times), "total_s": sum(times),
                     "mean_s": sum(times) / len(times)}
    if reset:
        _STAGES.clear()
    return out


def print_report(reset: bool = False) -> None:
    for name, row in sorted(report(reset).items(),
                            key=lambda kv: -kv[1]["total_s"]):
        print(f"{name:32s} {row['calls']:5d} calls  "
              f"{row['total_s']:8.3f}s total  {row['mean_s']*1e3:8.1f}ms "
              f"mean")


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (XLA ops, TPU timelines) to log_dir."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
