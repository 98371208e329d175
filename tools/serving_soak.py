"""Serving soak: sustained mixed-size load against BatchingPredictor.

VERDICT r3 item 8: a long-running serving process must hold flat RSS
(no leak across thousands of micro-batches), sane tail latency, and
telemetry that adds up. This harness drives N client threads at the
predictor for a configurable duration with a mixed workload — several
trimmed heights (multiple compiled shapes), a width mix, and a
per-request exclude_nodes mix — then asserts:

- RSS is flat: mean of the last third of samples <= mean of the first
  third x (1 + tolerance), after the warmup allocations;
- p99 latency is bounded (configurable; the real bound depends on the
  deployment's chip/link, the default is a sanity ceiling);
- telemetry adds up: served + errors + rejected == requests, errors == 0,
  batches > 0, mean batch > 1 under concurrent load.

Writes benchmarks/serving_soak.json. Run on the bench host:
    python tools/serving_soak.py --minutes 10 --clients 8
The slow-test lane runs a 45 s variant (tests/test_serving.py).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0  # pragma: no cover


def run_soak(calc, seconds: float, clients: int = 6,
             heights=(896, 960, 1024), widths=(1024,),
             max_wait_ms: float = 25.0,
             rss_tolerance: float = 0.10,
             p99_ceiling_ms: float | None = None) -> dict:
    """Drive the soak; returns the report dict (raises on invariant
    violations so CI fails loudly)."""
    from neuralbarkcalculator_tpu.pipeline.serving import BatchingPredictor

    predictor = BatchingPredictor(calc, max_wait_ms=max_wait_ms)
    # warm every (bucket, ladder) program for each distinct shape so the
    # soak measures steady state, not compiles
    for w in widths:
        for h in heights:
            predictor.warmup(height=h, width=w)

    rng_global = np.random.default_rng(0)
    shapes = [(h, w) for w in widths for h in heights]
    images = {s: (rng_global.uniform(0.2, 0.9, (*s, 3)) * 255
                  ).astype(np.uint8) for s in shapes}

    stop = threading.Event()
    latencies: list[float] = []
    lat_lock = threading.Lock()
    client_errors: list[BaseException] = []

    def client(cid: int) -> None:
        rng = np.random.default_rng(100 + cid)
        while not stop.is_set():
            shape = shapes[int(rng.integers(len(shapes)))]
            t0 = time.perf_counter()
            try:
                fut = predictor.submit(
                    images[shape],
                    exclude_nodes=bool(rng.integers(2)))
                res = fut.result(timeout=600)
            except BaseException as e:  # noqa: BLE001 - recorded, reraised
                client_errors.append(e)
                stop.set()
                return
            with lat_lock:
                latencies.append((time.perf_counter() - t0) * 1e3)
            if res.class_map.shape != shape or \
                    int(res.counts.sum()) != res.class_map.size:
                client_errors.append(AssertionError(
                    f"bad result: shape {res.class_map.shape} vs {shape},"
                    f" counts sum {int(res.counts.sum())}"))
                stop.set()
                return

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(clients)]
    rss_samples: list[tuple[float, float]] = []
    t_start = time.monotonic()
    for t in threads:
        t.start()
    while time.monotonic() - t_start < seconds:
        rss_samples.append((time.monotonic() - t_start, rss_mb()))
        time.sleep(min(10.0, max(1.0, seconds / 30.0)))
    stop.set()
    for t in threads:
        t.join(timeout=600)
    stats = predictor.snapshot_stats()
    predictor.close()
    if client_errors:
        raise RuntimeError(f"client failure during soak: "
                           f"{client_errors[0]!r}")

    lat = np.asarray(latencies, np.float64)
    rss = np.asarray([m for _, m in rss_samples], np.float64)
    third = max(1, len(rss) // 3)
    rss_first = float(rss[:third].mean())
    rss_last = float(rss[-third:].mean())
    report = {
        "tool": "tools/serving_soak.py",
        "seconds": seconds,
        "clients": clients,
        "shapes": [list(s) for s in shapes],
        "requests": int(stats["requests"]),
        "served": int(stats["served"]),
        "errors": int(stats["errors"]),
        "rejected": int(stats["rejected"]),
        "batches": int(stats["batches"]),
        "mean_batch": round(float(stats["mean_batch"]), 2),
        "throughput_rps": round(len(lat) / seconds, 2),
        "latency_ms": {
            "p50": round(float(np.percentile(lat, 50)), 1),
            "p95": round(float(np.percentile(lat, 95)), 1),
            "p99": round(float(np.percentile(lat, 99)), 1),
            "max": round(float(lat.max()), 1),
        } if lat.size else None,
        "rss_mb": {"first_third_mean": round(rss_first, 1),
                   "last_third_mean": round(rss_last, 1),
                   "samples": [[round(t, 1), round(m, 1)]
                               for t, m in rss_samples]},
    }

    # invariants
    if stats["served"] + stats["errors"] + stats["rejected"] \
            != stats["requests"]:
        raise AssertionError(f"telemetry does not add up: {stats}")
    if stats["errors"]:
        raise AssertionError(f"{stats['errors']} serve errors")
    if not lat.size or stats["batches"] == 0:
        raise AssertionError("no traffic was served")
    if clients > 2 and stats["mean_batch"] <= 1.0:
        raise AssertionError(
            f"no batching under {clients}-way load "
            f"(mean_batch={stats['mean_batch']})")
    if rss_last > rss_first * (1.0 + rss_tolerance):
        raise AssertionError(
            f"RSS grew {rss_first:.0f} -> {rss_last:.0f} MB "
            f"(> {rss_tolerance:.0%} tolerance): leak?")
    if p99_ceiling_ms is not None and \
            float(np.percentile(lat, 99)) > p99_ceiling_ms:
        raise AssertionError(
            f"p99 {np.percentile(lat, 99):.0f} ms exceeds ceiling "
            f"{p99_ceiling_ms} ms")
    return report


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model_path", default=os.path.expanduser(
        "~/.cache/neuralbarkcalculator_tpu/bench_model.msgpack"))
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--p99_ceiling_ms", type=float, default=None)
    args = ap.parse_args()

    import jax

    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.pipeline.predict import \
        NeuralBarkCalculator

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    np.asarray(jax.numpy.ones((8, 128)))

    config = PredictConfig(model_path=args.model_path,
                           batch_size=args.batch,
                           fixed_pad_height=1024)
    calc = NeuralBarkCalculator(args.model_path, config=config)
    report = run_soak(calc, seconds=args.minutes * 60.0,
                      clients=args.clients,
                      p99_ceiling_ms=args.p99_ceiling_ms)
    report["backend"] = jax.default_backend()
    path = os.path.join(REPO, "benchmarks", "serving_soak.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if k != "rss_mb"} | {
                          "rss_first_mb": report["rss_mb"]
                          ["first_third_mean"],
                          "rss_last_mb": report["rss_mb"]
                          ["last_third_mean"]}, indent=1))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
