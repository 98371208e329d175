"""Serving soak: sustained mixed-size load against BatchingPredictor.

VERDICT r3 item 8: a long-running serving process must hold flat RSS
(no leak across thousands of micro-batches), sane tail latency, and
telemetry that adds up. This harness drives N client threads at the
predictor for a configurable duration with a mixed workload — several
trimmed heights (multiple compiled shapes), a width mix, and a
per-request exclude_nodes mix — then asserts:

- RSS is flat NET OF the platform's measured transfer retention (below);
- p99 latency is bounded (configurable; the real bound depends on the
  deployment's chip/link, the default is a sanity ceiling);
- telemetry adds up: served + errors + rejected == requests, errors == 0,
  batches > 0, mean batch > 1 under concurrent load.

Platform retention: the first real 10-minute run of this soak FAILED
its raw flat-RSS invariant (4040 -> 10862 MB). Bisection
(tools/leak_probe.py, leak_probe2.py) pinned 100% of the growth on the
development environment's tunneled PJRT client: a bare
``jax.device_put`` of a fresh 3 MB uint8 array grows RSS by ~2.7 MB
per call — with explicit ``.delete()``, with the same host buffer
re-put, with flat Python-object accounting (live jax.Array count and
bytes constant), and ``malloc_trim(0)`` reclaims <3% — while the
framework's own layers are flat: the reused-buffer device step, the
native postprocess, and the CPU-backend equivalent (0.05 MB/put,
i.e. clean on a non-tunneled PJRT) all hold RSS constant.

So the soak measures the platform term instead of inheriting it. One
time series cannot fully separate a hypothetical per-request leak of
ours from the platform's per-byte retention (they are collinear —
requests and uploaded bytes move together), so the invariant is split
into what IS identifiable:

- the engine's ``bytes_h2d`` counter is sampled alongside every RSS
  sample and the per-uploaded-byte slope ``b`` is least-squares
  fitted from the soak series itself (a short pre-traffic device_put
  calibration is also recorded, but it systematically underestimates
  the sustained rate — measured 0.50 short-loop vs ~0.95 sustained —
  so the fit, not the calibration, drives the checks);
- RESIDUAL flatness: ``rss - b x bytes_h2d`` must be flat. Catches
  every leak NOT proportional to uploads (latency rings, figure
  caches, queue growth, compile caches).
- SLOPE bound: ``b <= 1.3`` MB per uploaded MB. A transfer path
  cannot retain more than it stages plus overhead; superlinear or
  queue-driven blowups fail this.
- CLEAN-PLATFORM lane: when the calibration says the client is clean
  (< 0.05 MB/MB — CPU PJRT, production hosts), the slope itself must
  be < 0.05, i.e. the RAW flat-RSS invariant. This is the lane that
  would catch a per-request leak in our stack; run it with
  ``--platform cpu`` (10-minute CPU soak) or rely on the slow-test
  45 s variant which runs on the CPU mesh.

Per-request attribution on the tunneled dev host is established by the
committed bisection probes above, not asserted per run. A failed soak
still writes its JSON (violations listed, then raised).

Writes benchmarks/serving_soak.json (or serving_soak_cpu.json with
--platform cpu). Run on the bench host:
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


def calibrate_platform_retention(shape=(1024, 1024, 3),
                                 puts: int = 16) -> float:
    """Measured RSS growth per host->device byte of THIS process's PJRT
    client (MB RSS per MB uploaded; ~0.9 on the tunneled dev client,
    ~0 on clean PJRT — see module docstring). Negative noise clamps to
    0 so the net invariant is never looser than the raw one on a clean
    client."""
    import gc

    import jax

    buf = np.random.default_rng(7).integers(
        0, 256, shape, np.uint8)
    d = jax.device_put(buf)
    d.block_until_ready()
    del d
    gc.collect()
    r0 = rss_mb()
    for _ in range(puts):
        d = jax.device_put(buf)
        d.block_until_ready()
        del d
    gc.collect()
    grown = rss_mb() - r0
    return max(0.0, grown / (puts * buf.nbytes / 2**20))


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

    # platform transfer-retention rate, calibrated in-process before
    # traffic (see module docstring); the invariant below nets this
    # environment term out of the RSS series
    retention = calibrate_platform_retention(
        shape=(max(heights), max(widths), 3))
    calc_stats = getattr(predictor.calc, "cache_stats", dict)

    def bytes_h2d_mb() -> float:
        return calc_stats().get("bytes_h2d", 0) / 2**20

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(clients)]
    rss_samples: list[tuple[float, float, float]] = []
    t_start = time.monotonic()
    for t in threads:
        t.start()
    while time.monotonic() - t_start < seconds:
        rss_samples.append((time.monotonic() - t_start, rss_mb(),
                            bytes_h2d_mb()))
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
    rss = np.asarray([m for _, m, _ in rss_samples], np.float64)
    up = np.asarray([b for _, _, b in rss_samples], np.float64)
    # least-squares slope of RSS per uploaded MB over the soak itself
    # (the short calibration loop underestimates the sustained rate;
    # see module docstring). Degenerate spread -> slope 0.
    du = up - up.mean()
    b_fit = (float(du @ (rss - rss.mean()) / (du @ du))
             if float(du @ du) > 1e-6 else 0.0)
    resid = rss - b_fit * up  # what uploads cannot explain
    third = max(1, len(rss) // 3)
    rss_first = float(rss[:third].mean())
    rss_last = float(rss[-third:].mean())
    resid_first = float(resid[:third].mean())
    resid_last = float(resid[-third:].mean())
    clean_platform = retention < 0.05
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
                               for t, m, _ in rss_samples]},
        "platform_retention": {
            "calibrated_mb_per_mb": round(retention, 3),
            "fitted_mb_per_mb": round(b_fit, 3),
            "uploaded_mb": round(float(up[-1] - up[0]), 1),
            "clean_platform": clean_platform,
            "note": ("calibrated = short pre-traffic device_put loop "
                     "(underestimates the sustained rate); fitted = "
                     "least-squares RSS-per-uploaded-MB over the soak "
                     "series; ~0 on clean PJRT, ~0.95 sustained on the "
                     "tunneled dev client — see tools/leak_probe2.py "
                     "and the module docstring for why per-request "
                     "attribution needs the bisection probes"),
        },
        "rss_resid_mb": {
            "first_third_mean": round(resid_first, 1),
            "last_third_mean": round(resid_last, 1),
            "samples": [[round(t, 1), round(m, 1)]
                        for (t, _, _), m in zip(rss_samples, resid)],
        },
    }

    # invariants — all evaluated so a failed soak still reports
    # everything it measured; the caller writes the JSON before raising
    violations: list[str] = []
    if stats["served"] + stats["errors"] + stats["rejected"] \
            != stats["requests"]:
        violations.append(f"telemetry does not add up: {stats}")
    if stats["errors"]:
        violations.append(f"{stats['errors']} serve errors")
    if not lat.size or stats["batches"] == 0:
        violations.append("no traffic was served")
    if clients > 2 and stats["mean_batch"] <= 1.0:
        violations.append(
            f"no batching under {clients}-way load "
            f"(mean_batch={stats['mean_batch']})")
    if resid_last > resid_first * (1.0 + rss_tolerance):
        violations.append(
            f"upload-independent RSS grew {resid_first:.0f} -> "
            f"{resid_last:.0f} MB (> {rss_tolerance:.0%}): a leak NOT "
            f"proportional to transfers (queues/caches/rings)")
    if b_fit > 1.3:
        violations.append(
            f"RSS slope {b_fit:.2f} MB per uploaded MB exceeds the "
            f"physical staging bound 1.3: superlinear growth")
    if clean_platform and b_fit > 0.05:
        violations.append(
            f"platform calibrates clean ({retention:.3f} MB/MB) but "
            f"RSS still grows {b_fit:.2f} MB per uploaded MB: a "
            f"per-request leak in the serving/engine stack")
    if p99_ceiling_ms is not None and \
            float(np.percentile(lat, 99)) > p99_ceiling_ms:
        violations.append(
            f"p99 {np.percentile(lat, 99):.0f} ms exceeds ceiling "
            f"{p99_ceiling_ms} ms")
    report["violations"] = violations
    return report


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model_path", default=os.path.expanduser(
        "~/.cache/neuralbarkcalculator_tpu/bench_model.msgpack"))
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--p99_ceiling_ms", type=float, default=None)
    ap.add_argument("--platform", default="default",
                    choices=("default", "cpu"),
                    help="'cpu' forces the CPU PJRT backend — the "
                         "clean-platform lane where the raw flat-RSS "
                         "invariant is asserted (slope < 0.05); "
                         "writes serving_soak_cpu.json")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

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
    name = ("serving_soak_cpu.json" if args.platform == "cpu"
            else "serving_soak.json")
    path = os.path.join(REPO, "benchmarks", name)
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if k not in ("rss_mb", "rss_resid_mb")} | {
                          "rss_first_mb": report["rss_mb"]
                          ["first_third_mean"],
                          "rss_last_mb": report["rss_mb"]
                          ["last_third_mean"],
                          "rss_resid_first_mb": report["rss_resid_mb"]
                          ["first_third_mean"],
                          "rss_resid_last_mb": report["rss_resid_mb"]
                          ["last_third_mean"]}, indent=1))
    print(f"wrote {path}", file=sys.stderr)
    if report["violations"]:
        raise AssertionError("; ".join(report["violations"]))


if __name__ == "__main__":
    main()
