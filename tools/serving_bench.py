"""Online-serving latency benchmark (cli/serve.py) on the real chip.

Starts the HTTP server in-process on an ephemeral port (bench model,
structured 1024x1024 content), warms it up, then measures client-side
latency for ``POST /v1/predict?format=json``:

- sequential: N single requests back to back (the latency floor),
- concurrent: C client threads x M requests (micro-batching under load).

Runs the default bf16+fold engine and, with ``--int8``, the int8 path.
Prints one JSON line per phase; paste into benchmarks/serving.json.
Caveat: this 1-core dev host runs client, HTTP threads, decode, and
postprocess on the same core — production hosts spread those; treat the
numbers as upper bounds (the device step is benchmarks/int8_step.json).
"""
from __future__ import annotations

import argparse
import http.client
import io
import json
import os
import sys
import threading
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

import numpy as np


def make_request_body() -> bytes:
    from PIL import Image

    from bench_data import structured_dual_mask, structured_image
    rng = np.random.default_rng(7)
    img = structured_image(rng, structured_dual_mask(rng, 1024, 1024))
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def one_request(port: int, body: bytes) -> float:
    t0 = time.perf_counter()
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    conn.request("POST", "/v1/predict?format=json", body=body,
                 headers={"Content-Type": "image/png"})
    resp = conn.getresponse()
    payload = resp.read()
    conn.close()
    if resp.status != 200:
        raise RuntimeError(f"{resp.status}: {payload[:200]!r}")
    return time.perf_counter() - t0


def pct(vals, q):
    return float(np.percentile(np.asarray(vals) * 1000.0, q))


def run_config(int8: bool, model_path: str, seq_n: int, conc: int,
               conc_m: int) -> list[dict]:
    from neuralbarkcalculator_tpu.cli.serve import (build_parser,
                                                    make_server,
                                                    serve_in_thread)
    args = build_parser().parse_args(
        [model_path, "--port", "0", "--batch_size", "8"]
        + (["--int8"] if int8 else []))
    server = make_server(args)
    state = server.state
    serve_in_thread(server)
    port = server.server_address[1]
    body = make_request_body()
    label = "int8" if int8 else "bf16"
    out = []
    try:
        state.predictor.warmup()
        one_request(port, body)  # warm the tail-batch program + HTTP path

        lat = [one_request(port, body) for _ in range(seq_n)]
        out.append({"phase": f"{label}_sequential", "n": seq_n,
                    "p50_ms": round(pct(lat, 50), 1),
                    "p95_ms": round(pct(lat, 95), 1)})

        lat, errs = [], []
        lock = threading.Lock()

        def client():
            for _ in range(conc_m):
                try:
                    t = one_request(port, body)
                except Exception as e:  # pragma: no cover
                    with lock:
                        errs.append(str(e))
                    return
                with lock:
                    lat.append(t)

        t0 = time.perf_counter()
        threads = [threading.Thread(target=client) for _ in range(conc)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        if errs:
            raise RuntimeError(errs[0])
        out.append({"phase": f"{label}_concurrent", "clients": conc,
                    "total": conc * conc_m,
                    "p50_ms": round(pct(lat, 50), 1),
                    "p95_ms": round(pct(lat, 95), 1),
                    "req_per_s": round(len(lat) / wall, 2)})
    finally:
        server.shutdown()
        server.server_close()
        state.predictor.close()
    return out


def run_cold_start(int8: bool, model_path: str, wipe_cache: bool) -> dict:
    """Time server construction (model load/convert + BN fold or int8
    load) and warmup (one XLA compile per ladder shape) — the two cold-
    start components a deployment must budget. ``wipe_cache`` deletes the
    persistent XLA compile cache first (true first-boot); without it the
    numbers show what a restart with a shipped cache directory costs."""
    import shutil

    from neuralbarkcalculator_tpu.cli.serve import build_parser, make_server
    if wipe_cache:
        cache = os.environ.get("NEURALBARK_CACHE", os.path.join(
            os.path.expanduser("~"), ".cache",
            "neuralbarkcalculator_tpu", "xla"))
        shutil.rmtree(cache, ignore_errors=True)
    args = build_parser().parse_args(
        [model_path, "--port", "0", "--batch_size", "8"]
        + (["--int8"] if int8 else []))
    t0 = time.perf_counter()
    server = make_server(args)
    t_build = time.perf_counter()
    try:
        server.state.predictor.warmup()
        t_warm = time.perf_counter()
    finally:
        server.server_close()
        server.state.predictor.close()
    return {"phase": "cold_start",
            "engine": "int8" if int8 else "bf16",
            "xla_cache": "cold" if wipe_cache else "warm",
            "model_path": os.path.basename(model_path),
            "build_s": round(t_build - t0, 2),
            "warmup_s": round(t_warm - t_build, 2),
            "total_s": round(t_warm - t0, 2)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default=os.path.expanduser(
        "~/.cache/neuralbarkcalculator_tpu/bench_model.msgpack"))
    ap.add_argument("--seq_n", type=int, default=20)
    ap.add_argument("--conc", type=int, default=8)
    ap.add_argument("--conc_m", type=int, default=5)
    ap.add_argument("--int8", action="store_true",
                    help="also run the int8 engine")
    ap.add_argument("--only", choices=["bf16", "int8"],
                    help="run a single engine (isolates phase-order / "
                         "process-age effects when comparing runs)")
    ap.add_argument("--cold_start", action="store_true",
                    help="measure build+warmup time instead of request "
                         "latency (one engine per process; combine with "
                         "--only and --wipe_cache)")
    ap.add_argument("--wipe_cache", action="store_true",
                    help="with --cold_start: delete the persistent XLA "
                         "cache first (true first-boot)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    np.asarray(jnp.ones((8, 128)))  # tunnel first-pull warmup

    if args.only:
        engines = [args.only == "int8"]
    else:
        engines = [False, True] if args.int8 else [False]

    if args.cold_start:
        for int8 in engines:
            print(json.dumps(run_cold_start(int8, args.model_path,
                                            args.wipe_cache)), flush=True)
        return

    for int8 in engines:
        for row in run_config(int8, args.model_path, args.seq_n,
                              args.conc, args.conc_m):
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
