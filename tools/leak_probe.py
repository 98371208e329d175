"""Bisect the serving-soak RSS leak (round 5).

The first real 10-minute soak (tools/serving_soak.py --minutes 10
--clients 8) failed its flat-RSS invariant: 4040 -> 10862 MB over
~3600 requests, ~1.9 MB/request — suspiciously one 1024^2 class map
plus change. This probe drives the layers one at a time on the real
chip and reports RSS growth per layer so the leak can be pinned:

  predictor   BatchingPredictor.submit loop (the soak's exact path)
  engine      calc.predict_images over ProcessedImage items
  step        the jitted device step alone (upload -> pull)
  postprocess the native remove_small_zones path alone

Usage: python tools/leak_probe.py [--iters 200] [--layer all]
"""
from __future__ import annotations

import argparse
import gc
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def run_layer(layer: str, calc, iters: int, h: int = 1024,
              w: int = 1024) -> dict:
    from neuralbarkcalculator_tpu.pipeline.preprocess import ProcessedImage

    rng = np.random.default_rng(0)
    img = (rng.uniform(0.2, 0.9, (h, w, 3)) * 255).astype(np.uint8)

    if layer == "predictor":
        from neuralbarkcalculator_tpu.pipeline.serving import \
            BatchingPredictor
        predictor = BatchingPredictor(calc, max_wait_ms=5.0)
        predictor.warmup(height=h, width=w)

        def once(i: int) -> None:
            predictor.submit(img, exclude_nodes=bool(i % 2)).result(
                timeout=600)

        def done() -> None:
            predictor.close()

    elif layer == "engine":
        items = [ProcessedImage(img, "x.png", "sapin")]
        for _ in calc.predict_images(items):  # warm + calibrate
            pass

        def once(i: int) -> None:
            for _ in calc.predict_images(items):
                pass

        done = gc.collect

    elif layer == "step":
        import jax
        import jax.numpy as jnp
        step = calc._device_step(h, 1, pack=True)
        dev = jax.device_put(img[None], calc.rules.image_batch)
        vh = jax.device_put(jnp.full((1,), h, jnp.int32), calc.rules.batch)
        row_ops = jax.device_put(
            jnp.stack([calc._row_op_dev(h, h)]), calc.rules.batch)
        variables = calc.variables
        np.asarray(step(variables, dev, vh, row_ops))  # compile

        def once(i: int) -> None:
            np.asarray(step(variables, dev, vh, row_ops))

        done = gc.collect

    elif layer == "postprocess":
        from neuralbarkcalculator_tpu.io import native as N
        cmap = (rng.uniform(0, 3, (h, w))).astype(np.uint8)
        packed = np.zeros((h, w // 4), np.uint8)
        for k in range(4):
            packed |= (cmap[:, k::4] & 3) << (2 * k)
        if N.remove_small_zones_host2(packed[None], w,
                                      packed=True) is None:
            raise SystemExit("native batch2 unavailable")

        def once(i: int) -> None:
            N.remove_small_zones_host2(packed[None], w, packed=True,
                                       exclude_nodes=bool(i % 2))

        done = gc.collect
    else:
        raise SystemExit(f"unknown layer {layer}")

    gc.collect()
    r0 = rss_mb()
    samples = [r0]
    for i in range(iters):
        once(i)
        if (i + 1) % max(1, iters // 10) == 0:
            samples.append(rss_mb())
    done()
    gc.collect()
    r1 = rss_mb()
    growth = samples[-1] - samples[1] if len(samples) > 2 else r1 - r0
    return {"layer": layer, "iters": iters, "rss_start_mb": round(r0, 1),
            "rss_end_mb": round(r1, 1),
            "growth_after_first_sample_mb": round(growth, 1),
            "per_iter_kb": round(1024.0 * growth /
                                 max(1, iters * 9 // 10), 1),
            "samples_mb": [round(s, 1) for s in samples]}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--layer", default="all",
                    choices=("all", "predictor", "engine", "step",
                             "postprocess"))
    ap.add_argument("--model_path", default=os.path.expanduser(
        "~/.cache/neuralbarkcalculator_tpu/bench_model.msgpack"))
    args = ap.parse_args()

    import jax

    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.pipeline.predict import \
        NeuralBarkCalculator

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    np.asarray(jax.numpy.ones((8, 128)))

    config = PredictConfig(model_path=args.model_path, batch_size=8,
                           fixed_pad_height=1024)
    calc = NeuralBarkCalculator(args.model_path, config=config)

    layers = (["postprocess", "step", "engine", "predictor"]
              if args.layer == "all" else [args.layer])
    import json
    for layer in layers:
        rep = run_layer(layer, calc, args.iters)
        print(json.dumps(rep), flush=True)


if __name__ == "__main__":
    main()
