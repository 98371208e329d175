"""Measure the engine's real device step: bf16+fold (default) vs int8.

Times the exact jitted program the predict engine runs (normalize +
forward + fused upsample/argmax + 2-bit pack, pipeline/predict.py
``_device_step``) on a device-resident batch, so the number is pure
device time — no link traffic inside the timed region.

Tunnel-safe methodology: through the tunneled runtime, dispatch returns
at enqueue and ``block_until_ready`` does not cover execution
(tools/int8_probe.py), so we time "K dispatches + one host pull of the
last output" and difference two K values: the device executes programs
in submission order, so (T_K2 - T_K1) / (K2 - K1) is one step with the
pull/RTT cancelled.

Run on the real chip: ``python tools/int8_step_bench.py [--batch N]``.
Writes one JSON line per config; paste into docs/SCALING.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_engine(model_path: str, int8: bool, batch: int):
    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.pipeline.predict import \
        NeuralBarkCalculator

    config = PredictConfig(model_path=model_path, batch_size=batch,
                           quantize_int8=int8)
    return NeuralBarkCalculator(model_path, config=config)


def time_steps(calc, batch: int, h: int = 1024, w: int = 1024,
               k1: int = 4, k2: int = 24) -> float:
    import jax
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.pipeline.preprocess import ProcessedImage

    rng = np.random.default_rng(0)
    imgs = (rng.uniform(0.2, 0.9, (batch, h, w, 3)) * 255).astype(np.uint8)
    items = [ProcessedImage(im, f"t{i}.png", "sapin")
             for i, im in enumerate(imgs)]
    # one full pump pass: triggers int8 calibration + compiles the step
    for _ in calc.predict_images(items):
        pass

    dev = jax.device_put(imgs, calc.rules.image_batch)
    vh = jax.device_put(jnp.full((batch,), h, jnp.int32), calc.rules.batch)
    row_ops = jax.device_put(
        jnp.stack([calc._row_op_dev(h, h)] * batch), calc.rules.batch)
    fn = calc._device_step(h, batch, pack=(w % 4 == 0))
    np.asarray(fn(calc.variables, dev, vh, row_ops))  # warm

    def run(k: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn(calc.variables, dev, vh, row_ops)
        np.asarray(out)
        return time.perf_counter() - t0

    run(2)  # steady-state
    best = min((run(k2) - run(k1)) / (k2 - k1) for _ in range(3))
    return best * 1000.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default=os.path.expanduser(
        "~/.cache/neuralbarkcalculator_tpu/bench_model.msgpack"))
    ap.add_argument("--batch", type=int, default=None,
                    help="single batch size (default: sweep 4, 8)")
    args = ap.parse_args()

    import jax
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    for batch in ([args.batch] if args.batch else [4, 8]):
        for int8 in (False, True):
            calc = build_engine(args.model_path, int8, batch)
            ms = time_steps(calc, batch)
            print(json.dumps({
                "config": "int8" if int8 else "bf16+fold",
                "batch": batch,
                "step_ms": round(ms, 2),
                "ms_per_img": round(ms / batch, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
