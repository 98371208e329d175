"""Sweep the accepted XLA:TPU compiler options over the inference step.

The train-side sweep (tools/dropout_cliff_probe3.py) established which
options this environment's compile helper accepts: latency-hiding
scheduler off, scoped-VMEM size, rwb fusion off (the fusion-strategy
options are rejected server-side with stable HTTP-500s). This probe
asks the question nobody asked yet: do any of the accepted knobs move
the PRODUCTION INFERENCE step (bf16+fold and int8, batch 32, 1024²)?

Protocol matches tools/inference_step_bench.py: the engine's exact
_device_step (normalize + forward + fused Pallas upsample/argmax +
2-bit pack), dispatch differencing (T_24-T_4)/20, best of 3, on the
trained bench model. Each option set is threaded through the new
PredictConfig.compiler_options escape hatch, so the probe exercises
the deployment path end to end.

Writes benchmarks/inference_opts.json.
Run: python tools/inference_opts_probe.py [--batch 32]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

CANDIDATES: dict[str, dict] = {
    "baseline": {},
    "no_latency_hiding": {
        "xla_tpu_enable_latency_hiding_scheduler": "false"},
    "vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": 65536},
    "rwb_fusion_off": {"xla_tpu_rwb_fusion": "false"},
}

# pass 1 measured vmem_64m fastest in BOTH modes (bf16 7.25 -> 7.04,
# int8 4.99 -> 4.77 ms/img) and the other knobs neutral; pass 2 scans
# the scoped-VMEM ladder to find the knee and re-checks reproducibility
# before the engine default moves (--scan_vmem)
VMEM_SCAN: dict[str, dict] = {
    "baseline": {},
    "vmem_48m": {"xla_tpu_scoped_vmem_limit_kib": 49152},
    "vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": 65536},
    "vmem_96m": {"xla_tpu_scoped_vmem_limit_kib": 98304},
}


def time_fn(fn, args_, k1: int = 4, k2: int = 24, samples: int = 3):
    np.asarray(fn(*args_))

    def run(k: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn(*args_)
        np.asarray(out)
        return time.perf_counter() - t0

    run(2)
    return min(1e3 * (run(k2) - run(k1)) / (k2 - k1)
               for _ in range(samples))


def measure(model_path: str, int8: bool, batch: int,
            opts: dict) -> float | str:
    import jax
    import jax.numpy as jnp

    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.pipeline.predict import \
        NeuralBarkCalculator
    from neuralbarkcalculator_tpu.pipeline.preprocess import ProcessedImage

    config = PredictConfig(model_path=model_path, batch_size=batch,
                           quantize_int8=int8,
                           compiler_options=opts or None)
    calc = NeuralBarkCalculator(model_path, config=config)
    h = w = 1024
    rng = np.random.default_rng(0)
    imgs = (rng.uniform(0.2, 0.9, (batch, h, w, 3)) * 255).astype(np.uint8)
    items = [ProcessedImage(im, f"t{i}.png", "sapin")
             for i, im in enumerate(imgs)]
    try:
        for _ in calc.predict_images(items):  # calibrate + warm + compile
            pass
        dev = jax.device_put(imgs, calc.rules.image_batch)
        vh = jax.device_put(jnp.full((batch,), h, jnp.int32),
                            calc.rules.batch)
        row_ops = jax.device_put(
            jnp.stack([calc._row_op_dev(h, h)] * batch), calc.rules.batch)
        step = calc._device_step(h, batch, pack=True)
        ms = time_fn(step, (calc.variables, dev, vh, row_ops))
    except Exception as e:  # rejected option / compile failure
        return f"rejected: {type(e).__name__}: {str(e)[:160]}"
    return round(ms / batch, 3)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--scan_vmem", action="store_true",
                    help="scan the scoped-VMEM ladder instead of the "
                         "full option set; writes "
                         "inference_opts_vmem.json")
    ap.add_argument("--model_path", default=os.path.expanduser(
        "~/.cache/neuralbarkcalculator_tpu/bench_model.msgpack"))
    args = ap.parse_args()

    import jax
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    np.asarray(jax.numpy.ones((8, 128)))

    out: dict[str, object] = {
        "tool": "tools/inference_opts_probe.py",
        "protocol": ("engine _device_step via "
                     "PredictConfig.compiler_options, dispatch "
                     "differencing (T_24-T_4)/20 best of 3, ms/img, "
                     "1024x1024, trained bench model"),
        "batch": args.batch,
        "backend": jax.default_backend(),
    }
    cands = VMEM_SCAN if args.scan_vmem else CANDIDATES
    for mode, int8 in (("bf16_fold", False), ("int8", True)):
        res = {}
        for name, opts in cands.items():
            res[name] = measure(args.model_path, int8, args.batch, opts)
            print(json.dumps({mode: {name: res[name]}}), flush=True)
        out[mode] = res
    path = os.path.join(REPO, "benchmarks",
                        "inference_opts_vmem.json" if args.scan_vmem
                        else "inference_opts.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
