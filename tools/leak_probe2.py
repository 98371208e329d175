"""Leak probe 2: pin the predict_images RSS growth to a primitive.

leak_probe.py pinned the soak leak to the engine layer (~2.9 MB/call at
batch 1) while the reused-buffer device step is flat. Candidates the
engine does per call that the step probe did not:

  devput       jax.device_put of a fresh 3 MB uint8 host array
  devput_del   same + explicit .delete() of the device array
  devput_samebuf  device_put of the SAME host array each iter
  dispatch     device_put + the cached jitted step + pull
  tracked      engine loop + python-object accounting (tracemalloc top)

Usage: python tools/leak_probe2.py [--iters 200] [--which all]
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


def measure(name: str, iters: int, once, setup=None) -> dict:
    state = setup() if setup else None
    once(0, state)  # warm
    gc.collect()
    r0 = rss_mb()
    samples = [r0]
    for i in range(1, iters):
        once(i, state)
        if i % max(1, iters // 10) == 0:
            samples.append(rss_mb())
    gc.collect()
    r1 = rss_mb()
    growth = samples[-1] - samples[1] if len(samples) > 2 else r1 - r0
    rep = {"which": name, "iters": iters,
           "growth_mb": round(growth, 1),
           "per_iter_kb": round(1024 * growth / max(1, iters * 9 // 10),
                                1),
           "samples_mb": [round(s, 1) for s in samples]}
    print(__import__("json").dumps(rep), flush=True)
    return rep


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--which", default="all")
    ap.add_argument("--model_path", default=os.path.expanduser(
        "~/.cache/neuralbarkcalculator_tpu/bench_model.msgpack"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    np.asarray(jnp.ones((8, 128)))

    rng = np.random.default_rng(0)
    h = w = 1024
    img = (rng.uniform(0.2, 0.9, (1, h, w, 3)) * 255).astype(np.uint8)

    want = (("devput", "devput_del", "devput_samebuf", "dispatch",
             "tracked") if args.which == "all" else (args.which,))

    if "devput" in want:
        def once(i, _):
            fresh = img + np.uint8(i % 2)  # new host buffer each iter
            d = jax.device_put(fresh)
            d.block_until_ready()
            del d
        measure("devput", args.iters, once)

    if "devput_del" in want:
        def once(i, _):
            fresh = img + np.uint8(i % 2)
            d = jax.device_put(fresh)
            d.block_until_ready()
            d.delete()
        measure("devput_del", args.iters, once)

    if "devput_samebuf" in want:
        def once(i, _):
            d = jax.device_put(img)
            d.block_until_ready()
            del d
        measure("devput_samebuf", args.iters, once)

    if "dispatch" in want or "tracked" in want:
        from neuralbarkcalculator_tpu.config import PredictConfig
        from neuralbarkcalculator_tpu.pipeline.predict import \
            NeuralBarkCalculator
        config = PredictConfig(model_path=args.model_path, batch_size=8,
                               fixed_pad_height=1024)
        calc = NeuralBarkCalculator(args.model_path, config=config)

    if "dispatch" in want:
        step = calc._device_step(h, 1, pack=True)
        vh = jax.device_put(jnp.full((1,), h, jnp.int32),
                            calc.rules.batch)
        row_ops = jax.device_put(jnp.stack([calc._row_op_dev(h, h)]),
                                 calc.rules.batch)
        variables = calc.variables

        def once(i, _):
            fresh = img + np.uint8(i % 2)
            dev = jax.device_put(fresh, calc.rules.image_batch)
            np.asarray(step(variables, dev, vh, row_ops))
        measure("dispatch", args.iters, once)

    if "tracked" in want:
        from neuralbarkcalculator_tpu.pipeline.preprocess import \
            ProcessedImage
        items = [ProcessedImage(img[0], "x.png", "sapin")]
        for _ in calc.predict_images(items):
            pass
        gc.collect()

        def live_np_mb() -> float:
            tot = 0
            for o in gc.get_objects():
                if isinstance(o, np.ndarray):
                    tot += o.nbytes
            return tot / 1e6

        def live_jax() -> tuple[int, float]:
            arrs = [o for o in gc.get_objects()
                    if isinstance(o, jax.Array)]
            return len(arrs), sum(
                int(np.prod(a.shape)) * a.dtype.itemsize
                for a in arrs) / 1e6

        n0, j0 = live_jax()
        np0 = live_np_mb()

        def once(i, _):
            for _ in calc.predict_images(items):
                pass
        rep = measure("tracked", args.iters, once)
        gc.collect()
        n1, j1 = live_jax()
        np1 = live_np_mb()
        print(__import__("json").dumps({
            "which": "tracked_objects",
            "live_jax_arrays": [n0, n1],
            "live_jax_mb": [round(j0, 1), round(j1, 1)],
            "live_np_mb": [round(np0, 1), round(np1, 1)],
            "live_buffers_device": len(jax.live_arrays())
            if hasattr(jax, "live_arrays") else None}), flush=True)


if __name__ == "__main__":
    main()
