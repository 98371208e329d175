"""Per-stage attribution of the int8 (and bf16+fold) engine step.

VERDICT r3 item 2: the int8 engine step plateaus at ~5.3 ms/img (b32)
against an isolated conv probe suggesting 1.6-2x over bf16; the gap was
asserted to be the non-conv remainder (Pallas upsample/argmax, f32
residual adds, requant epilogues) but never measured. This tool measures
it, stage by stage, with cumulative-prefix programs under the same
dispatch-differencing protocol as tools/inference_step_bench.py:

  P0  normalize + row mask                 (u8 -> masked normalized f32)
  P1  P0 + backbone forward                (feature map, stride 8)
  P2  P1 + head                            (= engine head_logits method)
  P3  P2 + Pallas upsample/argmax          (engine step, pack=False)
  P4  P3 + 2-bit pack                      (the exact production step)

Stage costs are adjacent differences (P1-P0 = backbone, etc.), so they
sum to P4 by construction; program boundaries change layout/fusion
decisions slightly, so the decomposition is attribution-grade, not
exact. As a protocol-consistency anchor, "unified_bench_ms_per_img"
echoes the committed benchmarks/inference_step.json row for the same
batch/dtype and "scalarize_residual_ms_per_img" is P4 minus that row
(the cost delta of the on-device sum + prefix-program layout shifts
vs the real packed-pull step). Every prefix program reduces its output to a
scalar ON DEVICE (sum): the raw intermediates reach 384 MB, and pulling
them through a slow dev link adds seconds of run-to-run variance that
swamps the differencing. The absolute per-image step time of the REAL
(non-scalarized) production step lives in benchmarks/inference_step.json.

Writes benchmarks/int8_attribution.json.
Run: python tools/int8_attribution.py [--batch 32] [--no_int8]
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


def time_fn(fn, args_, k1: int = 4, k2: int = 24, samples: int = 3):
    """Dispatch-differenced ms per call, best of ``samples``."""
    np.asarray(fn(*args_))  # compile + warm

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


def build(model_path: str, int8: bool, batch: int):
    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.pipeline.predict import \
        NeuralBarkCalculator

    config = PredictConfig(model_path=model_path, batch_size=batch,
                           quantize_int8=int8)
    return NeuralBarkCalculator(model_path, config=config)


def attribute(calc, batch: int, h: int = 1024, w: int = 1024) -> dict:
    import jax
    import jax.numpy as jnp

    from neuralbarkcalculator_tpu.models.resnet import apply_row_mask
    from neuralbarkcalculator_tpu.models.segmentation import \
        SegmentationModel
    from neuralbarkcalculator_tpu.pipeline.preprocess import ProcessedImage

    rng = np.random.default_rng(0)
    imgs = (rng.uniform(0.2, 0.9, (batch, h, w, 3)) * 255).astype(np.uint8)
    items = [ProcessedImage(im, f"t{i}.png", "sapin")
             for i, im in enumerate(imgs)]
    for _ in calc.predict_images(items):  # calibrate int8 + warm engine
        pass

    dev = jax.device_put(imgs, calc.rules.image_batch)
    vh = jax.device_put(jnp.full((batch,), h, jnp.int32), calc.rules.batch)
    row_ops = jax.device_put(
        jnp.stack([calc._row_op_dev(h, h)] * batch), calc.rules.batch)
    mean = jnp.asarray(calc.mean)
    std = jnp.asarray(calc.std)
    variables = calc.variables
    model = calc.model

    def normalize(batch_u8, valid_h):
        x = batch_u8.astype(jnp.float32) / 255.0
        x = (x - mean) / std
        return apply_row_mask(x, valid_h)

    # Every prefix program returns a device-side SCALAR (sum of its
    # output): the intermediates are up to 384 MB (normalized f32 batch)
    # and pulling them through a slow link makes the pull's run-to-run
    # variance (seconds) swamp the dispatch differencing — the first
    # version of this tool produced NEGATIVE stage times exactly that
    # way. The on-device reduction adds one HBM pass (<1 ms at these
    # sizes), identical across K, so it cancels in the differences.
    def scalar(x):
        return jnp.sum(x.astype(jnp.float32))

    p0 = jax.jit(lambda v, b, s: scalar(normalize(b, s)))
    # backbone-only: slice every collection's "backbone" subtree inside
    # the traced fn so the same code serves plain ({params, batch_stats})
    # and folded/quantized ({params}-only) variable layouts
    p1 = jax.jit(lambda v, b, s: scalar(model.backbone.apply(
        {c: t["backbone"] for c, t in v.items()
         if isinstance(t, dict) and "backbone" in t},
        normalize(b, s), train=False, valid_h=s)))

    def head_logits(v, b, s):
        return model.apply(v, normalize(b, s), train=False, valid_h=s,
                           method=SegmentationModel.head_logits)

    # NB head_logits re-normalizes inside (cumulative prefix): P2 - P1 is
    # the head alone only up to the shared prefix, which both sides pay.
    p2 = jax.jit(lambda v, b, s: scalar(head_logits(v, b, s)))
    step3 = calc._device_step(h, batch, pack=False)
    step4 = calc._device_step(h, batch, pack=True)
    # The engine step is already a top-level jit carrying its own
    # compiler_options (scoped VMEM for the Pallas kernel) — it cannot be
    # nested inside another jit. Scalarize with a SECOND tiny dispatch
    # instead: the uint8 outputs are 8-32 MB (not the 384 MB f32 of
    # P0-P2), the sum never leaves the device, and the extra dispatch is
    # identical across K so it cancels in the differencing.
    sum_dev = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    p3 = lambda v, b, s, r: sum_dev(step3(v, b, s, r))
    p4 = lambda v, b, s, r: sum_dev(step4(v, b, s, r))

    rows = {}
    rows["P0_normalize_ms"] = time_fn(p0, (variables, dev, vh))
    rows["P1_plus_backbone_ms"] = time_fn(p1, (variables, dev, vh))
    rows["P2_plus_head_ms"] = time_fn(p2, (variables, dev, vh))
    rows["P3_plus_upsample_argmax_ms"] = time_fn(
        p3, (variables, dev, vh, row_ops))
    rows["P4_plus_pack_ms"] = time_fn(p4, (variables, dev, vh, row_ops))

    stages = {
        "normalize": rows["P0_normalize_ms"],
        "backbone": rows["P1_plus_backbone_ms"] - rows["P0_normalize_ms"],
        "head": rows["P2_plus_head_ms"] - rows["P1_plus_backbone_ms"],
        "upsample_argmax": (rows["P3_plus_upsample_argmax_ms"]
                            - rows["P2_plus_head_ms"]),
        "pack": rows["P4_plus_pack_ms"]
                - rows["P3_plus_upsample_argmax_ms"],
    }
    return {
        "cumulative_ms": {k: round(v, 2) for k, v in rows.items()},
        "stage_ms": {k: round(v, 2) for k, v in stages.items()},
        "stage_ms_per_img": {k: round(v / batch, 3)
                             for k, v in stages.items()},
        "full_step_ms_per_img": round(rows["P4_plus_pack_ms"] / batch, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model_path", default=os.path.expanduser(
        "~/.cache/neuralbarkcalculator_tpu/bench_model.msgpack"))
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--no_int8", action="store_true",
                    help="only measure the bf16+fold step")
    args = ap.parse_args()

    import jax
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    np.asarray(jax.numpy.ones((8, 128)))  # warm the first-pull path

    out: dict[str, object] = {
        "tool": "tools/int8_attribution.py",
        "protocol": ("cumulative-prefix programs, dispatch differencing "
                     "(T_24-T_4)/20, best of 3; stage = adjacent "
                     "difference; 1024x1024, trained bench model"),
        "batch": args.batch,
        "backend": jax.default_backend(),
    }
    unified = {}
    step_json = os.path.join(REPO, "benchmarks", "inference_step.json")
    if os.path.isfile(step_json):
        with open(step_json) as f:
            unified = json.load(f).get("results", {})

    for int8 in ([False] if args.no_int8 else [False, True]):
        calc = build(args.model_path, int8, args.batch)
        key = "int8" if int8 else "bf16_fold"
        out[key] = attribute(calc, args.batch)
        ukey = (f"int8_b{args.batch}" if int8
                else f"bf16_fold_b{args.batch}")
        if ukey in unified:
            ums = unified[ukey]["ms_per_img"]
            out[key]["unified_bench_ms_per_img"] = ums
            out[key]["scalarize_residual_ms_per_img"] = round(
                out[key]["full_step_ms_per_img"] - ums, 3)
        print(json.dumps({key: out[key]}, indent=1), flush=True)
        del calc

    path = os.path.join(REPO, "benchmarks", "int8_attribution.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
