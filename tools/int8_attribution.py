"""Per-stage attribution of the int8 (and bf16+fold) engine step.

VERDICT r3 item 2 / r4 item 6: the int8 engine step plateaus at
~5.0 ms/img (b32) against an isolated conv probe suggesting 1.6-2x over
bf16; the attribution says where the non-conv remainder lives. Round 4
measured it with CUMULATIVE-PREFIX programs (stage = adjacent
difference of P_k programs) — and produced a NEGATIVE stage time
(-8.78 ms for bf16 upsample_argmax): adding a stage changed XLA's
layout/fusion decisions enough that the longer program ran faster, so
prefix differencing cannot isolate stages across fusion boundaries.

This version times each stage as its OWN ISOLATED jitted program, fed a
device-resident input materialized once from the previous stage:

  S_normalize        u8 batch          -> masked normalized f32
  S_backbone         normalized f32    -> stride-8 feature map
  S_head             feature map       -> 3-class logits (stride 8)
  S_upsample_argmax  logits + row ops  -> class map (Pallas kernel)
  S_pack             class map         -> 2-bit packed pull buffer

No difference of two programs is taken, so no stage can go
structurally negative the way prefix differencing did (a near-free
stage like the 2-bit pack can still read +-0.05 ms of dispatch-clock
noise around zero — that is clock resolution, not protocol error).
The stages do NOT sum exactly to the fused production step: each
isolated program materializes its input/output through HBM where the
fused step lets XLA fuse across the boundary; "isolated_sum_ms" vs
"fused_step_ms" quantifies that (fusion gain >= 0 is the expected
sign). Every program reduces its output to a scalar ON DEVICE (sum):
raw intermediates reach 384 MB and a slow dev link's pull variance
would swamp the clock. The absolute per-image time of the REAL packed
production step lives in benchmarks/inference_step.json.

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
    import functools

    import jax
    import jax.numpy as jnp

    from neuralbarkcalculator_tpu.models.resnet import apply_row_mask
    from neuralbarkcalculator_tpu.ops.pallas_kernels import upsample_argmax
    from neuralbarkcalculator_tpu.ops.resize import bicubic_resize_matrix
    from neuralbarkcalculator_tpu.pipeline.predict import _pack2bit
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

    # Every stage program returns a device-side SCALAR (sum of its
    # output): intermediates are up to 384 MB and a slow link's pull
    # variance would swamp the clock. The reduction adds <1 ms of HBM
    # traffic; it is part of each stage's quoted cost.
    def scalar(x):
        return jnp.sum(x.astype(jnp.float32))

    # slice per-collection subtrees inside the traced fn so the same
    # code serves plain ({params, batch_stats}) and folded/quantized
    # ({params}-only) variable layouts
    def subvars(v, name):
        return {c: t[name] for c, t in v.items()
                if isinstance(t, dict) and name in t}

    def backbone_feat(v, x, s):
        return model.backbone.apply(subvars(v, "backbone"), x,
                                    train=False, valid_h=s)

    # materialize each stage's input ONCE, device-resident
    x_norm = jax.jit(normalize)(dev, vh)
    feat = jax.jit(backbone_feat)(variables, x_norm, vh)
    feat_h = model.backbone.valid_feature_height(vh)

    def head(v, f, fh):
        return model.classifier.apply(subvars(v, "classifier"), f,
                                      train=False,
                                      valid_h=fh).astype(jnp.float32)

    logits = jax.jit(head)(variables, feat, feat_h)
    colt = jnp.asarray(np.ascontiguousarray(
        bicubic_resize_matrix(logits.shape[2], w).T), jnp.float32)
    interpret = bool(getattr(calc.config, "pallas_interpret", False))
    kernel = functools.partial(upsample_argmax, out_w=w,
                               interpret=interpret)
    # The isolated upsample programs need the same scoped-VMEM headroom
    # the production step grants itself (predict.py::_device_step): at
    # batch 32 XLA stack-allocates the kernel's [B, OH, OW] u8 output in
    # scoped VMEM and the default 16 MB limit is a compile-time OOM.
    vmem_opts = ({"xla_tpu_scoped_vmem_limit_kib": 65536}
                 if jax.default_backend() == "tpu" and not interpret
                 else None)
    preds = jax.jit(lambda lg, r, c: kernel(lg, r, c),
                    compiler_options=vmem_opts)(logits, row_ops, colt)

    s_norm = jax.jit(lambda b, s: scalar(normalize(b, s)))
    s_backbone = jax.jit(lambda v, x, s: scalar(backbone_feat(v, x, s)))
    s_head = jax.jit(lambda v, f, fh: scalar(head(v, f, fh)))
    s_upsample = jax.jit(lambda lg, r, c: scalar(kernel(lg, r, c)),
                         compiler_options=vmem_opts)
    s_pack = jax.jit(lambda p: scalar(_pack2bit(p)))
    # the fused production step for the fusion-gain comparison; it
    # carries its own compiler_options so it cannot nest in another jit
    # — scalarize with a second tiny dispatch (uint8 output is small)
    step = calc._device_step(h, batch, pack=True)
    sum_dev = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    fused = lambda v, b, s, r: sum_dev(step(v, b, s, r))

    stages = {
        "normalize": time_fn(s_norm, (dev, vh)),
        "backbone": time_fn(s_backbone, (variables, x_norm, vh)),
        "head": time_fn(s_head, (variables, feat, feat_h)),
        "upsample_argmax": time_fn(s_upsample, (logits, row_ops, colt)),
        "pack": time_fn(s_pack, (preds,)),
    }
    fused_ms = time_fn(fused, (variables, dev, vh, row_ops))
    isolated_sum = sum(stages.values())
    return {
        "stage_ms": {k: round(v, 2) for k, v in stages.items()},
        "stage_ms_per_img": {k: round(v / batch, 3)
                             for k, v in stages.items()},
        "isolated_sum_ms": round(isolated_sum, 2),
        "fused_step_ms": round(fused_ms, 2),
        "fusion_gain_ms": round(isolated_sum - fused_ms, 2),
        "full_step_ms_per_img": round(fused_ms / batch, 3),
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
        "protocol": ("ISOLATED per-stage programs (each stage its own "
                     "jit on a device-resident input, on-device scalar "
                     "reduce), dispatch differencing (T_24-T_4)/20, "
                     "best of 3; no program differences taken, so no "
                     "stage can go STRUCTURALLY negative (near-free "
                     "stages like pack can still read +-0.05 ms of "
                     "dispatch-clock noise around zero); isolated_sum "
                     "- fused_step = XLA cross-stage fusion gain; "
                     "1024x1024, trained bench model"),
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
