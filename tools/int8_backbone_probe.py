"""Per-STAGE attribution of the backbone int8 gap.

tools/int8_attribution.py (benchmarks/int8_attribution.json) showed the
int8 engine-step plateau lives in the BACKBONE: 5.91 -> 4.59 ms/img at
b32 is only 1.29x over bf16+fold while the head gets 1.84x (~95% of the
394 TOPs int8 roofline) and everything after it is noise. This tool
splits the backbone by residual stage to find which stage eats the gap:
it times cumulative prefixes (stem+pool, +layer1, +layer2, +layer3,
+layer4) of the REAL quantized/folded backbone by cloning the module
with truncated ``stage_sizes`` and filtering the variable tree to the
parameters those stages own — the per-stage cost is the adjacent
difference, same dispatch-differencing protocol as the attribution
tool. Also records XLA cost_analysis (flops + bytes accessed) of the
full-backbone programs so arithmetic-vs-bandwidth attribution doesn't
rest on timing alone.

Writes benchmarks/int8_backbone_stages.json.
Run: python tools/int8_backbone_probe.py [--batch 32]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

from int8_attribution import build, time_fn  # noqa: E402  (same dir)


def _filter_backbone(tree: dict, n_stages: int) -> dict:
    """Keep stem/global params plus layer1..layer<n_stages> blocks."""
    keep = tuple(f"layer{i + 1}_" for i in range(n_stages))
    return {k: v for k, v in tree.items()
            if not k.startswith("layer") or k.startswith(keep)}


def probe(calc, batch: int, h: int = 1024, w: int = 1024) -> dict:
    import jax
    import jax.numpy as jnp

    from neuralbarkcalculator_tpu.models.resnet import apply_row_mask
    from neuralbarkcalculator_tpu.pipeline.preprocess import ProcessedImage

    rng = np.random.default_rng(0)
    imgs = (rng.uniform(0.2, 0.9, (batch, h, w, 3)) * 255).astype(np.uint8)
    for _ in calc.predict_images(
            [ProcessedImage(im, f"t{i}.png", "sapin")
             for i, im in enumerate(imgs)]):  # calibrate int8 + warm
        pass

    dev = jax.device_put(imgs, calc.rules.image_batch)
    vh = jax.device_put(jnp.full((batch,), h, jnp.int32), calc.rules.batch)
    mean, std = jnp.asarray(calc.mean), jnp.asarray(calc.std)
    backbone = calc.model.backbone
    bb_vars = {c: t["backbone"] for c, t in calc.variables.items()
               if isinstance(t, dict) and "backbone" in t}
    n_total = len(backbone.stage_sizes)

    def normalize(batch_u8, valid_h):
        x = batch_u8.astype(jnp.float32) / 255.0
        return apply_row_mask((x - mean) / std, valid_h)

    out = {"cumulative_ms": {}, "stage_ms": {}, "stage_ms_per_img": {},
           "cost_analysis": {}}
    prev_ms = 0.0
    for n_stages in range(n_total + 1):
        sub = backbone.clone(stage_sizes=backbone.stage_sizes[:n_stages])
        sub_vars = {c: _filter_backbone(t, n_stages)
                    for c, t in bb_vars.items()}
        fn = jax.jit(lambda v, b, s, m=sub: jnp.sum(
            m.apply(v, normalize(b, s), train=False,
                    valid_h=s).astype(jnp.float32)))
        ms = time_fn(fn, (sub_vars, dev, vh))
        name = "stem_pool" if n_stages == 0 else f"layer{n_stages}"
        out["cumulative_ms"][name] = round(ms, 2)
        out["stage_ms"][name] = round(ms - prev_ms, 2)
        out["stage_ms_per_img"][name] = round((ms - prev_ms) / batch, 3)
        if n_stages == n_total:
            try:
                ca = fn.lower(sub_vars, dev, vh).compile().cost_analysis()
                out["cost_analysis"] = {
                    "flops": ca.get("flops"),
                    "bytes_accessed": ca.get("bytes accessed"),
                }
            except Exception as e:  # pragma: no cover
                out["cost_analysis"] = {"unavailable": str(e)}
        prev_ms = ms
    out["full_backbone_ms_per_img"] = round(prev_ms / batch, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model_path", default=os.path.expanduser(
        "~/.cache/neuralbarkcalculator_tpu/bench_model.msgpack"))
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    np.asarray(jax.numpy.ones((8, 128)))

    out: dict[str, object] = {
        "tool": "tools/int8_backbone_probe.py",
        "protocol": ("cumulative stage-prefix programs (truncated "
                     "stage_sizes clones of the real backbone), dispatch "
                     "differencing (T_24-T_4)/20, best of 3; stage = "
                     "adjacent difference; 1024x1024, trained bench "
                     "model"),
        "batch": args.batch,
        "backend": jax.default_backend(),
    }
    for int8 in (False, True):
        calc = build(args.model_path, int8, args.batch)
        key = "int8" if int8 else "bf16_fold"
        out[key] = probe(calc, args.batch)
        print(json.dumps({key: out[key]}, indent=1), flush=True)
        del calc

    path = os.path.join(REPO, "benchmarks", "int8_backbone_stages.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
