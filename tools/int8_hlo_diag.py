"""Optimized-HLO diagnosis of the int8 backbone plateau.

tools/int8_backbone_probe.py (benchmarks/int8_backbone_stages.json)
located the int8 plateau inside the backbone and showed it is spread
over every stage (1.1-1.4x vs bf16+fold, stem even slower) rather than
concentrated in the dilated layers. Timing alone cannot say WHY, so
this tool inspects the post-optimization HLO of the exact probe
programs (int8 and bf16+fold backbone at the production batch):

- every `convolution` op: operand dtypes/shapes, result dtype, window
  (stride/dilation) -- proves whether XLA kept s8 x s8 -> s32 MXU convs
  or silently upcast some of them;
- every entry-computation instruction output: bytes by dtype, i.e. what
  actually travels through HBM between fusions -- catches f32/bf16
  intermediates that the "everything fuses into the conv epilogue"
  story assumes away (e.g. the residual dequant/add in
  models/resnet.py::_quantized_forward);
- the top-N largest materialized outputs with their op kinds, so a fat
  fusion output is attributable to a specific graph site.

Writes benchmarks/int8_hlo_diag.json.
Run: python tools/int8_hlo_diag.py [--batch 32]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import numpy as np

from int8_attribution import build  # noqa: E402

DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2,
               "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "f32": 4,
               "s64": 8, "u64": 8, "f64": 8}

_SHAPE_RE = re.compile(r"^(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str):
    """'f32[32,128,128,512]{...}' -> (dtype, bytes). Tuples return None
    (their components appear as get-tuple-element consumers)."""
    m = _SHAPE_RE.match(shape_str)
    if not m:
        return None
    dt, dims = m.group(1), m.group(2)
    if dt not in DTYPE_BYTES:
        return None
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return dt, n * DTYPE_BYTES[dt]


def parse_hlo(text: str, top_n: int = 20) -> dict:
    """Summarize an optimized HLO module: conv table, per-dtype output
    bytes over the entry computation, largest materialized outputs."""
    # Entry computation: the block after `ENTRY %name (...) -> ... {`.
    entry = text[text.index("ENTRY "):]
    # name -> 'dtype[shape]' for every instruction definition, so conv
    # operand dtypes can be resolved (optimized HLO prints operands as
    # bare names).
    defs = {m.group(1): m.group(2) for m in re.finditer(
        r"%?([\w.\-]+) = (\w+\[[\d,]*\])", text)}
    convs = []
    for m in re.finditer(
            r"= (\w+)\[[\d,]*\]\S* convolution\(([^)]*)\)([^\n]*)", text):
        line = m.group(0)
        operands = [defs.get(n.lstrip("%"), "?")
                    for n in re.findall(r"%?[\w.\-]+", m.group(2))]
        win = re.search(r"window={([^}]*)}", line)
        convs.append({
            "result_dtype": m.group(1),
            "operands": operands,
            "window": win.group(1) if win else "",
        })
    by_dtype = defaultdict(int)
    largest = []
    for line in entry.splitlines():
        line = line.strip()
        m = re.match(r"%?[\w.\-]+ = (\S+\[[^\]]*\][^ ]*) (\w+)", line)
        if not m:
            continue
        sb = shape_bytes(m.group(1))
        if sb is None:
            continue
        dt, nbytes = sb
        op = m.group(2)
        if op in ("parameter", "constant", "get-tuple-element"):
            continue
        by_dtype[dt] += nbytes
        largest.append((nbytes, dt, op, m.group(1).split("{")[0]))
    largest.sort(reverse=True)
    conv_sig = defaultdict(int)
    for c in convs:
        ops = "x".join(o.split("[")[0] for o in c["operands"])
        conv_sig[ops + "->" + c["result_dtype"]] += 1
    return {
        "n_convs": len(convs),
        "conv_dtype_signatures": dict(conv_sig),
        "entry_output_bytes_by_dtype":
            {k: v for k, v in sorted(by_dtype.items(),
                                     key=lambda kv: -kv[1])},
        "entry_output_total_mb": round(sum(by_dtype.values()) / 2**20, 1),
        "largest_outputs": [
            {"mb": round(b / 2**20, 1), "dtype": dt, "op": op, "shape": sh}
            for b, dt, op, sh in largest[:top_n]],
        "convs": convs,
    }


def lower_backbone(calc, batch: int, h: int = 1024, w: int = 1024):
    import jax
    import jax.numpy as jnp

    from neuralbarkcalculator_tpu.models.resnet import apply_row_mask
    from neuralbarkcalculator_tpu.pipeline.preprocess import ProcessedImage

    rng = np.random.default_rng(0)
    imgs = (rng.uniform(0.2, 0.9, (batch, h, w, 3)) * 255).astype(np.uint8)
    for _ in calc.predict_images(
            [ProcessedImage(im, f"t{i}.png", "sapin")
             for i, im in enumerate(imgs)]):  # calibrate int8
        pass
    dev = jax.device_put(imgs, calc.rules.image_batch)
    vh = jax.device_put(jnp.full((batch,), h, jnp.int32), calc.rules.batch)
    mean, std = jnp.asarray(calc.mean), jnp.asarray(calc.std)
    backbone = calc.model.backbone
    bb_vars = {c: t["backbone"] for c, t in calc.variables.items()
               if isinstance(t, dict) and "backbone" in t}

    def fn(v, b, s):
        x = b.astype(jnp.float32) / 255.0
        x = apply_row_mask((x - mean) / std, s)
        return jnp.sum(backbone.apply(v, x, train=False,
                                      valid_h=s).astype(jnp.float32))

    return jax.jit(fn).lower(bb_vars, dev, vh).compile()


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model_path", default=os.path.expanduser(
        "~/.cache/neuralbarkcalculator_tpu/bench_model.msgpack"))
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dump_dir", default=None,
                    help="also write the raw optimized HLO text here")
    args = ap.parse_args()

    import jax
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    np.asarray(jax.numpy.ones((8, 128)))

    out: dict[str, object] = {
        "tool": "tools/int8_hlo_diag.py",
        "protocol": ("post-optimization HLO of the int8_backbone_probe "
                     "full-backbone program; conv dtype census + entry-"
                     "computation materialized-output bytes by dtype"),
        "batch": args.batch,
        "backend": jax.default_backend(),
    }
    for int8 in (False, True):
        key = "int8" if int8 else "bf16_fold"
        calc = build(args.model_path, int8, args.batch)
        compiled = lower_backbone(calc, args.batch)
        text = compiled.as_text()
        if args.dump_dir:
            os.makedirs(args.dump_dir, exist_ok=True)
            with open(os.path.join(args.dump_dir, f"{key}.hlo"), "w") as f:
                f.write(text)
        summary = parse_hlo(text)
        # the full conv table is bulky; keep it in the dump, not the JSON
        summary.pop("convs")
        out[key] = summary
        print(json.dumps({key: summary}, indent=1), flush=True)
        del calc, compiled, text

    path = os.path.join(REPO, "benchmarks", "int8_hlo_diag.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
