"""Probe 2: does XLA AUTO layout assignment rescue the split trunk bwd?

split_step_probe.py established that the trunk backward compiled as its
own program (cotangent dt1 as a program *input*) costs ~122 ms vs the
~58 ms the same backward costs inside the fused program — the cliff is
charged at the program boundary because jit inputs get default layouts,
and the conv backward then pays re-layout copies everywhere.

This probe recompiles the same P3 with ``jax.experimental.layout``
AUTO formats on every input and output, letting XLA's layout assignment
pick the space-to-depth conv layouts for the parameters and the
cotangent. Inputs are device_put into the chosen formats OUTSIDE the
timed loop (in a real integration P1/P2 would be compiled to *produce*
those formats, and the optimizer state would live in them).

Writes benchmarks/split_step_auto.json with:
  p3_default_ms  — trunk fwd+bwd, default input layouts (reproduces probe 1)
  p3_auto_ms     — same program, AUTO input/output layouts
  relayout_ms    — one-time device_put cost of moving the params pytree
                   into the AUTO formats (what the optimizer would avoid
                   by living in that layout)

Usage: python tools/split_step_probe2.py [--steps 12]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=12)
    parser.add_argument("--batch", type=int, default=5)
    parser.add_argument("--crop", type=int, default=512)
    args = parser.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Format, Layout

    from neuralbarkcalculator_tpu.models.segmentation import fcn_resnet50

    np.asarray(jnp.ones((8, 128)))  # warm the pull path

    rng = np.random.default_rng(0)
    crop, batch = args.crop, args.batch
    imgs = jnp.asarray(rng.standard_normal((batch, crop, crop, 3)),
                       jnp.float32)
    fh = crop // 8
    dt1 = jnp.asarray(rng.standard_normal((batch, fh, fh, 512)) * 1e-3,
                      jnp.float32)

    model = fcn_resnet50(dropout=0.8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    backbone = model.backbone
    conv1 = nn.Conv(512, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False)
    bn1 = nn.BatchNorm(use_running_average=False, momentum=0.9,
                       epsilon=1e-5, dtype=jnp.float32)

    def trunk_apply(params, stats, x):
        feat, _ = backbone.apply(
            {"params": params["backbone"],
             "batch_stats": stats["backbone"]}, x, train=True,
            mutable=["batch_stats"])
        hp, hs = params["classifier"], stats["classifier"]
        y = conv1.apply({"params": hp["conv1"]}, feat)
        y, _ = bn1.apply({"params": hp["bn1"],
                          "batch_stats": hs["bn1"]}, y,
                         mutable=["batch_stats"])
        return nn.relu(y)

    def p3_fn(params, stats, x, dt):
        _, vjp = jax.vjp(lambda p: trunk_apply(p, stats, x), params)
        return vjp(dt)[0]

    params, stats = variables["params"], variables["batch_stats"]
    results: dict[str, object] = {}

    def timed(fn, args_, tag):
        for _ in range(3):
            out = fn(*args_)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = fn(*args_)
        jax.block_until_ready(out)
        ms = 1e3 * (time.perf_counter() - t0) / args.steps
        results[tag] = round(ms, 2)
        print(f"{tag}: {ms:.2f} ms", file=sys.stderr)

    # --- default layouts (reproduces probe 1's p3)
    timed(jax.jit(p3_fn), (params, stats, imgs, dt1), "p3_default_ms")

    # --- AUTO layouts: XLA picks every input/output layout
    auto = Format(Layout.AUTO)
    p3_auto = jax.jit(p3_fn, in_shardings=auto, out_shardings=auto)
    lowered = p3_auto.lower(params, stats, imgs, dt1)
    compiled = lowered.compile()
    in_fmts = getattr(compiled, "input_formats",
                      getattr(compiled, "input_layouts", None))
    if isinstance(in_fmts, tuple) and len(in_fmts) == 2:
        in_fmts = in_fmts[0]  # (args, kwargs)
    if in_fmts is None:
        raise SystemExit(
            "this JAX exposes neither Compiled.input_formats nor "
            ".input_layouts: cannot device_put into the AUTO layouts, so "
            "p3_auto_ms would silently measure default layouts — aborting")
    t0 = time.perf_counter()
    args_l = jax.block_until_ready(
        jax.device_put((params, stats, imgs, dt1), in_fmts))
    results["relayout_ms"] = round(1e3 * (time.perf_counter() - t0), 2)
    print(f"relayout_ms: {results['relayout_ms']}", file=sys.stderr)

    flat_fmts = jax.tree_util.tree_leaves(in_fmts)
    results["n_inputs"] = len(flat_fmts)
    # dt1 is the last positional arg and a single array, so its format is
    # the last leaf in flatten order whatever the container structure is
    # (per-arg tuple or flat leaf tuple — both flatten dt1 last)
    results["dt1_format"] = repr(flat_fmts[-1])
    print(f"n_inputs: {len(flat_fmts)}", file=sys.stderr)

    timed(compiled, args_l, "p3_auto_ms")

    # numerics: AUTO == default
    g_def = jax.jit(p3_fn)(params, stats, imgs, dt1)
    g_auto = compiled(*args_l)
    err = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(
        jax.tree_util.tree_leaves(g_def),
        jax.tree_util.tree_leaves(g_auto)))
    results["grad_check_max_abs_err"] = err
    print(f"auto-vs-default grad err: {err:.3e}", file=sys.stderr)
    if err >= 1e-4:  # mirror probe 1's gate: a layout-induced numeric
        # divergence must fail the run, not be silently recorded
        raise SystemExit(
            f"AUTO-layout gradients diverge from default layouts "
            f"(max abs err {err:.3e} >= 1e-4)")

    results["shapes"] = (f"crop {crop}, batch {batch}, fcn_resnet50 trunk "
                         f"(backbone+conv1+bn1+relu) fwd+vjp, f32")
    results["backend"] = jax.default_backend()
    os.makedirs(os.path.join(REPO, "benchmarks"), exist_ok=True)
    with open(os.path.join(REPO, "benchmarks", "split_step_auto.json"),
              "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
