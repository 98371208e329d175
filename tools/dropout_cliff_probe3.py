"""Probe 3 (round 4, timeboxed): does any XLA:TPU compiler option dodge
the dropout layout cliff on the current stack?

History: the fused train step pays +43..47 ms when ANY non-conv producer
(the dropout mask multiply, a reshape, a dot, an opaque custom call)
interposes in the conv chain — XLA:TPU then abandons its space-to-depth
conv layouts for the backward and inserts ~1000 copy/slice/pad ops
(tools/split_step_probe.py, round 2; re-confirmed on JAX 0.9.0 in
round 3; the Pallas fused-dropout kernel does NOT dodge it). This probe
is the round-4 prescribed retry: sweep plausible layout/fusion-affecting
``compiler_options`` on the EXACT fused train-step graph (dropout 0.8 vs
dropout 0) and record the delta per option. Options the server-side
compiler rejects are recorded as rejected, not failures.

Writes benchmarks/dropout_cliff_r4.json. If no option closes the gap,
the item is closed permanently and the practical lever stays the
documented TPU-native recipe (lovasz_hist + bf16,
``train --tpu-native-recipe``).

Usage: python tools/dropout_cliff_probe3.py [--steps 10]
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

# Candidate option sets: layout/fusion knobs that plausibly change the
# backward's layout assignment. Unknown options raise at compile time on
# the server; each is tried independently and rejections recorded.
CANDIDATES: dict[str, dict] = {
    "baseline": {},
    "no_latency_hiding": {
        "xla_tpu_enable_latency_hiding_scheduler": "false"},
    "big_scoped_vmem": {"xla_tpu_scoped_vmem_limit_kib": 65536},
    "no_multi_level_fusion": {
        "xla_tpu_use_multi_level_fusion": "false"},
    "no_fusion_emitter": {"xla_tpu_use_fusion_emitter": "false"},
    "aggressive_fusion": {
        "xla_tpu_enable_aggressive_loop_fusion": "true"},
    "no_bf16_conversion_folding": {
        "xla_allow_excess_precision": "false"},
    "rwb_fusion_off": {"xla_tpu_rwb_fusion": "false"},
}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--crop", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from neuralbarkcalculator_tpu.models.segmentation import fcn_resnet50
    from neuralbarkcalculator_tpu.ops import losses as L
    from neuralbarkcalculator_tpu.train.optim import adam
    from neuralbarkcalculator_tpu.train.step import TrainState

    np.asarray(jnp.ones((8, 128)))  # warm the pull path
    rng = np.random.default_rng(0)
    crop, batch = args.crop, args.batch
    imgs = jnp.asarray(rng.standard_normal((batch, crop, crop, 3)),
                       jnp.float32)
    labs = jnp.asarray((rng.random((batch, crop, crop)) * 3), jnp.int32)
    key = jax.random.PRNGKey(1)

    results: dict[str, object] = {
        "tool": "tools/dropout_cliff_probe3.py",
        "graph": f"fwd+bwd+Adam, crop {crop} batch {batch}, exact "
                 f"Lovasz, f32, dropout 0.8 vs 0.0 "
                 f"(the split_step_probe graph)",
        "jax": jax.__version__,
        "options": {},
    }

    def build(dropout: float, opts: dict):
        model = fcn_resnet50(dropout=dropout)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), train=False)
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables["batch_stats"], tx=adam(5e-4, 2e-3))

        def fwd_bwd(state, imgs, labs, key):
            def compute_loss(params):
                logits, mutated = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    imgs, train=True, mutable=["batch_stats"],
                    rngs={"dropout": key})
                return L.lovasz_softmax_loss(logits, labs), mutated

            (loss, mutated), grads = jax.value_and_grad(
                compute_loss, has_aux=True)(state.params)
            state = state.apply_gradients(
                grads=grads, batch_stats=mutated["batch_stats"])
            return state, loss

        return jax.jit(fwd_bwd,
                       compiler_options=opts or None), state

    def timed(step_fn, state) -> float:
        s, out = state, None
        for _ in range(3):
            s, out = step_fn(s, imgs, labs, key)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            s, out = step_fn(s, imgs, labs, key)
        jax.block_until_ready(out)
        return 1e3 * (time.perf_counter() - t0) / args.steps

    for name, opts in CANDIDATES.items():
        row: dict[str, object] = {"compiler_options": opts}
        try:
            per_dropout = {}
            for dropout in (0.8, 0.0):
                step_fn, state = build(dropout, opts)
                per_dropout[f"dropout_{dropout}"] = round(
                    timed(step_fn, state), 1)
            row.update(per_dropout)
            row["cliff_ms"] = round(
                per_dropout["dropout_0.8"] - per_dropout["dropout_0.0"],
                1)
        except Exception as e:  # server-side rejection or crash
            row["rejected"] = f"{type(e).__name__}: {str(e)[:300]}"
        results["options"][name] = row
        print(json.dumps({name: row}), flush=True)

    path = os.path.join(REPO, "benchmarks", "dropout_cliff_r4.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
