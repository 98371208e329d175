"""Probe: does splitting the train step into conv-chain-only XLA programs
dodge the dropout layout cliff?

Background (docs/SCALING.md, train-step roofline): XLA:TPU keeps the
backward pass in its space-to-depth transformed conv layouts only while
the program graph is exactly conv->bn->relu->conv end to end. ANY
interposed non-conv producer (the head's dropout mask multiply, a
reshape->matmul head, even an opaque Pallas custom call) makes the whole
backward pay ~+45 ms of re-layout copies at the reference recipe shapes
(crop 512, batch 5, fcn_resnet50 dropout 0.8 — reference __main__.py:231,
260-269). The one untried avenue recorded there: restructure the step so
the conv stack's backward lives in a program with no non-conv ops at all.

This probe implements that restructure as three dependent programs:

  P1  trunk fwd:      x -> backbone -> head conv1 -> bn1 -> relu = t1
                      (pure conv/bn/relu graph; also returns new BN stats)
  P2  tail fwd+bwd:   t1 -> dropout -> 1x1 conv -> bicubic upsample ->
                      loss; returns (loss, dL/dt1, conv2 grads). All the
                      non-conv ops (mask multiply, matmul-shaped 1x1,
                      resize, sort) are quarantined here, charged layouts
                      only on the small [B,64,64,512] tensor.
  P3  trunk bwd:      recomputes the trunk fwd and applies vjp with dt1
                      as an *input* — the graph stays conv-chain-shaped,
                      so the hypothesis says it pays no cliff. The price
                      is one extra trunk forward (remat-style).
  P4  Adam update on the merged grads (elementwise; cliff-irrelevant,
                      kept separate so P3 stays pure).

Compares, in one process on the real device:
  - fused fwd+bwd+Adam, dropout 0.8  (what training runs today)
  - fused fwd+bwd+Adam, dropout 0.0  (the conv floor + loss)
  - split P1->P2->P3->P4, dropout 0.8

with both the exact Lovász loss and a trivial mean-logit loss (the
trivial pair isolates the cliff from the loss cost). Writes
benchmarks/split_step.json. Numerics: with dropout 0 and the same key the
split grads are checked to match the fused grads (allclose, f32).

Usage: python tools/split_step_probe.py [--steps 15] [--skip_check]
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
    parser.add_argument("--steps", type=int, default=15)
    parser.add_argument("--batch", type=int, default=5)
    parser.add_argument("--crop", type=int, default=512)
    parser.add_argument("--skip_check", action="store_true")
    args = parser.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from neuralbarkcalculator_tpu.models.segmentation import fcn_resnet50
    from neuralbarkcalculator_tpu.ops import losses as L
    from neuralbarkcalculator_tpu.ops.resize import bicubic_upsample
    from neuralbarkcalculator_tpu.train.optim import adam
    from neuralbarkcalculator_tpu.train.step import TrainState

    np.asarray(jnp.ones((8, 128)))  # warm the pull path

    rng = np.random.default_rng(0)
    crop, batch = args.crop, args.batch
    imgs = jnp.asarray(rng.standard_normal((batch, crop, crop, 3)),
                       jnp.float32)
    labs = jnp.asarray((rng.random((batch, crop, crop)) * 3), jnp.int32)
    key = jax.random.PRNGKey(7)

    model = fcn_resnet50(dropout=0.8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    backbone = model.backbone
    # Standalone modules mirroring FCNHead's trunk half (heads.py:44-51)
    # and its tail conv (heads.py:55-56); applied with slices of the same
    # params tree, so weights are shared with the fused model. Widths are
    # derived from the initialized params (not hand-copied constants), so
    # a future FCNHead/NUM_CLASSES change either flows through or fails
    # the shape check at apply time; the default-on grad check below
    # additionally validates the whole decomposition numerically.
    _hp = variables["params"]["classifier"]
    inter = _hp["conv1"]["kernel"].shape[-1]
    n_classes = _hp["conv2"]["kernel"].shape[-1]
    conv1 = nn.Conv(inter, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False)
    bn1 = nn.BatchNorm(use_running_average=False, momentum=0.9,
                       epsilon=1e-5, dtype=jnp.float32)
    conv2 = nn.Conv(n_classes, (1, 1))

    def trunk_apply(params, stats, x):
        feat, mut = backbone.apply(
            {"params": params["backbone"],
             "batch_stats": stats["backbone"]}, x, train=True,
            mutable=["batch_stats"])
        hp, hs = params["classifier"], stats["classifier"]
        y = conv1.apply({"params": hp["conv1"]}, feat)
        y, mut2 = bn1.apply({"params": hp["bn1"],
                             "batch_stats": hs["bn1"]}, y,
                            mutable=["batch_stats"])
        new_stats = {"backbone": mut["batch_stats"],
                     "classifier": {"bn1": mut2["batch_stats"]}}
        return nn.relu(y), new_stats

    def tail_apply(t1, conv2_params, dkey, rate):
        if rate > 0.0:
            keep = 1.0 - rate
            mask = jax.random.bernoulli(dkey, keep, t1.shape)
            t1 = t1 * mask.astype(t1.dtype) / keep
        logits = conv2.apply({"params": conv2_params}, t1)
        return bicubic_upsample(logits.astype(jnp.float32), crop, crop)

    def make_loss(name):
        if name == "lovasz":
            return lambda lg: L.lovasz_softmax_loss(lg, labs)
        return lambda lg: jnp.mean(lg)  # trivial

    results: dict[str, object] = {}

    def timed_chain(fn_once, tag):
        for _ in range(3):
            out = fn_once()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = fn_once()
        jax.block_until_ready(out)
        ms = 1e3 * (time.perf_counter() - t0) / args.steps
        results[tag] = round(ms, 2)
        print(f"{tag}: {ms:.2f} ms", file=sys.stderr)
        return out

    def fresh_state():
        return TrainState.create(
            apply_fn=model.apply,
            params=jax.tree.map(jnp.copy, variables["params"]),
            batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
            tx=adam(5e-4, 2e-3))

    for loss_name in ("trivial", "lovasz"):
        loss_of = make_loss(loss_name)

        # --- fused baselines (dropout 0.8 and 0.0) --------------------
        for rate, tag in ((0.8, "drop0.8"), (0.0, "drop0.0")):
            m = fcn_resnet50(dropout=rate)

            def fused(state, k, m=m):
                def compute_loss(params):
                    logits, mutated = m.apply(
                        {"params": params,
                         "batch_stats": state.batch_stats},
                        imgs, train=True, mutable=["batch_stats"],
                        rngs={"dropout": k})
                    return loss_of(logits), mutated
                (loss, mutated), grads = jax.value_and_grad(
                    compute_loss, has_aux=True)(state.params)
                return state.apply_gradients(
                    grads=grads,
                    batch_stats=mutated["batch_stats"]), loss

            fused_j = jax.jit(fused, donate_argnums=(0,))
            st = fresh_state()

            def run_fused(fj=fused_j, box=[st]):
                box[0], loss = fj(box[0], key)
                return loss

            timed_chain(run_fused, f"fused_{loss_name}_{tag}_ms")

        # --- split chain (dropout 0.8) --------------------------------
        p1 = jax.jit(trunk_apply)

        def p2_fn(t1, conv2_params, k):
            def f(t1_, cp):
                return loss_of(tail_apply(t1_, cp, k, 0.8))
            loss, (dt1, dc2) = jax.value_and_grad(
                f, argnums=(0, 1))(t1, conv2_params)
            return loss, dt1, dc2

        p2 = jax.jit(p2_fn)

        def p3_fn(params, stats, x, dt1):
            def f(p):
                return trunk_apply(p, stats, x)[0]
            _, vjp = jax.vjp(f, params)
            return vjp(dt1)[0]

        p3 = jax.jit(p3_fn)

        def p4_fn(state, trunk_grads, dc2, new_stats):
            grads = jax.tree.map(jnp.copy, trunk_grads)
            grads["classifier"]["conv2"] = dc2
            return state.apply_gradients(grads=grads,
                                         batch_stats=new_stats)

        p4 = jax.jit(p4_fn, donate_argnums=(0,))
        st = fresh_state()

        def run_split(box=[st]):
            state = box[0]
            t1, new_stats = p1(state.params, state.batch_stats, imgs)
            loss, dt1, dc2 = p2(t1, state.params["classifier"]["conv2"],
                                key)
            dtrunk = p3(state.params, state.batch_stats, imgs, dt1)
            box[0] = p4(state, dtrunk, dc2, new_stats)
            return loss

        timed_chain(run_split, f"split_{loss_name}_drop0.8_ms")

        # component attribution for the split chain
        st = fresh_state()
        t1, new_stats = jax.block_until_ready(
            p1(st.params, st.batch_stats, imgs))
        loss, dt1, dc2 = jax.block_until_ready(
            p2(t1, st.params["classifier"]["conv2"], key))
        for tag, fn in ((f"p1_trunk_fwd_{loss_name}_ms",
                         lambda: p1(st.params, st.batch_stats, imgs)[0]),
                        (f"p2_tail_{loss_name}_ms",
                         lambda: p2(t1, st.params["classifier"]["conv2"],
                                    key)[0]),
                        (f"p3_trunk_bwd_{loss_name}_ms",
                         lambda: p3(st.params, st.batch_stats, imgs,
                                    dt1))):
            timed_chain(fn, tag)

    # --- numerics: split == fused at dropout 0 (same graph, f32) -------
    if not args.skip_check:
        m0 = fcn_resnet50(dropout=0.0)

        def fused_grads(params, stats):
            def f(p):
                logits, _ = m0.apply({"params": p, "batch_stats": stats},
                                     imgs, train=True,
                                     mutable=["batch_stats"])
                return jnp.mean(logits)
            return jax.grad(f)(params)

        gf = jax.jit(fused_grads)(variables["params"],
                                  variables["batch_stats"])

        def split_grads(params, stats):
            t1, _ = trunk_apply(params, stats, imgs)
            def f(t1_, cp):
                return jnp.mean(tail_apply(t1_, cp, key, 0.0))
            dt1, dc2 = jax.grad(f, argnums=(0, 1))(
                t1, params["classifier"]["conv2"])
            def trunk_only(p):
                return trunk_apply(p, stats, imgs)[0]
            g = jax.vjp(trunk_only, params)[1](dt1)[0]
            g["classifier"]["conv2"] = dc2
            return g

        gs = jax.jit(split_grads)(variables["params"],
                                  variables["batch_stats"])
        flat_f = jax.tree_util.tree_leaves(gf)
        flat_s = jax.tree_util.tree_leaves(gs)
        max_err = max(float(jnp.max(jnp.abs(a - b)))
                      for a, b in zip(flat_f, flat_s))
        results["grad_check_max_abs_err"] = max_err
        print(f"grad check (dropout 0, trivial loss): max abs err "
              f"{max_err:.3e}", file=sys.stderr)
        if max_err >= 1e-4:  # not a bare assert: python -O must not turn
            # the numerics gate into a no-op while the JSON still ships
            raise SystemExit(
                f"split-vs-fused gradients diverge (max abs err "
                f"{max_err:.3e} >= 1e-4): the decomposition is invalid")

    results["shapes"] = (f"crop {crop}, batch {batch}, fcn_resnet50 "
                         f"dropout 0.8, f32, Adam included in all chains")
    results["backend"] = jax.default_backend()
    os.makedirs(os.path.join(REPO, "benchmarks"), exist_ok=True)
    with open(os.path.join(REPO, "benchmarks", "split_step.json"),
              "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
