"""Train-step timing + attribution at the reference recipe shapes.

Breaks the fused train step (train/step.py) into its stages and times each
as its own jitted program on the real device, at the reference training
shapes (1024^2 uint8 HBM-resident dataset, crop 512, batch 5,
__main__.py:260-269):

- gather+augment (old full-image path vs fused crop-first path)
- forward+backward+Adam (the loss side)
- metrics (confusion matrix + optional postprocessed F1)
- the complete step (what training actually runs)

Writes benchmarks/train_step.json. Stage times do not sum exactly to the
full step (XLA fuses across stage boundaries inside the single program —
that fusion is the point of compiling the whole step as one jit).

Usage: python tools/train_step_bench.py [--steps 20] [--batch 5]
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


def timed(fn, *args, steps=20, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--batch", type=int, default=5)
    parser.add_argument("--size", type=int, default=1024)
    parser.add_argument("--crop", type=int, default=512)
    parser.add_argument("--images", type=int, default=24)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    np.asarray(jnp.ones((8, 128)))  # warm the pull path

    from neuralbarkcalculator_tpu.data.augment import (augment_batch,
                                                       gather_augment_batch)
    from neuralbarkcalculator_tpu.models.segmentation import fcn_resnet50
    from neuralbarkcalculator_tpu.ops.metrics import (confusion_matrix,
                                                      pixelwise_f1)
    from neuralbarkcalculator_tpu.parallel.mesh import (ShardingRules,
                                                        make_mesh)
    from neuralbarkcalculator_tpu.train.optim import adam
    from neuralbarkcalculator_tpu.train.step import (TrainState,
                                                     make_train_step)

    rng = np.random.default_rng(0)
    n, size, crop, batch = args.images, args.size, args.crop, args.batch
    images = jnp.asarray(
        (rng.random((n, size, size, 3)) * 255).astype(np.uint8))
    labels = jnp.asarray((rng.random((n, size, size)) * 3).astype(np.uint8))
    idx = jnp.asarray(rng.integers(0, n, batch), jnp.int32)
    key = jax.random.PRNGKey(0)
    mean = jnp.asarray([0.5, 0.5, 0.5])
    std = jnp.asarray([0.25, 0.25, 0.25])

    rules = ShardingRules(make_mesh())
    model = fcn_resnet50(dropout=0.8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables["batch_stats"], tx=adam(5e-4, 2e-3))

    results: dict[str, float] = {}

    # --- augment paths
    def old_path(key):
        imgs = images[idx].astype(jnp.float32) / 255.0
        labs = labels[idx].astype(jnp.int32)
        return augment_batch(key, imgs, labs, crop, mean, std)

    results["augment_old_full_image_ms"] = 1e3 * timed(
        jax.jit(old_path), key, steps=args.steps)
    results["augment_fused_crop_first_ms"] = 1e3 * timed(
        jax.jit(lambda k: gather_augment_batch(k, images, labels, idx,
                                               crop, mean, std)),
        key, steps=args.steps)

    # --- forward/backward/update on a fixed augmented batch
    imgs_aug, labs_aug = jax.block_until_ready(
        gather_augment_batch(key, images, labels, idx, crop, mean, std))

    def fwd_bwd(state, imgs, labs, key):
        from neuralbarkcalculator_tpu.ops import losses as L

        def compute_loss(params):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                imgs, train=True, mutable=["batch_stats"],
                rngs={"dropout": key})
            return L.lovasz_softmax_loss(logits, labs), (logits, mutated)

        (loss, (logits, mutated)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads,
                                      batch_stats=mutated["batch_stats"])
        return state, loss, logits

    fwd_bwd_j = jax.jit(fwd_bwd, donate_argnums=(0,))
    # the fwd/bwd loop donates its state; keep an untouched copy for the
    # full-step phase below
    state_full = jax.tree.map(jnp.copy, state)
    # time with a loop that threads state through (steady-state step time
    # includes the update)
    st = state
    for _ in range(3):
        st, loss, logits = fwd_bwd_j(st, imgs_aug, labs_aug, key)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        st, loss, logits = fwd_bwd_j(st, imgs_aug, labs_aug, key)
    jax.block_until_ready(loss)
    results["fwd_bwd_adam_ms"] = 1e3 * (time.perf_counter() - t0) \
        / args.steps
    logits = jax.block_until_ready(logits)

    # --- metrics
    results["metrics_cm_miou_ms"] = 1e3 * timed(
        jax.jit(lambda lg, lb: confusion_matrix(jnp.argmax(lg, -1), lb)),
        logits, labs_aug, steps=args.steps)
    results["metrics_f1_raw_ms"] = 1e3 * timed(
        jax.jit(lambda lg, lb: pixelwise_f1(lg, lb, 3, False)),
        logits, labs_aug, steps=args.steps)

    # --- the full fused step (what Experiment.train runs)
    step = make_train_step(rules, crop=crop, mean=(0.5, 0.5, 0.5),
                           std=(0.25, 0.25, 0.25))
    st2 = jax.device_put(state_full, rules.replicated)
    for _ in range(3):
        st2, metrics = step(st2, images, labels, idx, key)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        st2, metrics = step(st2, images, labels, idx, key)
    jax.block_until_ready(metrics)
    results["full_step_ms"] = 1e3 * (time.perf_counter() - t0) / args.steps

    results["shapes"] = (f"dataset {n}x{size}^2 u8 HBM-resident, "
                         f"crop {crop}, batch {batch}, fcn_resnet50 "
                         f"dropout 0.8, lovasz, miou+raw-F1")
    results["backend"] = jax.default_backend()
    for k, v in results.items():
        print(f"{k}: {v if isinstance(v, str) else round(v, 2)}",
              file=sys.stderr)
    os.makedirs(os.path.join(REPO, "benchmarks"), exist_ok=True)
    with open(os.path.join(REPO, "benchmarks", "train_step.json"),
              "w") as f:
        json.dump({k: (round(v, 2) if isinstance(v, float) else v)
                   for k, v in results.items()}, f, indent=1)
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
