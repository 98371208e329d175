"""Stage-level subgrid probe: can layer3/4 amortize the space-to-batch
transposes across a whole stage?

tools/dilated_conv_probe.py measured the per-conv answer (VERDICT r4
item 2): the dense-subgrid reformulation of a dilated 3x3 conv wins
1.61x for int8 d=2 at layer3 shapes WITH both transposes counted, is
neutral for int8 d=4 and for bf16 (the transposes eat the core win),
and the transform-free core is 1.3-1.6x faster everywhere. The obvious
follow-up: every op BETWEEN the dilated convs of a stage (1x1 convs,
requant epilogues, residual adds, ReLU) is pointwise, so a whole stage
can run in subgrid space with ONE transform pair total — blocks 1..N-1
of layer3 (d=2) and 1..2 of layer4 (d=4) chain their conv2s without
leaving subgrid layout.

This probe times realistic block chains (conv1 1x1 -> requant -> conv2
3x3 dilated -> requant -> conv3 1x1 -> f32 residual add+relu+requant,
the exact _quantized_forward epilogue structure) three ways:

  dilated       conv2 uses rhs_dilation, everything on the full grid
  per_conv      conv2 wrapped to_subgrid/conv/from_subgrid per block
  stage         ONE to_subgrid at entry, all blocks in subgrid space,
                ONE from_subgrid at exit

Writes benchmarks/subgrid_stage.json.
Run: python tools/subgrid_stage_probe.py [--batch 32]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import numpy as np

from dilated_conv_probe import from_subgrid, to_subgrid  # noqa: E402
from int8_attribution import time_fn  # noqa: E402


def build_chain(n_blocks: int, hw: int, planes: int, d: int, batch: int,
                mode: str, dtype_name: str):
    """Return (jitted fn, args) for an n-block bottleneck chain.

    mode: 'dilated' | 'per_conv' | 'stage'."""
    import jax
    import jax.numpy as jnp

    p4 = planes * 4
    rng = np.random.default_rng(0)
    int8 = dtype_name == "s8"

    def wconv(cin, cout, k):
        if int8:
            return jnp.asarray(rng.integers(-100, 100, (k, k, cin, cout)),
                               jnp.int8)
        return jnp.asarray(rng.normal(0, 0.05, (k, k, cin, cout)),
                           jnp.bfloat16)

    params = []
    for _ in range(n_blocks):
        params.append(dict(
            w1=wconv(p4, planes, 1), m1=jnp.full((planes,), 0.01),
            w2=wconv(planes, planes, 3), m2=jnp.full((planes,), 0.01),
            w3=wconv(planes, p4, 1), m3=jnp.full((p4,), 0.01),
        ))
    if int8:
        x = jnp.asarray(rng.integers(-100, 100, (batch, hw, hw, p4)),
                        jnp.int8)
        acc = jnp.int32
    else:
        x = jnp.asarray(rng.normal(0, 1, (batch, hw, hw, p4)),
                        jnp.bfloat16)
        acc = jnp.bfloat16

    def conv(v, w, dd):
        k = w.shape[0]
        pad = dd * (k // 2)
        return jax.lax.conv_general_dilated(
            v, w, (1, 1), [(pad, pad), (pad, pad)],
            rhs_dilation=(dd, dd),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc)

    def requant_relu(a, m):
        y = a.astype(jnp.float32) * m
        if int8:
            return jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)
        return jax.nn.relu(y).astype(jnp.bfloat16)

    def block(v, pr, conv2):
        t1 = requant_relu(conv(v, pr["w1"], 1), pr["m1"])
        t2 = requant_relu(conv2(t1), pr["m2"])
        out = conv(t2, pr["w3"], 1).astype(jnp.float32) * pr["m3"]
        out = jax.nn.relu(out + v.astype(jnp.float32))
        if int8:
            return jnp.clip(jnp.round(out), 0, 127).astype(jnp.int8)
        return out.astype(jnp.bfloat16)

    def fn(x, params):
        if mode == "stage":
            v = to_subgrid(x, d)
            for pr in params:
                v = block(v, pr, lambda t, pr=pr: conv(t, pr["w2"], 1))
            return jnp.sum(from_subgrid(v, d, batch)
                           .astype(jnp.float32))
        for i, pr in enumerate(params):
            if mode == "per_conv":
                def conv2(t, pr=pr):
                    return from_subgrid(
                        conv(to_subgrid(t, d), pr["w2"], 1), d, batch)
            else:
                def conv2(t, pr=pr):
                    return conv(t, pr["w2"], d)
            x = block(x, pr, conv2)
        return jnp.sum(x.astype(jnp.float32))

    import jax
    return jax.jit(lambda x, p: fn(x, p)), (x, params)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    np.asarray(jax.numpy.ones((8, 128)))

    out: dict[str, object] = {
        "tool": "tools/subgrid_stage_probe.py",
        "protocol": ("dispatch differencing (T_24-T_4)/20, best of 3; "
                     "n-block bottleneck chains (1x1 -> requant -> "
                     "dilated 3x3 -> requant -> 1x1 -> f32 residual "
                     "add/relu/requant) at production shapes; 'stage' = "
                     "one transform pair for the whole chain"),
        "batch": args.batch,
        "backend": jax.default_backend(),
    }
    # layer3: blocks 1-5 run conv2 d=2 at 256 planes; layer4: blocks 1-2
    # run conv2 d=4 at 512 planes (torchvision dilation layout,
    # /root/reference .. models.py:128-130 via replace_stride_with_dilation)
    for label, n, planes, d in (("layer3_5blocks_d2", 5, 256, 2),
                                ("layer4_2blocks_d4", 2, 512, 4)):
        for dt in ("s8", "bf16"):
            row = {}
            # exactness: integer chains must agree exactly across modes
            ref = None
            for mode in ("dilated", "per_conv", "stage"):
                fn, fargs = build_chain(n, 128, planes, d, args.batch,
                                        mode, dt)
                val = float(np.asarray(fn(*fargs)))
                if ref is None:
                    ref = val
                elif dt == "s8" and abs(val - ref) > abs(ref) * 1e-6:
                    raise SystemExit(
                        f"{label}_{dt} {mode} mismatch: {val} vs {ref}")
                row[mode] = {"ms": round(time_fn(fn, fargs), 2)}
            key = f"{label}_{dt}"
            out[key] = row
            print(json.dumps({key: row}), flush=True)

    path = os.path.join(REPO, "benchmarks", "subgrid_stage.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
