"""Is XLA's dilated conv the layer3/4 bottleneck? Subgrid probe.

After the int8 residual/stem fixes, the backbone's remaining gap to its
compute roofline sits in the dilated stages (layer3 d=2: 1.12 ms/img vs
~0.64 compute floor; layer4 d=4: 1.70 vs ~1.46 at b32 —
benchmarks/int8_backbone_stages.json). A 3x3 conv with rhs_dilation d
touches only pixels of matching (i mod d, j mod d) residue, so it is
EXACTLY a dense 3x3 pad-1 conv over d*d independent subgrids (the
space-to-batch trick: zero padding of d rows in image space == one zero
row per subgrid). If the MXU runs the dense formulation materially
faster, the model's qconv/conv path should adopt it; if not, the dilated
stages are at their real floor and the item closes.

Times, per dtype (s8 -> s32 and bf16), at the exact production shapes:
  layer3 conv2: [32,128,128,256] k 3x3x256x256 d=2
  layer4 conv2: [32,128,128,512] k 3x3x512x512 d=4
dilated vs subgrid (including the two transposes) vs subgrid-core
(transform outside the timed region — the "if layout were free" bound).

Writes benchmarks/dilated_conv_probe.json.
Run: python tools/dilated_conv_probe.py [--batch 32]
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

from int8_attribution import time_fn  # noqa: E402


def to_subgrid(x, d):
    """[B,H,W,C] -> [B*d*d, H/d, W/d, C] grouping pixels by residue."""
    import jax.numpy as jnp
    b, h, w, c = x.shape
    x = x.reshape(b, h // d, d, w // d, d, c)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b * d * d, h // d, w // d, c)


def from_subgrid(y, d, b):
    import jax.numpy as jnp  # noqa: F401
    n, hh, ww, c = y.shape
    y = y.reshape(b, d, d, hh, ww, c)
    y = y.transpose(0, 3, 1, 4, 2, 5)
    return y.reshape(b, hh * d, ww * d, c)


def conv(x, k, dilation, acc_dtype):
    import jax
    import jax.numpy as jnp  # noqa: F401
    pad = dilation
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype)


def dense(x, k, acc_dtype):
    import jax
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype)


def probe_shape(batch, hw, cin, d, dtype_name):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    if dtype_name == "s8":
        x = jnp.asarray(rng.integers(-100, 100, (batch, hw, hw, cin)),
                        jnp.int8)
        k = jnp.asarray(rng.integers(-100, 100, (3, 3, cin, cin)), jnp.int8)
        acc = jnp.int32
    else:
        x = jnp.asarray(rng.normal(0, 1, (batch, hw, hw, cin)),
                        jnp.bfloat16)
        k = jnp.asarray(rng.normal(0, 0.05, (3, 3, cin, cin)), jnp.bfloat16)
        acc = jnp.bfloat16

    # reduce on device: full outputs are GBs and the tunnel pull would
    # swamp the differencing (same convention as the attribution tools)
    f_dil = jax.jit(lambda x, k: jnp.sum(
        conv(x, k, d, acc).astype(jnp.float32)))
    f_sub = jax.jit(lambda x, k: jnp.sum(from_subgrid(
        dense(to_subgrid(x, d), k, acc), d, batch).astype(jnp.float32)))
    f_core = jax.jit(lambda xs, k: jnp.sum(
        dense(xs, k, acc).astype(jnp.float32)))

    # exactness first (int arithmetic: must be equal; bf16: identical
    # op order per output pixel, also equal)
    a = np.asarray(f_dil(x, k))
    bsum = np.asarray(f_sub(x, k))
    rel = abs(a - bsum) / max(abs(a), 1e-9)
    if rel > 1e-3:
        raise SystemExit(f"subgrid != dilated: {a} vs {bsum} rel={rel}")

    xs = jax.device_put(np.asarray(to_subgrid(x, d)))
    flops = 2 * batch * hw * hw * cin * cin * 9
    out = {}
    for name, fn, args_ in (("dilated", f_dil, (x, k)),
                            ("subgrid", f_sub, (x, k)),
                            ("subgrid_core", f_core, (xs, k))):
        ms = time_fn(fn, args_)
        out[name] = {
            "ms": round(ms, 2),
            "tops": round(flops / (ms * 1e-3) / 1e12, 1),
        }
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    np.asarray(jax.numpy.ones((8, 128)))

    out: dict[str, object] = {
        "tool": "tools/dilated_conv_probe.py",
        "protocol": ("dispatch differencing (T_24-T_4)/20, best of 3, "
                     "device-resident inputs, on-device sum reduce; "
                     "subgrid = space-to-batch incl. both transposes, "
                     "subgrid_core = dense conv only (pre-transformed "
                     "input)"),
        "batch": args.batch,
        "backend": jax.default_backend(),
    }
    # layer4 block0's conv2 runs d=2 at 512 planes (torchvision
    # previous_dilation semantics); layer3 block0 is d=1 (already dense)
    for label, hw, cin, d in (("layer3_conv2_d2", 128, 256, 2),
                              ("layer4_conv2_d4", 128, 512, 4),
                              ("layer4_block0_conv2_d2", 128, 512, 2)):
        for dt in ("s8", "bf16"):
            key = f"{label}_{dt}"
            out[key] = probe_shape(args.batch, hw, cin, d, dt)
            print(json.dumps({key: out[key]}), flush=True)

    path = os.path.join(REPO, "benchmarks", "dilated_conv_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
