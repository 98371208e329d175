"""Probe: does int8 MXU conv beat bf16 at this model's hot shapes?

v5e lists int8 peak at ~2x bf16 (394 vs 197 TOPs). Whether XLA:TPU
actually maps `lax.conv_general_dilated(int8, int8) -> int32` onto the
int8 MXU path at *these* shapes — dilated 3x3 convs on 128x128 NHWC
feature maps — decides whether a quantized inference mode (post-training
per-channel weight quant + static activation scales) is worth building.

Methodology: N conv applications chained through a `lax.scan` carry
(x_{i+1} = requantize(conv(x_i, w_i)), distinct weights per step) so the
device must execute them sequentially inside ONE executable — naive
"dispatch in a loop, sync once" timing reads absurd TF/s through the
tunneled runtime (measured 70,000 TF/s "bf16", 350x over peak: the sync
does not cover the enqueued work). The int8 chain pays a realistic
requantize (>>7 to int8) per step; the bf16 chain a tanh-free clamp.

Shapes: the FLOPs-dominant stride-8 stages of the dilated FCN-ResNet50
at 1024^2 inference (SURVEY.md §3.3) — channel-square so the chain
carries: layer3 3x3 256ch d2, layer4 3x3 512ch d4, 1x1 512ch, and a
2048->512->2048 sandwich standing in for the head/expand pair.

Run on the real chip: ``python tools/int8_probe.py`` (writes one JSON
line per shape).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 4
N_CHAIN = 24
SHAPES = [
    # (name, H, W, C, k, dilation)
    ("layer3_3x3_d2_c256", 128, 128, 256, 3, 2),
    ("layer4_3x3_d4_c512", 128, 128, 512, 3, 4),
    ("pointwise_1x1_c512", 128, 128, 512, 1, 1),
    ("head_pair_2048x512", 128, 128, (2048, 512), 3, 1),
]


def conv(x, w, dil, out_dtype=None):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype)


def timed(jitted, *args, repeats=3):
    """Time one executable, forcing completion with a host pull.

    Through the tunneled runtime `block_until_ready` returns at enqueue
    (measured: 24 chained convs "finish" in 0.1 ms = 95x chip peak), so
    the only trustworthy fence is materializing bytes on the host. We
    pull a 4-byte reduction of the output; the tunnel round-trip it adds
    is measured separately via a no-op pull and subtracted.
    """
    def run():
        out = jitted(*args)
        return float(jnp.sum(out.astype(jnp.float32)))

    run()  # compile + warm (first pull also pays the tunnel warmup)
    tiny = jax.jit(lambda: jnp.zeros((), jnp.float32))
    float(tiny())  # compile the no-op
    best, best_rt = float("inf"), float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(tiny())
        best_rt = min(best_rt, time.perf_counter() - t0)
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return max(best - best_rt, 1e-6) * 1000.0


def chain_bf16(x, ws, dil):
    def body(h, w):
        y = conv(h, w, dil, jnp.bfloat16)
        return jnp.clip(y * 0.05, -3.0, 3.0), ()

    out, _ = jax.lax.scan(body, x, ws)
    return out


def chain_int8(x, ws, dil):
    def body(h, w):
        acc = conv(h, w, dil, jnp.int32)  # int8 x int8 -> int32
        # realistic requantize: shift + saturate back to int8
        return jnp.clip(acc >> 7, -127, 127).astype(jnp.int8), ()

    out, _ = jax.lax.scan(body, x, ws)
    return out


def pair_chain(x, ws_up, ws_down, dil, int8: bool):
    """cin->cout->cin sandwich per step (e.g. 512->2048->512)."""
    if int8:
        def body(h, w2):
            wu, wd = w2
            mid = jnp.clip(conv(h, wu, dil, jnp.int32) >> 7,
                           -127, 127).astype(jnp.int8)
            acc = conv(mid, wd, dil, jnp.int32)
            return jnp.clip(acc >> 7, -127, 127).astype(jnp.int8), ()
    else:
        def body(h, w2):
            wu, wd = w2
            mid = jnp.clip(conv(h, wu, dil, jnp.bfloat16) * 0.05, -3, 3)
            y = conv(mid, wd, dil, jnp.bfloat16)
            return jnp.clip(y * 0.05, -3.0, 3.0), ()

    out, _ = jax.lax.scan(body, x, (ws_up, ws_down))
    return out


def main() -> None:
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} devices={jax.device_count()}")
    for name, h, w_, c, k, dil in SHAPES:
        pair = isinstance(c, tuple)
        cin = c[1] if pair else c
        x = rng.standard_normal((BATCH, h, w_, cin)).astype(np.float32)
        x_bf = jnp.asarray(x * 0.1, jnp.bfloat16)
        x_i8 = jnp.asarray(np.clip(np.rint(x * 20), -127, 127), jnp.int8)

        if pair:
            cbig, csmall = c
            wu = rng.standard_normal((N_CHAIN, k, k, csmall, cbig))
            wd = rng.standard_normal((N_CHAIN, k, k, cbig, csmall))
            flops = 2 * BATCH * h * w_ * csmall * cbig * k * k * 2 * N_CHAIN
            args_bf = (x_bf, jnp.asarray(wu * 0.02, jnp.bfloat16),
                       jnp.asarray(wd * 0.02, jnp.bfloat16))
            args_i8 = (x_i8,
                       jnp.asarray(np.clip(np.rint(wu * 40), -127, 127),
                                   jnp.int8),
                       jnp.asarray(np.clip(np.rint(wd * 40), -127, 127),
                                   jnp.int8))
            f_bf = jax.jit(lambda a, u, d: pair_chain(a, u, d, dil, False))
            f_i8 = jax.jit(lambda a, u, d: pair_chain(a, u, d, dil, True))
        else:
            ws = rng.standard_normal((N_CHAIN, k, k, c, c))
            flops = 2 * BATCH * h * w_ * c * c * k * k * N_CHAIN
            args_bf = (x_bf, jnp.asarray(ws * 0.02, jnp.bfloat16))
            args_i8 = (x_i8, jnp.asarray(
                np.clip(np.rint(ws * 40), -127, 127), jnp.int8))
            f_bf = jax.jit(lambda a, w: chain_bf16(a, w, dil))
            f_i8 = jax.jit(lambda a, w: chain_int8(a, w, dil))

        ms_bf = timed(f_bf, *args_bf)
        try:
            ms_i8 = timed(f_i8, *args_i8)
        except Exception as e:
            print(json.dumps({"shape": name, "bf16_ms": round(ms_bf, 2),
                              "int8": f"FAILED: {type(e).__name__}: {e}"}))
            continue
        print(json.dumps({
            "shape": name,
            "bf16_ms": round(ms_bf, 2),
            "bf16_tfs": round(flops / ms_bf / 1e9, 1),
            "int8_ms": round(ms_i8, 2),
            "int8_tops": round(flops / ms_i8 / 1e9, 1),
            "speedup": round(ms_bf / ms_i8, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
