"""Golden test: the fused Pallas upsample+argmax kernel must match the
unfused path (bicubic_upsample_ragged + jnp.argmax) exactly.

Runs in Pallas interpreter mode on the CPU mesh; the real-TPU compiled
path is exercised by the predict engine on hardware (verify drives).
"""
import numpy as np
import pytest


def test_upsample_argmax_matches_unfused(rng):
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.ops.pallas_kernels import upsample_argmax
    from neuralbarkcalculator_tpu.ops.resize import (
        bicubic_resize_matrix, bicubic_upsample_ragged,
        embedded_bicubic_rows)

    b, f, wf, ow = 2, 32, 16, 128
    oh = 256
    feat = rng.normal(size=(b, f, wf, 3)).astype(np.float32)
    heights = [250, 256]
    row_ops = np.stack([
        embedded_bicubic_rows(f * h // oh, h, f, oh) for h in heights
    ]).astype(np.float32)
    colt = np.ascontiguousarray(
        bicubic_resize_matrix(wf, ow).T).astype(np.float32)

    want = np.asarray(jnp.argmax(bicubic_upsample_ragged(
        jnp.asarray(feat), jnp.asarray(row_ops), ow), axis=-1))

    got = np.asarray(upsample_argmax(
        jnp.asarray(feat), jnp.asarray(row_ops), jnp.asarray(colt),
        out_w=ow, interpret=True))

    assert got.shape == (b, oh, ow) and got.dtype == np.uint8
    np.testing.assert_array_equal(got, want.astype(np.uint8))
    # padded rows (height 250 image) are class 0
    assert np.all(got[0, 250:] == 0)
