"""Golden test: the fused Pallas upsample+argmax kernel must match the
unfused path (bicubic_upsample_ragged + jnp.argmax) exactly.

Runs in Pallas interpreter mode on the CPU mesh; the real-TPU compiled
path is exercised by the predict engine on hardware (verify drives).
"""
import jax
import jax.numpy as jnp
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


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="fused_dropout_matmul uses the TPU on-core "
                           "PRNG (no interpret-mode emulation)")
def test_fused_dropout_matmul_tpu():
    """Fused dropout+1x1-conv head kernel: rate~0 equals the plain
    matmul; at rate 0.8 the recovered mask is {0, 1/keep} with ~20%
    keep, and gradients match autodiff of the fixed-mask equivalent."""
    from neuralbarkcalculator_tpu.ops.pallas_kernels import (
        fused_dropout_matmul)

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((2, 32, 64, 512)), jnp.float32)
    ones_w = jnp.ones((512, 3), jnp.float32)
    b = jnp.asarray(rng.standard_normal(3), jnp.float32)
    seed = jnp.asarray([1234], jnp.int32)

    y0 = fused_dropout_matmul(h, ones_w, b, seed, 1e-9)
    want = jnp.einsum("bhwc,ck->bhwk", h, ones_w) + b
    np.testing.assert_allclose(np.asarray(y0), np.asarray(want),
                               atol=1e-4)

    rate = 0.8
    dh = jax.grad(lambda x: jnp.sum(
        fused_dropout_matmul(x, ones_w, b, seed, rate)))(h)
    m = np.asarray(dh) / 3.0
    assert set(np.unique(np.round(m, 3))) <= {0.0, 5.0}
    assert 0.18 < (m > 0).mean() < 0.22

    w2 = jnp.asarray(rng.standard_normal((512, 3)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((2, 32, 64, 3)), jnp.float32)
    gk = jax.grad(lambda *a: jnp.vdot(
        fused_dropout_matmul(*a, seed, rate), g), argnums=(0, 1, 2))(
        h, w2, b)
    gr = jax.grad(lambda h2, w_, b_: jnp.vdot(jnp.einsum(
        "bhwc,ck->bhwk", h2 * jnp.asarray(m), w_) + b_, g),
        argnums=(0, 1, 2))(h, w2, b)
    for a, c in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-3)
