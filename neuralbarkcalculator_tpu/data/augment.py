"""Paired augmentation: host-side pad_resize + device-side random pipeline.

The reference training transform (__main__.py:155-166) is, per sample:
pad_resize(1024) -> ColorJitter(saturation=0.2, brightness=0.1) ->
RandomCrop(crop) -> RandomHorizontalFlip -> RandomVerticalFlip, applied to
sample and target with a shared seed (dataset.py:176-183), plus Normalize as
input-only.

TPU-native split:
- ``pad_resize`` is deterministic, so it runs once on host at dataset load
  (reference utils.py:242-247: np-reflect pad to >= target then PIL-bilinear
  resize; we reproduce PIL's antialiased triangle filter exactly as a linear
  operator).
- Everything random runs *inside the jitted train step* on device, driven by
  jax.random keys (one key per sample, vmapped): crop offsets and flips are
  shared between image and label; color jitter applies to the image only.
  (The reference nominally jitters the target too, but on {0,127,255} duals
  a 0.9-1.1 brightness factor never moves a value across the class-decode
  rounding boundary, so image-only jitter is exactly equivalent.)
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- host side

@functools.lru_cache(maxsize=32)
def pil_bilinear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """PIL Image.resize(BILINEAR) as a 1-D linear operator (antialiased
    triangle filter, the PIL>=2.7 convolution resampler torchvision 0.3's
    Resize delegates to)."""
    scale = in_size / out_size
    support = max(scale, 1.0)
    R = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        js = np.arange(xmin, xmax)
        w = 1.0 - np.abs((js + 0.5 - center) / support)
        w = np.clip(w, 0.0, None)
        s = w.sum()
        if s > 0:
            R[i, xmin:xmax] = w / s
    return R


def pad_resize(image: np.ndarray, width: int, height: int) -> np.ndarray:
    """Reference utils.py:242-247: reflect-pad by ceil((target-size)/2) on
    each side, then PIL-bilinear resize to (height, width).

    image: [H, W, C] or [H, W] float.
    """
    ph = math.ceil((height - image.shape[0]) / 2)
    pw = math.ceil((width - image.shape[1]) / 2)
    pad_spec = [(ph, ph), (pw, pw)] + [(0, 0)] * (image.ndim - 2)
    if ph or pw:
        image = np.pad(image, pad_spec, mode="reflect")
    if image.shape[:2] == (height, width):
        return image
    rr = pil_bilinear_matrix(image.shape[0], height)
    rc = pil_bilinear_matrix(image.shape[1], width)
    out = np.tensordot(rr, image, axes=(1, 0))
    out = np.moveaxis(np.tensordot(rc, out, axes=(1, 1)), 0, 1)
    return out.astype(image.dtype, copy=False)


def pad_resize_pair(sample: np.ndarray, target: np.ndarray,
                    size: int) -> tuple[np.ndarray, np.ndarray]:
    """Paired pad_resize for (float sample, int label); labels resize with
    the same operator then re-round to classes (nearest behavior for the
    near-identity scales this path sees)."""
    sample = pad_resize(sample, size, size)
    lab = pad_resize(target.astype(np.float32), size, size)
    return sample, np.rint(lab).astype(np.int32)


# -------------------------------------------------------------- device side

def _grayscale(img: jnp.ndarray) -> jnp.ndarray:
    """ITU-R 601 luma, the torchvision grayscale used by saturation."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return (0.299 * r + 0.587 * g + 0.114 * b)[..., None]


def color_jitter(key: jax.Array, img: jnp.ndarray,
                 brightness: float, saturation: float) -> jnp.ndarray:
    """torchvision ColorJitter(brightness, saturation) parity: factors
    sampled U[1-x, 1+x], the two adjustments applied in random order,
    output clamped to [0,1]."""
    kb, ks, korder = jax.random.split(key, 3)
    fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - brightness),
                            maxval=1 + brightness)
    fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - saturation),
                            maxval=1 + saturation)

    def bright(x):
        return jnp.clip(x * fb, 0.0, 1.0)

    def sat(x):
        gray = _grayscale(x)
        return jnp.clip(gray + fs * (x - gray), 0.0, 1.0)

    order = jax.random.bernoulli(korder)
    return jax.lax.cond(order,
                        lambda x: sat(bright(x)),
                        lambda x: bright(sat(x)), img)


def paired_random_crop(key: jax.Array, img: jnp.ndarray, lab: jnp.ndarray,
                       crop: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shared-offset RandomCrop(crop) on [H,W,C] image + [H,W] label."""
    h, w = img.shape[0], img.shape[1]
    ki, kj = jax.random.split(key)
    i = jax.random.randint(ki, (), 0, h - crop + 1)
    j = jax.random.randint(kj, (), 0, w - crop + 1)
    img_c = jax.lax.dynamic_slice(img, (i, j, 0), (crop, crop,
                                                   img.shape[2]))
    lab_c = jax.lax.dynamic_slice(lab, (i, j), (crop, crop))
    return img_c, lab_c


def paired_flips(key: jax.Array, img: jnp.ndarray,
                 lab: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shared RandomHorizontalFlip + RandomVerticalFlip (p=0.5 each)."""
    kh, kv = jax.random.split(key)
    do_h = jax.random.bernoulli(kh)
    do_v = jax.random.bernoulli(kv)
    img = jnp.where(do_h, img[:, ::-1], img)
    lab = jnp.where(do_h, lab[:, ::-1], lab)
    img = jnp.where(do_v, img[::-1], img)
    lab = jnp.where(do_v, lab[::-1], lab)
    return img, lab


def _augment_one(key: jax.Array, img: jnp.ndarray, lab: jnp.ndarray,
                 crop: int, brightness: float, saturation: float,
                 mean: jnp.ndarray, std: jnp.ndarray):
    kj, kc, kf = jax.random.split(key, 3)
    img = color_jitter(kj, img, brightness, saturation)
    img, lab = paired_random_crop(kc, img, lab, crop)
    img, lab = paired_flips(kf, img, lab)
    img = (img - mean) / std  # input-only Normalize (__main__.py:157)
    return img, lab


@functools.partial(jax.jit, static_argnums=(3,),
                   static_argnames=("brightness", "saturation"))
def augment_batch(key: jax.Array, imgs: jnp.ndarray, labs: jnp.ndarray,
                  crop: int, mean: jnp.ndarray, std: jnp.ndarray,
                  brightness: float = 0.1, saturation: float = 0.2):
    """Vectorized paired augmentation of a [B,H,W,C]/[B,H,W] batch on
    device: one independent key per sample."""
    keys = jax.random.split(key, imgs.shape[0])
    return jax.vmap(
        lambda k, i, l: _augment_one(k, i, l, crop, brightness, saturation,
                                     mean, std))(keys, imgs, labs)


def _gather_augment_one(key: jax.Array, idx: jnp.ndarray,
                        images_u8: jnp.ndarray, labels_u8: jnp.ndarray,
                        crop: int, brightness: float, saturation: float,
                        mean: jnp.ndarray, std: jnp.ndarray):
    """One sample of gather_augment_batch (vmapped over key/idx)."""
    kj, kc, kf = jax.random.split(key, 3)
    h, w = images_u8.shape[1], images_u8.shape[2]
    ki_, kj_ = jax.random.split(kc)
    oy = jax.random.randint(ki_, (), 0, h - crop + 1)
    ox = jax.random.randint(kj_, (), 0, w - crop + 1)
    img = jax.lax.dynamic_slice(
        images_u8, (idx, oy, ox, 0),
        (1, crop, crop, images_u8.shape[3]))[0]
    lab = jax.lax.dynamic_slice(labels_u8, (idx, oy, ox),
                                (1, crop, crop))[0]
    img = img.astype(jnp.float32) / 255.0
    lab = lab.astype(jnp.int32)
    img = color_jitter(kj, img, brightness, saturation)
    img, lab = paired_flips(kf, img, lab)
    img = (img - mean) / std  # input-only Normalize (__main__.py:157)
    return img, lab


@functools.partial(jax.jit, static_argnums=(4,),
                   static_argnames=("brightness", "saturation"))
def gather_augment_batch(key: jax.Array, images_u8: jnp.ndarray,
                         labels_u8: jnp.ndarray, idx: jnp.ndarray,
                         crop: int, mean: jnp.ndarray, std: jnp.ndarray,
                         brightness: float = 0.1,
                         saturation: float = 0.2):
    """Fused dataset-gather + paired augmentation: slices each sample's
    random crop window *directly out of the HBM-resident uint8 dataset*
    (one batched dynamic-slice gather) instead of materializing full
    [B, H, W, 3] images and jittering them before cropping. The pointwise
    color jitter commutes with cropping, so jitter-after-crop is exactly
    the reference distribution (__main__.py:155-166) at a quarter of the
    HBM traffic for crop=H/2; per-sample key splitting matches
    augment_batch (kj=jitter, kc=crop offsets, kf=flips).
    """
    keys = jax.random.split(key, idx.shape[0])
    return jax.vmap(
        lambda k, i: _gather_augment_one(k, i, images_u8, labels_u8, crop,
                                         brightness, saturation, mean,
                                         std))(keys, idx)


def pad_to_biggest_image(samples: list[np.ndarray],
                         targets: list[np.ndarray]
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Reference pad_to_biggest_image parity (utils.py:250-264, unused in
    the reference's main): pad_resize every (sample, target) pair to the
    largest width/height in the batch, then stack.

    samples: list of [H, W, C] float; targets: list of [H, W] int.
    """
    height = max(s.shape[0] for s in samples)
    width = max(s.shape[1] for s in samples)
    out_s, out_t = [], []
    for sample, target in zip(samples, targets):
        s = pad_resize(sample, width, height)
        t = np.rint(pad_resize(target.astype(np.float32), width,
                               height)).astype(np.int32)
        out_s.append(s)
        out_t.append(t)
    return np.stack(out_s), np.stack(out_t)


def norm_color_jitter(key: jax.Array, img: jnp.ndarray,
                      brightness: float = 0.0, contrast: float = 0.0,
                      saturation: float = 0.0) -> jnp.ndarray:
    """Reference NormColorJitter parity (utils.py:267-351, unused in the
    reference's main): jitter factors sampled from N(1, x) instead of
    U[1-x, 1+x], adjustments applied in a random order.

    img: [H, W, 3] float in [0, 1]. A zero parameter disables that
    adjustment (reference _check_input).
    """
    kb, kc, ks, korder = jax.random.split(key, 4)

    def bright(x):
        if brightness == 0:
            return x
        f = 1.0 + brightness * jax.random.normal(kb, ())
        return jnp.clip(x * f, 0.0, 1.0)

    def contr(x):
        if contrast == 0:
            return x
        f = 1.0 + contrast * jax.random.normal(kc, ())
        gray_mean = jnp.mean(_grayscale(x))
        return jnp.clip(gray_mean + f * (x - gray_mean), 0.0, 1.0)

    def sat(x):
        if saturation == 0:
            return x
        f = 1.0 + saturation * jax.random.normal(ks, ())
        gray = _grayscale(x)
        return jnp.clip(gray + f * (x - gray), 0.0, 1.0)

    # random application order (reference shuffles the transform list)
    orders = [(bright, contr, sat), (bright, sat, contr),
              (contr, bright, sat), (contr, sat, bright),
              (sat, bright, contr), (sat, contr, bright)]
    idx = jax.random.randint(korder, (), 0, len(orders))
    branches = [
        (lambda x, fs=fs: fs[2](fs[1](fs[0](x)))) for fs in orders]
    return jax.lax.switch(idx, branches, img)
