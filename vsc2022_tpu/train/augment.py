"""Device-side augmentation for self-supervised descriptor training.

SSCD-style two-view augmentation (random resized crop, horizontal
flip, brightness/contrast jitter) implemented as a single jit over the
batch — the host ships raw uint8 frames once and both views are
generated on device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from vsc2022_tpu.inference.transforms import IMAGENET_MEAN, IMAGENET_STD


def _random_resized_crop(rng, img, out_hw: int):
    """One image [H, W, 3] → random crop (area 30–100%) resized to
    out_hw², via a scaled gather grid (shapes stay static)."""
    h, w, _ = img.shape
    k_scale, k_x, k_y, = jax.random.split(rng, 3)
    scale = jax.random.uniform(k_scale, (), minval=0.55, maxval=1.0)
    crop_h = jnp.maximum((scale * h).astype(jnp.int32), 1)
    crop_w = jnp.maximum((scale * w).astype(jnp.int32), 1)
    top = jax.random.randint(k_y, (), 0, h) % jnp.maximum(h - crop_h + 1, 1)
    left = jax.random.randint(k_x, (), 0, w) % jnp.maximum(w - crop_w + 1, 1)

    ys = top + (jnp.arange(out_hw) * crop_h) // out_hw
    xs = left + (jnp.arange(out_hw) * crop_w) // out_hw
    return img[ys][:, xs]


@functools.partial(jax.jit, static_argnames=("out_hw",))
def two_views(
    rng: jax.Array,
    frames: jax.Array,  # [B, H, W, 3] uint8
    out_hw: int = 224,
) -> Tuple[jax.Array, jax.Array]:
    """Two augmented, ImageNet-normalized views of each frame."""
    b = frames.shape[0]
    x = frames.astype(jnp.float32) / 255.0

    def one_view(key, img):
        k_crop, k_flip, k_bright, k_contrast = jax.random.split(key, 4)
        v = _random_resized_crop(k_crop, img, out_hw)
        v = jax.lax.cond(
            jax.random.bernoulli(k_flip),
            lambda u: u[:, ::-1, :],
            lambda u: u,
            v,
        )
        v = v * jax.random.uniform(k_bright, (), minval=0.7, maxval=1.3)
        mean = jnp.mean(v, axis=(0, 1), keepdims=True)
        v = (v - mean) * jax.random.uniform(
            k_contrast, (), minval=0.7, maxval=1.3
        ) + mean
        v = jnp.clip(v, 0.0, 1.0)
        return (v - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

    k_a, k_b = jax.random.split(rng)
    view_a = jax.vmap(one_view)(jax.random.split(k_a, b), x)
    view_b = jax.vmap(one_view)(jax.random.split(k_b, b), x)
    return view_a, view_b
