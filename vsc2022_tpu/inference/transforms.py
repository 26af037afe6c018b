"""On-device image preprocessing, fused into the jit forward pass.

The reference preprocesses on CPU with torchvision (PIL resize +
ToTensor + ImageNet Normalize per frame; reference:
vsc/baseline/inference_impl.py:39-69). Here decode stays on the host
but resize/crop/normalize run on device over whole uint8 batches —
one H2D transfer of packed uint8, everything else fused by XLA.

Transform modes match the reference enum
(reference: vsc/baseline/inference.py:28-34):
  RESIZE_288        aspect-preserving resize, short side → 288
  RESIZE_320_CENTER short side → 320, center crop 320×320
  RESIZE_224_SQUARE resize to 224×224
"""

from __future__ import annotations

import enum
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class InferenceTransforms(enum.Enum):
    RESIZE_288 = enum.auto()
    RESIZE_320_CENTER = enum.auto()
    RESIZE_224_SQUARE = enum.auto()


def resized_dims(mode: InferenceTransforms, h: int, w: int) -> Tuple[int, int]:
    """Target (H, W) after the resize step (before any crop)."""
    if mode == InferenceTransforms.RESIZE_224_SQUARE:
        return 224, 224
    short = 288 if mode == InferenceTransforms.RESIZE_288 else 320
    if h <= w:
        return short, max(1, round(w * short / h))
    return max(1, round(h * short / w)), short


def output_dims(mode: InferenceTransforms, h: int, w: int) -> Tuple[int, int]:
    rh, rw = resized_dims(mode, h, w)
    if mode == InferenceTransforms.RESIZE_320_CENTER:
        return 320, 320
    return rh, rw


@functools.partial(jax.jit, static_argnames=("mode",))
def preprocess(frames: jax.Array, mode: InferenceTransforms) -> jax.Array:
    """uint8 [B, H, W, 3] → normalized float32 [B, H', W', 3]."""
    b, h, w, c = frames.shape
    x = frames.astype(jnp.float32) / 255.0
    rh, rw = resized_dims(mode, h, w)
    if (rh, rw) != (h, w):
        # antialiased linear resize ≈ PIL/torchvision BILINEAR downscale
        x = jax.image.resize(x, (b, rh, rw, c), method="linear", antialias=True)
    if mode == InferenceTransforms.RESIZE_320_CENTER:
        top = (rh - 320) // 2
        left = (rw - 320) // 2
        x = jax.lax.dynamic_slice(
            x, (0, max(top, 0), max(left, 0), 0),
            (b, min(320, rh), min(320, rw), c),
        )
        if x.shape[1] != 320 or x.shape[2] != 320:
            # Input smaller than the crop: pad (torchvision CenterCrop pads)
            ph, pw = 320 - x.shape[1], 320 - x.shape[2]
            x = jnp.pad(
                x,
                ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)),
            )
    mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32)
    std = jnp.asarray(IMAGENET_STD, dtype=jnp.float32)
    return (x - mean) / std
