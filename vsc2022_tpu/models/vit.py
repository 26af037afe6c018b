"""DINO ViT-S/16 with the copy-detection descriptor head.

The DINO baseline uses the pretrained ViT-S/16 with the copy-detection
feature extraction from the DINO paper: the [CLS] token concatenated
with GeM-pooled patch tokens → 2·384 = 768 dims
(reference: docs/baseline_dino.md:2-9; served as an opaque
``dino_vits16_cdpool`` TorchScript artifact).

Standard pre-norm ViT: patch conv 16×16/16, learned pos-embed, 12
blocks (dim 384, 6 heads, MLP ×4, GELU), final LayerNorm.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class MLP(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out, name="fc2")(x)
        return x


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.dim,
            out_features=self.dim,
            name="attn",
        )(y, y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = MLP(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(y)
        return x + y


def _interpolate_pos_embed(pos: jnp.ndarray, num_patches: int) -> jnp.ndarray:
    """Bicubic-resample the grid part of a [1, 1+N, D] pos-embed to a new
    patch count (DINO supports variable input resolutions this way)."""
    n = pos.shape[1] - 1
    if n == num_patches:
        return pos
    import jax.image

    cls_pos, grid = pos[:, :1], pos[:, 1:]
    size = int(np.sqrt(n))
    new_size = int(np.sqrt(num_patches))
    grid = grid.reshape(1, size, size, -1)
    grid = jax.image.resize(
        grid, (1, new_size, new_size, grid.shape[-1]), method="cubic"
    )
    return jnp.concatenate([cls_pos, grid.reshape(1, -1, pos.shape[-1])], axis=1)


def vit_gem_pool(tokens: jnp.ndarray, p: float = 4.0, eps: float = 1e-6):
    """GeM over patch tokens. DINO's copy-detection evaluation uses
    exponent 4 (facebookresearch/dino eval_copy_detection)."""
    clipped = jnp.clip(tokens, eps, None)
    return jnp.mean(clipped**p, axis=1) ** (1.0 / p)


class DinoViT(nn.Module):
    """ViT-S/16; output = concat([CLS], GeM(patch tokens)) → 768-d."""

    patch_size: int = 16
    dim: int = 384
    depth: int = 12
    num_heads: int = 6
    gem_p: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, _ = x.shape
        patches = nn.Conv(
            self.dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            name="patch_embed",
        )(x)
        num_patches = patches.shape[1] * patches.shape[2]
        tokens = patches.reshape(n, num_patches, self.dim)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.dim)
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, (224 // self.patch_size) ** 2 + 1, self.dim),
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (n, 1, self.dim)), tokens], axis=1
        )
        tokens = tokens + _interpolate_pos_embed(pos_embed, num_patches)

        for i in range(self.depth):
            tokens = Block(self.dim, self.num_heads, name=f"block{i}")(tokens)
        tokens = nn.LayerNorm(epsilon=1e-6, name="norm")(tokens)

        cls_out = tokens[:, 0]
        patch_pool = vit_gem_pool(tokens[:, 1:], p=self.gem_p)
        return jnp.concatenate([cls_out, patch_pool], axis=-1)
