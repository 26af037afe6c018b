"""SSCD descriptor model: ResNet-50 trunk + GeM pooling + 512-d projection.

The reference's adapted ``sscd_disc_mixup`` TorchScript model is
backbone → GlobalGeMPool2d → Linear → [L2Norm stripped]
(reference: vsc/baseline/adapt_sscd_model.py:54-77). The L2Norm strip is
a constructor flag here instead of a separate model-surgery script —
score normalization needs raw (unnormalized) descriptors.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vsc2022_tpu.models.resnet import ResNet50, gem_pool


class SSCDModel(nn.Module):
    """Frame descriptor model; input NHWC float images (ImageNet
    normalized), output [N, dims] descriptors.

    ``stage_sizes``/``stage_features`` default to ResNet-50; smaller
    configurations are useful for tests and sharding dry-runs."""

    dims: int = 512
    gem_p: float = 3.0
    l2_normalize: bool = False  # reference strips L2Norm for score-norm
    stage_sizes: tuple = (3, 4, 6, 3)
    stage_features: tuple = (64, 128, 256, 512)
    fold_bn: bool = False  # inference-only; pair with models/fold.py
    stem_s2d: bool = False  # inference-only; pair with fold.s2d_stem

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ResNet50(
            stage_sizes=self.stage_sizes,
            stage_features=self.stage_features,
            fold_bn=self.fold_bn,
            stem_s2d=self.stem_s2d,
            name="backbone",
        )(x, train=train)
        x = gem_pool(x, p=self.gem_p)
        x = nn.Dense(self.dims, name="project")(x)
        if self.l2_normalize:
            x = x / jnp.clip(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12, None
            )
        return x
