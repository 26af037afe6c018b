"""Flax ResNet-50 (torchvision v1.5 semantics, NHWC layout).

Backbone for the SSCD descriptor model and the DnS L3-iMAC feature
extractor. Matches torchvision's ``resnet50``: 7×7/2 stem + 3×3/2
maxpool, bottleneck blocks with the stride on the 3×3 conv, so imported
torch weights reproduce outputs exactly (inference mode).

The reference runs this architecture only as an opaque TorchScript
artifact (reference: vsc/baseline/adapt_sscd_model.py:54-69 observes the
backbone/pool/project structure); here it is a first-class module so
XLA can fuse and the mesh can shard it.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


class FoldedNorm(nn.Module):
    """Stand-in norm for a BatchNorm whose affine was folded into the
    preceding conv (models/fold.py): a no-op with no parameters."""

    @nn.compact
    def __call__(self, x):
        return x


class Bottleneck(nn.Module):
    """1×1 → 3×3(stride) → 1×1(×4) with projection shortcut."""

    features: int
    stride: int = 1
    norm: ModuleDef = nn.BatchNorm
    conv_bias: bool = False  # True when BN is folded into the convs

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(
            self.features, (1, 1), use_bias=self.conv_bias, name="conv1"
        )(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            use_bias=self.conv_bias,
            name="conv2",
        )(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features * 4, (1, 1), use_bias=self.conv_bias, name="conv3"
        )(y)
        y = self.norm(name="bn3")(y)

        if residual.shape[-1] != self.features * 4 or self.stride != 1:
            residual = nn.Conv(
                self.features * 4,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=self.conv_bias,
                name="downsample_conv",
            )(residual)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """Returns the final [N, H/32, W/32, 2048] feature map; with
    ``return_intermediates`` also the four stage outputs (for L3-iMAC)."""

    return_intermediates: bool = False
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    stage_features: Sequence[int] = (64, 128, 256, 512)
    # Inference-only: BatchNorm affines pre-folded into conv weights
    # (models/fold.py transforms the params); BN layers become no-ops
    # and every conv carries a bias. Removes the BN elementwise passes
    # from the hot loop (~6-8% of the b512 bf16 forward measured on
    # v5e — tools/profile_inference.py).
    fold_bn: bool = False
    # Inference-only: space-to-depth stem (the MLPerf ResNet TPU
    # transform). The 7×7/2 conv over 3 channels packs the MXU
    # contraction at 147 elements over a 3-channel minor axis; the
    # exact reparameterization — 2×2 space-to-depth, then a VALID
    # 4×4/1 conv over 12 channels (kernel transformed by
    # models/fold.py s2d_stem) — contracts 192 elements with 4× the
    # channel packing. Same math, reassociated f32 sums. Pair with
    # s2d_stem-transformed params.
    stem_s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert not (self.fold_bn and train), (
            "fold_bn is an inference-only transform (running statistics "
            "are folded away)"
        )
        if self.fold_bn:
            norm = FoldedNorm
        else:
            norm = partial(
                nn.BatchNorm,
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
            )
        if self.stem_s2d:
            assert not train, "stem_s2d is an inference-only transform"
            n, h, w, c = x.shape
            assert h % 2 == 0 and w % 2 == 0, (
                "stem_s2d needs even spatial dims (all inference "
                f"transforms are even); got {(h, w)}"
            )
            out_h = (h - 1) // 2 + 1
            out_w = (w - 1) // 2 + 1
            # Pad 4 per side (the original pad 3 shifted into the even
            # grid; the extra leading column multiplies the kernel's
            # zero row), 2×2 space-to-depth, one VALID 4×4 conv.
            xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
            hp, wp = h + 8, w + 8
            y = xp.reshape(n, hp // 2, 2, wp // 2, 2, c)
            y = y.transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape(n, hp // 2, wp // 2, 4 * c)
            x = nn.Conv(
                64, (4, 4), padding="VALID", use_bias=self.fold_bn,
                name="conv1",
            )(y)[:, :out_h, :out_w]
        else:
            x = nn.Conv(
                64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                use_bias=self.fold_bn, name="conv1",
            )(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        intermediates = []
        for stage, (num_blocks, features) in enumerate(
            zip(self.stage_sizes, self.stage_features)
        ):
            for block in range(num_blocks):
                stride = 2 if stage > 0 and block == 0 else 1
                x = Bottleneck(
                    features,
                    stride=stride,
                    norm=norm,
                    conv_bias=self.fold_bn,
                    name=f"layer{stage + 1}_{block}",
                )(x)
            intermediates.append(x)

        if self.return_intermediates:
            return x, tuple(intermediates)
        return x


def gem_pool(x: jnp.ndarray, p: float = 3.0, eps: float = 1e-6) -> jnp.ndarray:
    """Generalized-mean pooling over spatial dims: (mean(x^p))^(1/p).

    The SSCD head's GlobalGeMPool2d (reference:
    vsc/baseline/adapt_sscd_model.py:64 observes it in the TorchScript
    graph); p=3 is the SSCD default.
    """
    x = jnp.clip(x, eps, None)
    pooled = jnp.mean(x**p, axis=(1, 2))
    return pooled ** (1.0 / p)
