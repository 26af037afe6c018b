"""Full-model conversion numerics: build the torch architectures the
published checkpoints use (torchvision-layout ResNet-50 + SSCD head,
DINO ViT-S), randomize their weights, convert with models/convert, and
require numerically identical outputs. This pins every convention the
converters must honor: stride placement, downsample ordering, BN eps and
running stats, qkv fusion, attention scaling, GELU flavor, LN eps."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vsc2022_tpu.models import DinoViT, SSCDModel  # noqa: E402
from vsc2022_tpu.models.convert import (  # noqa: E402
    dino_vit_from_torch,
    sscd_from_torch,
)


# ---- torchvision-layout ResNet-50 (v1.5: stride on the 3x3) ----------


class TorchBottleneck(tnn.Module):
    def __init__(self, cin, mid, stride=1):
        super().__init__()
        cout = mid * 4
        self.conv1 = tnn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(mid)
        self.conv2 = tnn.Conv2d(mid, mid, 3, stride=stride, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(mid)
        self.conv3 = tnn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(cout),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + identity)


class TorchResNet50Trunk(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        specs = [(3, 64, 64), (4, 128, 256), (6, 256, 512), (3, 512, 1024)]
        for idx, (blocks, mid, cin) in enumerate(specs, start=1):
            layers = []
            for b in range(blocks):
                stride = 2 if idx > 1 and b == 0 else 1
                layers.append(
                    TorchBottleneck(cin if b == 0 else mid * 4, mid, stride)
                )
            setattr(self, f"layer{idx}", tnn.Sequential(*layers))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for idx in range(1, 5):
            x = getattr(self, f"layer{idx}")(x)
        return x


class TorchSSCD(tnn.Module):
    """backbone → GeM(p=3) → project (the adapted SSCD layout)."""

    def __init__(self):
        super().__init__()
        self.backbone = TorchResNet50Trunk()
        self.project = tnn.Linear(2048, 512)

    def forward(self, x):
        x = self.backbone(x)
        x = x.clamp(min=1e-6).pow(3.0).mean(dim=(2, 3)).pow(1.0 / 3.0)
        return self.project(x)


def randomize_bn_stats(model, rng):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(
                torch.from_numpy(rng.randn(m.num_features).astype(np.float32))
                * 0.1
            )
            m.running_var.copy_(
                torch.from_numpy(
                    rng.rand(m.num_features).astype(np.float32)
                )
                + 0.5
            )


class TestSSCDFullModelConversion:
    def test_outputs_match(self):
        torch.manual_seed(0)
        rng = np.random.RandomState(0)
        model = TorchSSCD().eval()
        with torch.no_grad():
            randomize_bn_stats(model, rng)

        state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        variables = sscd_from_torch(state)

        x = rng.randn(2, 3, 96, 96).astype(np.float32)
        with torch.no_grad():
            expect = model(torch.from_numpy(x)).numpy()
        got = np.asarray(
            SSCDModel().apply(
                variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
            )
        )
        np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-3)


# ---- DINO ViT-S/16 ----------------------------------------------------


class TorchViTBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(dim, dim * 3)
        self.attn.proj = tnn.Linear(dim, dim)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, dim * 4)
        self.mlp.fc2 = tnn.Linear(dim * 4, dim)
        self.heads = heads

    def forward(self, x):
        b, n, d = x.shape
        h = self.heads
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(b, n, 3, h, d // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q @ k.transpose(-2, -1)) * (d // h) ** -0.5
        att = att.softmax(dim=-1)
        y = (att @ v).transpose(1, 2).reshape(b, n, d)
        x = x + self.attn.proj(y)
        y = self.norm2(x)
        y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(y)))
        return x + y


class TorchDinoViT(tnn.Module):
    def __init__(self, dim=384, depth=12, heads=6, patch=16):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, patch, stride=patch)
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = tnn.Parameter(
            torch.randn(1, (224 // patch) ** 2 + 1, dim) * 0.02
        )
        self.blocks = tnn.ModuleList(
            [TorchViTBlock(dim, heads) for _ in range(depth)]
        )
        self.norm = tnn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        b = x.shape[0]
        p = self.patch_embed.proj(x)  # [B, D, H/16, W/16]
        tokens = p.flatten(2).transpose(1, 2)
        tokens = torch.cat(
            [self.cls_token.expand(b, -1, -1), tokens], dim=1
        )
        tokens = tokens + self.pos_embed
        for blk in self.blocks:
            tokens = blk(tokens)
        tokens = self.norm(tokens)
        cls = tokens[:, 0]
        patches = tokens[:, 1:].clamp(min=1e-6)
        gem = patches.pow(4.0).mean(dim=1).pow(1.0 / 4.0)
        return torch.cat([cls, gem], dim=1)


class TestDinoViTFullModelConversion:
    def test_outputs_match(self):
        torch.manual_seed(1)
        rng = np.random.RandomState(1)
        model = TorchDinoViT(dim=96, depth=3, heads=3).eval()
        # Convert with matching hyperparameters.
        state = {}
        for k, v in model.state_dict().items():
            k = k.replace("blocks.", "blocks.")  # names already match
            state[k] = v.detach().numpy()

        variables = dino_vit_from_torch(state, dim=96, heads=3)
        flax_model = DinoViT(dim=96, depth=3, num_heads=3)

        x = rng.randn(2, 3, 224, 224).astype(np.float32)
        with torch.no_grad():
            expect = model(torch.from_numpy(x)).numpy()
        got = np.asarray(
            flax_model.apply(
                variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
            )
        )
        np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-3)
