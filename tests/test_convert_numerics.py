"""Full-model conversion numerics: build the torch architectures the
published checkpoints use (torchvision-layout ResNet-50 + SSCD head,
DINO ViT-S), randomize their weights, convert with models/convert, and
require numerically identical outputs. This pins every convention the
converters must honor: stride placement, downsample ordering, BN eps and
running stats, qkv fusion, attention scaling, GELU flavor, LN eps."""

import numpy as np
import pytest


pytestmark = pytest.mark.slow  # torch replica builds + TorchScript round-trips (~1.5 min)
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


# ---- DnS students (distill-and-select layout; DnS paper math) ---------


class TorchDnSAttention(tnn.Module):
    """Tensor-dot (l2-) attention: weights in [0,1] from a unit-norm
    context vector (ViSiL/DnS formulation)."""

    def __init__(self, dims=512):
        super().__init__()
        self.context_vector = tnn.Linear(dims, 1, bias=False)

    def forward(self, x):
        u = torch.nn.functional.normalize(
            self.context_vector.weight, dim=-1
        )
        weights = (x @ u.t() + 1.0) / 2.0
        return x * weights, weights


class TorchFineStudent(tnn.Module):
    def __init__(self, fg_type="att"):
        super().__init__()
        self.fg_type = fg_type
        self.reduction = tnn.Linear(3840, 512)
        self.attention = TorchDnSAttention(512)
        if fg_type == "bin":
            self.binarization = tnn.Module()
            self.binarization.W = tnn.Parameter(torch.randn(512, 512))

    def forward(self, regions):  # [T, 9, 3840]
        x = self.reduction(regions)
        x = torch.nn.functional.normalize(x, dim=-1, eps=1e-12)
        x, _ = self.attention(x)
        if self.fg_type == "bin":
            x = x @ self.binarization.W
        return x


class TorchCoarseStudent(tnn.Module):
    def __init__(self):
        super().__init__()
        self.reduction = tnn.Linear(3840, 512)
        self.attention = TorchDnSAttention(512)
        self.project = tnn.Linear(512, 1024)

    def forward(self, regions):  # [T, 9, 3840]
        x = self.reduction(regions)
        x = torch.nn.functional.normalize(x, dim=-1, eps=1e-12)
        x, weights = self.attention(x)
        pooled = x.sum(dim=1) / weights.sum(dim=1).clamp(min=1e-6)
        return torch.tanh(self.project(pooled))


class TestDnSStudentConversion:
    def _state(self, model):
        return {k: v.detach().numpy() for k, v in model.state_dict().items()}

    def _regions(self, rng, t=5):
        r = rng.randn(t, 9, 3840).astype(np.float32)
        return r / np.linalg.norm(r, axis=-1, keepdims=True)

    @pytest.mark.parametrize("fg_type", ["att", "bin"])
    def test_fine_student_outputs_match(self, fg_type):
        from vsc2022_tpu.models.convert import dns_student_from_torch
        from vsc2022_tpu.models.dns import DnSStudent

        torch.manual_seed(3)
        rng = np.random.RandomState(3)
        ref_model = TorchFineStudent(fg_type).eval()
        params = dns_student_from_torch(self._state(ref_model), "fg", fg_type)
        student = DnSStudent("fg", fg_type, params=params)

        regions = self._regions(rng)
        with torch.no_grad():
            expect = ref_model(torch.from_numpy(regions)).numpy()
        got = student.index_video(regions.reshape(regions.shape[0], -1))
        np.testing.assert_allclose(
            got.reshape(expect.shape), expect, rtol=1e-4, atol=1e-5
        )
        if fg_type == "bin":
            # The driver stores sign(x) via > 0 (dns_index.py:113):
            # the converted rotation must preserve every sign bit.
            assert ((got.reshape(expect.shape) > 0) == (expect > 0)).all()

    def test_coarse_student_outputs_match(self):
        from vsc2022_tpu.models.convert import dns_student_from_torch
        from vsc2022_tpu.models.dns import DnSStudent

        torch.manual_seed(4)
        rng = np.random.RandomState(4)
        ref_model = TorchCoarseStudent().eval()
        params = dns_student_from_torch(self._state(ref_model), "cg")
        student = DnSStudent("cg", params=params)

        regions = self._regions(rng, t=7)
        with torch.no_grad():
            expect = ref_model(torch.from_numpy(regions)).numpy()
        got = student.index_video(regions.reshape(regions.shape[0], -1))
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


class ScriptableFineStudent(tnn.Module):
    """TorchScript-able fg student exposing the reference artifact
    surface (index_video / get_network_name / student_type / fg_type)."""

    def __init__(self, fg_type: str = "att"):
        super().__init__()
        self.student_type = "fg"
        self.fg_type = fg_type
        self.reduction = tnn.Linear(3840, 512)
        self.attention = tnn.Module()
        self.attention.context_vector = tnn.Linear(512, 1, bias=False)
        self.use_bin = fg_type == "bin"
        if self.use_bin:
            self.binarization = tnn.Module()
            self.binarization.W = tnn.Parameter(torch.randn(512, 512))
        else:
            self.binarization = tnn.Module()
            self.binarization.W = tnn.Parameter(torch.eye(512))

    @torch.jit.export
    def get_network_name(self) -> str:
        return "fg_" + self.fg_type + "_student"

    @torch.jit.export
    def index_video(self, x: torch.Tensor) -> torch.Tensor:
        return self.forward(x)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = x.reshape(x.shape[0], 9, 3840)
        x = self.reduction(x)
        x = torch.nn.functional.normalize(x, dim=-1, eps=1e-12)
        u = torch.nn.functional.normalize(
            self.attention.context_vector.weight, dim=-1
        )
        x = x * ((x @ u.t() + 1.0) / 2.0)
        if self.use_bin:
            x = x @ self.binarization.W
        return x


class TestAdaptModelDnSEndToEnd:
    def test_torchscript_to_checkpoint_with_verify(self, tmp_path):
        import argparse

        from vsc2022_tpu.baseline import adapt_model
        from vsc2022_tpu.models.dns import DnSStudent
        from vsc2022_tpu.utils.checkpoint import load_variables

        torch.manual_seed(5)
        scripted = torch.jit.script(ScriptableFineStudent("att").eval())
        ts_path = str(tmp_path / "fg_att_student.torchscript")
        ckpt_path = str(tmp_path / "fg_att_student.npz")
        scripted.save(ts_path)

        adapt_model.main(argparse.Namespace(
            input_torchscript=ts_path,
            output_checkpoint=ckpt_path,
            model="dns_fg_att",
            strip_prefix="",
            verify=True,  # runs the numeric equivalence check
        ))

        # The written checkpoint round-trips into a working student.
        student = DnSStudent("fg", "att", params=load_variables(ckpt_path))
        rng = np.random.RandomState(6)
        regions = rng.randn(2, 9, 3840).astype(np.float32)
        regions /= np.linalg.norm(regions, axis=-1, keepdims=True)
        with torch.no_grad():
            expect = scripted.index_video(
                torch.from_numpy(regions.reshape(2, -1))
            ).numpy()
        got = student.index_video(regions.reshape(2, -1))
        np.testing.assert_allclose(
            got.reshape(expect.shape), expect, rtol=1e-4, atol=1e-5
        )


class TestAdaptModelSSCDEndToEnd:
    def test_torchscript_to_checkpoint_with_verify(self, tmp_path):
        import argparse

        import jax as _jax

        from vsc2022_tpu.baseline import adapt_model
        from vsc2022_tpu.models import SSCDModel
        from vsc2022_tpu.utils.checkpoint import load_variables

        torch.manual_seed(7)
        rng = np.random.RandomState(7)
        model = TorchSSCD().eval()
        randomize_bn_stats(model, rng)
        ts_path = str(tmp_path / "sscd.torchscript")
        ckpt_path = str(tmp_path / "sscd.npz")
        # trace (not script): the trunk's getattr loop is trace-friendly
        # and the real published artifacts are traced modules too.
        example = torch.zeros(1, 3, 64, 64)
        with torch.no_grad():
            torch.jit.trace(model, example).save(ts_path)

        # The CLI converts AND numerically verifies against the artifact.
        adapt_model.main(argparse.Namespace(
            input_torchscript=ts_path,
            output_checkpoint=ckpt_path,
            model="sscd",
            strip_prefix="",
            verify=True,
        ))

        # The written checkpoint reproduces torch outputs on fresh input.
        variables = load_variables(ckpt_path)
        x = rng.randn(2, 3, 96, 96).astype(np.float32)
        with torch.no_grad():
            expect = model(torch.from_numpy(x)).numpy()
        got = np.asarray(SSCDModel().apply(
            variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
        ))
        np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-3)
        del _jax


class TestDnSIndexTorchscriptDropIn:
    def test_index_cli_accepts_torchscript(self, tmp_path):
        """The reference's invocation style — dns_index.py pointed at a
        published student TorchScript — works directly: the student
        type comes from the module metadata and weights convert on the
        fly, producing outputs matching the torch module."""
        import argparse
        import os

        from vsc2022_tpu.baseline import dns_index
        from vsc2022_tpu.metrics import Dataset
        from vsc2022_tpu.storage import load_features, store_features
        from vsc2022_tpu.types import VideoFeature

        torch.manual_seed(7)
        scripted = torch.jit.script(ScriptableFineStudent("att").eval())
        ts_path = str(tmp_path / "fg_att_student.torchscript")
        scripted.save(ts_path)

        rng = np.random.RandomState(8)

        def vids(n):
            out = []
            for i in range(n):
                t = int(rng.randint(2, 5))
                f = rng.randn(t, 9, 3840).astype(np.float32)
                f /= np.linalg.norm(f, axis=-1, keepdims=True)
                out.append(VideoFeature(
                    video_id=i, timestamps=np.arange(t, dtype=np.float64),
                    feature=f.reshape(t, -1),
                ))
            return out

        queries, refs = vids(2), vids(3)
        q_path, r_path = str(tmp_path / "q.npz"), str(tmp_path / "r.npz")
        store_features(q_path, queries, Dataset.QUERIES)
        store_features(r_path, refs, Dataset.REFS)

        out_dir = str(tmp_path / "out")
        dns_index.main(argparse.Namespace(
            query_features=q_path, ref_features=r_path,
            score_norm_features=None, output_path=out_dir,
            student=None, fg_type="bin",  # must be overridden to "att"
            checkpoint_path=None, torchscript_path=ts_path,
            accelerator="cpu",
        ))

        got = load_features(
            os.path.join(out_dir, "queries_fg_att_student.npz"),
            Dataset.QUERIES,
        )
        assert len(got) == 2
        for vf, src in zip(got, queries):
            with torch.no_grad():
                expect = scripted.index_video(
                    torch.from_numpy(src.feature)
                ).numpy()
            # fg att outputs are stored fp16 (reference behavior).
            assert vf.feature.dtype == np.float16
            np.testing.assert_allclose(
                vf.feature.astype(np.float32).reshape(expect.shape),
                expect, rtol=1e-2, atol=2e-3,
            )


# ---- serialized-layout aliases + probe ---------------------------------


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(la) == len(lb)
    for path, leaf in la:
        np.testing.assert_array_equal(leaf, lb[path])


class TestLayoutAliases:
    """Real artifacts serialize under layout-variant names; ALIAS_RULES
    must map the known variants onto the canonical converter names
    (VERDICT round 2 item 7: tool the rename seam, don't just error)."""

    def _sscd_state(self):
        torch.manual_seed(1)
        model = TorchSSCD().eval()
        return {k: v.detach().numpy() for k, v in model.state_dict().items()}

    def test_trunk_and_embeddings_variant(self):
        from vsc2022_tpu.models.convert import sscd_from_torch

        state = self._sscd_state()
        want = sscd_from_torch(dict(state))
        renamed = {}
        for k, v in state.items():
            k = k.replace("backbone.", "trunk.", 1)
            k = k.replace("project.", "embeddings.1.", 1)
            renamed[k] = v
        _tree_equal(sscd_from_torch(renamed), want)

    def test_classy_vision_stem_variant(self):
        from vsc2022_tpu.models.convert import sscd_from_torch

        state = self._sscd_state()
        want = sscd_from_torch(dict(state))
        renamed = {
            k.replace("backbone.conv1.", "backbone.initial_block._module.0.")
            .replace("backbone.bn1.", "backbone.initial_block._module.1."): v
            for k, v in state.items()
        }
        _tree_equal(sscd_from_torch(renamed), want)

    def test_dns_typed_student_prefix(self):
        from vsc2022_tpu.models.convert import dns_student_from_torch

        torch.manual_seed(2)
        student = TorchCoarseStudent().eval()
        state = {
            k: v.detach().numpy() for k, v in student.state_dict().items()
        }
        want = dns_student_from_torch(dict(state), "cg")
        renamed = {f"cg_student.{k}": v for k, v in state.items()}
        _tree_equal(dns_student_from_torch(renamed, "cg"), want)

    def test_unknown_layout_still_diagnoses(self):
        from vsc2022_tpu.models.convert import (
            ConversionKeyError,
            sscd_from_torch,
        )

        state = {
            f"mystery.{k}": v for k, v in self._sscd_state().items()
        }
        with pytest.raises(ConversionKeyError, match="Closest serialized"):
            sscd_from_torch(state)


class TestProbe:
    def _args(self, model="sscd"):
        import argparse

        return argparse.Namespace(model=model)

    def test_probe_ok(self, capsys):
        from vsc2022_tpu.baseline.adapt_model import probe

        torch.manual_seed(3)
        model = TorchSSCD().eval()
        state = {
            k.replace("backbone.", "trunk.", 1): v.detach().numpy()
            for k, v in model.state_dict().items()
        }
        assert probe(self._args(), state) == 0
        out = capsys.readouterr().out
        assert "Alias rules (sscd) rename" in out
        assert "OK: all" in out

    def test_probe_reports_missing(self, capsys):
        from vsc2022_tpu.baseline.adapt_model import probe

        torch.manual_seed(4)
        model = TorchSSCD().eval()
        state = {
            k: v.detach().numpy() for k, v in model.state_dict().items()
        }
        del state["backbone.layer3.2.conv2.weight"]
        assert probe(self._args(), state) == 1
        out = capsys.readouterr().out
        assert "CONVERSION WOULD FAIL" in out
        assert "layer3.2.conv2.weight" in out

    def test_probe_dns_lists_shapes(self, capsys):
        from vsc2022_tpu.baseline.adapt_model import probe

        torch.manual_seed(5)
        student = TorchCoarseStudent().eval()
        state = {
            k: v.detach().numpy() for k, v in student.state_dict().items()
        }
        assert probe(self._args("dns_cg"), state) == 0
        assert "no init reference" in capsys.readouterr().out
