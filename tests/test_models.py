"""Model-layer tests: output shapes, conversion numerics against torch
primitives, and transform semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vsc2022_tpu.inference.transforms import (
    InferenceTransforms,
    output_dims,
    preprocess,
)
from vsc2022_tpu.models import DinoViT, SSCDModel
from vsc2022_tpu.models.dns import (
    DnSStudent,
    L3iMACExtractor,
    chamfer_similarity,
)
from vsc2022_tpu.models.resnet import ResNet50, gem_pool


class TestResNet50:
    def test_output_shapes(self):
        model = ResNet50(return_intermediates=True)
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        out, stages = model.apply(variables, x)
        assert out.shape == (1, 2, 2, 2048)
        assert [s.shape[-1] for s in stages] == [256, 512, 1024, 2048]
        assert [s.shape[1] for s in stages] == [16, 8, 4, 2]

    def test_gem_pool_limits(self):
        x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 4, 8) + 0.1)
        # p=1 is mean pooling; p→large approaches max pooling.
        np.testing.assert_allclose(
            gem_pool(x, p=1.0), jnp.mean(x, axis=(1, 2)), rtol=1e-5
        )
        np.testing.assert_allclose(
            gem_pool(x, p=64.0), jnp.max(x, axis=(1, 2)), rtol=0.05
        )


class TestSSCDModel:
    def test_descriptor_shape(self):
        model = SSCDModel()
        x = jnp.zeros((2, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (2, 512)

    def test_l2_normalize_flag(self):
        x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32)
        raw = SSCDModel(l2_normalize=False)
        variables = raw.init(jax.random.PRNGKey(0), x)
        normed = SSCDModel(l2_normalize=True).apply(variables, x)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(normed), axis=1), 1.0, rtol=1e-5
        )
        # Raw output followed by L2 norm equals the normalized model
        # (the reference's model-surgery equivalence;
        # adapt_sscd_model.py:70-72).
        out = np.asarray(raw.apply(variables, x))
        np.testing.assert_allclose(
            out / np.linalg.norm(out, axis=1, keepdims=True),
            np.asarray(normed),
            rtol=1e-5,
        )


class TestFoldBN:
    """BN folding (models/fold.py): the folded model + folded params
    must reproduce the unfolded forward to float32 roundoff."""

    @staticmethod
    def _randomize_bn(variables, seed=0):
        """Non-trivial running stats + BN affines, so folding isn't a
        no-op (init leaves mean=0/var=1/scale=1/bias=0)."""
        rng = np.random.RandomState(seed)

        def jitter(tree, low, high):
            return jax.tree.map(
                lambda a: jnp.asarray(
                    rng.uniform(low, high, np.shape(a)).astype(np.float32)
                ),
                tree,
            )

        def jitter_bn_affines(params):
            out = {}
            for name, sub in params.items():
                if not isinstance(sub, dict):
                    out[name] = sub
                elif name.startswith("bn") or name == "downsample_bn":
                    out[name] = {
                        "scale": jitter(sub["scale"], 0.5, 1.5),
                        "bias": jitter(sub["bias"], -0.3, 0.3),
                    }
                else:
                    out[name] = jitter_bn_affines(sub)
            return out

        variables = dict(variables)
        # Stats: mean in [-0.5, 0.5], var in [0.25, 0.75].
        stats = jitter(variables["batch_stats"], -0.5, 0.5)
        variables["batch_stats"] = jax.tree.map(
            lambda a: jnp.abs(a) + 0.25, stats
        )
        variables["params"] = jitter_bn_affines(variables["params"])
        return variables

    def test_sscd_fold_equivalence(self):
        from vsc2022_tpu.models.fold import fold_batchnorm

        x = jnp.asarray(
            np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32
        )
        model = SSCDModel(stage_sizes=(1, 1, 1, 1),
                          stage_features=(8, 8, 16, 16))
        variables = model.init(jax.random.PRNGKey(0), x)
        variables = self._randomize_bn(variables)
        expect = np.asarray(model.apply(variables, x))

        folded_model = SSCDModel(stage_sizes=(1, 1, 1, 1),
                                 stage_features=(8, 8, 16, 16), fold_bn=True)
        folded = fold_batchnorm(variables)
        assert "batch_stats" not in folded
        got = np.asarray(folded_model.apply(folded, x))
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)

        # The folded tree matches folded-init structure exactly.
        init_folded = folded_model.init(jax.random.PRNGKey(0), x)
        shapes = lambda t: {  # noqa: E731
            jax.tree_util.keystr(p): np.shape(v)
            for p, v in jax.tree_util.tree_leaves_with_path(t)
        }
        assert shapes(folded) == shapes(init_folded)

    def test_l3imac_fold_equivalence(self):
        from vsc2022_tpu.models.fold import fold_batchnorm

        x = jnp.asarray(
            np.random.RandomState(1).randn(1, 64, 64, 3), jnp.float32
        )
        model = L3iMACExtractor()
        variables = model.init(jax.random.PRNGKey(0), x)
        variables = self._randomize_bn(variables, seed=1)
        expect = np.asarray(model.apply(variables, x))
        got = np.asarray(
            L3iMACExtractor(fold_bn=True).apply(fold_batchnorm(variables), x)
        )
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)

    def test_unpaired_bn_raises(self):
        from vsc2022_tpu.models.fold import fold_batchnorm

        variables = {
            "params": {
                "bn_orphan": {"scale": np.ones(4), "bias": np.zeros(4)},
            },
            "batch_stats": {
                "bn_orphan": {"mean": np.zeros(4), "var": np.ones(4)},
            },
        }
        with pytest.raises(ValueError, match="bn_orphan"):
            fold_batchnorm(variables)


class TestDinoViT:
    def test_descriptor_shape(self):
        model = DinoViT()
        x = jnp.zeros((2, 224, 224, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (2, 768)

    def test_variable_resolution(self):
        model = DinoViT()
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
        out = model.apply(variables, jnp.zeros((1, 112, 112, 3)))
        assert out.shape == (1, 768)


class TestDnS:
    def test_extractor_shape(self):
        model = L3iMACExtractor()
        x = jnp.asarray(
            np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32
        )
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (2, 9, 3840)
        norms = np.linalg.norm(np.asarray(out), axis=-1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-5)

    def test_students_interface(self):
        rng = np.random.RandomState(0)
        feats = rng.randn(6, 9 * 3840).astype(np.float32)

        cg = DnSStudent("cg")
        assert cg.student_type == "cg"
        assert cg.get_network_name() == "cg_student"
        out = cg.index_video(feats)
        assert out.shape == (6, 1024)

        fg = DnSStudent("fg", "att")
        assert fg.get_network_name() == "fg_att_student"
        out = fg.index_video(feats)
        assert out.shape == (6, 9 * 512)

        fg_bin = DnSStudent("fg", "bin")
        assert fg_bin.get_network_name() == "fg_bin_student"
        out_bin = fg_bin.index_video(feats) > 0  # driver binarization
        assert out_bin.dtype == bool

    def test_chamfer_similarity(self):
        rng = np.random.RandomState(1)
        q = rng.randn(4, 9, 16).astype(np.float32)
        r = rng.randn(5, 9, 16).astype(np.float32)
        sim = np.asarray(chamfer_similarity(jnp.asarray(q), jnp.asarray(r)))
        assert sim.shape == (4, 5)
        # Oracle: mean over query regions of max over ref regions.
        expect = np.einsum("qad,rbd->qrab", q, r).max(axis=3).mean(axis=2)
        np.testing.assert_allclose(sim, expect, rtol=1e-4, atol=1e-4)
        # Self-similarity of identical frames is the max.
        sim_self = np.asarray(
            chamfer_similarity(jnp.asarray(q), jnp.asarray(q))
        )
        assert (np.argmax(sim_self, axis=1) == np.arange(4)).all()


class TestConversion:
    def test_conv_bn_linear_numerics(self):
        """Validate layout conversions against torch's own ops."""
        torch = pytest.importorskip("torch")
        import torch.nn as tnn

        from vsc2022_tpu.models.convert import _bn, _conv, _linear
        import flax.linen as fnn

        torch.manual_seed(0)
        conv = tnn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False).eval()
        bn = tnn.BatchNorm2d(8).eval()
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 1.5)
        lin = tnn.Linear(8, 4).eval()

        x = torch.randn(2, 3, 16, 16)
        with torch.no_grad():
            y = bn(conv(x)).mean(dim=(2, 3))
            expect = lin(y).numpy()

        state = {
            f"bn.{k}": v.detach().numpy() for k, v in bn.state_dict().items()
        }
        bn_params, bn_stats = _bn(state, "bn")

        xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
        conv_flax = fnn.Conv(8, (3, 3), strides=(2, 2),
                             padding=((1, 1), (1, 1)), use_bias=False)
        yj = conv_flax.apply(
            {"params": {"kernel": _conv(conv.weight.detach().numpy())}}, xj
        )
        bn_flax = fnn.BatchNorm(use_running_average=True, epsilon=1e-5)
        yj = bn_flax.apply(
            {"params": bn_params, "batch_stats": bn_stats}, yj
        )
        yj = jnp.mean(yj, axis=(1, 2))
        dense = fnn.Dense(4)
        got = dense.apply(
            {
                "params": {
                    "kernel": _linear(lin.weight.detach().numpy()),
                    "bias": lin.bias.detach().numpy(),
                }
            },
            yj,
        )
        np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4, atol=1e-4)

    def test_sscd_tree_structure(self):
        """Synthetic torch-style state dict converts to a tree matching
        SSCDModel.init exactly (keys and shapes)."""
        from vsc2022_tpu.models.convert import sscd_from_torch

        rng = np.random.RandomState(0)

        state = {}

        def add_conv(name, cin, cout, k):
            state[f"{name}.weight"] = rng.randn(cout, cin, k, k).astype(
                np.float32
            )

        def add_bn(name, c):
            for suffix in ("weight", "bias", "running_mean", "running_var"):
                state[f"{name}.{suffix}"] = rng.rand(c).astype(np.float32)
            state[f"{name}.num_batches_tracked"] = np.zeros((), np.int64)

        add_conv("backbone.conv1", 3, 64, 7)
        add_bn("backbone.bn1", 64)
        specs = [(3, 64, 256, 64), (4, 128, 512, 256), (6, 256, 1024, 512),
                 (3, 512, 2048, 1024)]
        for stage, (blocks, mid, out, cin) in enumerate(specs, start=1):
            for blk in range(blocks):
                t = f"backbone.layer{stage}.{blk}"
                c_in = cin if blk == 0 else out
                add_conv(f"{t}.conv1", c_in, mid, 1)
                add_bn(f"{t}.bn1", mid)
                add_conv(f"{t}.conv2", mid, mid, 3)
                add_bn(f"{t}.bn2", mid)
                add_conv(f"{t}.conv3", mid, out, 1)
                add_bn(f"{t}.bn3", out)
                if blk == 0:
                    add_conv(f"{t}.downsample.0", c_in, out, 1)
                    add_bn(f"{t}.downsample.1", out)
        state["project.weight"] = rng.randn(512, 2048).astype(np.float32)
        state["project.bias"] = rng.randn(512).astype(np.float32)

        converted = sscd_from_torch(state)

        model = SSCDModel()
        expect = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        flat_c = jax.tree_util.tree_leaves_with_path(converted)
        flat_e = jax.tree_util.tree_leaves_with_path(expect)
        paths_c = {jax.tree_util.keystr(p): v.shape for p, v in flat_c}
        paths_e = {jax.tree_util.keystr(p): v.shape for p, v in flat_e}
        assert paths_c == paths_e
        # And the converted tree actually runs.
        out = model.apply(converted, jnp.zeros((1, 64, 64, 3)))
        assert out.shape == (1, 512)

    def test_dino_tree_structure(self):
        from vsc2022_tpu.models.convert import dino_vit_from_torch

        rng = np.random.RandomState(0)
        dim, heads, depth = 384, 6, 12
        state = {
            "patch_embed.proj.weight": rng.randn(dim, 3, 16, 16).astype(
                np.float32
            ),
            "patch_embed.proj.bias": rng.randn(dim).astype(np.float32),
            "cls_token": rng.randn(1, 1, dim).astype(np.float32),
            "pos_embed": rng.randn(1, 197, dim).astype(np.float32),
            "norm.weight": rng.randn(dim).astype(np.float32),
            "norm.bias": rng.randn(dim).astype(np.float32),
        }
        for i in range(depth):
            t = f"blocks.{i}"
            state[f"{t}.norm1.weight"] = rng.randn(dim).astype(np.float32)
            state[f"{t}.norm1.bias"] = rng.randn(dim).astype(np.float32)
            state[f"{t}.attn.qkv.weight"] = rng.randn(3 * dim, dim).astype(
                np.float32
            )
            state[f"{t}.attn.qkv.bias"] = rng.randn(3 * dim).astype(np.float32)
            state[f"{t}.attn.proj.weight"] = rng.randn(dim, dim).astype(
                np.float32
            )
            state[f"{t}.attn.proj.bias"] = rng.randn(dim).astype(np.float32)
            state[f"{t}.norm2.weight"] = rng.randn(dim).astype(np.float32)
            state[f"{t}.norm2.bias"] = rng.randn(dim).astype(np.float32)
            state[f"{t}.mlp.fc1.weight"] = rng.randn(4 * dim, dim).astype(
                np.float32
            )
            state[f"{t}.mlp.fc1.bias"] = rng.randn(4 * dim).astype(np.float32)
            state[f"{t}.mlp.fc2.weight"] = rng.randn(dim, 4 * dim).astype(
                np.float32
            )
            state[f"{t}.mlp.fc2.bias"] = rng.randn(dim).astype(np.float32)

        converted = dino_vit_from_torch(state)
        model = DinoViT()
        expect = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
        flat_c = {
            jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_leaves_with_path(converted)
        }
        flat_e = {
            jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_leaves_with_path(expect)
        }
        assert flat_c == flat_e
        out = model.apply(converted, jnp.zeros((1, 224, 224, 3)))
        assert out.shape == (1, 768)


class TestTransforms:
    def test_output_dims(self):
        T = InferenceTransforms
        assert output_dims(T.RESIZE_224_SQUARE, 480, 640) == (224, 224)
        assert output_dims(T.RESIZE_320_CENTER, 480, 640) == (320, 320)
        assert output_dims(T.RESIZE_288, 480, 640) == (288, 384)
        assert output_dims(T.RESIZE_288, 640, 480) == (384, 288)

    def test_preprocess_normalization(self):
        # A mid-gray image maps to (0.5 - mean) / std exactly.
        frames = np.full((2, 224, 224, 3), 127.5, dtype=np.float32).astype(
            np.uint8
        )
        frames = np.full((2, 224, 224, 3), 128, dtype=np.uint8)
        out = np.asarray(
            preprocess(jnp.asarray(frames), InferenceTransforms.RESIZE_224_SQUARE)
        )
        expect = (128 / 255.0 - np.array([0.485, 0.456, 0.406])) / np.array(
            [0.229, 0.224, 0.225]
        )
        np.testing.assert_allclose(out[0, 0, 0], expect, rtol=1e-5)

    def test_preprocess_center_crop(self):
        # 640×480 → resize short side 320 → (320, 427) → crop center 320.
        frames = np.zeros((1, 480, 640, 3), dtype=np.uint8)
        out = preprocess(jnp.asarray(frames), InferenceTransforms.RESIZE_320_CENTER)
        assert out.shape == (1, 320, 320, 3)


class TestConversionDiagnostics:
    """The conversion seam's failure mode with real artifacts is key-name
    drift — the errors must diagnose it, not just KeyError."""

    def test_missing_key_suggests_near_misses(self):
        from vsc2022_tpu.models.convert import (
            ConversionKeyError,
            dns_student_from_torch,
        )

        state = {
            "reduction_layer.weight": np.zeros((512, 3840), np.float32),
            "reduction_layer.bias": np.zeros((512,), np.float32),
        }
        with pytest.raises(ConversionKeyError, match="reduction_layer.weight"):
            dns_student_from_torch(state, "fg")

    def test_uniform_wrapper_prefixes_stripped(self):
        from vsc2022_tpu.models.convert import normalize_state_keys

        state = {
            "module.student.reduction.weight": 1,
            "module.student.attention.context_vector.weight": 2,
        }
        out = normalize_state_keys(state)
        assert set(out) == {
            "reduction.weight", "attention.context_vector.weight",
        }

    def test_architecture_prefixes_untouched(self):
        from vsc2022_tpu.models.convert import normalize_state_keys

        # 'backbone.' is not a wrapper prefix and 'project.*' breaks
        # uniformity anyway — nothing may be stripped.
        state = {"backbone.conv1.weight": 1, "project.weight": 2}
        assert normalize_state_keys(dict(state)) == state


class TestS2DStem:
    """The space-to-depth stem (models/fold.py s2d_stem +
    ``stem_s2d=True``) is an exact reparameterization of the 7×7/2
    stem: outputs match to f32 reassociation roundoff, at both the
    production transforms' spatial sizes and a non-multiple-of-4 size,
    and it composes with BN folding."""

    def _model(self, **kw):
        from vsc2022_tpu.models import SSCDModel

        return SSCDModel(
            stage_sizes=(1, 1, 1, 1), stage_features=(8, 8, 16, 16), **kw
        )

    @pytest.mark.parametrize("hw", [64, 70])
    def test_equivalence(self, hw):
        from vsc2022_tpu.models.fold import s2d_stem

        x = jnp.asarray(
            np.random.RandomState(1).randn(2, hw, hw, 3), jnp.float32
        )
        model = self._model()
        variables = model.init(jax.random.PRNGKey(0), x)
        expect = np.asarray(model.apply(variables, x))

        s2d_model = self._model(stem_s2d=True)
        transformed = s2d_stem(variables)
        got = np.asarray(s2d_model.apply(transformed, x))
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)

        # Transformed tree matches s2d-init structure exactly.
        init_s2d = s2d_model.init(jax.random.PRNGKey(0), x)
        shapes = lambda t: {  # noqa: E731
            jax.tree_util.keystr(p): np.shape(v)
            for p, v in jax.tree_util.tree_leaves_with_path(t)
        }
        assert shapes(transformed) == shapes(init_s2d)

    def test_composes_with_fold_bn(self):
        from vsc2022_tpu.models.fold import fold_batchnorm, s2d_stem

        x = jnp.asarray(
            np.random.RandomState(2).randn(2, 64, 64, 3), jnp.float32
        )
        model = self._model()
        variables = model.init(jax.random.PRNGKey(0), x)
        expect = np.asarray(model.apply(variables, x))
        both_model = self._model(fold_bn=True, stem_s2d=True)
        both = s2d_stem(fold_batchnorm(variables))
        got = np.asarray(both_model.apply(both, x))
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)
