"""Training-step tests: loss semantics and the sharded train step on a
virtual multi-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from vsc2022_tpu.models.sscd import SSCDModel
from vsc2022_tpu.parallel.mesh import train_mesh
from vsc2022_tpu.train import (
    create_train_state,
    make_train_step,
    sscd_loss,
)

TINY = dict(stage_sizes=(1, 1, 1, 1), stage_features=(4, 8, 8, 16), dims=16)


def l2n(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


class TestLoss:
    def test_aligned_views_lower_loss(self):
        rng = np.random.RandomState(0)
        a = l2n(rng.randn(16, 8)).astype(np.float32)
        aligned = sscd_loss(jnp.asarray(a), jnp.asarray(a))
        shuffled = sscd_loss(
            jnp.asarray(a), jnp.asarray(np.roll(a, 1, axis=0))
        )
        assert float(aligned) < float(shuffled)

    def test_finite(self):
        rng = np.random.RandomState(1)
        a = l2n(rng.randn(8, 8)).astype(np.float32)
        b = l2n(rng.randn(8, 8)).astype(np.float32)
        assert np.isfinite(float(sscd_loss(jnp.asarray(a), jnp.asarray(b))))


class TestTrainStep:
    def make_batch(self, rng, b=8, hw=32):
        return {
            "view_a": jnp.asarray(
                rng.rand(b, hw, hw, 3).astype(np.float32)
            ),
            "view_b": jnp.asarray(
                rng.rand(b, hw, hw, 3).astype(np.float32)
            ),
        }

    def test_single_device_step(self):
        model = SSCDModel(**TINY)
        tx = optax.adamw(1e-3)
        state = create_train_state(
            jax.random.PRNGKey(0), model, tx, input_shape=(1, 32, 32, 3)
        )
        step = make_train_step(model, tx)
        rng = np.random.RandomState(0)
        batch = self.make_batch(rng)
        new_state, loss = step(state, batch)
        assert np.isfinite(float(loss))
        assert int(new_state.step) == 1
        # Params actually changed.
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        new_leaf = jax.tree_util.tree_leaves(new_state.params)[0]
        assert not np.allclose(np.asarray(leaf), np.asarray(new_leaf))

    def test_mesh_step_matches_single_device(self):
        assert len(jax.devices()) >= 8
        model = SSCDModel(**TINY)
        tx = optax.adamw(1e-3)
        state = create_train_state(
            jax.random.PRNGKey(0), model, tx, input_shape=(1, 32, 32, 3)
        )
        rng = np.random.RandomState(0)
        batch = self.make_batch(rng)

        single = make_train_step(model, tx)
        _, loss_single = single(state, batch)

        mesh = train_mesh(8)
        assert mesh.shape == {"data": 4, "model": 2}
        sharded = make_train_step(model, tx, mesh)
        new_state, loss_sharded = sharded(state, batch)
        np.testing.assert_allclose(
            float(loss_sharded), float(loss_single), rtol=1e-4
        )
        assert int(new_state.step) == 1


class TestAugment:
    def test_two_views_shapes_and_range(self):
        from vsc2022_tpu.train.augment import two_views

        rng = np.random.RandomState(0)
        frames = (rng.rand(4, 48, 64, 3) * 255).astype(np.uint8)
        a, b = two_views(jax.random.PRNGKey(0), jnp.asarray(frames), out_hw=32)
        assert a.shape == (4, 32, 32, 3)
        assert b.shape == (4, 32, 32, 3)
        # Views differ (random augmentation) and are finite.
        assert not np.allclose(np.asarray(a), np.asarray(b))
        assert np.isfinite(np.asarray(a)).all()

    def test_deterministic_given_key(self):
        from vsc2022_tpu.train.augment import two_views

        rng = np.random.RandomState(1)
        frames = (rng.rand(2, 40, 40, 3) * 255).astype(np.uint8)
        a1, b1 = two_views(jax.random.PRNGKey(7), jnp.asarray(frames), out_hw=24)
        a2, b2 = two_views(jax.random.PRNGKey(7), jnp.asarray(frames), out_hw=24)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


class TestDnSDistillation:
    """DnS student distillation: L1 to a teacher video-pair similarity
    (the Distill-and-Select training objective; the reference only
    ships the resulting artifacts)."""

    def make_batch(self, rng, b=6, t=4):
        from vsc2022_tpu.models.dns import L3_IMAC_DIM, NUM_REGIONS
        from vsc2022_tpu.train.dns_distill import _frame_chamfer

        def regions(n):
            x = rng.randn(n, t, NUM_REGIONS, L3_IMAC_DIM).astype(np.float32)
            return x / np.linalg.norm(x, axis=-1, keepdims=True)

        q, r = regions(b), regions(b)
        # Half the pairs are (noisy) copies → teacher sims carry signal.
        for i in range(0, b, 2):
            r[i] = q[i] + 0.05 * rng.randn(*q[i].shape).astype(np.float32)
            r[i] /= np.linalg.norm(r[i], axis=-1, keepdims=True)
        teacher = np.asarray(
            [float(_frame_chamfer(jnp.asarray(q[i]), jnp.asarray(r[i])))
             for i in range(b)],
            dtype=np.float32,
        )
        return {
            "q_regions": jnp.asarray(q),
            "r_regions": jnp.asarray(r),
            "teacher_sim": jnp.asarray(teacher),
        }

    @pytest.mark.parametrize("student_type,fg_type,qw", [
        ("fg", "att", 0.0),
        ("fg", "bin", 0.1),
        ("cg", "", 0.0),
    ])
    def test_loss_decreases(self, student_type, fg_type, qw):
        import optax

        from vsc2022_tpu.train.dns_distill import (
            build_student_module,
            create_distill_state,
            make_distill_step,
        )

        rng = np.random.RandomState(8)
        module = build_student_module(student_type, fg_type or "att")
        tx = optax.adam(3e-3)
        state = create_distill_state(jax.random.PRNGKey(0), module, tx)
        step = make_distill_step(
            module, tx, student_type, quantization_weight=qw
        )
        batch = self.make_batch(rng)
        losses = []
        for _ in range(12):
            state, loss = step(state, batch)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        # Random init can land coincidentally low before the first adam
        # step kicks; require convergence from the post-step-1 level.
        assert losses[-1] < max(losses[:2]) * 0.75, losses

    def test_mesh_sharded_step_runs(self):
        import optax

        from vsc2022_tpu.parallel.mesh import corpus_mesh
        from vsc2022_tpu.train.dns_distill import (
            build_student_module,
            create_distill_state,
            make_distill_step,
        )

        rng = np.random.RandomState(9)
        module = build_student_module("fg", "att")
        tx = optax.adam(1e-3)
        state = create_distill_state(jax.random.PRNGKey(1), module, tx)
        step = make_distill_step(module, tx, "fg", mesh=corpus_mesh(8))
        batch = self.make_batch(rng, b=8)
        state, loss = step(state, batch)
        assert np.isfinite(float(loss))
        assert int(state.step) == 1


def test_distill_cli_checkpoint_feeds_dns_student(tmp_path):
    """train --objective dns_distill → npz checkpoint → DnSStudent:
    the trained artifact slots straight into the dns_index pipeline."""
    from vsc2022_tpu.models.dns import DnSStudent
    from vsc2022_tpu.train import cli
    from vsc2022_tpu.utils.checkpoint import load_variables

    out = str(tmp_path / "fg_att_student.npz")
    args = cli.parser.parse_args([
        "--objective", "dns_distill", "--student", "fg", "--fg_type", "att",
        "--synthetic", "8", "--steps", "2", "--batch_size", "4",
        "--checkpoint_out", out,
    ])
    cli.main(args)

    student = DnSStudent("fg", "att", params=load_variables(out))
    rng = np.random.RandomState(13)
    regions = rng.randn(3, 9 * 3840).astype(np.float32)
    encoded = student.index_video(regions)
    assert encoded.shape == (3, 9 * 512)
    assert np.isfinite(encoded).all()
