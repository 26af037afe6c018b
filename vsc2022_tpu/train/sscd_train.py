"""SSCD-style contrastive training step, sharded over a device mesh.

The reference ships no training code — its models are pretrained
TorchScript artifacts (SURVEY.md §1 "no training code"). A production
framework needs to (re)train and fine-tune its descriptor models, so
this module provides the SSCD training objective (InfoNCE over two
augmented views with cross-replica negatives + a KoLeo entropy
regularizer, per the SSCD paper) as a single pjit-style train step.

Sharding design (idiomatic GSPMD — annotate, let XLA insert
collectives):
  * batch axis → mesh axis "data" (DP): each device computes its
    slice's descriptors; the InfoNCE similarity matrix over the global
    batch makes XLA all-gather descriptors over ICI.
  * projection head output dim → mesh axis "model" (TP): the 2048→512
    projection kernel is column-sharded; gradients reduce-scatter
    automatically.
  * everything else replicated.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vsc2022_tpu.models.sscd import SSCDModel


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def create_train_state(
    rng: jax.Array,
    model: SSCDModel,
    tx: optax.GradientTransformation,
    input_shape=(1, 64, 64, 3),
) -> TrainState:
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def sscd_loss(
    desc_a: jnp.ndarray,  # [B, D] L2-normalized descriptors, view A
    desc_b: jnp.ndarray,  # [B, D] view B
    temperature: float = 0.05,
    entropy_weight: float = 30.0,
) -> jnp.ndarray:
    """InfoNCE between two views over the global batch + KoLeo entropy.

    Written on global (sharded) arrays: under pjit the cross-device
    similarity matrix lowers to all-gathers over ICI.
    """
    b = desc_a.shape[0]
    # Symmetric InfoNCE: A→B and B→A, negatives = all other samples.
    logits_ab = desc_a @ desc_b.T / temperature  # [B, B]
    logits_aa = desc_a @ desc_a.T / temperature
    # Mask self-similarity in the AA block.
    eye = jnp.eye(b, dtype=bool)
    logits_aa = jnp.where(eye, -jnp.inf, logits_aa)
    logits = jnp.concatenate([logits_ab, logits_aa], axis=1)  # [B, 2B]
    labels = jnp.arange(b)
    loss_a = optax.softmax_cross_entropy_with_integer_labels(logits, labels)

    logits_ba = desc_b @ desc_a.T / temperature
    logits_bb = jnp.where(eye, -jnp.inf, desc_b @ desc_b.T / temperature)
    logits2 = jnp.concatenate([logits_ba, logits_bb], axis=1)
    loss_b = optax.softmax_cross_entropy_with_integer_labels(logits2, labels)
    infonce = jnp.mean(loss_a + loss_b) / 2.0

    # KoLeo: -mean log distance to nearest other descriptor (spreads
    # the embedding over the sphere; SSCD's entropy regularizer).
    sim = desc_a @ desc_a.T
    sim = jnp.where(eye, -jnp.inf, sim)
    nn_dist_sq = jnp.clip(2.0 - 2.0 * jnp.max(sim, axis=1), 1e-6)
    koleo = -jnp.mean(0.5 * jnp.log(nn_dist_sq))

    return infonce + entropy_weight * 0.001 * koleo


def train_shardings(mesh: Mesh, state: TrainState):
    """Sharding tree: projection kernel TP-sharded, rest replicated."""

    def spec_for(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if "project" in keys and keys[-1] == "kernel":
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    def map_like(tree):
        return jax.tree_util.tree_map_with_path(spec_for, tree)

    return TrainState(
        params=map_like(state.params),
        batch_stats=map_like(state.batch_stats),
        opt_state=jax.tree_util.tree_map_with_path(spec_for, state.opt_state),
        step=NamedSharding(mesh, P()),
    )


def make_train_step(
    model: SSCDModel,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
):
    """Build the jitted train step; with a mesh, inputs/outputs carry
    explicit NamedShardings (batch → "data", projection → "model")."""

    def loss_fn(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        desc_a, updates = model.apply(
            variables, batch["view_a"], train=True, mutable=["batch_stats"]
        )
        desc_b, updates = model.apply(
            {"params": params, "batch_stats": updates["batch_stats"]},
            batch["view_b"],
            train=True,
            mutable=["batch_stats"],
        )

        def l2n(x):
            return x / jnp.clip(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12
            )

        loss = sscd_loss(l2n(desc_a), l2n(desc_b))
        return loss, updates["batch_stats"]

    def step_fn(state: TrainState, batch):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, loss

    if mesh is None:
        return jax.jit(step_fn)

    batch_sharding = {
        "view_a": NamedSharding(mesh, P("data", None, None, None)),
        "view_b": NamedSharding(mesh, P("data", None, None, None)),
    }

    def jitted(state, batch, _state_shardings=None):
        state_shardings = _state_shardings or train_shardings(mesh, state)
        fn = jax.jit(
            step_fn,
            in_shardings=(state_shardings, batch_sharding),
            out_shardings=(state_shardings, NamedSharding(mesh, P())),
        )
        return fn(state, batch)

    return jitted
