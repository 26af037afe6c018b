"""DnS student distillation, sharded over a device mesh.

The reference consumes pretrained DnS students as TorchScript artifacts
(reference: vsc/baseline/dns_index.py:100-116); the Distill-and-Select
method that produced them trains students to reproduce a fine-grained
teacher's video-pair similarity (DnS paper §3.2: L1 between student and
teacher similarities, plus a quantization regularizer for the
binarization student). This module provides that training loop
TPU-natively so students can be (re)trained or fine-tuned:

  * Batches carry region-feature pairs and a precomputed teacher
    similarity target — the teacher is a data-pipeline concern (run any
    fine-grained model once over the pair corpus), keeping the train
    step model-agnostic.
  * Student video similarity: fine-grained students score a pair by
    frame-chamfer (mean over query frames of the max over ref frames of
    region-chamfer similarity); the coarse student by the dot product
    of attention-pooled frame descriptors, mean-pooled over frames.
  * Sharding: batch axis → mesh axis "data" (DP); parameters
    replicated; XLA inserts the gradient psums.

Losses: L1 similarity distillation; fg_bin adds the ITQ-style
quantization penalty pulling pre-binarization codes toward ±1.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vsc2022_tpu.models.dns import (
    L3_IMAC_DIM,
    NUM_REGIONS,
    CoarseStudentModule,
    FineGrainedStudentModule,
)


class DistillState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def build_student_module(student_type: str, fg_type: str = "att"):
    if student_type == "cg":
        return CoarseStudentModule()
    assert student_type == "fg", student_type
    return FineGrainedStudentModule(fg_type=fg_type)


def create_distill_state(
    rng: jax.Array,
    module,
    tx: optax.GradientTransformation,
) -> DistillState:
    probe = jnp.zeros((1, NUM_REGIONS, L3_IMAC_DIM), jnp.float32)
    params = module.init(rng, probe)
    return DistillState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )


def _frame_chamfer(q_regions, r_regions):
    """[Tq, R, D] × [Tr, R, D] → scalar video similarity: mean over
    query frames of max over ref frames of region-chamfer similarity
    (the ViSiL video-level aggregation the DnS teacher uses)."""
    sims = jnp.einsum(
        "qad,rbd->qrab", q_regions, r_regions,
        preferred_element_type=jnp.float32,
    )
    frame_sim = jnp.mean(jnp.max(sims, axis=-1), axis=-1)  # [Tq, Tr]
    return jnp.mean(jnp.max(frame_sim, axis=-1))


def _encode_batch(module, params, regions):
    """[B, T, R, 3840] → student encodings [B, T, ...]."""
    return jax.vmap(lambda x: module.apply(params, x))(regions)


def _encoded_pair_similarity(enc_q, enc_r, student_type: str):
    """[B] video-pair similarities from student encodings."""

    def one_pair(eq, er):
        if student_type == "cg":
            pq = jnp.mean(eq, axis=0)  # [1024]
            pr = jnp.mean(er, axis=0)
            pq = pq / jnp.clip(jnp.linalg.norm(pq), 1e-12)
            pr = pr / jnp.clip(jnp.linalg.norm(pr), 1e-12)
            return jnp.dot(pq, pr)
        return _frame_chamfer(eq, er)  # [T, R, 512] each

    return jax.vmap(one_pair)(enc_q, enc_r)


def student_pair_similarity(
    module, params, q_regions, r_regions, student_type: str
):
    """Batched video-pair similarity under the student.

    q_regions/r_regions: [B, T, R, 3840] (fixed T per batch).
    Returns [B] similarities in the student's embedding space.
    """
    enc_q = _encode_batch(module, params, q_regions)
    enc_r = _encode_batch(module, params, r_regions)
    return _encoded_pair_similarity(enc_q, enc_r, student_type)


def make_distill_step(
    module,
    tx: optax.GradientTransformation,
    student_type: str,
    quantization_weight: float = 0.0,
    mesh: Optional[Mesh] = None,
):
    """Build the jitted distillation step.

    batch = {"q_regions" [B,T,R,3840], "r_regions" [B,T',R,3840],
    "teacher_sim" [B]}. ``quantization_weight`` > 0 adds the ITQ-style
    ±1 pull on fg_bin codes (DnS paper's binarization regularizer).
    """

    def loss_fn(params, batch):
        # Encode each side once; similarity and the quantization term
        # share the encodings.
        enc_q = _encode_batch(module, params, batch["q_regions"])
        enc_r = _encode_batch(module, params, batch["r_regions"])
        sims = _encoded_pair_similarity(enc_q, enc_r, student_type)
        loss = jnp.mean(jnp.abs(sims - batch["teacher_sim"]))
        if quantization_weight > 0.0:
            quant = 0.5 * (
                jnp.mean(jnp.abs(jnp.abs(enc_q) - 1.0))
                + jnp.mean(jnp.abs(jnp.abs(enc_r) - 1.0))
            )
            loss = loss + quantization_weight * quant
        return loss

    def step_fn(state: DistillState, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            DistillState(
                params=new_params, opt_state=new_opt, step=state.step + 1
            ),
            loss,
        )

    if mesh is None:
        return jax.jit(step_fn)

    axis = mesh.axis_names[0]
    replicated = NamedSharding(mesh, P())
    batch_sharding = {
        "q_regions": NamedSharding(mesh, P(axis)),
        "r_regions": NamedSharding(mesh, P(axis)),
        "teacher_sim": NamedSharding(mesh, P(axis)),
    }

    def jitted(state, batch):
        state_shardings = jax.tree.map(lambda _: replicated, state)
        fn = jax.jit(
            step_fn,
            in_shardings=(state_shardings, batch_sharding),
            out_shardings=(state_shardings, replicated),
        )
        return fn(state, batch)

    return jitted
