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


def student_pair_similarity(
    module, params, q_regions, r_regions, student_type: str
):
    """Batched video-pair similarity under the student.

    q_regions/r_regions: [B, T, R, 3840] (fixed T per batch).
    Returns [B] similarities in the student's embedding space.
    """

    def one_pair(q, r):
        if student_type == "cg":
            dq = module.apply(params, q)  # [T, 1024]
            dr = module.apply(params, r)
            pq = jnp.mean(dq, axis=0)
            pr = jnp.mean(dr, axis=0)
            pq = pq / jnp.clip(jnp.linalg.norm(pq), 1e-12)
            pr = pr / jnp.clip(jnp.linalg.norm(pr), 1e-12)
            return jnp.dot(pq, pr)
        eq = module.apply(params, q)  # [T, R, 512]
        er = module.apply(params, r)
        return _frame_chamfer(eq, er)

    return jax.vmap(one_pair)(q_regions, r_regions)


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
        sims = student_pair_similarity(
            module, params, batch["q_regions"], batch["r_regions"],
            student_type,
        )
        distill = jnp.mean(jnp.abs(sims - batch["teacher_sim"]))
        loss = distill
        if quantization_weight > 0.0:
            codes = jax.vmap(lambda q: module.apply(params, q))(
                batch["q_regions"]
            )
            loss = loss + quantization_weight * jnp.mean(
                jnp.abs(jnp.abs(codes) - 1.0)
            )
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
