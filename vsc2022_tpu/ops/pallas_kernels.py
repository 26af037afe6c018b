"""Pallas TPU kernels for the retrieval hot path.

These fuse the similarity matmul with its reduction so the [M, N] score
matrix never exists in HBM — the MXU computes each tile into VMEM and
the VPU reduces it in place:

  * ``fused_row_max``   — max_j q·rᵀ per row (score-normalization's
    k=1 noise-NN; reference: vsc/baseline/score_normalization.py:96).
    HBM traffic drops from O(M·N) score writes+reads to O(M+N·D).
  * ``fused_count_above`` — exact per-row count of scores ≥ τ (the
    count-verify pass that makes approximate candidate collection
    exact; see ops/similarity.py global_topk).

Grid layout: (row tiles, col tiles) with the column dimension iterating
fastest; a VMEM scratch accumulator carries the running reduction
across column tiles and the result is written on the last one. Operand
tiles stream HBM→VMEM via the standard pallas pipeline (double-buffered
by the Mosaic compiler).

On non-TPU backends the kernels run in interpreter mode (tests).

Routing: the searcher uses these only when VSC2022_TPU_USE_PALLAS=1.
They are validated correct on TPU hardware, but remote-compile relay
environments (PALLAS_AXON_REMOTE_COMPILE) re-lower the custom call per
invocation, which makes them pathologically slow there — on directly
attached TPU hosts they remove the O(M·N) HBM score traffic entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")

ROW_TILE = 512
COL_TILE = 1024


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _row_max_kernel(q_ref, r_ref, n_valid_ref, out_ref, acc_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.full_like(acc_ref, NEG_INF)

    s = jnp.dot(q_ref[:], r_ref[:].T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    col_ids = j * COL_TILE + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col_ids < n_valid_ref[0], s, NEG_INF)
    acc_ref[:] = jnp.maximum(acc_ref[:], jnp.max(s, axis=1, keepdims=True))

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_row_max(
    q: jax.Array,  # [M, D] f32, M % ROW_TILE == 0
    refs: jax.Array,  # [N, D] f32, N % COL_TILE == 0 (padding rows
    #                   excluded by n_valid)
    n_valid: jax.Array,  # scalar int32: number of real ref rows
    interpret: bool = False,
) -> jax.Array:  # [M] f32
    m, d = q.shape
    n = refs.shape[0]
    grid = (m // ROW_TILE, n // COL_TILE)
    out = pl.pallas_call(
        _row_max_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_TILE, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((COL_TILE, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ROW_TILE, 1), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * d,
            bytes_accessed=(m * d + n * d + m) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, refs, jnp.reshape(n_valid, (1,)).astype(jnp.int32))
    return out[:, 0]


def _count_above_kernel(tau_ref, q_ref, r_ref, n_valid_ref, out_ref, acc_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s = jnp.dot(q_ref[:], r_ref[:].T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    col_ids = j * COL_TILE + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, 1
    )
    above = (s >= tau_ref[0]) & (col_ids < n_valid_ref[0])
    acc_ref[:] = acc_ref[:] + jnp.sum(
        above.astype(jnp.int32), axis=1, keepdims=True
    )

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_count_above(
    q: jax.Array,  # [M, D] f32, M % ROW_TILE == 0
    refs: jax.Array,  # [N, D] f32, N % COL_TILE == 0
    tau: jax.Array,  # scalar f32
    n_valid: jax.Array,  # scalar int32 (#real ref rows; padding excluded)
    interpret: bool = False,
) -> jax.Array:  # [M] int32
    m, d = q.shape
    n = refs.shape[0]
    grid = (m // ROW_TILE, n // COL_TILE)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ROW_TILE, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((COL_TILE, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((ROW_TILE, 1), jnp.int32)],
    )
    out = pl.pallas_call(
        _count_above_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, 1), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * d,
            bytes_accessed=(m * d + n * d + m) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        jnp.reshape(tau, (1,)).astype(jnp.float32),
        q,
        refs,
        jnp.reshape(n_valid, (1,)).astype(jnp.int32),
    )
    return out[:, 0]
