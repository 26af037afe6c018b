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
  * ``fused_topk``      — matmul + per-row top-κ candidate collection
    (the candidates phase of global_topk); best-2-per-128-lane-segment
    recall, exactness restored by the count-verify pass. Routed from
    ops/similarity.streaming_topk under the env flag.

Grid layout: (row tiles, col tiles) with the column dimension iterating
fastest; a VMEM scratch accumulator carries the running reduction
across column tiles and the result is written on the last one. Operand
tiles stream HBM→VMEM via the standard pallas pipeline (double-buffered
by the Mosaic compiler).

  * ``pool_writer``     — matmul + best-2-per-128-segment winner-pool
    writer, the round-3 collection kernel (OPT-IN; see
    ops/similarity.pooled_candidates for routing and the selection
    machinery that runs on its output).
  * ``pool_writer_band`` — banded rewrite of pool_writer: ``inner``
    column tiles per grid step (static slices of a wider VMEM r
    block) + static-offset band stores — no placement matmul, int32
    ids (no 2^24 ceiling), ``inner``× fewer grid steps (v1's measured
    1M loss to the XLA scan was attributed to 17k-step overhead).

On non-TPU backends the kernels run in interpreter mode (tests).

Routing: pool_writer is OPT-IN via VSC2022_TPU_POOL_PALLAS=1 on TPU,
the banded variant via =band (=interpret / =interpret_band test them
on CPU; unset/0 run the XLA carry-scan builder, which measured faster
than v1 at 1M — see below); the round-2 kernels remain
opt-in via VSC2022_TPU_USE_PALLAS=1 (or =interpret). History, kept for the record: fused_topk — matmul +
per-row top-κ with min-replacement folding — measured SLOWER than the
XLA collection at production shapes (395 vs 1507 ms at [9216×1M×512],
in-process) because it folds candidates one at a time. pool_writer is
the redesign that won: it does NO cross-tile selection at all, only
the per-segment best-2 reduction while the score tile is in VMEM, and
leaves selection to the pool-side machinery (bit-level k-th search +
narrow top-k), where the XLA formulations of the same reduction are
HBM-bandwidth-bound at ~3.5× the matmul floor.
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


POOL_ROW_TILE = 512
POOL_COL_TILE = 1024
POOL_TILES_PER_BAND = 8  # column tiles per 128-wide output band


def _pool_writer_kernel(
    q_ref, r_ref, n_valid_ref, out_v_ref, out_i_ref, *, precision,
    tiles_per_band,
):
    """Fused matmul + best-2-per-128-lane-segment pool writer.

    Unlike the round-2 fused_topk (whose per-candidate min-replacement
    folding made it 4× slower than XLA at corpus scale), this kernel
    does NO selection across tiles: it reduces each [RT, CT] score tile
    to its per-segment best-2 (values + global column ids) while the
    tile is still in VMEM and writes only that [RT, 2·CT/128] pool
    slice to HBM. The scores never touch HBM — the XLA formulations of
    the same reduction are bandwidth-bound at ~3.5× the matmul time
    ([9000×1M×512]: 282 ms vs the 82 ms matmul floor; the pool
    selection machinery lives in ops/similarity.pooled_candidates).

    Output layout: the TPU lowering wants a 128-divisible minor output
    dim but one tile's pool is only 16 wide, so 8 consecutive column
    tiles share one [RT, 128] output band (the band block stays VMEM-
    resident across those grid steps). Tile results land in their band
    slot via a [16, 128] identity-row placement matmul — Mosaic proves
    the identity's dynamic sublane slice 8-aligned, whereas a 16-lane
    offset store is rejected outright and an earlier [RT, 16].T
    formulation spent more time in sublane shuffles than in the
    matmul. −inf must not enter the placement product (−inf·0 = NaN),
    so a finite sentinel stands in and is restored on the band's last
    step."""
    j = pl.program_id(1)
    # Operands arrive pre-cast (bf16 for default precision — casting
    # inside the kernel re-ran per grid step, ~100 ms of pure cast
    # traffic at [9000x1M]); the dot accumulates f32 either way. Mosaic
    # rejects an fp32-precision attribute on bf16 operands, so bf16
    # inputs take the native single-pass matmul.
    if q_ref.dtype == jnp.bfloat16:
        s = jnp.dot(q_ref[:], r_ref[:].T,
                    preferred_element_type=jnp.float32)
    else:
        s = jnp.dot(q_ref[:], r_ref[:].T,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision(precision))
    rt, ct = s.shape
    col0 = j * ct
    neg_sentinel = jnp.float32(-3.0e38)
    col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col_ids < n_valid_ref[0], s, neg_sentinel)

    seg = ct // SEG_LANES
    s3 = s.reshape(rt, seg, SEG_LANES)
    lane3 = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 2)
    m1 = jnp.max(s3, axis=2)
    a1 = jnp.min(
        jnp.where(s3 == m1[:, :, None], lane3, SEG_LANES), axis=2
    )
    s3b = jnp.where(lane3 == a1[:, :, None], neg_sentinel, s3)
    m2 = jnp.max(s3b, axis=2)
    a2 = jnp.min(
        jnp.where(s3b == m2[:, :, None], lane3, SEG_LANES), axis=2
    )
    seg_base = col0 + jax.lax.broadcasted_iota(
        jnp.int32, (rt, seg), 1
    ) * SEG_LANES
    ppt = 2 * seg
    t = j % tiles_per_band
    band_w = tiles_per_band * ppt
    # placer[u, c] = 1 iff c == t·ppt + u — built from iotas (Mosaic has
    # no dynamic_slice lowering for slicing identity rows).
    prow = jax.lax.broadcasted_iota(jnp.int32, (ppt, band_w), 0)
    pcol = jax.lax.broadcasted_iota(jnp.int32, (ppt, band_w), 1)
    placer = (pcol == t * ppt + prow).astype(jnp.float32)
    vals = jnp.concatenate([m1, m2], axis=1)
    ids = jnp.concatenate(
        [seg_base + jnp.minimum(a1, SEG_LANES - 1),
         seg_base + jnp.minimum(a2, SEG_LANES - 1)], axis=1
    )
    placed_v = jnp.dot(vals, placer, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    # Ids ride the same placement matmul exactly (corpus ids < 2^24).
    placed_i = jnp.dot(ids.astype(jnp.float32), placer,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    @pl.when(t == 0)
    def _():
        out_v_ref[:] = placed_v
        out_i_ref[:] = placed_i.astype(jnp.int32)

    @pl.when(t != 0)
    def _():
        out_v_ref[:] = out_v_ref[:] + placed_v
        out_i_ref[:] = out_i_ref[:] + placed_i.astype(jnp.int32)

    @pl.when(t == tiles_per_band - 1)
    def _():
        out_v_ref[:] = jnp.where(
            out_v_ref[:] <= neg_sentinel, NEG_INF, out_v_ref[:]
        )


@functools.partial(
    jax.jit,
    static_argnames=("precision", "interpret", "row_tile", "col_tile",
                     "tiles_per_band"),
)
def pool_writer(
    q: jax.Array,  # [M, D], M % row_tile == 0 (f32 or bf16)
    refs: jax.Array,  # [N, D], N % (tiles_per_band·col_tile) == 0
    n_valid: jax.Array,  # scalar int32 (#real ref rows)
    precision: str = "highest",
    interpret: bool = False,
    row_tile: int = POOL_ROW_TILE,
    col_tile: int = POOL_COL_TILE,
    tiles_per_band: int = POOL_TILES_PER_BAND,
):
    """Best-2-per-128-segment winner pool of q·refsᵀ, [M, 2·N/128]
    (values f32 best-first per segment, global column ids int32),
    laid out band-major: band b holds column tiles band·b..band·b+band−1,
    tile t of a band at band columns [ppt·t, ppt·t+ppt) as
    [m1 × ppt/2 | m2 × ppt/2]. Tile sizes are tunable for A/B sweeps
    (tools/profile_search.py --pool_tiles); defaults are the production
    configuration."""
    if precision == "default":
        # XLA's DEFAULT-for-f32 dot semantics: one bf16 pass with f32
        # accumulation. Cast once out here — not per grid step.
        q = q.astype(jnp.bfloat16)
        refs = refs.astype(jnp.bfloat16)
        precision = "highest"
    m, d = q.shape
    n = refs.shape[0]
    band = tiles_per_band
    assert m % row_tile == 0, m
    assert n % (band * col_tile) == 0, n  # whole output bands
    grid = (m // row_tile, n // col_tile)  # cols iterate fastest
    ppt = 2 * (col_tile // SEG_LANES)
    # The TPU lowering wants a 128-divisible minor output dim (the
    # interpreter does not care — tests use tiny bands).
    assert interpret or (band * ppt) % 128 == 0, (band, col_tile)

    out_v, out_i = pl.pallas_call(
        functools.partial(_pool_writer_kernel, precision=precision,
                          tiles_per_band=band),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((col_tile, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((row_tile, band * ppt),
                         lambda i, j: (i, j // band),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, band * ppt),
                         lambda i, j: (i, j // band),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, ppt * grid[1]), jnp.float32),
            jax.ShapeDtypeStruct((m, ppt * grid[1]), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * d,
            bytes_accessed=(m * d * (n // (band * col_tile))
                            + n * d * (m // row_tile)
                            + 2 * m * ppt * grid[1]) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, refs, jnp.reshape(n_valid, (1,)).astype(jnp.int32))
    return out_v, out_i


def _pool_band_kernel(
    q_ref, r_ref, n_valid_ref, out_v_ref, out_i_ref, *, precision,
    inner, outer, col_tile,
):
    """Banded rewrite of ``_pool_writer_kernel``: one grid step
    processes ``inner`` column tiles (static slices of a wider
    VMEM-resident r block) and stores its [RT, inner·ppt] slab with a
    STATIC lane offset chosen by ``j % outer`` (unrolled ``pl.when``
    branches — each branch is a static store, so no identity-row
    placement matmul, no −inf sentinel dance, and ids ride as int32
    directly, lifting v1's 2^24 id ceiling). Grid steps drop by
    ``inner``× vs v1 (the measured v1 loss to the XLA scan at 1M was
    attributed to per-step overhead at 17k steps)."""
    j = pl.program_id(1)
    ct = col_tile
    seg = ct // SEG_LANES
    ppt = 2 * seg
    col0 = j * (inner * ct)
    vals_parts = []
    ids_parts = []
    for t in range(inner):
        r_t = r_ref[t * ct:(t + 1) * ct, :]
        if q_ref.dtype == jnp.bfloat16:
            s = jnp.dot(q_ref[:], r_t.T,
                        preferred_element_type=jnp.float32)
        else:
            s = jnp.dot(q_ref[:], r_t.T,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision(precision))
        rt = s.shape[0]
        tile_col0 = col0 + t * ct
        col_ids = tile_col0 + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1
        )
        s = jnp.where(col_ids < n_valid_ref[0], s, NEG_INF)
        s3 = s.reshape(rt, seg, SEG_LANES)
        lane3 = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 2)
        m1 = jnp.max(s3, axis=2)
        a1 = jnp.min(
            jnp.where(s3 == m1[:, :, None], lane3, SEG_LANES), axis=2
        )
        s3b = jnp.where(lane3 == a1[:, :, None], NEG_INF, s3)
        m2 = jnp.max(s3b, axis=2)
        a2 = jnp.min(
            jnp.where(s3b == m2[:, :, None], lane3, SEG_LANES), axis=2
        )
        seg_base = tile_col0 + jax.lax.broadcasted_iota(
            jnp.int32, (rt, seg), 1
        ) * SEG_LANES
        vals_parts.append(jnp.concatenate([m1, m2], axis=1))
        ids_parts.append(jnp.concatenate(
            [seg_base + jnp.minimum(a1, SEG_LANES - 1),
             seg_base + jnp.minimum(a2, SEG_LANES - 1)], axis=1
        ))
    vals = jnp.concatenate(vals_parts, axis=1)
    ids = jnp.concatenate(ids_parts, axis=1)
    w = inner * ppt
    slot = j % outer
    if outer == 1:
        out_v_ref[:] = vals
        out_i_ref[:] = ids
        return
    # outer > 1: `outer` consecutive steps share one 128-wide output
    # band (the block stays VMEM-resident across them). Each branch
    # stores the FULL band with this step's slab zero-extended to its
    # static window — full-block stores lower under any alignment,
    # where a w-lane offset store might not (v1's header records a
    # 16-lane offset store being rejected outright). Zeros are safe to
    # add to −inf values and int32 ids alike (no products, no NaNs).
    rt = vals.shape[0]

    def placed(x, sl):
        zeros = jnp.zeros((rt, w), x.dtype)
        return jnp.concatenate(
            [zeros] * sl + [x] + [zeros] * (outer - 1 - sl), axis=1
        )

    for sl in range(outer):
        @pl.when(slot == sl)
        def _(sl=sl):
            if sl == 0:
                out_v_ref[:] = placed(vals, 0)
                out_i_ref[:] = placed(ids, 0)
            else:
                out_v_ref[:] = out_v_ref[:] + placed(vals, sl)
                out_i_ref[:] = out_i_ref[:] + placed(ids, sl)


@functools.partial(
    jax.jit,
    static_argnames=("precision", "interpret", "row_tile", "col_tile",
                     "inner"),
)
def pool_writer_band(
    q: jax.Array,  # [M, D], M % row_tile == 0 (f32 or bf16)
    refs: jax.Array,  # [N, D], N % (outer·inner·col_tile) == 0
    n_valid: jax.Array,  # scalar int32 (#real ref rows)
    precision: str = "highest",
    interpret: bool = False,
    row_tile: int = 256,  # smaller than v1: the wider r block plus the
    #                       score-tile temporaries must share VMEM
    col_tile: int = POOL_COL_TILE,
    inner: int = 0,  # 0 = auto (fixed 2; bounded by scoped VMEM)
):
    """Banded pool writer: same output layout and best-2-per-128
    contract as ``pool_writer`` (tile t of a band at band columns
    [ppt·t, ppt·t+ppt) as [m1 × ppt/2 | m2 × ppt/2], band-major), but
    built with ``inner`` column tiles per grid step and static-offset
    band stores instead of the placement matmul. Ids are int32
    end-to-end — no 2^24 corpus ceiling."""
    if precision == "default":
        q = q.astype(jnp.bfloat16)
        refs = refs.astype(jnp.bfloat16)
        precision = "highest"
    if inner == 0:
        # inner is bounded by SCOPED VMEM, not the r block: the kernel
        # body unrolls `inner` score tiles and Mosaic stack-allocates
        # every iteration's [row_tile, col_tile] f32 temporaries
        # simultaneously (~5.7 MB each at 256x1024) against a 16 MB
        # scoped budget. inner=4 compiled in the interpreter but OOM'd
        # on real v5e (22.75M scoped, measured round 3) — 2 is the
        # widest default that fits regardless of input dtype.
        inner = 2
    m, d = q.shape
    n = refs.shape[0]
    ppt = 2 * (col_tile // SEG_LANES)
    assert 128 % (inner * ppt) == 0 or (inner * ppt) % 128 == 0, (
        inner, ppt,
    )
    outer = max(1, 128 // (inner * ppt))
    assert m % row_tile == 0, m
    assert n % (outer * inner * col_tile) == 0, (n, outer, inner)
    grid = (m // row_tile, n // (inner * col_tile))
    band_w = outer * inner * ppt
    assert interpret or band_w % 128 == 0, band_w

    out_v, out_i = pl.pallas_call(
        functools.partial(_pool_band_kernel, precision=precision,
                          inner=inner, outer=outer, col_tile=col_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((inner * col_tile, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((row_tile, band_w),
                         lambda i, j: (i, j // outer),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, band_w),
                         lambda i, j: (i, j // outer),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, ppt * (n // col_tile)), jnp.float32),
            jax.ShapeDtypeStruct((m, ppt * (n // col_tile)), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * d,
            bytes_accessed=(m * d * (n // (inner * col_tile))
                            + n * d * (m // row_tile)
                            + 2 * m * ppt * (n // col_tile)) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, refs, jnp.reshape(n_valid, (1,)).astype(jnp.int32))
    return out_v, out_i


SEG_LANES = 128  # candidate granularity: best 2 per 128-lane segment
# Smaller row tile than the reductions above: the collector's score
# tile plus its segment/select temporaries must all fit scoped VMEM
# (512 rows × 1024 cols overflows the 16 MB budget by ~1.3 MB).
TOPK_ROW_TILE = 256


def _topk_collect_kernel(
    q_ref, r_ref, n_valid_ref, out_s_ref, out_i_ref, acc_s, acc_i
):
    """Fused matmul + per-row top-κ candidate collection.

    Per column tile: the MXU computes the [RT, CT] score tile into VMEM;
    the VPU reduces each 128-lane segment to its best two (max, argmax)
    candidates and folds them into a running per-row κ-set by replacing
    the set's current minimum (min-replacement keeps the best κ seen
    without any sort — Mosaic has no sort/top_k lowering). At most two
    candidates survive per segment per tile (approx_max_k's recall
    contract, doubled); the searcher's count-verify pass restores
    exactness downstream (ops/similarity.py global_topk)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_s[:] = jnp.full_like(acc_s, NEG_INF)
        acc_i[:] = jnp.zeros_like(acc_i)

    s = jnp.dot(q_ref[:], r_ref[:].T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    rt, ct = s.shape
    col0 = j * ct
    col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col_ids < n_valid_ref[0], s, NEG_INF)

    # Segment (max, argmax) ×2 — best and runner-up per 128-lane
    # segment: [RT, CT] → [RT, SEG] each. Argmax emulated via min-iota
    # over max-equal lanes (first max wins, like lax.argmax).
    seg = ct // SEG_LANES
    s3 = s.reshape(rt, seg, SEG_LANES)
    lane3 = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 2)
    kp_lane = jax.lax.broadcasted_iota(jnp.int32, acc_s.shape, 1)

    def seg_best(vals):
        vmax = jnp.max(vals, axis=2)
        varg = jnp.min(
            jnp.where(vals == vmax[:, :, None], lane3, SEG_LANES), axis=2
        )
        return vmax, varg

    max1, arg1 = seg_best(s3)
    s3_rest = jnp.where(lane3 == arg1[:, :, None], NEG_INF, s3)
    max2, arg2 = seg_best(s3_rest)

    for vmax, varg in ((max1, arg1), (max2, arg2)):
        for t in range(seg):
            cand_s = vmax[:, t]
            cand_i = col0 + t * SEG_LANES + varg[:, t]
            cur = acc_s[:]
            cur_min = jnp.min(cur, axis=1)
            min_lane = jnp.min(
                jnp.where(cur == cur_min[:, None], kp_lane, cur.shape[1]),
                axis=1,
            )
            hit = (kp_lane == min_lane[:, None]) & (
                cand_s > cur_min
            )[:, None]
            acc_s[:] = jnp.where(hit, cand_s[:, None], cur)
            acc_i[:] = jnp.where(hit, cand_i[:, None], acc_i[:])

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_s_ref[:] = acc_s[:]
        out_i_ref[:] = acc_i[:]


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("kappa", "interpret"))
def fused_topk(
    q: jax.Array,  # [M, D]
    refs: jax.Array,  # [N, D]
    n_valid: jax.Array,  # scalar int32 (#real ref rows)
    kappa: int,
    interpret: bool = False,
):
    """Per-row top-κ candidates of q·refsᵀ without the [M, N] (or even
    [M, col_block]) score matrix ever touching HBM.

    Returns (scores [M, κ], indices [M, κ]) sorted best-first per row.
    Candidate recall: the best 2 per 128-column segment per column
    tile (approx_max_k's contract, doubled); rows padded with −inf/0 when fewer than κ
    valid candidates exist. Traceable; callable inside jit."""
    m, d = q.shape
    n = refs.shape[0]
    rt = min(TOPK_ROW_TILE, _ceil_to(max(m, 1), 8))
    ct = min(COL_TILE, _ceil_to(max(n, 1), SEG_LANES))
    mp, np_ = _ceil_to(m, rt), _ceil_to(n, ct)
    if mp != m:
        q = jnp.pad(q, ((0, mp - m), (0, 0)))
    if np_ != n:
        refs = jnp.pad(refs, ((0, np_ - n), (0, 0)))

    out_s, out_i = pl.pallas_call(
        _topk_collect_kernel,
        grid=(mp // rt, np_ // ct),
        in_specs=[
            pl.BlockSpec((rt, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((rt, kappa), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, kappa), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mp, kappa), jnp.float32),
            jax.ShapeDtypeStruct((mp, kappa), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rt, kappa), jnp.float32),
            pltpu.VMEM((rt, kappa), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * d,
            bytes_accessed=(mp * d + np_ * d + 2 * mp * kappa) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, refs, jnp.reshape(n_valid, (1,)).astype(jnp.int32))

    # The κ-set is maintained unsorted; order it best-first outside the
    # kernel (tiny [M, κ] work, XLA top_k).
    top_s, sel = jax.lax.top_k(out_s[:m], kappa)
    top_i = jnp.take_along_axis(out_i[:m], sel, axis=1)
    return top_s, top_i


# ---------------------------------------------------------------------------
# DnS fused chamfer (round 4)
# ---------------------------------------------------------------------------

def _chamfer_kernel(qf_ref, rf_ref, out_ref, *, regions, rt, precision,
                    symmetric):
    """One (pair, q-tile, r-tile) step of the DnS chamfer: the region-
    pair product lives only in VMEM.

    qf block [1, QT·R, D] is frame-major/region-minor (rows (q, a));
    rf block [1, R·RT, D] is region-major WITHIN the tile (rows
    (c, n) — the XLA-side pre-layout in ``chamfer_fine_sims``), so
    max-over-c is ``regions`` static lane slices and both chamfer
    reductions run without strided access. The [B, NQ, R, R, NR]
    product tensor the XLA formulation materializes to HBM
    (baseline/dns_baseline.py _chamfer_fuse; 7.8 GB f32 at the
    512-pair bench bucket) never exists here."""
    qf = qf_ref[0]
    rf = rf_ref[0]
    if qf.dtype == jnp.bfloat16:
        p = jax.lax.dot_general(
            qf, rf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        p = jax.lax.dot_general(
            qf, rf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision(precision),
        )
    qt = p.shape[0] // regions
    # mean_a max_c: max over ref regions (static lane slices), then
    # mean over query regions (second-minor after the trivial
    # major-axis split).
    maxc = p[:, :rt]
    for c in range(1, regions):
        maxc = jnp.maximum(maxc, p[:, c * rt:(c + 1) * rt])
    fg = jnp.mean(maxc.reshape(qt, regions, rt), axis=1)
    if symmetric:
        # mean_c max_a: max over query regions, mean over ref regions.
        ma = jnp.max(p.reshape(qt, regions, regions * rt), axis=1)
        acc = ma[:, :rt]
        for c in range(1, regions):
            acc = acc + ma[:, c * rt:(c + 1) * rt]
        fg = (fg + acc * (1.0 / regions)) * 0.5
    out_ref[0] = fg


def chamfer_fine_sims(
    qf: jax.Array,  # [B, NQ, R, D] fine query regions
    rf: jax.Array,  # [B, NR, R, D] fine ref regions
    *,
    symmetric: bool = True,
    precision: str = "highest",
    interpret: bool = False,
) -> jax.Array:
    """Fused DnS chamfer similarity [B, NQ, NR] (pre-rescale).

    Grid (B, NQ/QT, NR/RT) with 64-frame tiles: per step one MXU
    contraction [QT·R, D]×[D, R·RT] plus in-VMEM reductions — VMEM
    stays ~4 MB at ANY bucket size, where the XLA einsum's product
    tensor grows as B·NQ·NR·R². Zero-pad frames (the gathered pad row)
    produce fg = 0 exactly like the XLA path, so downstream masking is
    unchanged. Returns mean_a max_c (symmetrized when ``symmetric``)
    WITHOUT the [0,1] rescale — the caller fuses rescale + coarse
    exactly as for the XLA formulation."""
    b, nq, regions, d = qf.shape
    nr = rf.shape[1]
    qt = min(nq, 64)
    rt = min(nr, 64)
    # Grid floor-division would silently leave trailing output rows
    # uninitialized for non-tile-multiple frame counts; the alignment
    # buckets are powers of two ≥ 32, so demand it loudly here.
    assert nq % qt == 0 and nr % rt == 0, (
        f"chamfer_fine_sims needs tile-multiple frame counts "
        f"(64, or the full extent below 64); got NQ={nq}, NR={nr}"
    )
    if precision == "default":
        qf = qf.astype(jnp.bfloat16)
        rf = rf.astype(jnp.bfloat16)
    # Frame-major query rows (q, a); per-tile region-major ref rows:
    # [B, NR, R, D] → [B, NR/RT, RT, R, D] → [B, NR/RT, R, RT, D].
    qf2 = qf.reshape(b, nq * regions, d)
    rf2 = jnp.swapaxes(
        rf.reshape(b, nr // rt, rt, regions, d), 2, 3
    ).reshape(b, (nr // rt) * regions * rt, d)
    kernel = functools.partial(
        _chamfer_kernel, regions=regions, rt=rt, precision=precision,
        symmetric=symmetric,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, nq // qt, nr // rt),
        in_specs=[
            pl.BlockSpec(
                (1, qt * regions, d), lambda b_, i, j: (b_, i, 0)
            ),
            pl.BlockSpec(
                (1, regions * rt, d), lambda b_, i, j: (b_, j, 0)
            ),
        ],
        out_specs=pl.BlockSpec((1, qt, rt), lambda b_, i, j: (b_, i, j)),
        out_shape=jax.ShapeDtypeStruct((b, nq, nr), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (nq * regions) * (nr * regions) * d,
            bytes_accessed=(
                b * nq * regions * d * qf2.dtype.itemsize * (nr // rt)
                + b * nr * regions * d * rf2.dtype.itemsize * (nq // qt)
                + b * nq * nr * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qf2, rf2)
