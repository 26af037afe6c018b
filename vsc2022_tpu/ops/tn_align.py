"""Temporal-network (TN) alignment as a batched, jit-compiled DP scan.

The reference outsources temporal localization to VCSL's TN model — a
CPU graph algorithm (networkx longest-path over a DAG of similar frame
pairs, multiprocessing pool over pairs; reference:
vsc/baseline/localization.py:39-79, vcsl/vta.py submodule). That
formulation (irregular graph, Python objects) is hostile to TPUs.

This module re-derives TN as a dense dynamic program:

  * Nodes: cells (i, j) of the similarity matrix where sim ≥ min_sim
    and j is among the top-K of row i (the TN frame-retrieval gate).
  * Edges: (i', j') → (i, j) iff 0 < i−i' ≤ max_step and
    0 < j−j' ≤ max_step (TN's temporal-consistency window).
  * Objective: the longest path (node count; similarity sum as
    tie-break) — matching networkx ``dag_longest_path`` semantics with
    unit edge weights, which is what VCSL's TN computes.

Key TPU trick: no traceback. Because paths are strictly monotonic in
both axes, a path's bounding box is determined by its two endpoints —
so the DP carries (start_i, start_j, length, simsum) alongside the
best-path value and a single forward scan yields the winning box
directly. Multiple paths are extracted by masking the winning box's
node cells and re-running the scan (``max_paths`` iterations inside one
jit, no host round-trips).

Everything is batched over pairs: sims [B, NQ, NR] with per-pair valid
lengths, so one compiled program aligns a whole candidate batch.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


class TNParams(NamedTuple):
    """Static TN hyperparameters (reference call sites:
    vsc/baseline/sscd_baseline.py:118-126 pass tn_max_step=5,
    min_length=4; the rest are VCSL-style knobs, exposed for tuning).

    ``adaptive_sigma``: the node gate uses
    threshold = max(min_sim, mean + adaptive_sigma · std) over the
    pair's valid similarity cells. This makes the gate invariant to the
    similarity scale and to the additive similarity_bias, and rejects
    random-descriptor collisions whatever the descriptor dimension
    (noise std of normalized d-dim descriptors is 1/√d, so no single
    absolute threshold works across models). The 2.5 default maximizes
    segment AP on the synthetic planted-copy benchmark sweep
    (tools/synthetic_eval.py across seeds and noise levels). Set to 0
    to disable and use the absolute ``min_sim`` only."""

    max_step: int = 5
    min_length: int = 4
    max_paths: int = 10
    min_sim: float = 0.2
    top_k_per_row: int = 10
    adaptive_sigma: float = 2.5


def _shift_down(x: jnp.ndarray, delta: int, fill) -> jnp.ndarray:
    """shift along last axis: out[..., j] = x[..., j - delta]."""
    if delta == 0:
        return x
    pad = jnp.full(x.shape[:-1] + (delta,), fill, dtype=x.dtype)
    return jnp.concatenate([pad, x[..., :-delta]], axis=-1)


def _select(pred, a, b):
    """Elementwise select over a pytree-like tuple of arrays."""
    return tuple(jnp.where(pred, x, y) for x, y in zip(a, b))


def _better(ln_a, sum_a, ln_b, sum_b):
    """Lexicographic path order: longer wins; ties by similarity sum."""
    return (ln_a > ln_b) | ((ln_a == ln_b) & (sum_a > sum_b))


def node_mask(
    sims: jnp.ndarray,  # [B, NQ, NR]
    q_len: jnp.ndarray,  # [B]
    r_len: jnp.ndarray,  # [B]
    min_sim: float,
    top_k_per_row: int,
    adaptive_sigma: float = 0.0,
) -> jnp.ndarray:
    """TN node gate: valid cells above the (possibly adaptive) similarity
    threshold that rank in the top-K of their row."""
    b, nq, nr = sims.shape
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, nq, nr), 2)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (b, nq, nr), 1)
    valid = (col_ids < r_len[:, None, None]) & (row_ids < q_len[:, None, None])
    masked = jnp.where(valid, sims, NEG_INF)

    threshold = jnp.full((b, 1, 1), min_sim, dtype=jnp.float32)
    if adaptive_sigma > 0:
        count = jnp.maximum((q_len * r_len).astype(jnp.float32), 1.0)
        zeroed = jnp.where(valid, sims, 0.0)
        mean = jnp.sum(zeroed, axis=(1, 2)) / count
        var = jnp.sum(jnp.where(valid, (sims - mean[:, None, None]) ** 2, 0.0),
                      axis=(1, 2)) / count
        adaptive = mean + adaptive_sigma * jnp.sqrt(var)
        threshold = jnp.maximum(threshold, adaptive[:, None, None])

    if top_k_per_row < nr:
        kth = jax.lax.top_k(masked, top_k_per_row)[0][..., -1:]
        in_topk = masked >= kth
    else:
        in_topk = jnp.ones_like(valid)
    return valid & in_topk & (masked >= threshold)


def _dp_scan(sims, nodes, params: TNParams):
    """One forward DP pass. Returns the best eligible path per batch
    element: (found, end_i, end_j, start_i, start_j, length)."""
    b, nq, nr = sims.shape
    w = params.max_step

    def row_step(carry, inputs):
        # Window buffers over the last `w` rows: [B, w, NR] each.
        win_ln, win_sum, win_si, win_sj, best = carry
        sim_row, node_row, i = inputs  # [B, NR], [B, NR], scalar

        # Best predecessor over the w×w window, tracking provenance.
        # Stage 1: reduce over the w buffered rows (column-wise).
        col_ln = jnp.full((b, nr), 0, dtype=jnp.int32)
        col_sum = jnp.full((b, nr), NEG_INF, dtype=jnp.float32)
        col_si = jnp.zeros((b, nr), dtype=jnp.int32)
        col_sj = jnp.zeros((b, nr), dtype=jnp.int32)
        for d in range(w):
            cand = (win_ln[:, d], win_sum[:, d], win_si[:, d], win_sj[:, d])
            take = _better(cand[0], cand[1], col_ln, col_sum)
            col_ln, col_sum, col_si, col_sj = _select(
                take, cand, (col_ln, col_sum, col_si, col_sj)
            )
        # Stage 2: reduce over column offsets 1..w.
        prev_ln = jnp.full((b, nr), 0, dtype=jnp.int32)
        prev_sum = jnp.full((b, nr), NEG_INF, dtype=jnp.float32)
        prev_si = jnp.zeros((b, nr), dtype=jnp.int32)
        prev_sj = jnp.zeros((b, nr), dtype=jnp.int32)
        for delta in range(1, w + 1):
            cand = (
                _shift_down(col_ln, delta, 0),
                _shift_down(col_sum, delta, NEG_INF),
                _shift_down(col_si, delta, 0),
                _shift_down(col_sj, delta, 0),
            )
            take = _better(cand[0], cand[1], prev_ln, prev_sum)
            prev_ln, prev_sum, prev_si, prev_sj = _select(
                take, cand, (prev_ln, prev_sum, prev_si, prev_sj)
            )

        # Extend a predecessor path, or start a new one at this node.
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (b, nr), 1)
        has_prev = prev_ln > 0
        new_ln = jnp.where(has_prev, prev_ln + 1, 1)
        new_sum = jnp.where(has_prev, prev_sum + sim_row, sim_row)
        new_si = jnp.where(has_prev, prev_si, i)
        new_sj = jnp.where(has_prev, prev_sj, col_iota)
        # Non-node cells hold no path.
        new_ln = jnp.where(node_row, new_ln, 0)
        new_sum = jnp.where(node_row, new_sum, NEG_INF)

        # Update the per-batch running best over eligible cells.
        eligible = new_ln >= params.min_length
        elig_ln = jnp.where(eligible, new_ln, 0)
        elig_sum = jnp.where(eligible, new_sum, NEG_INF)
        b_ln, b_sum, b_i, b_j, b_si, b_sj = best
        # Row-wise lexicographic argmax in two exact stages: first the
        # max length, then the best simsum among max-length cells.
        max_ln = jnp.max(elig_ln, axis=1, keepdims=True)
        tie_sum = jnp.where(
            (elig_ln == max_ln) & (elig_ln > 0), elig_sum, NEG_INF
        )
        j_star = jnp.argmax(tie_sum, axis=1)
        r_ln = jnp.take_along_axis(elig_ln, j_star[:, None], 1)[:, 0]
        r_sum = jnp.take_along_axis(elig_sum, j_star[:, None], 1)[:, 0]
        r_si = jnp.take_along_axis(new_si, j_star[:, None], 1)[:, 0]
        r_sj = jnp.take_along_axis(new_sj, j_star[:, None], 1)[:, 0]
        take = _better(r_ln, r_sum, b_ln, b_sum)
        best = (
            jnp.where(take, r_ln, b_ln),
            jnp.where(take, r_sum, b_sum),
            jnp.where(take, i, b_i),
            jnp.where(take, j_star.astype(jnp.int32), b_j),
            jnp.where(take, r_si, b_si),
            jnp.where(take, r_sj, b_sj),
        )

        # Roll the window: drop row i-w, append row i.
        win_ln = jnp.concatenate([win_ln[:, 1:], new_ln[:, None]], axis=1)
        win_sum = jnp.concatenate([win_sum[:, 1:], new_sum[:, None]], axis=1)
        win_si = jnp.concatenate([win_si[:, 1:], new_si[:, None]], axis=1)
        win_sj = jnp.concatenate([win_sj[:, 1:], new_sj[:, None]], axis=1)
        return (win_ln, win_sum, win_si, win_sj, best), None

    init = (
        jnp.zeros((b, w, nr), dtype=jnp.int32),
        jnp.full((b, w, nr), NEG_INF, dtype=jnp.float32),
        jnp.zeros((b, w, nr), dtype=jnp.int32),
        jnp.zeros((b, w, nr), dtype=jnp.int32),
        (
            jnp.zeros((b,), dtype=jnp.int32),
            jnp.full((b,), NEG_INF, dtype=jnp.float32),
            jnp.zeros((b,), dtype=jnp.int32),
            jnp.zeros((b,), dtype=jnp.int32),
            jnp.zeros((b,), dtype=jnp.int32),
            jnp.zeros((b,), dtype=jnp.int32),
        ),
    )
    # One row per scan step. (A C-rows-per-step unrolled variant was
    # measured: identical warm runtime — the pass is memory-bound, the
    # per-step overhead is not the bottleneck — at 3× the compile time.)
    xs = (
        jnp.moveaxis(sims, 1, 0),  # [NQ, B, NR]
        jnp.moveaxis(nodes, 1, 0),
        jnp.arange(nq, dtype=jnp.int32),
    )
    (_, _, _, _, best), _ = jax.lax.scan(row_step, init, xs)
    b_ln, b_sum, b_i, b_j, b_si, b_sj = best
    found = b_ln >= params.min_length
    return found, b_i, b_j, b_si, b_sj, b_ln


@functools.partial(jax.jit, static_argnames=("params",))
def tn_align(
    sims: jnp.ndarray,  # [B, NQ, NR] f32 (bias already applied)
    q_len: jnp.ndarray,  # [B] int32 valid query frames
    r_len: jnp.ndarray,  # [B] int32 valid ref frames
    params: TNParams = TNParams(),
):
    """Extract up to ``max_paths`` aligned segments per pair.

    Returns:
      boxes  [B, P, 4] int32 — (x1, y1, x2, y2) inclusive frame indices
             (x = query axis, y = ref axis), like VCSL's box convention
             (reference: vsc/baseline/localization.py:65-75).
      valid  [B, P] bool
      scores [B, P] f32 — max similarity inside the box (no bias
             correction; callers subtract their similarity_bias,
             reference: vsc/baseline/localization.py:88-91).
    """
    b, nq, nr = sims.shape
    p = params.max_paths
    nodes0 = node_mask(
        sims, q_len, r_len, params.min_sim, params.top_k_per_row,
        params.adaptive_sigma,
    )
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (b, nq, nr), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, nq, nr), 2)

    def extract(nodes, _):
        found, ei, ej, si, sj, ln = _dp_scan(sims, nodes, params)
        # Mask the box's node cells so later paths cannot reuse them.
        in_box = (
            (row_ids >= si[:, None, None])
            & (row_ids <= ei[:, None, None])
            & (col_ids >= sj[:, None, None])
            & (col_ids <= ej[:, None, None])
        )
        new_nodes = nodes & ~(in_box & found[:, None, None])
        # Score: max similarity inside the box.
        box_max = jnp.max(
            jnp.where(in_box, sims, NEG_INF), axis=(1, 2)
        )
        box = jnp.stack([si, sj, ei, ej], axis=1)
        return new_nodes, (box, found, box_max)

    _, (boxes, valid, scores) = jax.lax.scan(extract, nodes0, None, length=p)
    # [P, B, ...] → [B, P, ...]
    return (
        jnp.moveaxis(boxes, 0, 1),
        jnp.moveaxis(valid, 0, 1),
        jnp.moveaxis(scores, 0, 1),
    )
