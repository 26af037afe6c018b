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
    # "box": after extracting a path, mask every node cell inside its
    #   bounding box (fast: no traceback; enforces non-overlapping
    #   boxes). "path": mask only the path's own cells, the published
    #   VCSL behavior (the graph loses the path's nodes, later paths
    #   may thread through the same region; vta.py removes
    #   nx.dag_longest_path nodes from the graph each iteration).
    mask_mode: str = "box"
    # Reject (do not emit) a box whose IoU with an already-accepted box
    # exceeds this; the rejected path's nodes are still consumed and the
    # attempt still counts toward max_paths (VCSL TN's max_iou knob,
    # default 0.3 there). 1.0 disables the check.
    max_iou: float = 1.0

    @classmethod
    def vcsl_faithful(cls, max_step: int = 5, min_length: int = 4,
                      max_paths: int = 10) -> "TNParams":
        """The parity configuration: published VCSL TN gating and path
        extraction — absolute min_sim=0.2 node threshold (no adaptive
        sigma), per-row top-K=5 frame retrieval (VCSL tn_top_K default),
        path-cell masking between iterations, and max_iou=0.3 box
        dedup. max_step/min_length default to the reference's call site
        values (vsc/baseline/sscd_baseline.py:118-126)."""
        return cls(
            max_step=max_step, min_length=min_length, max_paths=max_paths,
            min_sim=0.2, top_k_per_row=5, adaptive_sigma=0.0,
            mask_mode="path", max_iou=0.3,
        )


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


def _dp_scan(sims, nodes, params: TNParams, collect: bool = False):
    """One forward DP pass. Returns the best eligible path per batch
    element: (found, end_i, end_j, start_i, start_j, length), plus —
    when ``collect`` — the full per-cell (length, simsum) DP tables
    needed for path traceback."""
    b, nq, nr = sims.shape
    w = params.max_step
    # The path START provenance packs into ONE i32 (start = si·NR + sj):
    # the scan carry drops from four [B, w, NR] window buffers to three
    # (25% less HBM carry traffic — the scan is memory-bound on its
    # rolled carry) and every windowed reduce runs one select cheaper.
    # Bit-identical to the unpacked form: packing is a bijection and
    # all comparisons stay on (length, simsum).
    assert nq * nr < 2**31, (nq, nr)

    def row_step(carry, inputs):
        # Window buffers over the last `w` rows: [B, w, NR] each.
        # (A ring-buffer variant — one aliased dynamic_update_slice row
        # store per step instead of the full roll — was measured 2×
        # SLOWER on TPU: the traced-slot dynamic slices defeat the
        # scan's carry aliasing. The roll is the fast form.)
        win_ln, win_sum, win_st, best = carry
        sim_row, node_row, i = inputs  # [B, NR], [B, NR], scalar

        # Best predecessor over the w×w window, tracking provenance.
        # Stage 1: reduce over the w buffered rows (column-wise).
        col_ln = jnp.full((b, nr), 0, dtype=jnp.int32)
        col_sum = jnp.full((b, nr), NEG_INF, dtype=jnp.float32)
        col_st = jnp.zeros((b, nr), dtype=jnp.int32)
        for d in range(w):
            cand = (win_ln[:, d], win_sum[:, d], win_st[:, d])
            take = _better(cand[0], cand[1], col_ln, col_sum)
            col_ln, col_sum, col_st = _select(
                take, cand, (col_ln, col_sum, col_st)
            )
        # Stage 2: reduce over column offsets 1..w.
        prev_ln = jnp.full((b, nr), 0, dtype=jnp.int32)
        prev_sum = jnp.full((b, nr), NEG_INF, dtype=jnp.float32)
        prev_st = jnp.zeros((b, nr), dtype=jnp.int32)
        for delta in range(1, w + 1):
            cand = (
                _shift_down(col_ln, delta, 0),
                _shift_down(col_sum, delta, NEG_INF),
                _shift_down(col_st, delta, 0),
            )
            take = _better(cand[0], cand[1], prev_ln, prev_sum)
            prev_ln, prev_sum, prev_st = _select(
                take, cand, (prev_ln, prev_sum, prev_st)
            )

        # Extend a predecessor path, or start a new one at this node.
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (b, nr), 1)
        has_prev = prev_ln > 0
        new_ln = jnp.where(has_prev, prev_ln + 1, 1)
        new_sum = jnp.where(has_prev, prev_sum + sim_row, sim_row)
        new_st = jnp.where(has_prev, prev_st, i * nr + col_iota)
        # Non-node cells hold no path.
        new_ln = jnp.where(node_row, new_ln, 0)
        new_sum = jnp.where(node_row, new_sum, NEG_INF)

        # Update the per-batch running best over eligible cells.
        eligible = new_ln >= params.min_length
        elig_ln = jnp.where(eligible, new_ln, 0)
        elig_sum = jnp.where(eligible, new_sum, NEG_INF)
        b_ln, b_sum, b_i, b_j, b_st = best
        # Row-wise lexicographic argmax in two exact stages: first the
        # max length, then the best simsum among max-length cells.
        max_ln = jnp.max(elig_ln, axis=1, keepdims=True)
        tie_sum = jnp.where(
            (elig_ln == max_ln) & (elig_ln > 0), elig_sum, NEG_INF
        )
        j_star = jnp.argmax(tie_sum, axis=1)
        # Gather-free per-row picks (take_along_axis lowers to gathers
        # with layout penalties; see ops/similarity.py): the winning
        # length IS max_ln (j_star maximizes among max-length cells, or
        # everything is 0/−inf), the winning sum IS the row max of
        # tie_sum, and the packed start comes from a one-hot masked
        # max (starts are non-negative; exactly one lane matches).
        at_star = col_iota == j_star[:, None]
        r_ln = max_ln[:, 0]
        r_sum = jnp.max(tie_sum, axis=1)
        r_st = jnp.max(jnp.where(at_star, new_st, -1), axis=1)
        take = _better(r_ln, r_sum, b_ln, b_sum)
        best = (
            jnp.where(take, r_ln, b_ln),
            jnp.where(take, r_sum, b_sum),
            jnp.where(take, i, b_i),
            jnp.where(take, j_star.astype(jnp.int32), b_j),
            jnp.where(take, r_st, b_st),
        )

        # Roll the window: drop row i-w, append row i.
        win_ln = jnp.concatenate([win_ln[:, 1:], new_ln[:, None]], axis=1)
        win_sum = jnp.concatenate([win_sum[:, 1:], new_sum[:, None]], axis=1)
        win_st = jnp.concatenate([win_st[:, 1:], new_st[:, None]], axis=1)
        ys = (new_ln, new_sum) if collect else None
        return (win_ln, win_sum, win_st, best), ys

    init = (
        jnp.zeros((b, w, nr), dtype=jnp.int32),
        jnp.full((b, w, nr), NEG_INF, dtype=jnp.float32),
        jnp.zeros((b, w, nr), dtype=jnp.int32),
        (
            jnp.zeros((b,), dtype=jnp.int32),
            jnp.full((b,), NEG_INF, dtype=jnp.float32),
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
    (_, _, _, best), ys = jax.lax.scan(row_step, init, xs)
    b_ln, b_sum, b_i, b_j, b_st = best
    b_si, b_sj = b_st // nr, b_st % nr
    found = b_ln >= params.min_length
    result = (found, b_i, b_j, b_si, b_sj, b_ln)
    if not collect:
        return result
    ln_table = jnp.moveaxis(ys[0], 0, 1)  # [B, NQ, NR]
    sum_table = jnp.moveaxis(ys[1], 0, 1)
    return result, ln_table, sum_table


def _trace_path(
    ln_table: jnp.ndarray,  # [B, NQ, NR] int32 DP path lengths
    sum_table: jnp.ndarray,  # [B, NQ, NR] f32 DP simsums
    found: jnp.ndarray,  # [B] bool
    end_i: jnp.ndarray,  # [B]
    end_j: jnp.ndarray,  # [B]
    max_step: int,
) -> jnp.ndarray:
    """Recover the winning path's cells as a [B, NQ, NR] bool mask.

    Walks backward from the endpoint, at each step re-running the
    forward pass's windowed predecessor selection (same lexicographic
    (length, simsum) order and tie preferences: per column the earliest
    buffered row wins, across columns the smallest shift wins) — so the
    recovered chain is exactly the chain the forward extension chose.
    """
    b, nq, nr = ln_table.shape
    w = max_step
    # Pad top/left by w so the predecessor window at (i-w, j-w) is a
    # plain dynamic_slice; padded cells carry ln=0 (never selected).
    lnp = jnp.pad(ln_table, ((0, 0), (w, 0), (w, 0)))
    sump = jnp.pad(
        sum_table, ((0, 0), (w, 0), (w, 0)), constant_values=NEG_INF
    )
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (b, nq, nr), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, nq, nr), 2)

    def window(arr, i, j):  # [NQ+w, NR+w], scalars → [w, w]
        # Rows i-w..i-1, cols j-w..j-1 live at padded (i, j)..(i+w-1, ...).
        return jax.lax.dynamic_slice(arr, (i, j), (w, w))

    def body(state):
        ci, cj, cl, active, mask = state
        here = (
            (row_ids == ci[:, None, None]) & (col_ids == cj[:, None, None])
        )
        mask = mask | (here & active[:, None, None])

        win_ln = jax.vmap(window)(lnp, ci, cj)  # [B, w, w]
        win_sum = jax.vmap(window)(sump, ci, cj)
        # Stage 1 (per column): earliest row wins ties.
        best_ln = jnp.zeros((b, w), jnp.int32)
        best_sum = jnp.full((b, w), NEG_INF, jnp.float32)
        best_r = jnp.zeros((b, w), jnp.int32)
        for r in range(w):
            take = _better(win_ln[:, r], win_sum[:, r], best_ln, best_sum)
            best_ln = jnp.where(take, win_ln[:, r], best_ln)
            best_sum = jnp.where(take, win_sum[:, r], best_sum)
            best_r = jnp.where(take, r, best_r)
        # Stage 2 (across columns): smallest shift = largest column wins.
        sel_ln = jnp.zeros((b,), jnp.int32)
        sel_sum = jnp.full((b,), NEG_INF, jnp.float32)
        sel_r = jnp.zeros((b,), jnp.int32)
        sel_c = jnp.zeros((b,), jnp.int32)
        for c in reversed(range(w)):
            take = _better(best_ln[:, c], best_sum[:, c], sel_ln, sel_sum)
            sel_ln = jnp.where(take, best_ln[:, c], sel_ln)
            sel_sum = jnp.where(take, best_sum[:, c], sel_sum)
            sel_r = jnp.where(take, best_r[:, c], sel_r)
            sel_c = jnp.where(take, c, sel_c)

        step = active & (cl > 1)
        ci = jnp.where(step, ci - w + sel_r, ci)
        cj = jnp.where(step, cj - w + sel_c, cj)
        cl = jnp.where(step, cl - 1, cl)
        active = step
        return ci, cj, cl, active, mask

    def cond(state):
        return jnp.any(state[3])

    # cl starts at the winning length; walk guards itself via cl.
    length0 = jax.vmap(lambda t, i, j: t[i, j])(ln_table, end_i, end_j)
    init = (
        end_i.astype(jnp.int32),
        end_j.astype(jnp.int32),
        length0,
        found,
        jnp.zeros((b, nq, nr), dtype=bool),
    )
    _, _, _, _, mask = jax.lax.while_loop(cond, body, init)
    return mask


def _box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU of inclusive-index boxes (x1, y1, x2, y2): [..., 4] each."""
    ix = jnp.maximum(
        0,
        jnp.minimum(a[..., 2], b[..., 2]) - jnp.maximum(a[..., 0], b[..., 0])
        + 1,
    )
    iy = jnp.maximum(
        0,
        jnp.minimum(a[..., 3], b[..., 3]) - jnp.maximum(a[..., 1], b[..., 1])
        + 1,
    )
    inter = (ix * iy).astype(jnp.float32)
    area = lambda t: (  # noqa: E731
        (t[..., 2] - t[..., 0] + 1) * (t[..., 3] - t[..., 1] + 1)
    ).astype(jnp.float32)
    return inter / jnp.maximum(area(a) + area(b) - inter, 1.0)


@functools.partial(jax.jit, static_argnames=("params",))
def tn_align_packed(
    sims: jnp.ndarray,
    q_len: jnp.ndarray,
    r_len: jnp.ndarray,
    params: "TNParams" = None,
):
    """``tn_align`` with its three outputs packed into ONE f32 buffer
    [B, P, 6] = (x1, y1, x2, y2, valid, score): a single D2H pull per
    alignment batch instead of three. On this rig's relay each pull
    costs a full dispatch round trip (~27 ms floor — bench
    rpc_floor_ms), which measured ~60% of the 512-pair DnS
    localization wall (tools/profile_dns.py); the box coordinates are
    frame indices (< 2^24), exact in f32."""
    boxes, valid, scores = _tn_align_impl(
        sims, q_len, r_len, params or TNParams()
    )
    return jnp.concatenate(
        [
            boxes.astype(jnp.float32),
            valid[:, :, None].astype(jnp.float32),
            scores[:, :, None],
        ],
        axis=2,
    )


@functools.partial(jax.jit, static_argnames=("params",))
def tn_align(
    sims: jnp.ndarray,  # [B, NQ, NR] f32 (bias already applied)
    q_len: jnp.ndarray,  # [B] int32 valid query frames
    r_len: jnp.ndarray,  # [B] int32 valid ref frames
    params: TNParams = TNParams(),
):
    """Extract up to ``max_paths`` aligned segments per pair.

    (Hot-path callers that pull results to host should prefer
    ``tn_align_packed`` — one D2H transfer instead of three.)

    Returns:
      boxes  [B, P, 4] int32 — (x1, y1, x2, y2) inclusive frame indices
             (x = query axis, y = ref axis), like VCSL's box convention
             (reference: vsc/baseline/localization.py:65-75).
      valid  [B, P] bool
      scores [B, P] f32 — max similarity inside the box (no bias
             correction; callers subtract their similarity_bias,
             reference: vsc/baseline/localization.py:88-91).
    """
    return _tn_align_impl(sims, q_len, r_len, params)


def _tn_align_impl(sims, q_len, r_len, params):
    b, nq, nr = sims.shape
    p = params.max_paths
    nodes0 = node_mask(
        sims, q_len, r_len, params.min_sim, params.top_k_per_row,
        params.adaptive_sigma,
    )
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (b, nq, nr), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, nq, nr), 2)

    def extract(nodes, _):
        if params.mask_mode == "path":
            (found, ei, ej, si, sj, ln), ln_t, sum_t = _dp_scan(
                sims, nodes, params, collect=True
            )
            consumed = _trace_path(ln_t, sum_t, found, ei, ej, params.max_step)
        else:
            found, ei, ej, si, sj, ln = _dp_scan(sims, nodes, params)
            consumed = None
        in_box = (
            (row_ids >= si[:, None, None])
            & (row_ids <= ei[:, None, None])
            & (col_ids >= sj[:, None, None])
            & (col_ids <= ej[:, None, None])
        )
        # Remove the consumed node cells so later paths cannot reuse
        # them: the whole bounding box ("box", fast default) or just
        # the path's own cells ("path", VCSL-faithful).
        if consumed is None:
            consumed = in_box
        new_nodes = nodes & ~(consumed & found[:, None, None])
        # Score: max similarity inside the box.
        box_max = jnp.max(
            jnp.where(in_box, sims, NEG_INF), axis=(1, 2)
        )
        box = jnp.stack([si, sj, ei, ej], axis=1)
        return new_nodes, (box, found, box_max)

    _, (boxes, valid, scores) = jax.lax.scan(extract, nodes0, None, length=p)
    boxes = jnp.moveaxis(boxes, 0, 1)  # [P, B, ...] → [B, P, ...]
    valid = jnp.moveaxis(valid, 0, 1)
    scores = jnp.moveaxis(scores, 0, 1)

    if params.max_iou < 1.0:
        # Sequential IoU dedup (VCSL max_iou): box p is emitted only if
        # its overlap with every previously-emitted box is <= max_iou.
        # Rejected paths stay consumed and still used an iteration.
        kept = []
        for i in range(p):
            ok = valid[:, i]
            for q_idx in range(i):
                iou = _box_iou(boxes[:, i], boxes[:, q_idx])
                ok = ok & ~(kept[q_idx] & (iou > params.max_iou))
            kept.append(ok)
        valid = jnp.stack(kept, axis=1)

    return boxes, valid, scores
