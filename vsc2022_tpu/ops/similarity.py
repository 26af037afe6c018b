"""Exact brute-force similarity search on TPU — the FAISS replacement.

The reference delegates retrieval to FAISS ``IndexFlat`` +
``range_search_max_results`` (reference: vsc/index.py:142-165): an
adaptive-radius search whose *result* is exactly the global top-k of the
full query-frame × ref-frame score matrix. Here that is computed
natively:

  * A jit-compiled streaming pass tiles the score matrix: for each
    (query block, ref block) tile, a matmul runs on the MXU and a
    per-row running top-κ is maintained — the full matrix is never
    materialized in HBM.
  * Global-k semantics are recovered by flattening per-row survivors,
    taking the global k-th candidate score τ, and exactly recomputing
    any row that could be missing an entry ≥ τ. Which rows those are
    is decided from the collection's own structural guarantees — no
    extra pass over the corpus:
      - a row whose κ-th kept score ≥ τ may have been truncated (every
        candidate dropped from its running top-κ was ≤ that score);
      - under approximate collection (best-2 per lane segment), an
        uncollected entry is ≤ its segment's second-best, so a row can
        hide entries ≥ τ only where two kept candidates ≥ τ share a
        segment.
    Flagged rows get an exact recompute (a small matmul over just
    those rows). This yields the exact global top-k set, like FAISS's
    adaptive radius iteration, at ~half the device work of the
    count-every-row verification used through round 2 (the count pass
    re-ran the full corpus matmul).

Metrics: inner product (the production path) and squared L2 (FAISS
``METRIC_L2`` parity, used in reference tests; tests/test_index.py:44).
All ranking happens on an internal "goodness" scale where larger is
always better (negated squared distance for L2).
"""

from __future__ import annotations

import functools
import logging
import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vsc2022_tpu.utils.transfer import start_host_copy

NEG_INF = float("-inf")


def _use_pallas_kernels() -> bool:
    """Opt-in Pallas kernel routing. VSC2022_TPU_USE_PALLAS=1 routes on
    a TPU backend; =interpret routes through the Pallas interpreter on
    any backend (tests). Checked at trace time — flipping the env var
    after a shape has compiled will not retrace (see
    ops/pallas_kernels.py header for the relay-environment caveat)."""
    flag = os.environ.get("VSC2022_TPU_USE_PALLAS", "")
    if flag == "1":
        return jax.default_backend() == "tpu"
    return flag == "interpret"


def _pallas_interpret() -> bool:
    return os.environ.get("VSC2022_TPU_USE_PALLAS") == "interpret"

# Default tile sizes: MXU-aligned. row_block bounds the [row, col] f32
# score intermediate (16384×8192 = 512 MB HBM); large rows-per-dispatch
# matters because every kernel dispatch pays host→device latency.
DEFAULT_ROW_BLOCK = 16384
DEFAULT_COL_BLOCK = 8192

# Pool-resident candidate collection (single-device approx path): the
# best POOL_SEG_KEEP entries of every POOL_SEG_LANES-lane segment are
# kept HBM-resident for the whole query set; selection then runs on the
# pool (a bit-level binary search for the exact global k-th, plus a
# cheap hierarchical extraction) instead of per-chunk lax.top_k merges
# — on this hardware top_k lowers to a full sort, measured ~14× the
# matmul it follows, and the merge sorts dominated collection time
# (~320 of 568 ms at [9000×1M×512]). The per-segment winners come from
# ONE variadic lax.reduce pass (a top-2 monoid over (value, id) pairs):
# the masked-argmax re-read formulation measured ~2× the data reads.
POOL_SEG_LANES = 128
POOL_SEG_KEEP = 2
# Pool HBM budget (values + ids, bytes). Above it the searcher falls
# back to the chunked-merge streaming collection. This static value is
# calibrated for f32 corpora near the single-chip ceiling (v5e 16 GB:
# 4M x 513 f32 rows = 8.2 GB leaves ~3 GiB after transients); when the
# runtime exposes memory_stats (real TPU), _pool_budget_bytes measures
# the actual headroom instead (fresh per deciding search — resident
# tables staged since the last measure must count) — a bf16/int8
# corpus frees HBM the pool can use, keeping large query blocks in
# the pooled regime.
POOL_BYTES_BUDGET = 3 << 30
# HBM reserved for the fused dispatch's transients when the budget is
# measured: two streamed [row_block, col_block] f32 score tiles
# (2 x 512 MB), packed extraction buffers, staged query rows, and
# compiler scratch.
POOL_HBM_RESERVE = 4 << 30
# Corpus floor for the pooled collection. Below it the chunked-merge
# streaming collection wins: the pool's serial selection machinery
# (k-th binary search, count passes, windowed extraction) has a fixed
# multi-pass cost that only amortizes once the per-chunk top_k merge
# sorts it replaces grow with the corpus — measured on the v5e bench
# workload (61k corpus: streaming ~0.35 s vs pooled ~0.9 s device
# compute) while the 1M point favors the pool ~1.9x. Override with
# VSC2022_TPU_COLLECTION=pooled|stream (tests pin both paths).
POOL_MIN_CORPUS = 1 << 18


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _check_keep_idx(keep_idx, n_refs: int) -> np.ndarray:
    """Validate a keep_rows survivor-index vector (shared between the
    single-device and sharded searchers so the contract can't drift)."""
    keep_idx = np.ascontiguousarray(keep_idx, dtype=np.int32)
    assert keep_idx.ndim == 1, keep_idx.shape
    if keep_idx.size:
        assert keep_idx[0] >= 0 and keep_idx[-1] < n_refs, (
            int(keep_idx[0]), int(keep_idx[-1]), n_refs,
        )
        assert np.all(np.diff(keep_idx) > 0), "keep_idx must increase"
    return keep_idx


def _pad_keep_idx(keep_idx: np.ndarray, n_pad: int) -> np.ndarray:
    """Pad the gather index with row 0 (any in-range row); the tail is
    zeroed inside the gather so `append_rows`'s rows-past-n_valid-are-
    zero invariant survives compaction."""
    idx = np.zeros((n_pad,), dtype=np.int32)
    idx[: keep_idx.size] = keep_idx
    return idx


def _compact_gather(refs, idx, *, n_pad: int, new_total: int):
    """Gather survivors onto the fresh-stage layout, zero tail."""
    out = jnp.take(refs, idx, axis=0)
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0) < new_total
    )
    return jnp.where(valid, out, jnp.zeros((), out.dtype))


def _pad_axis0(a: np.ndarray, n: int) -> np.ndarray:
    if a.shape[0] == n:
        return a
    pad = np.zeros((n - a.shape[0],) + a.shape[1:], dtype=a.dtype)
    return np.concatenate([a, pad], axis=0)


# Re-exported here so the drain call sites (and the profiler's
# serial-pull A/B monkeypatch) resolve through this module's namespace.
_start_host_copy = start_host_copy


def _compute_dtype(refs):
    """The dtype QUERIES compute in against this corpus: the corpus
    dtype for float storage, f32 for int8 storage (queries are never
    quantized — only the refs operand upcasts inside each dot)."""
    return jnp.float32 if refs.dtype == jnp.int8 else refs.dtype


def quantize_rows_int8(rows: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int8 quantization: scale = max|row| / 127.

    The int8 storage tier (``dtype="int8"``, the TPU-native analog of
    FAISS's SQ8 scalar quantizer — reference: vsc/index.py:82's
    ``codec_str`` reaches faiss.index_factory, where "SQ8" is the
    standard 8-bit codec). Scores are defined over the DEQUANTIZED
    corpus: s[i, j] = (q[i] · int8[j]) * scale[j], computed exactly
    that way on device (f32 accumulation, one scale multiply on the
    output column), so the brute-force oracle over the dequantized
    rows reproduces them bit-for-bit. Per-row scales keep ``append``
    quantizer-free: new rows bring their own scale, nothing is
    clipped against a frozen training-time range."""
    rows = np.ascontiguousarray(rows, dtype=np.float32)
    amax = (
        np.abs(rows).max(axis=1)
        if rows.shape[1] and rows.shape[0]
        else np.zeros((rows.shape[0],), np.float32)
    )
    scale = (amax / 127.0).astype(np.float32)
    inv = np.where(scale > 0, 1.0 / scale, 0.0).astype(np.float32)
    q = np.clip(np.rint(rows * inv[:, None]), -127, 127).astype(np.int8)
    return q, scale


def streaming_topk(
    q: jax.Array,  # [M, D] f32 (padded rows allowed; caller discards)
    refs: jax.Array,  # [N_pad, D] f32, padded with zero rows
    n_valid: jax.Array,  # scalar int32: number of valid ref rows
    ref_sq: jax.Array,  # [N_pad] f32 squared norms (zeros if metric == "IP")
    kappa: int,
    col_block: int,
    metric: str,
    precision: str,
    base: int | jax.Array = 0,  # global index offset (corpus sharding)
    varying_axes: Tuple[str, ...] = (),  # mesh axes this shard varies over
    approx: bool = False,  # use approx_max_k for block candidates
    block_ids: Optional[jax.Array] = None,  # [B] int32: scan ONLY these
) -> Tuple[jax.Array, jax.Array]:
    """Per-row top-κ of q·refsᵀ (goodness scale), streaming over ref blocks.

    Traceable (no jit) so it can run inside shard_map; ``base`` offsets
    returned indices for corpus shards, and ``varying_axes`` marks the
    scan carry as device-varying for shard_map's vma type check. Returns
    (scores [M, κ] desc, global indices [M, κ]).

    ``block_ids`` (traced, shape-static) restricts the scan to a block
    subset — the IVF pruned tier's collection primitive. Sentinel
    entries equal to n_blocks (one past the last block) are safe: their
    scores mask to −inf exactly like the ragged-chunk padding, so the
    caller can pad the subset to a fixed shape without recompiling per
    subset size. Candidate slots that never saw a finite score may
    carry arbitrary indices — the same contract every approx path here
    already has.
    """
    m = q.shape[0]
    n_pad = refs.shape[0]
    n_blocks = n_pad // col_block
    n_scan = n_blocks if block_ids is None else block_ids.shape[0]
    prec = jax.lax.Precision(precision)

    if (
        approx
        and metric == "IP"
        and not varying_axes
        and block_ids is None
        and _use_pallas_kernels()
    ):
        # Fused Pallas path: matmul + top-κ collection in VMEM, the
        # [M, col_block] score blocks never reach HBM. Candidates are
        # approximate (best 2 per 128-column segment per tile) exactly
        # like the approx_max_k path; global_topk's count-verify pass
        # restores exactness either way.
        from vsc2022_tpu.ops.pallas_kernels import fused_topk

        kp = min(kappa, n_pad)
        top_s, top_i = fused_topk(
            q, refs, n_valid, kp, interpret=_pallas_interpret()
        )
        if kp < kappa:  # keep the [M, κ] contract
            pad_cols = kappa - kp
            top_s = jnp.pad(
                top_s, ((0, 0), (0, pad_cols)), constant_values=NEG_INF
            )
            top_i = jnp.pad(top_i, ((0, 0), (0, pad_cols)))
        return top_s, top_i + base

    if metric == "L2":
        q32 = q.astype(jnp.float32)
        q_sq = jnp.sum(q32 * q32, axis=1)
    else:
        q_sq = None

    def block_scores(block_idx):
        """Masked goodness scores for one block + its start column.

        Column ids are never materialized as an [m, col_block] tensor:
        they are consecutive (start..start+col_block), so every
        consumer reconstructs them arithmetically from local offsets —
        a take_along_axis gather over a tensor this wide measured ~5×
        the cost of everything else in the collection combined."""
        start = block_idx * col_block
        r_blk = jax.lax.dynamic_slice_in_dim(refs, start, col_block, axis=0)
        if metric == "IP8":  # int8 storage: upcast fuses into the dot
            r_blk = r_blk.astype(jnp.float32)
        s = jnp.dot(q, r_blk.T, precision=prec, preferred_element_type=jnp.float32)
        if metric == "L2":
            rs = jax.lax.dynamic_slice_in_dim(ref_sq, start, col_block, axis=0)
            # goodness = -||q - r||² = 2 q·r − ||r||² − ||q||²
            s = 2.0 * s - rs[None, :] - q_sq[:, None]
        elif metric == "IP8":
            # ref_sq carries the per-row dequantization scales; one
            # output-column multiply restores real similarity values.
            sc = jax.lax.dynamic_slice_in_dim(ref_sq, start, col_block, axis=0)
            s = s * sc[None, :]
        in_range = jax.lax.broadcasted_iota(jnp.int32, (m, col_block), 1) < (
            n_valid - start
        )
        s = jnp.where(in_range, s, NEG_INF)
        return s, start

    seg_pool = 2 * n_scan * (col_block // min(128, col_block))
    if (
        approx
        and kappa > 1
        and col_block % min(128, col_block) == 0
        and seg_pool >= kappa
    ):
        # Sort-free candidate collection: per block, keep the best two
        # entries of every 128-lane segment (cheap VPU max/argmax — XLA
        # top_k/approx_max_k lower to full sorts on this hardware,
        # measured 14× slower than the matmul they follow). Segment
        # winners accumulate into a bounded per-row pool (≤ ~4096 wide);
        # one top_k merges each full pool into the running top-κ carry —
        # sort work amortizes to a few passes per block, and memory
        # stays O(M·pool) regardless of corpus size (a flat pool over
        # all blocks would be O(M·N/64): ~5 GB at VSC scale). Recall
        # matches the approx_max_k contract; the caller's count-verify
        # pass restores exactness either way.
        seg_lanes = min(128, col_block)
        seg = col_block // seg_lanes
        chunk_blocks = max(1, min(n_scan, 4096 // (2 * seg)))
        n_chunks = -(-n_scan // chunk_blocks)
        # Out-of-range block ids in the ragged last chunk are safe:
        # their col_ids exceed n_valid, so every score masks to −inf.
        if block_ids is None:
            scan_grid = jnp.arange(n_chunks * chunk_blocks)
        else:
            scan_grid = jnp.concatenate([
                block_ids.astype(jnp.int32),
                jnp.full(
                    (n_chunks * chunk_blocks - n_scan,), n_blocks,
                    jnp.int32,
                ),
            ])
        scan_grid = scan_grid.reshape(n_chunks, chunk_blocks)

        def seg_best2(block_idx):
            # Gather-free: values via max, ids via argmax + segment-base
            # arithmetic (ids within a block are consecutive). The
            # take_along_axis formulation of the same reduction measured
            # ~5× slower on TPU (gather over [m, seg, lanes]).
            s, start = block_scores(block_idx)
            s3 = s.reshape(m, seg, seg_lanes)
            m1 = jnp.max(s3, axis=2)
            a1 = jnp.argmax(s3, axis=2).astype(jnp.int32)
            lane = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 2)
            s3b = jnp.where(lane == a1[:, :, None], NEG_INF, s3)
            m2 = jnp.max(s3b, axis=2)
            a2 = jnp.argmax(s3b, axis=2).astype(jnp.int32)
            seg_base = (
                base + start
                + jnp.arange(seg, dtype=jnp.int32)[None, :] * seg_lanes
            )
            return (
                jnp.concatenate([m1, m2], axis=1),
                jnp.concatenate([seg_base + a1, seg_base + a2], axis=1),
            )

        dummy = jnp.zeros((), jnp.int32)
        if varying_axes:
            dummy = jax.lax.pcast(dummy, varying_axes, to="varying")

        def collect_pool(chunk):
            def inner(c2, bi):
                return c2, seg_best2(bi)

            _, (pool_s, pool_i) = jax.lax.scan(inner, dummy, chunk)
            return (
                jnp.moveaxis(pool_s, 0, 1).reshape(m, -1),
                jnp.moveaxis(pool_i, 0, 1).reshape(m, -1),
            )

        if n_chunks == 1:
            # Whole corpus fits one pool: single top_k, no merge loop.
            pool_s, pool_i = collect_pool(scan_grid[0])
            top_s, sel = jax.lax.top_k(pool_s, kappa)
            return top_s, jnp.take_along_axis(pool_i, sel, axis=1)

        def chunk_step(carry, chunk):
            top_s, top_i = carry
            pool_s, pool_i = collect_pool(chunk)
            merged_s = jnp.concatenate([top_s, pool_s], axis=1)
            merged_i = jnp.concatenate([top_i, pool_i], axis=1)
            new_s, sel = jax.lax.top_k(merged_s, kappa)
            new_i = jnp.take_along_axis(merged_i, sel, axis=1)
            return (new_s, new_i), None

        init = (
            jnp.full((m, kappa), NEG_INF, dtype=jnp.float32),
            jnp.zeros((m, kappa), dtype=jnp.int32),
        )
        if varying_axes:
            init = tuple(
                jax.lax.pcast(x, varying_axes, to="varying") for x in init
            )
        (top_s, top_i), _ = jax.lax.scan(chunk_step, init, scan_grid)
        return top_s, top_i

    def body(carry, block_idx):
        top_s, top_i = carry
        s, start = block_scores(block_idx)

        k_blk = min(kappa, col_block)
        if k_blk == 1:
            # Fast path for NN search: a max-reduce, no sort.
            blk_s = jnp.max(s, axis=1, keepdims=True)
            blk_j = jnp.argmax(s, axis=1)[:, None]
        else:
            blk_s, blk_j = jax.lax.top_k(s, k_blk)
        # Block-local → global ids arithmetically (consecutive columns).
        blk_i = blk_j.astype(jnp.int32) + (base + start)

        merged_s = jnp.concatenate([top_s, blk_s], axis=1)
        merged_i = jnp.concatenate([top_i, blk_i], axis=1)
        new_s, sel = jax.lax.top_k(merged_s, kappa)
        new_i = jnp.take_along_axis(merged_i, sel, axis=1)
        return (new_s, new_i), None

    init = (
        jnp.full((m, kappa), NEG_INF, dtype=jnp.float32),
        jnp.zeros((m, kappa), dtype=jnp.int32),
    )
    if varying_axes:
        init = tuple(
            jax.lax.pcast(x, varying_axes, to="varying") for x in init
        )
    (top_s, top_i), _ = jax.lax.scan(
        body, init,
        jnp.arange(n_blocks) if block_ids is None
        else block_ids.astype(jnp.int32),
    )
    return top_s, top_i


_block_topk = jax.jit(
    streaming_topk,
    static_argnames=("kappa", "col_block", "metric", "precision", "approx"),
)


def streaming_count_above(
    q: jax.Array,  # [M, D]
    refs: jax.Array,  # [N_pad, D]
    n_valid: jax.Array,
    ref_sq: jax.Array,
    tau: jax.Array,  # scalar f32 threshold (goodness scale)
    col_block: int,
    metric: str,
    precision: str,
    varying_axes: Tuple[str, ...] = (),
    block_ids: Optional[jax.Array] = None,  # [B] int32: count ONLY these
) -> jax.Array:
    """Exact per-row count of entries with goodness ≥ τ (streaming).

    The exactness oracle for approximate candidate collection: a row
    whose count exceeds its kept-candidates-above-τ count was truncated
    (or the approx pass missed entries) and must be recomputed. One
    matmul pass, no sorts.

    ``block_ids`` restricts the count to a block subset. The caller
    owns the proof that skipped blocks contribute zero (the IVF tier's
    per-block score upper bound < τ); sentinel entries == n_blocks pad
    the subset shape and count nothing."""
    m = q.shape[0]
    n_blocks = refs.shape[0] // col_block
    prec = jax.lax.Precision(precision)
    if metric == "L2":
        q32 = q.astype(jnp.float32)
        q_sq = jnp.sum(q32 * q32, axis=1)
    else:
        q_sq = None

    def body(counts, block_idx):
        start = block_idx * col_block
        r_blk = jax.lax.dynamic_slice_in_dim(refs, start, col_block, axis=0)
        if metric == "IP8":
            r_blk = r_blk.astype(jnp.float32)
        s = jnp.dot(q, r_blk.T, precision=prec, preferred_element_type=jnp.float32)
        if metric == "L2":
            rs = jax.lax.dynamic_slice_in_dim(ref_sq, start, col_block, axis=0)
            s = 2.0 * s - rs[None, :] - q_sq[:, None]
        elif metric == "IP8":
            sc = jax.lax.dynamic_slice_in_dim(ref_sq, start, col_block, axis=0)
            s = s * sc[None, :]
        in_range = jax.lax.broadcasted_iota(jnp.int32, (m, col_block), 1) < (
            n_valid - start
        )
        above = (s >= tau) & in_range
        return counts + jnp.sum(above, axis=1, dtype=jnp.int32), None

    init = jnp.zeros((m,), dtype=jnp.int32)
    if varying_axes:
        init = jax.lax.pcast(init, varying_axes, to="varying")
    counts, _ = jax.lax.scan(
        body, init,
        jnp.arange(n_blocks) if block_ids is None
        else block_ids.astype(jnp.int32),
    )
    return counts


def _f32_sort_key(x: jax.Array) -> jax.Array:
    """Monotone f32 → uint32 key (IEEE total order over non-NaN):
    positives get the sign bit set, negatives bit-flip — standard radix
    trick. Key 0 is unreachable for real scores (only a negative NaN
    maps there), so 0 is free as the invalid-slot sentinel."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jnp.where(u >> 31, ~u, u | jnp.uint32(0x80000000))


def _key_to_f32(key: jax.Array) -> jax.Array:
    u = jnp.where(key >> 31, key & jnp.uint32(0x7FFFFFFF), ~key)
    return jax.lax.bitcast_convert_type(u, jnp.float32)


def pooled_candidates(
    q: jax.Array,  # [M, D] (row-padded; padding rows yield junk, sliced off)
    refs: jax.Array,  # [N_pad, D]
    n_valid: jax.Array,  # scalar int32
    ref_sq: jax.Array,  # [N_pad] (L2 only)
    n_rows: jax.Array,  # scalar int32: valid query rows
    k_eff: jax.Array,  # scalar int32: the global k
    kappa: int,
    col_block: int,
    metric: str,
    precision: str,
    row_block: int = DEFAULT_ROW_BLOCK,
    seg_lanes: int = POOL_SEG_LANES,
    seg_keep: int = POOL_SEG_KEEP,
    debug_stage: str = "",  # "pool" | "tau": early-exit for profiling
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Sort-free global candidate phase over an HBM-resident winner
    pool. Replaces the chunked lax.top_k merges of the streaming
    collection (each merge is a full sort — measured the dominant cost
    at corpus scale, ~320 of 568 ms at [9000×1M×512] vs an 82 ms
    matmul floor):

      1. One streamed pass computes the scores and keeps the best
         ``seg_keep`` (=2) entries of every ``seg_lanes``-lane segment
         via a single variadic lax.reduce over (value, global-id)
         pairs — a top-2 monoid merge, one read of the score tile, no
         masked re-reads — and writes them into an HBM pool [M, P]
         (P = seg_keep·N_pad/seg_lanes) carried through the scan (no
         stacked-ys transpose).
      2. The exact global k-th pool score τ comes from a 32-step
         binary search on the monotone uint32 key image — 32 cheap
         masked count passes over the pool, no sort. Exact per-row
         ≥τ pool counts fall out of one more pass.
      3. Extraction: the pool reduces best-2 per (narrow) position
         window, then one narrow exact top-κ. Any extraction miss is
         caught by the per-row pool counts (host: kept ≠ count → exact
         row repair), so extraction needs no structural guarantee of
         its own.

    Returns (top_s [M, κ], top_i [M, κ], pool_counts [M], τ, amb [M],
    pool_v [M, P], pool_i [M, P]). Exactness contract for the host
    verify: a corpus entry ≥ τ missing from the pool implies all
    ``seg_keep`` pool entries of its segment are ≥ τ — witnessed
    exactly by that row's in-dispatch ambiguity count ``amb`` — and a
    pool entry ≥ τ missing from the extraction implies kept <
    pool_count. Rows with amb == 0 therefore repair straight from the
    returned device-resident pool (no corpus rescan); only amb > 0
    rows need a corpus count, and only counts exceeding the pool count
    (≥ seg_keep+1 entries ≥ τ in one segment) need a corpus re-search.
    """
    m = q.shape[0]
    n_pad = refs.shape[0]
    pool_per_block = seg_keep * (col_block // seg_lanes)

    # The fused Pallas pool writer (VSC2022_TPU_POOL_PALLAS=1 on TPU;
    # =interpret runs it through the Pallas interpreter on any backend,
    # for tests) is OPT-IN: measured same-process at [9000x1M.512] it
    # builds the pool in 441 ms vs 302 ms for the XLA carry-scan below
    # (v5e, jax 0.8 Mosaic) — per-grid-step overhead at 17k steps
    # outweighs the HBM round trip it saves. Exactness is guarded by
    # the pool count-verify under either builder.
    pool_flag = os.environ.get("VSC2022_TPU_POOL_PALLAS", "")
    band_variant = pool_flag in ("band", "interpret_band")
    use_kernel = (
        metric == "IP"
        # v1 carries corpus ids through an f32 placement matmul —
        # exact only below 2^24; the band variant rides int32 ids and
        # has no such ceiling.
        and (band_variant or n_pad < (1 << 24))
        and (
            pool_flag in ("interpret", "interpret_band")
            or (
                pool_flag in ("1", "band")
                and jax.default_backend() == "tpu"
            )
        )
    )
    if use_kernel:
        # Fused Pallas pool writer: the scores never touch HBM (the
        # XLA scan below is bandwidth-bound at ~3.5× the matmul time).
        # Tile-major pool layout, same best-2-per-128 guarantee.
        # =band selects the banded rewrite (inner-tiled grid, static
        # band stores — built against v1's measured per-grid-step
        # overhead at 1M scale).
        from vsc2022_tpu.ops.pallas_kernels import (
            POOL_COL_TILE,
            POOL_ROW_TILE,
            POOL_TILES_PER_BAND,
            pool_writer,
            pool_writer_band,
        )

        m_pad = _ceil_to(m, POOL_ROW_TILE)
        n_kpad = _ceil_to(n_pad, POOL_TILES_PER_BAND * POOL_COL_TILE)
        qk = q if m_pad == m else jnp.pad(q, ((0, m_pad - m), (0, 0)))
        rk = refs if n_kpad == n_pad else jnp.pad(
            refs, ((0, n_kpad - n_pad), (0, 0))
        )
        writer = pool_writer_band if band_variant else pool_writer
        pv, pi = writer(
            qk.astype(refs.dtype), rk, n_valid, precision=precision,
            interpret=pool_flag.startswith("interpret"),
        )
        sel = _pool_select(
            pv, pi, m_pad, n_rows, k_eff, kappa,
            2 * (POOL_COL_TILE // seg_lanes), debug_stage,
        )
        return (*sel, pv, pi) if not debug_stage else sel

    pv, pi = pool_build_xla(
        q, refs, n_valid, ref_sq, col_block=col_block, metric=metric,
        precision=precision, row_block=row_block, seg_lanes=seg_lanes,
        seg_keep=seg_keep,
    )
    sel = _pool_select(
        pv, pi, m, n_rows, k_eff, kappa, pool_per_block, debug_stage
    )
    return (*sel, pv, pi) if not debug_stage else sel


def pool_build_xla(
    q: jax.Array,  # [M, D]
    refs: jax.Array,  # [N_pad, D] (a corpus shard under shard_map)
    n_valid: jax.Array,  # scalar int32: valid rows of THIS refs array
    ref_sq: jax.Array,  # [N_pad] (L2 only)
    col_block: int,
    metric: str,
    precision: str,
    row_block: int = DEFAULT_ROW_BLOCK,
    base: "int | jax.Array" = 0,  # global index offset (corpus sharding)
    varying_axes: Tuple[str, ...] = (),
    seg_lanes: int = POOL_SEG_LANES,
    seg_keep: int = POOL_SEG_KEEP,
    seg_impl: "str | None" = None,  # "nat" | "vred" (None: env/default)
) -> Tuple[jax.Array, jax.Array]:
    """The winner-pool build: one streamed pass keeping the best-2
    (value, global id) of every ``seg_lanes``-lane segment in an HBM
    pool [M, P]. Traceable (no jit) so it runs inside shard_map —
    ``base`` offsets ids for corpus shards, ``varying_axes`` marks the
    scan carry device-varying. Query rows stream through row blocks
    (still one traced graph).

    Two segment-top-2 formulations (``seg_impl`` /
    ``VSC2022_TPU_POOL_SEG``): ``vred`` is an 8-ary variadic 4-tuple
    (value, id) monoid reduce — one pass over the score tile, but the
    tuple combiner's cross-lane shuffle tree carries four arrays;
    ``nat`` computes max → argmax → masked re-max with NATIVE
    single-array lane reduces and derives global ids arithmetically
    from the local argmax, so no global-id iota tensors ride the
    reduction at all. Internal TIE choices may differ between the two
    (reduction order vs first-index); e2e candidate exactness incl.
    tie-breaks is enforced downstream by the pool count-verify + exact
    recompute, which the fuzz pins under both."""
    n_pad = refs.shape[0]
    n_blocks = n_pad // col_block
    seg = col_block // seg_lanes
    pool_per_block = seg_keep * seg
    p_total = n_blocks * pool_per_block
    prec = jax.lax.Precision(precision)
    if seg_impl is None:
        seg_impl = os.environ.get("VSC2022_TPU_POOL_SEG", "vred")

    def seg_top2_nat(s3):
        """Best-2 per segment as four native lane reduces with LOCAL
        index results (global ids derive arithmetically)."""
        m1 = jnp.max(s3, axis=2)
        a1 = jnp.argmax(s3, axis=2).astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 2)
        s3m = jnp.where(lane == a1[..., None], NEG_INF, s3)
        m2 = jnp.max(s3m, axis=2)
        a2 = jnp.argmax(s3m, axis=2).astype(jnp.int32)
        return m1, a1, m2, a2

    def seg_top2(s3, gid3):
        """Best-2 (value, id) per segment in ONE pass: an 8-ary
        variadic reduce whose combiner merges two sorted top-2 sets.
        Element lift: (v, i) → (v, i, −inf, 0)."""

        def comb(acc, x):
            am1, aa1, am2, aa2 = acc
            bm1, ba1, bm2, ba2 = x
            a_first = am1 >= bm1
            m1 = jnp.where(a_first, am1, bm1)
            a1 = jnp.where(a_first, aa1, ba1)
            lo = jnp.where(a_first, bm1, am1)  # loser of the firsts
            lo_i = jnp.where(a_first, ba1, aa1)
            sec = jnp.where(a_first, am2, bm2)  # winner's second
            sec_i = jnp.where(a_first, aa2, ba2)
            take_lo = lo >= sec
            return (
                m1, a1,
                jnp.where(take_lo, lo, sec),
                jnp.where(take_lo, lo_i, sec_i),
            )

        return jax.lax.reduce(
            (s3, gid3, jnp.full_like(s3, NEG_INF), jnp.zeros_like(gid3)),
            (jnp.float32(NEG_INF), jnp.int32(0),
             jnp.float32(NEG_INF), jnp.int32(0)),
            comb, (2,),
        )

    def pool_block(qb):
        mb = qb.shape[0]
        if metric == "L2":
            qb32 = qb.astype(jnp.float32)
            q_sq_b = jnp.sum(qb32 * qb32, axis=1)

        def col_body(carry, block_idx):
            pool_v, pool_i = carry
            start = block_idx * col_block
            r_blk = jax.lax.dynamic_slice_in_dim(
                refs, start, col_block, axis=0
            )
            if metric == "IP8":
                r_blk = r_blk.astype(jnp.float32)
            s = jnp.dot(qb, r_blk.T, precision=prec,
                        preferred_element_type=jnp.float32)
            if metric == "L2":
                rs = jax.lax.dynamic_slice_in_dim(
                    ref_sq, start, col_block, axis=0
                )
                s = 2.0 * s - rs[None, :] - q_sq_b[:, None]
            elif metric == "IP8":
                sc = jax.lax.dynamic_slice_in_dim(
                    ref_sq, start, col_block, axis=0
                )
                s = s * sc[None, :]
            in_range = jax.lax.broadcasted_iota(
                jnp.int32, (mb, col_block), 1
            ) < (n_valid - start)
            s = jnp.where(in_range, s, NEG_INF)
            s3 = s.reshape(mb, seg, seg_lanes)
            if seg_impl == "nat":
                m1, a1l, m2, a2l = seg_top2_nat(s3)
                seg_base = base + start + seg_lanes * (
                    jax.lax.broadcasted_iota(jnp.int32, (mb, seg), 1)
                )
                a1, a2 = seg_base + a1l, seg_base + a2l
            else:
                gid3 = base + start + (
                    jax.lax.broadcasted_iota(
                        jnp.int32, s3.shape, 1
                    ) * seg_lanes
                    + jax.lax.broadcasted_iota(jnp.int32, s3.shape, 2)
                )
                m1, a1, m2, a2 = seg_top2(s3, gid3)
            pool_v = jax.lax.dynamic_update_slice(
                pool_v, jnp.concatenate([m1, m2], axis=1),
                (0, block_idx * pool_per_block),
            )
            pool_i = jax.lax.dynamic_update_slice(
                pool_i, jnp.concatenate([a1, a2], axis=1),
                (0, block_idx * pool_per_block),
            )
            return (pool_v, pool_i), None

        init = (
            jnp.full((mb, p_total), NEG_INF, jnp.float32),
            jnp.zeros((mb, p_total), jnp.int32),
        )
        if varying_axes:
            init = tuple(
                jax.lax.pcast(x, varying_axes, to="varying") for x in init
            )
        (pv_b, pi_b), _ = jax.lax.scan(
            col_body, init, jnp.arange(n_blocks)
        )
        return pv_b, pi_b

    return _scan_row_blocks(pool_block, q, row_block)


def _pool_select(pv, pi, m, n_rows, k_eff, kappa, pair_chunk,
                 debug_stage="", axis_name=None):
    """Selection over an HBM-resident winner pool [M, P]: the exact
    global k-th threshold (bit-level binary search, no sort), exact
    per-row ≥τ counts, per-row ambiguity counts, and candidate
    extraction (hierarchical reduce + one narrow exact top-κ). Shared
    by the XLA-scan and Pallas pool builders; see pooled_candidates
    for the exactness contract.

    ``pair_chunk`` describes the slot layout: the pool is a run of
    chunks of that width, each holding its segments' first-slot values
    in the front half and second-slot values in the back half. The
    ambiguity count ``amb`` is the number of segments whose BOTH slots
    are ≥ τ — the exact per-row witness that a corpus entry ≥ τ could
    have been displaced from the pool (displacement needs two better
    entries, themselves then ≥ τ). Rows with amb == 0 have pool_count
    == exact corpus count, so any deficit repairs from the pool alone
    with no corpus rescan.

    ``axis_name`` runs the same selection across a corpus mesh inside
    shard_map, with ``pv``/``pi`` the local shard pool: the segments
    partition the global corpus, so every count (binary-search counts,
    per-row counts, ambiguity) psums over ICI, and the extraction
    merges per-shard top-κ with one all-gather — exactly the streaming
    merge's traffic shape, O(M·κ·n_dev)."""
    p_total = pv.shape[1]
    if axis_name is None:
        _allsum = lambda x, **kw: jnp.sum(x, **kw)  # noqa: E731
    else:
        _allsum = lambda x, **kw: jax.lax.psum(  # noqa: E731
            jnp.sum(x, **kw), axis_name
        )
    if debug_stage == "pool":
        z = jnp.sum(pv) + jnp.sum(pi).astype(jnp.float32)
        return z, z, z, z, z

    # --- exact global k-th over the pool (bit-level binary search) ----
    row_valid = (
        jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) < n_rows
    )

    def valid_mask():
        return (pv > NEG_INF) & row_valid

    total_valid = _allsum(valid_mask(), dtype=jnp.int32)

    def search_body(_, carry):
        # uint32 bounds; hi starts at +inf's key so hi−lo+1 never wraps.
        lo, hi = carry
        mid = lo + (hi - lo + jnp.uint32(1)) // jnp.uint32(2)
        cnt = _allsum(
            (_f32_sort_key(pv) >= mid) & valid_mask(), dtype=jnp.int32
        )
        take = cnt >= k_eff
        return (
            jnp.where(take, mid, lo),
            jnp.where(take, hi, mid - jnp.uint32(1)),
        )

    # 24 of the 32 key bits suffice: the remaining slack admits only
    # candidates within 2^8 ULP below the true k-th — a negligible
    # over-collection the host's final exact cut absorbs (τ̂ ≤ τ* holds
    # by construction: the count at the returned key is ≥ k).
    tau_key, _ = jax.lax.fori_loop(
        0, 24, search_body,
        (jnp.uint32(0), _f32_sort_key(jnp.float32(jnp.inf))),
    )
    tau = jnp.where(
        total_valid < k_eff, NEG_INF, _key_to_f32(tau_key)
    )
    counts = _allsum(
        (_f32_sort_key(pv) >= tau_key) & valid_mask(),
        axis=1, dtype=jnp.int32,
    )
    # Ambiguity: segments whose second slot is also ≥ τ. Slot pairs sit
    # (pos j, pos j + pair_chunk/2) within each pair_chunk-wide run.
    above = ((_f32_sort_key(pv) >= tau_key) & valid_mask()).reshape(
        m, p_total // pair_chunk, POOL_SEG_KEEP, pair_chunk // POOL_SEG_KEEP
    )
    amb = _allsum(jnp.all(above, axis=2), axis=(1, 2), dtype=jnp.int32)
    if debug_stage == "tau":
        return tau, tau, counts.astype(jnp.float32).sum(), tau, amb.sum()

    # --- extraction: hierarchical reduce + one narrow exact top-k -----
    # Window width trades the final sort against extraction recall
    # (a miss costs a row repair): 16 positions ≈ 1 kB of corpus per
    # window keeps the 3-hits-in-one-window collision rate ≈0.5% per
    # row at the production score density. Windows of ≤ 64 positions
    # never span a block's m1/m2 halves. Adapt down for small pools
    # (reduced width ≥ ~4κ) and up for huge ones (sort ≤ ~8k wide).
    red_lanes = 16
    while red_lanes < 128 and 2 * p_total // red_lanes > 8192:
        red_lanes *= 2
    while red_lanes > 2 and p_total < 2 * kappa * red_lanes:
        red_lanes //= 2
    p_pad = _ceil_to(p_total, red_lanes)
    if red_lanes <= 2 or p_pad <= max(2 * kappa, 512):
        # Tiny pool: sort it directly.
        kx = min(kappa, p_total)
        top_s, sel = jax.lax.top_k(pv, kx)
        top_i = jnp.take_along_axis(pi, sel, axis=1)
    else:
        pvp = pv if p_pad == p_total else jnp.pad(
            pv, ((0, 0), (0, p_pad - p_total)), constant_values=NEG_INF
        )
        r = p_pad // red_lanes
        v3 = pvp.reshape(m, r, red_lanes)
        lane3 = jax.lax.broadcasted_iota(jnp.int32, v3.shape, 2)
        m1 = jnp.max(v3, axis=2)
        a1 = jnp.argmax(v3, axis=2).astype(jnp.int32)
        v3b = jnp.where(lane3 == a1[:, :, None], NEG_INF, v3)
        m2 = jnp.max(v3b, axis=2)
        a2 = jnp.argmax(v3b, axis=2).astype(jnp.int32)
        base = jnp.arange(r, dtype=jnp.int32)[None, :] * red_lanes
        red_v = jnp.concatenate([m1, m2], axis=1)
        red_p = jnp.concatenate([base + a1, base + a2], axis=1)
        kx = min(kappa, red_v.shape[1])
        top_s, sel = jax.lax.top_k(red_v, kx)
        top_pos = jnp.take_along_axis(red_p, sel, axis=1)
        # Pool position → corpus id (one small gather over the id pool;
        # positions beyond p_total hold −inf scores, id 0 is harmless).
        top_pos = jnp.minimum(top_pos, p_total - 1)
        top_i = jnp.take_along_axis(pi, top_pos, axis=1)
    if axis_name is not None:
        # Per-shard extractions merge over ICI like the streaming path:
        # a shard entry ≥ τ dropped here (> kx on one shard, or > κ in
        # the union) always shows as kept < count on the host, so the
        # merged extraction keeps the pool-repair contract.
        all_s = jax.lax.all_gather(top_s, axis_name)
        all_i = jax.lax.all_gather(top_i, axis_name)
        all_s = jnp.moveaxis(all_s, 0, 1).reshape(m, -1)
        all_i = jnp.moveaxis(all_i, 0, 1).reshape(m, -1)
        kx = min(kappa, all_s.shape[1])
        top_s, sel = jax.lax.top_k(all_s, kx)
        top_i = jnp.take_along_axis(all_i, sel, axis=1)
    if kx < kappa:
        top_s = jnp.pad(
            top_s, ((0, 0), (0, kappa - kx)), constant_values=NEG_INF
        )
        top_i = jnp.pad(top_i, ((0, 0), (0, kappa - kx)))
    return top_s, top_i, counts, tau, amb


def _scan_row_blocks(fn, q: jax.Array, row_block: int):
    """Apply ``fn(q_block) -> pytree of [rb, ...]`` over row blocks of q
    via lax.scan, concatenating results along axis 0. Bounds the [rb,
    col_block] score intermediates for arbitrarily many query rows
    while staying inside ONE compiled dispatch. q rows must divide
    evenly into row_block (callers stage/pad accordingly)."""
    m = q.shape[0]
    if m <= row_block:
        return fn(q)
    assert m % row_block == 0, (m, row_block)
    q3 = q.reshape(m // row_block, row_block, *q.shape[1:])

    def body(carry, q_blk):
        return carry, fn(q_blk)

    _, out = jax.lax.scan(body, jnp.int32(0), q3)
    return jax.tree.map(
        lambda a: a.reshape(m, *a.shape[2:]), out
    )


def _candidates_core(
    q: jax.Array,  # [M_pad, D]
    refs: jax.Array,
    n_rows: jax.Array,  # scalar int32: valid query rows (≤ M_pad)
    n_valid: jax.Array,
    ref_sq: jax.Array,
    kappa: int,
    col_block: int,
    metric: str,
    precision: str,
    approx: bool,
    k_eff: jax.Array,  # scalar int32
    row_block: int = DEFAULT_ROW_BLOCK,
    block_ids: Optional[jax.Array] = None,  # restrict BOTH passes (IVF)
):
    """Whole candidate phase as one traceable graph: per-row top-κ and
    the global k-th threshold τ over valid rows — host↔device
    round-trips cost ~50 ms each on thin links, so everything that can
    fuse, fuses. Query sets larger than one row block stream through
    an outer scan (still one dispatch). n_rows and k_eff are traced
    scalars so varying query counts recompile only per padded shape.

    approx="pooled" selects the pool-resident collection (exact pool
    counts come back with the candidates); True the chunked-merge
    streaming collection; False exact per-row top-κ. Returns
    (top_s, top_i, counts, tau, pool) where ``pool`` is None for the
    non-pooled modes and (amb, pool_v, pool_i) — the per-row ambiguity
    counts plus the device-resident winner pool, kept alive for the
    host repair — for the pooled one. For the non-pooled modes
    ``counts`` are EXACT per-row corpus counts of entries ≥ τ,
    computed by a second in-dispatch streamed pass: the host's verify
    rule is then simply ``kept-above-τ != count`` — no structural flag
    rules, no extra host↔device round trips for false alarms. (The
    pooled mode keeps its pool-count contract: its selection already
    paid for pool counts, and at pool-scale corpora a full corpus
    count pass costs a second 1M-tile matmul.)"""
    if approx == "pooled":
        assert block_ids is None, "pooled collection takes no block subset"
        top_s, top_i, counts, tau, amb, pv, pi = pooled_candidates(
            q, refs, n_valid, ref_sq, n_rows, k_eff, kappa=kappa,
            col_block=col_block, metric=metric, precision=precision,
            row_block=row_block,
        )
        return top_s, top_i, counts, tau, (amb, pv, pi)
    top_s, top_i = _scan_row_blocks(
        lambda qb: streaming_topk(
            qb, refs, n_valid, ref_sq, kappa=kappa, col_block=col_block,
            metric=metric, precision=precision, approx=bool(approx),
            block_ids=block_ids,
        ),
        q, row_block,
    )
    row_ids = jax.lax.broadcasted_iota(jnp.int32, top_s.shape, 0)
    masked = jnp.where(row_ids < n_rows, top_s, NEG_INF)
    flat = jnp.sort(masked.reshape(-1))[::-1]
    k_idx = jnp.clip(k_eff, 1, flat.shape[0]) - 1
    # τ = the global k-th candidate score. When k exceeds the number of
    # valid candidates (n_rows·κ), the true k-th is unknowable from the
    # candidates → −inf so the verify pass flags every row.
    tau = jnp.where(
        k_eff > n_rows * kappa, NEG_INF,
        jax.lax.dynamic_index_in_dim(flat, k_idx, keepdims=False),
    )
    counts = _scan_row_blocks(
        lambda qb: streaming_count_above(
            qb, refs, n_valid, ref_sq, tau, col_block=col_block,
            metric=metric, precision=precision, block_ids=block_ids,
        ),
        q, row_block,
    )
    return top_s, top_i, counts, tau, None


def _pack_candidates(top_s, top_i, tau, counts=None, amb=None) -> jax.Array:
    """Pack the candidate-phase outputs into ONE int32 vector so the
    host pays a single D2H round trip (each separate pull costs a
    dispatch + link latency). All padded rows are packed (the host
    slices to nq — at most 7 pad rows) so the executable is reusable
    across query counts. Layout:
    [bitcast(τ), (counts[m],) (amb[m],) bitcast(top_s)[m·κ],
    top_i[m·κ]] — counts ride BOTH fused modes (exact corpus counts
    for streaming, pool counts for pooled); amb is pooled-only."""
    parts = [
        jax.lax.bitcast_convert_type(
            jnp.reshape(tau, (1,)).astype(jnp.float32), jnp.int32
        ),
    ]
    if counts is not None:
        parts.append(counts.astype(jnp.int32))
    if amb is not None:
        parts.append(amb.astype(jnp.int32))
    parts.append(
        jax.lax.bitcast_convert_type(
            top_s.astype(jnp.float32), jnp.int32
        ).reshape(-1)
    )
    parts.append(top_i.astype(jnp.int32).reshape(-1))
    return jnp.concatenate(parts)


def _unpack_candidates(buf: np.ndarray, nq: int, kappa: int,
                       with_counts: bool = False, with_amb: bool = False):
    """Host-side inverse of _pack_candidates: slices the padded rows
    off and returns writable arrays
    (top_s, top_i, counts-or-None, τ, amb-or-None)."""
    tau = float(buf[:1].view(np.float32)[0])
    n_vec = int(with_counts) + int(with_amb)
    amb = None
    if n_vec:
        m = (buf.size - 1) // (2 * kappa + n_vec)
        counts = buf[1 : 1 + m].astype(np.int64)[:nq]
        off = 1 + m
        if with_amb:
            amb = buf[off : off + m].astype(np.int64)[:nq]
            off += m
    else:
        m = (buf.size - 1) // (2 * kappa)
        counts = None
        off = 1
    top_s = (
        buf[off : off + m * kappa].view(np.float32).reshape(m, kappa)[:nq]
        .copy()
    )
    top_i = (
        buf[off + m * kappa :].astype(np.int64).reshape(m, kappa)[:nq]
    )
    return top_s, top_i, counts, tau, amb


@functools.partial(
    jax.jit,
    static_argnames=("kappa", "col_block", "metric", "precision", "approx",
                     "row_block"),
)
def _fused_candidates_packed(
    q, refs, n_valid, ref_sq, n_rows, k_eff, kappa, col_block, metric,
    precision, approx, row_block=DEFAULT_ROW_BLOCK, block_ids=None,
):
    """Candidate phase in ONE dispatch, packed for ONE D2H pull. The
    pooled mode additionally returns the device-resident winner pool
    (value, id) pair for the host repair; None otherwise. ``block_ids``
    restricts both passes to a block subset (the IVF pruned tier)."""
    top_s, top_i, counts, tau, pool = _candidates_core(
        q, refs, n_rows, n_valid, ref_sq, kappa, col_block, metric,
        precision, approx, k_eff, row_block=row_block, block_ids=block_ids,
    )
    if pool is not None:
        amb, pv, pi = pool
        return _pack_candidates(top_s, top_i, tau, counts, amb), pv, pi
    return _pack_candidates(top_s, top_i, tau, counts), None, None


@functools.partial(
    jax.jit,
    static_argnames=("k", "col_block", "metric", "precision", "row_block"),
)
def _row_topk_packed(
    q, refs, n_valid, ref_sq, k, col_block, metric, precision, row_block,
):
    """Exact per-row top-k for ANY query-set size in ONE dispatch +
    one packed pull (row blocks stream via the in-dispatch scan)."""
    top_s, top_i = _scan_row_blocks(
        lambda qb: streaming_topk(
            qb, refs, n_valid, ref_sq, kappa=k, col_block=col_block,
            metric=metric, precision=precision,
        ),
        q, row_block,
    )
    return jnp.concatenate([
        jax.lax.bitcast_convert_type(
            top_s.astype(jnp.float32), jnp.int32
        ).reshape(-1),
        top_i.astype(jnp.int32).reshape(-1),
    ])


@functools.partial(
    jax.jit, static_argnames=("col_block", "metric", "precision")
)
def _repair_block_counts_packed(
    q_dev, rows, refs, n_valid, ref_sq, tau, col_block, metric, precision,
):
    """Exact per-(row, block) ≥τ counts for the flagged rows (gather
    fused in): one small matmul over |rows| query rows — NOT the whole
    query set. The per-block resolution lets the repair extraction sort
    ONLY the tiles that contain hits (a handful per row) instead of
    running per-block top-k sorts over the whole corpus width. Returns
    [S, n_blocks] int32 flattened."""
    block = jnp.take(q_dev, rows, axis=0).astype(_compute_dtype(refs))
    m = block.shape[0]
    n_blocks = refs.shape[0] // col_block
    prec = jax.lax.Precision(precision)
    if metric == "L2":
        b32 = block.astype(jnp.float32)
        q_sq = jnp.sum(b32 * b32, axis=1)

    def body(carry, block_idx):
        start = block_idx * col_block
        r_blk = jax.lax.dynamic_slice_in_dim(refs, start, col_block, axis=0)
        if metric == "IP8":
            r_blk = r_blk.astype(jnp.float32)
        s = jnp.dot(block, r_blk.T, precision=prec,
                    preferred_element_type=jnp.float32)
        if metric == "L2":
            rs = jax.lax.dynamic_slice_in_dim(ref_sq, start, col_block, axis=0)
            s = 2.0 * s - rs[None, :] - q_sq[:, None]
        elif metric == "IP8":
            sc = jax.lax.dynamic_slice_in_dim(ref_sq, start, col_block, axis=0)
            s = s * sc[None, :]
        in_range = jax.lax.broadcasted_iota(jnp.int32, (m, col_block), 1) < (
            n_valid - start
        )
        above = (s >= tau) & in_range
        return carry, jnp.sum(above, axis=1, dtype=jnp.int32)

    _, per_block = jax.lax.scan(body, jnp.int32(0), jnp.arange(n_blocks))
    return jnp.transpose(per_block).reshape(-1)  # [S·n_blocks]


@functools.partial(
    jax.jit,
    static_argnames=("k", "col_block", "metric", "precision"),
)
def _repair_rows_topk_packed(
    q_dev,  # [M, D] device-resident queries (any dtype)
    rows,  # [S_pad] int32 flagged row indices (padding repeats row 0)
    refs, n_valid, ref_sq,
    k, col_block, metric, precision,
):
    """Exact per-row top-k for a gathered set of flagged rows, packed
    for one pull (the repair extraction). The gather stays on device —
    flagged rows never cross the host link."""
    block = jnp.take(q_dev, rows, axis=0).astype(_compute_dtype(refs))
    top_s, top_i = streaming_topk(
        block, refs, n_valid, ref_sq, kappa=k, col_block=col_block,
        metric=metric, precision=precision,
    )
    return jnp.concatenate([
        jax.lax.bitcast_convert_type(top_s, jnp.int32).reshape(-1),
        top_i.astype(jnp.int32).reshape(-1),
    ])


@functools.partial(jax.jit, static_argnames=("k",))
def _pool_rows_topk_packed(
    pool_v,  # [M, P] f32 winner-pool values (device-resident)
    pool_i,  # [M, P] int32 global corpus ids
    rows,  # [S_pad] int32 flagged row indices (padding repeats row 0)
    k,
):
    """Exact per-row top-k over the winner pool for flagged rows: one
    [rows, P] gather + one narrow sort, no corpus rescan. Sound
    whenever the row's pool holds every corpus entry ≥ τ (amb == 0, or
    corpus count == pool count) and k ≥ the row's pool count."""
    pvr = jnp.take(pool_v, rows, axis=0)
    pir = jnp.take(pool_i, rows, axis=0)
    top_s, sel = jax.lax.top_k(pvr, k)
    top_i = jnp.take_along_axis(pir, sel, axis=1)
    return jnp.concatenate([
        jax.lax.bitcast_convert_type(top_s, jnp.int32).reshape(-1),
        top_i.reshape(-1),
    ])


@functools.partial(
    jax.jit,
    static_argnames=("beta", "kappa", "noise_col_block", "col_block",
                     "precision", "approx", "row_block", "metric"),
)
def _fused_sn_candidates_packed(
    q,  # [M_pad, D] (padding rows beyond nq allowed)
    noise_refs, noise_n_valid, noise_sq,  # noise corpus (for the bias)
    refs, n_valid, ref_sq,  # score-norm refs (D+1: trailing ones dim)
    n_rows, k_eff,  # traced scalars: valid query rows, effective k
    beta, kappa, noise_col_block, col_block, precision, approx,
    row_block=DEFAULT_ROW_BLOCK,
    metric="IP",  # "IP8" when both corpora are int8-staged
):
    """The ENTIRE score-normalized query pipeline in one dispatch:
    noise-NN bias (k=1 row max), CSLS bias-dimension append, global
    top-κ candidates and τ — packed into a single D2H buffer. Also
    returns the bias-augmented queries (device-resident; the
    flagged-row recompute gathers from them without pulling the full
    matrix). Large query sets stream through row-block scans (still
    one dispatch)."""
    def bias_append(qb):
        bias, _ = streaming_topk(
            qb, noise_refs, noise_n_valid, noise_sq, kappa=1,
            col_block=noise_col_block, metric=metric, precision=precision,
        )
        return jnp.concatenate(
            [qb, (-beta * bias[:, :1]).astype(qb.dtype)], axis=1
        )

    q_sn = _scan_row_blocks(bias_append, q, row_block)
    top_s, top_i, counts, tau, pool = _candidates_core(
        q_sn, refs, n_rows, n_valid, ref_sq, kappa, col_block, metric,
        precision, approx, k_eff, row_block=row_block,
    )
    if pool is not None:
        amb, pv, pi = pool
        return (
            _pack_candidates(top_s, top_i, tau, counts, amb), q_sn, pv, pi
        )
    return _pack_candidates(top_s, top_i, tau, counts), q_sn, None, None


class SimilaritySearcher:
    """Brute-force searcher over a fixed reference descriptor matrix.

    Stages references to device once; queries stream through in row
    blocks. The TPU-native analog of a FAISS flat index
    (reference: vsc/index.py:74-94).
    """

    def __init__(
        self,
        refs: np.ndarray,  # [N, D]
        metric: str = "IP",
        precision: str = "highest",
        row_block: int = DEFAULT_ROW_BLOCK,
        col_block: int = DEFAULT_COL_BLOCK,
        dtype: str = "float32",
    ):
        """``dtype="bfloat16"`` stores the corpus and computes scores in
        bf16 (f32 accumulation): half the HBM footprint and transfer
        volume, MXU-native matmul throughput. Scores coarsen to bf16
        resolution — ranking stays deterministic but differs slightly
        from f32; use for throughput/scale, f32 for strict parity.

        ``dtype="int8"`` stores the corpus as symmetric per-row int8
        (the FAISS SQ8 analog; see quantize_rows_int8): quarter the
        HBM footprint and transfer volume. Queries stay f32; scores
        are exact over the DEQUANTIZED corpus (f32 accumulation + one
        per-column scale multiply), so exactness incl. tie-breaks
        holds against the dequantized brute-force oracle. IP only —
        the per-row scales ride the ref_sq slot."""
        assert metric in ("IP", "L2"), metric
        assert dtype in ("float32", "bfloat16", "int8"), dtype
        assert dtype != "int8" or metric == "IP", (
            "int8 storage supports metric='IP' only"
        )
        self.metric = metric
        self.precision = precision
        self.dtype = {
            "float32": jnp.float32,
            "bfloat16": jnp.bfloat16,
            "int8": jnp.int8,
        }[dtype]
        self.n_refs = refs.shape[0]
        self.dim = refs.shape[1]
        self.row_block = row_block
        self._col_block_req = col_block
        self.col_block = min(col_block, _ceil_to(max(self.n_refs, 1), 128))
        n_pad = _ceil_to(max(self.n_refs, 1), self.col_block)
        if self.dtype == jnp.int8:
            refs_host, scale = quantize_rows_int8(refs)
            self._refs = jnp.asarray(_pad_axis0(refs_host, n_pad))
            self._ref_sq = jnp.asarray(_pad_axis0(scale, n_pad))
        else:
            refs_host = np.ascontiguousarray(refs, dtype=self._np_dtype())
            self._refs = jnp.asarray(_pad_axis0(refs_host, n_pad))
            self._set_ref_sq()
        self._n_valid = jnp.asarray(self.n_refs, dtype=jnp.int32)

    @property
    def _kernel_metric(self) -> str:
        """The metric string the score kernels see: "IP8" routes the
        int8 dequantization branch (scales in the ref_sq slot); the
        public ``metric`` stays "IP" so pipeline-level checks (e.g.
        SN fusability) are storage-agnostic."""
        return "IP8" if self.dtype == jnp.int8 else self.metric

    @property
    def _q_dtype(self):
        """Query staging/compute dtype (queries are never quantized)."""
        return jnp.float32 if self.dtype == jnp.int8 else self.dtype

    def _set_ref_sq(self) -> None:
        assert self.dtype != jnp.int8  # int8 manages scales explicitly
        if self.metric == "L2":
            r32 = self._refs.astype(jnp.float32)
            self._ref_sq = jnp.sum(r32 * r32, axis=1)
        else:
            self._ref_sq = jnp.zeros((self._refs.shape[0],), jnp.float32)

    def append_rows(self, new_rows: np.ndarray) -> None:
        """Grow the staged corpus in place: only the NEW rows cross the
        host link; the resident rows concatenate device-side (serving
        `add` at 1M-frame scale restages ~2 GB over a thin host link
        without this). n_valid is a traced scalar, so searches only
        recompile when the padded corpus shape crosses a col_block
        boundary (or the tiny-corpus block clamp grows)."""
        if self.dtype == jnp.int8:
            new_rows, new_scale = quantize_rows_int8(new_rows)
        else:
            new_rows = np.ascontiguousarray(new_rows, dtype=self._np_dtype())
        assert new_rows.shape[1] == self.dim, (new_rows.shape, self.dim)
        new_total = self.n_refs + new_rows.shape[0]
        new_col_block = min(
            self._col_block_req, _ceil_to(max(new_total, 1), 128)
        )
        n_pad = _ceil_to(new_total, new_col_block)
        refs = self._refs
        assert n_pad >= refs.shape[0], "corpus growth cannot shrink padding"
        if n_pad > refs.shape[0]:
            refs = jnp.pad(refs, ((0, n_pad - refs.shape[0]), (0, 0)))
        # Rows past n_valid are zero (masked by the kernels anyway);
        # the new rows land right after the valid ones.
        self._refs = jax.lax.dynamic_update_slice(
            refs,
            jnp.asarray(new_rows).astype(self.dtype),
            (jnp.asarray(self.n_refs, jnp.int32), jnp.asarray(0, jnp.int32)),
        )
        if self.dtype == jnp.int8:
            # Per-row dequant scales ride along with their rows.
            sq = self._ref_sq
            if n_pad > sq.shape[0]:
                sq = jnp.pad(sq, (0, n_pad - sq.shape[0]))
            self._ref_sq = jax.lax.dynamic_update_slice(
                sq, jnp.asarray(new_scale),
                (jnp.asarray(self.n_refs, jnp.int32),),
            )
        self.n_refs = new_total
        self.col_block = new_col_block
        if self.dtype != jnp.int8:
            self._set_ref_sq()
        self._n_valid = jnp.asarray(self.n_refs, dtype=jnp.int32)

    def keep_rows(self, keep_idx: np.ndarray) -> None:
        """Shrink the staged corpus to EXACTLY these surviving rows
        (the searcher primitive under serving `remove`; note the
        argument is the survivors, not FAISS-remove_ids-style drop
        ids). One device-side gather compacts the survivors — corpus
        rows never cross the host link, only the [new_total] int32
        index vector does — and the result lands on the exact
        fresh-stage layout (survivors in original order, zero tail
        padding), so every search kernel and its bit-exact tie-breaks
        are untouched by construction.

        ``keep_idx``: strictly increasing global row indices to KEEP.
        """
        keep_idx = _check_keep_idx(keep_idx, self.n_refs)
        new_total = int(keep_idx.size)
        new_col_block = min(
            self._col_block_req, _ceil_to(max(new_total, 1), 128)
        )
        n_pad = _ceil_to(max(new_total, 1), new_col_block)
        gather = jax.jit(
            functools.partial(
                _compact_gather, n_pad=n_pad, new_total=new_total
            )
        )
        idx_dev = jnp.asarray(_pad_keep_idx(keep_idx, n_pad))
        self._refs = gather(self._refs, idx_dev)
        if self.dtype == jnp.int8:
            # Compact the per-row dequant scales with the same gather.
            self._ref_sq = gather(self._ref_sq[:, None], idx_dev)[:, 0]
        self.n_refs = new_total
        self.col_block = new_col_block
        if self.dtype != jnp.int8:
            self._set_ref_sq()
        self._n_valid = jnp.asarray(self.n_refs, dtype=jnp.int32)

    def _np_dtype(self):
        if self.dtype == jnp.bfloat16:
            import ml_dtypes

            return ml_dtypes.bfloat16
        return np.float32

    def _stage_queries(self, queries, block_rows: int) -> jax.Array:
        """One host→device transfer of the (padded) query matrix; all
        row blocks slice it on device. Transfers dominate on thin
        host↔device links, so pay exactly one. Device arrays pass
        through (pad on device) — zero transfers for fused pipelines."""
        n_pad = _ceil_to(max(queries.shape[0], 1), block_rows)
        if isinstance(queries, jax.Array):
            queries = queries.astype(self._q_dtype)
            if queries.shape[0] == n_pad:
                return queries
            return jnp.pad(queries, ((0, n_pad - queries.shape[0]), (0, 0)))
        q = np.ascontiguousarray(queries, dtype=self._np_dtype())
        return jnp.asarray(_pad_axis0(q, n_pad))

    # ---- kernel entry points (overridden by the sharded searcher) ------

    def _topk_kernel(self, block: np.ndarray, kappa: int, approx: bool = False):
        return _block_topk(
            jnp.asarray(block).astype(self._q_dtype),
            self._refs,
            self._n_valid,
            self._ref_sq,
            kappa=kappa,
            col_block=self.col_block,
            metric=self._kernel_metric,
            precision=self.precision,
            approx=approx,
        )

    def _pool_budget_bytes(self, pool_bytes: int = 0) -> int:
        """Winner-pool HBM budget for a pool that needs ``pool_bytes``.

        Fast path (no device RPC): a pool inside the static
        f32-calibrated budget is always admissible. Only when the
        MEASURED headroom would be the deciding factor — the pool
        exceeds the static budget but a compact corpus dtype (bf16,
        int8/SQ8) may have freed the HBM it needs — query the device's
        memory_stats FRESH: bytes_limit minus what is already resident
        (corpus, noise, SN tables, and anything staged since the last
        search, e.g. the localizer's coarse+fine ref tables under
        `serve --matches`) minus a transient reserve. A cached measure
        here risked sizing a pool into HBM another consumer had since
        claimed (device OOM mid-serving); the fresh stats RPC (~25-60
        ms on this rig's relay) is only paid by searches whose pool
        actually outgrows the static budget. A transient stats failure
        falls back to the static budget for THIS search only."""
        if pool_bytes <= POOL_BYTES_BUDGET:
            return POOL_BYTES_BUDGET
        try:
            (dev,) = self._refs.devices()
            stats = dev.memory_stats()
            limit = int(stats["bytes_limit"])
            used = int(stats["bytes_in_use"])
        except Exception:
            return POOL_BYTES_BUDGET
        if limit <= POOL_HBM_RESERVE:
            return POOL_BYTES_BUDGET
        return max(POOL_BYTES_BUDGET, limit - used - POOL_HBM_RESERVE)

    def _collection_mode(self, m: int, kappa: int, approx: bool):
        """Pick the approx collection implementation for an m-row query
        block: "pooled" (HBM winner pool, sort-free selection, exact
        pool counts) when the corpus is large enough for it to win AND
        the pool fits the budget; True (chunked streaming merges)
        otherwise — including under the Pallas opt-in flag, whose
        fused_topk routing lives inside streaming_topk. The
        VSC2022_TPU_COLLECTION env var forces a path (tests pin both;
        "pooled" still falls back when structurally infeasible)."""
        if not approx:
            return False
        n_pad = self._refs.shape[0]
        p_total = POOL_SEG_KEEP * (n_pad // POOL_SEG_LANES)
        pool_bytes = 8 * m * p_total
        pool_budget = self._pool_budget_bytes(pool_bytes)
        # κ approaching the pool width means extraction cannot hold the
        # per-row candidates anyway (mass repair): stream instead.
        pool_ok = (
            self.col_block % POOL_SEG_LANES == 0
            and pool_bytes <= pool_budget
            and 4 * kappa <= p_total
            and not (self.metric == "IP" and _use_pallas_kernels())
        )
        forced = os.environ.get("VSC2022_TPU_COLLECTION", "")
        if forced == "stream":
            return True
        if forced == "pooled":
            return "pooled" if pool_ok else True
        if pool_ok and n_pad >= POOL_MIN_CORPUS:
            return "pooled"
        if n_pad >= POOL_MIN_CORPUS and pool_bytes > pool_budget:
            # The pool would win at this corpus size but doesn't fit:
            # say so, with the query-block size that would. Silent
            # fallback cost a 6x regime cliff at [4608 x 8M] before
            # this log existed (docs/performance.md, int8 table).
            logging.getLogger(__name__).warning(
                "pooled collection falls back to streaming: pool needs "
                "%.2f GiB for %d query rows (budget %.2f GiB); "
                "<=%d query rows per search would stay pooled",
                pool_bytes / 2**30, m, pool_budget / 2**30,
                pool_budget // (8 * p_total) if p_total else 0,
            )
        return True

    def _fused_kernel(self, q_dev, nq: int, kappa: int, approx: bool,
                      k_eff: int):
        """Single-dispatch candidate phase for ANY query-set size (row
        blocks stream via an in-dispatch scan); returns the packed
        int32 buffer (one D2H pull), the collection mode, and — in
        pooled mode — the device-resident winner pool for the repair.
        The sharded searcher overrides with a mesh version."""
        m = q_dev.shape[0]
        n_rb = max(1, -(-m // self.row_block))
        if m % n_rb:
            # Unexpected staging (not a whole number of near-even
            # blocks): single-block if it fits, else the loop path.
            if m > self.row_block:
                return None, approx, None
            rb = m
        else:
            rb = m // n_rb
        mode = self._collection_mode(m, kappa, approx)
        packed, pv, pi = _fused_candidates_packed(
            q_dev.astype(self._q_dtype),
            self._refs,
            self._n_valid,
            self._ref_sq,
            jnp.asarray(nq, jnp.int32),
            jnp.asarray(k_eff, jnp.int32),
            kappa=kappa,
            col_block=self.col_block,
            metric=self._kernel_metric,
            precision=self.precision,
            approx=mode,
            row_block=rb,
        )
        return packed, mode, None if pv is None else (pv, pi)


    # ---- per-row top-k -------------------------------------------------

    def row_topk(
        self, queries: np.ndarray, k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Exact per-row top-k. Returns (scores [Nq, k], idx [Nq, k]),
        sorted best-first per row; L2 scores are squared distances.

        The vanilla-KNN path (reference: vsc/index.py:167-177).
        """
        k = min(k, self.n_refs)
        nq = queries.shape[0]
        block_rows = self._plan_row_block(nq)
        q_dev = self._stage_queries(queries, block_rows)
        if type(self) is SimilaritySearcher and nq > 0 and k > 0:
            # One dispatch + one packed pull for any size.
            buf = np.asarray(_row_topk_packed(
                q_dev.astype(self._q_dtype), self._refs, self._n_valid,
                self._ref_sq, k=k, col_block=self.col_block,
                metric=self._kernel_metric, precision=self.precision,
                row_block=block_rows,
            ))
            m = q_dev.shape[0]
            # copy: the packed pull is read-only (a view of the device
            # buffer) — callers get writable arrays.
            out_s = buf[: m * k].view(np.float32).reshape(m, k)[:nq].copy()
            out_i = buf[m * k :].astype(np.int64).reshape(m, k)[:nq]
            if self.metric == "L2":
                np.negative(out_s, out=out_s)  # goodness → squared distance
            return out_s, out_i
        out_s = np.empty((nq, k), dtype=np.float32)
        out_i = np.empty((nq, k), dtype=np.int64)
        for start in range(0, nq, block_rows):
            stop = min(start + block_rows, nq)
            s, i = self._topk_kernel(
                jax.lax.dynamic_slice_in_dim(q_dev, start, block_rows), k
            )
            out_s[start:stop] = np.asarray(s)[: stop - start]
            out_i[start:stop] = np.asarray(i)[: stop - start]
        if self.metric == "L2":
            out_s = -out_s  # goodness → squared distance
        return out_s, out_i

    def row_nn(self, queries: np.ndarray) -> np.ndarray:
        """Best score per row (k=1), e.g. for score normalization
        (reference: vsc/baseline/score_normalization.py:96).

        With VSC2022_TPU_USE_PALLAS=1 on a TPU backend, routes through
        the fused Pallas matmul+row-max kernel (no HBM score
        materialization; see ops/pallas_kernels.py for caveats)."""
        import os

        if (
            os.environ.get("VSC2022_TPU_USE_PALLAS") == "1"
            and self._kernel_metric == "IP"  # excludes int8 storage
            and jax.default_backend() == "tpu"
            and type(self) is SimilaritySearcher
        ):
            from vsc2022_tpu.ops.pallas_kernels import (
                COL_TILE,
                ROW_TILE,
                fused_row_max,
            )

            nq = queries.shape[0]
            q = self._stage_queries(queries, ROW_TILE)
            n_pad = _ceil_to(self._refs.shape[0], COL_TILE)
            refs = self._refs
            if n_pad != refs.shape[0]:
                pad = jnp.zeros((n_pad - refs.shape[0], self.dim), jnp.float32)
                refs = jnp.concatenate([refs, pad], axis=0)
            return np.asarray(fused_row_max(q, refs, self._n_valid))[:nq]
        s, _ = self.row_topk(queries, 1)
        return s[:, 0]

    def row_nn_device(self, q_dev: jax.Array) -> jax.Array:
        """Device-resident row_nn: input and output stay on device (for
        fused pipelines like score-norm → search). q_dev rows must be a
        multiple of row_block (use _stage_queries)."""
        parts = []
        for start in range(0, q_dev.shape[0], self.row_block):
            rows = min(self.row_block, q_dev.shape[0] - start)
            block = jax.lax.dynamic_slice_in_dim(q_dev, start, rows)
            s, _ = self._topk_kernel(block, 1)
            parts.append(s[:, 0])
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    # ---- global top-k --------------------------------------------------

    def global_topk(
        self,
        queries: np.ndarray,
        k: int,
        kappa: Optional[int] = None,
        approx_candidates: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Exact global top-k over all (query row, ref row) pairs.

        Candidate collection uses the TPU-accelerated approximate top-k
        primitive by default; exactness is restored by a count-verify
        pass (for every row, an exact streaming count of entries ≥ the
        global k-th score is compared against the candidates held — any
        shortfall triggers an exact recompute of that row). The result
        therefore reproduces the adaptive-radius global search exactly
        (reference: vsc/index.py:142-165) regardless of candidate
        recall.

        Returns (query_idx, ref_idx, score) sorted by score best-first
        (ties: by (query_idx, ref_idx) for determinism); L2 scores are
        squared distances.
        """
        nq = queries.shape[0]
        total = nq * self.n_refs
        if total == 0 or k <= 0:
            return (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.float32),
            )
        kappa, k_eff = self._plan(nq, k, kappa)

        block_rows = self._plan_row_block(nq)
        q_dev = self._stage_queries(queries, block_rows)

        fused, mode, pool = self._fused_kernel(
            q_dev, nq, kappa, approx_candidates, k_eff
        )
        amb = None
        if fused is not None:
            # Single-dispatch path: candidates + verify counts (pool
            # counts for the pooled mode, exact corpus counts
            # otherwise) + τ in one packed buffer.
            all_s, all_i, counts, tau, amb = _unpack_candidates(
                np.asarray(fused), nq, kappa, with_counts=True,
                with_amb=mode == "pooled",
            )
        else:
            # Rare fallback for unexpected staging: exact per-row top-κ
            # per block (no approx collection), so the κ-th-kept ≥ τ
            # truncation rule alone is a sound verify.
            all_s = np.empty((nq, kappa), dtype=np.float32)
            all_i = np.empty((nq, kappa), dtype=np.int64)
            for start in range(0, nq, block_rows):
                stop = min(start + block_rows, nq)
                block = jax.lax.dynamic_slice_in_dim(q_dev, start, block_rows)
                s, i = self._topk_kernel(block, kappa, approx=False)
                all_s[start:stop] = np.asarray(s)[: stop - start]
                all_i[start:stop] = np.asarray(i)[: stop - start]
            counts = None
            tau = None
            mode = False

        return self._finalize_global_topk(
            all_s, all_i, counts, tau, queries, q_dev, nq, kappa,
            k_eff, mode, block_rows, amb=amb, pool=pool,
        )

    def _map_ref_ids(self, flat_r: np.ndarray) -> np.ndarray:
        """Identity for the plain searcher; the IVF tier overrides to
        translate its cluster-contiguous staged row ids back to the
        caller's original ids before the final (q, r) tie sort."""
        return flat_r

    def _plan(self, nq: int, k: int, kappa: Optional[int] = None):
        """Per-row candidate budget κ and the effective k."""
        if kappa is None:
            # ~1.5× the average per-row need: device→host candidate
            # traffic and the extraction sort are proportional to κ,
            # and the structural verify repairs any under-collection
            # exactly (rows above budget flag via the pool counts).
            kappa = max(32, math.ceil(1.5 * k / max(nq, 1)))
            kappa = 1 << (kappa - 1).bit_length()  # next power of two
        return min(kappa, self.n_refs), min(k, nq * self.n_refs)

    def _plan_row_block(self, nq: int) -> int:
        """Row-block size for nq query rows: one near-even block layout
        (minimal padding) whose blocks stay within the row_block memory
        budget."""
        if nq <= self.row_block:
            return _ceil_to(max(nq, 1), 8)
        n_blocks = -(-nq // self.row_block)
        return _ceil_to(-(-nq // n_blocks), 8)

    def _saturated_rows(self, queries, q_dev, rows: np.ndarray, n_pad: int):
        """Descriptors of the saturated rows, padded to n_pad. Host
        numpy when the caller holds the queries; otherwise a device
        gather — the rows never cross the host link in either direction
        (pulling the full matrix, or even just these rows, through a
        thin link would dominate the recompute)."""
        if isinstance(queries, np.ndarray):
            return _pad_axis0(
                np.ascontiguousarray(queries[rows], dtype=np.float32), n_pad
            )
        idx = np.zeros(n_pad, dtype=np.int32)
        idx[: rows.size] = rows
        return jnp.take(q_dev, jnp.asarray(idx), axis=0)

    def _repair_chunk(self) -> int:
        """Row-chunk ceiling for corpus-scan repair dispatches: score
        intermediates ≤ ~1.5 GB."""
        n_pad = self._refs.shape[0]
        return max(8, min(
            self.row_block,
            ((3 << 29) // (4 * max(n_pad, 1))) // 8 * 8 or 8,
        ))

    def _corpus_counts(self, q_dev, rows: np.ndarray, tau: float):
        """Exact per-row corpus counts of entries ≥ τ (one streamed
        count dispatch per row chunk)."""
        n_blocks = self._refs.shape[0] // self.col_block
        chunk = self._repair_chunk()
        pending = []
        for start in range(0, rows.size, chunk):
            part = rows[start : start + chunk]
            # Pow-2 padding bounds the executable count (remote
            # compiles cost ~30-60 s on relay-attached hosts).
            n_fix = max(8, 1 << (part.size - 1).bit_length())
            idx = np.zeros(n_fix, dtype=np.int32)
            idx[: part.size] = part
            pending.append((start, part.size, n_fix, _repair_block_counts_packed(
                q_dev, jnp.asarray(idx), self._refs, self._n_valid,
                self._ref_sq, jnp.float32(tau),
                col_block=self.col_block,
                metric=self._kernel_metric, precision=self.precision,
            )))
        totals = np.empty(rows.size, np.int64)
        for pend in pending:
            _start_host_copy(pend[-1])
        for start, n, n_fix, dev in pending:
            cb = np.asarray(dev).reshape(n_fix, n_blocks)[:n]
            totals[start : start + n] = cb.sum(axis=1)
        return totals

    @staticmethod
    def _bucket_dispatch(rows, need, chunk, k_cap, dispatch_fn):
        """Count-bucketed extraction: rows grouped by pow2(need), each
        bucket ONE dispatch with κ_b = the bucket ceiling (≥ every
        member's need, so nothing is dropped). Device work and pull
        volume scale with the rows' ACTUAL needs. All buckets dispatch
        async before any pull."""
        bucket_of = np.maximum(
            np.ceil(np.log2(np.maximum(need, 1))).astype(np.int64), 5
        )  # κ_b ≥ 32 merges the small buckets into one executable
        pending = []
        for b in np.unique(bucket_of):
            sel = bucket_of == b
            kb = min(int(1 << b), k_cap)
            brows = rows[sel]
            for start in range(0, brows.size, chunk):
                part = brows[start : start + chunk]
                n_fix = max(8, 1 << (part.size - 1).bit_length())
                idx = np.zeros(n_fix, dtype=np.int32)
                idx[: part.size] = part
                pending.append(
                    (part, n_fix, kb, dispatch_fn(idx, kb))
                )
        return pending

    def _corpus_rows_topk_packed(self, q_dev, idx, kb: int):
        """One corpus-rescan extraction dispatch for the repair: the
        exact top-kb over the full corpus for the gathered query rows,
        packed [vals, ids] for _drain_extractions. The sharded searcher
        overrides this with its mesh kernel."""
        return _repair_rows_topk_packed(
            q_dev, jnp.asarray(idx), self._refs, self._n_valid,
            self._ref_sq, k=kb, col_block=self.col_block,
            metric=self._kernel_metric, precision=self.precision,
        )

    @staticmethod
    def _drain_extractions(pending, tau, parts_s, parts_q, parts_r):
        """Pull bucketed (vals, ids) packed buffers; keep entries ≥ τ.

        All transfers are issued async before the first blocking pull:
        through the relay each D2H round trip costs ~tens of ms of
        link latency, and a serial drain pays it once per bucket —
        measured ~60% of the 61k-search repair wall before the
        overlap."""
        for pend in pending:
            _start_host_copy(pend[-1])
        for rows, n_fix, kb, dev_buf in pending:
            buf = np.asarray(dev_buf)
            v = buf[: n_fix * kb].view(np.float32)
            v = v.reshape(n_fix, kb)[: rows.size]
            i = buf[n_fix * kb :].reshape(n_fix, kb)[: rows.size]
            si, sj = np.nonzero((v >= tau) & np.isfinite(v))
            parts_s.append(v[si, sj])
            parts_q.append(rows[si])
            parts_r.append(i[si, sj].astype(np.int64))

    def _collect_repairs(
        self, queries, q_dev, saturated: np.ndarray, tau: float,
        kept_above: np.ndarray,
        exact_counts: Optional[np.ndarray] = None,
    ):
        """All (score, query, ref) entries ≥ τ for the truly deficient
        rows among the flagged ones — by corpus rescan (streaming
        collection, or pooled when no pool survived).

        1. Resolve exact per-row ≥τ counts. The streaming verify ships
           them in the packed buffer (``exact_counts``); otherwise a
           count dispatch over just the flagged rows resolves them and
           prunes false alarms.
        2. Count-bucketed extraction over the corpus (κ_b per bucket;
           see _bucket_dispatch). Two rejected designs, both measured
           on the skewed bench workload with 3241 genuinely deficient
           rows: per-(row, block) tile sorts — a 537 MB tile gather +
           [16k, 512] sort, ~1.2 s; flat nonzero compaction — TPU
           lowers the 268M-element masked cumsum catastrophically,
           ~2.5 s.

        Returns (scores, q_rows, ref_ids, repaired_rows): the caller
        replaces candidates only for ``repaired_rows``. The sharded
        searcher overrides this (its refs live sharded)."""
        chunk = self._repair_chunk()
        if exact_counts is None:
            totals = self._corpus_counts(q_dev, saturated, tau)
        else:
            totals = np.asarray(exact_counts, np.int64)

        deficient = totals != kept_above
        repaired_rows = saturated[deficient]
        if not repaired_rows.size:
            return (
                np.empty(0, np.float32), np.empty(0, np.int64),
                np.empty(0, np.int64), repaired_rows,
            )
        need = np.maximum(totals[deficient], 1)
        parts_s, parts_q, parts_r = [], [], []
        pending = self._bucket_dispatch(
            repaired_rows, need, chunk, self.n_refs,
            lambda idx, kb: self._corpus_rows_topk_packed(q_dev, idx, kb),
        )
        self._drain_extractions(pending, tau, parts_s, parts_q, parts_r)
        return (
            np.concatenate(parts_s),
            np.concatenate(parts_q),
            np.concatenate(parts_r),
            repaired_rows,
        )

    def _collect_repairs_pooled(
        self, pool, q_dev, saturated: np.ndarray, tau: float,
        kept_above: np.ndarray, pool_counts: np.ndarray,
        amb_counts: np.ndarray,
    ):
        """Pool-resident repair (pooled collection): most deficits are
        extraction misses whose every missing entry still sits in the
        device-resident winner pool, so they re-extract from the pool
        — a [rows, P] gather + narrow top-κ_b, NO corpus rescan. Only
        rows with amb > 0 (some segment's both slots ≥ τ — the only
        way a corpus entry ≥ τ can be missing from the pool) pay a
        corpus count, and only counts exceeding the pool count (≥3
        entries ≥ τ in one 128-lane segment, birthday-rare) fall back
        to the corpus re-search. At the 1M bench point this replaced
        a 1.75 s 9-dispatch corpus-rescan repair (1815 deficient rows,
        mean need 60 > κ=32) with pool-local work.

        Returns (scores, q_rows, ref_ids, repaired_rows)."""
        pv, pi = pool
        ambiguous = amb_counts > 0
        # amb == 0 ⇒ pool_count is the exact corpus count: flagged ⇒
        # kept ≠ pool_count ⇒ deficient; need = pool_count.
        pool_rows = saturated[~ambiguous]
        pool_need = np.maximum(pool_counts[~ambiguous], 1)
        parts_s, parts_q, parts_r = [], [], []
        p_total = int(pv.shape[1])
        pool_chunk = max(8, min(
            self.row_block, ((1 << 30) // (8 * max(p_total, 1))) // 8 * 8 or 8,
        ))
        pending_pool = self._bucket_dispatch(
            pool_rows, pool_need, pool_chunk, p_total,
            lambda idx, kb: _pool_rows_topk_packed(
                pv, pi, jnp.asarray(idx), k=kb
            ),
        )
        corpus_rows = np.empty(0, np.int64)
        corpus_need = np.empty(0, np.int64)
        pruned = np.empty(0, np.int64)
        if ambiguous.any():
            amb_rows = saturated[ambiguous]
            totals = self._corpus_counts(q_dev, amb_rows, tau)
            complete = totals == kept_above[ambiguous]
            hidden = totals > pool_counts[ambiguous]
            pool_ok = ~complete & ~hidden  # totals == pool_count > kept
            pruned = amb_rows[complete]
            corpus_rows = amb_rows[hidden & ~complete]
            corpus_need = totals[hidden & ~complete]
            pending_pool += self._bucket_dispatch(
                amb_rows[pool_ok], np.maximum(totals[pool_ok], 1),
                pool_chunk, p_total,
                lambda idx, kb: _pool_rows_topk_packed(
                    pv, pi, jnp.asarray(idx), k=kb
                ),
            )
        if corpus_rows.size:
            pending_pool += self._bucket_dispatch(
                corpus_rows, corpus_need, self._repair_chunk(),
                self.n_refs,
                lambda idx, kb: self._corpus_rows_topk_packed(
                    q_dev, idx, kb
                ),
            )
        self._drain_extractions(pending_pool, tau, parts_s, parts_q, parts_r)
        repaired_rows = np.setdiff1d(saturated, pruned, assume_unique=True)
        if not parts_s:
            return (
                np.empty(0, np.float32), np.empty(0, np.int64),
                np.empty(0, np.int64), repaired_rows,
            )
        return (
            np.concatenate(parts_s),
            np.concatenate(parts_q),
            np.concatenate(parts_r),
            repaired_rows,
        )

    @staticmethod
    def _segment_multiplicity(all_s, all_i, tau, seg: int, t: int):
        """Rows where ≥ t kept-above-τ candidates share one seg-lane
        segment (masked slots get unique negative sentinels)."""
        kappa = all_s.shape[1]
        if kappa < t:
            # Too few slots to witness t siblings: any kept ≥ τ may
            # hide one.
            return ((all_s >= tau) & np.isfinite(all_s)).any(axis=1)
        kept_above = (all_s >= tau) & np.isfinite(all_s)
        sentinel = -1 - np.arange(kappa, dtype=np.int64)[None, :]
        segids = np.where(kept_above, all_i // seg, sentinel)
        segids.sort(axis=1)
        return (segids[:, t - 1 :] == segids[:, : 1 - t]).any(axis=1)

    def _flag_deficient_rows(
        self, all_s, all_i, counts, tau, kappa: int, mode, amb=None
    ) -> np.ndarray:
        """Rows that could be missing an entry ≥ τ:

        * τ = −inf (k beyond the collected candidates): every row.
        * non-pooled fused collection — ``counts`` are EXACT per-row
          corpus counts of entries ≥ τ (computed in-dispatch), so
          kept ≠ count flags exactly the deficient rows: no structural
          rules, no false alarms, regardless of how approximate the
          collection was (truncation and segment occlusion both show
          as a count shortfall).
        * pooled collection — ``counts`` are pool counts: an
          extraction miss shows as kept ≠ pool count; a corpus entry
          missing from the pool implies all ``POOL_SEG_KEEP`` pool
          entries of its segment are ≥ τ, witnessed exactly by the
          in-dispatch per-row ambiguity count (``amb`` > 0). Without
          amb (legacy tools), the segment-multiplicity rule over the
          extracted candidates is the coarser witness.
        * no counts (loop fallback; exact per-block top-κ): truncation
          only — every dropped candidate is ≤ the row's κ-th kept
          score, so a row is suspect iff that score ≥ τ.
        """
        nq = all_s.shape[0]
        if tau == NEG_INF:
            return np.arange(nq, dtype=np.int64)
        if counts is not None:
            kept_above = ((all_s >= tau) & np.isfinite(all_s)).sum(axis=1)
            flagged = kept_above != counts
            if mode == "pooled":
                if amb is not None:
                    flagged |= amb > 0
                else:
                    flagged |= self._segment_multiplicity(
                        all_s, all_i, tau, POOL_SEG_LANES, POOL_SEG_KEEP
                    )
            return np.where(flagged)[0]
        return np.where(all_s[:, -1] >= tau)[0]

    def _finalize_global_topk(
        self, all_s, all_i, counts, tau, queries, q_dev, nq: int,
        kappa: int, k_eff: int, mode, block_rows: int,
        amb=None, pool=None,
    ):
        """Host finalization of the candidate phase: structural verify
        (exact recompute of any row that could be missing an entry
        ≥ τ), then the exact global sort/truncate."""
        flat_s = all_s.ravel()
        flat_q = np.repeat(np.arange(nq, dtype=np.int64), kappa)
        flat_r = all_i.ravel()

        if kappa < self.n_refs or mode:
            # Global threshold τ = k-th best among candidates (−inf when
            # fewer than k were collected: then every row may be missing
            # entries and must be recomputed).
            if tau is None:
                if flat_s.size >= k_eff:
                    tau = np.partition(flat_s, flat_s.size - k_eff)[
                        flat_s.size - k_eff
                    ]
                else:
                    tau = NEG_INF
            saturated = self._flag_deficient_rows(
                all_s, all_i, counts, tau, kappa, mode, amb
            )
            if saturated.size:
                # Exact recompute over just the flagged rows. The
                # streaming verify's counts are corpus-exact and ride
                # the packed buffer; the pooled mode repairs from the
                # device-resident pool (corpus rescan only for the
                # birthday-rare hidden entries).
                kept_above = (
                    (all_s[saturated] >= tau)
                    & np.isfinite(all_s[saturated])
                ).sum(axis=1)
                if (
                    mode == "pooled" and pool is not None
                    and amb is not None and tau > NEG_INF
                ):
                    rep_s, rep_q, rep_r, repaired = (
                        self._collect_repairs_pooled(
                            pool, q_dev, saturated, tau, kept_above,
                            np.asarray(counts)[saturated],
                            np.asarray(amb)[saturated],
                        )
                    )
                else:
                    exact_counts = (
                        counts[saturated]
                        if counts is not None and mode != "pooled"
                        else None
                    )
                    rep_s, rep_q, rep_r, repaired = self._collect_repairs(
                        queries, q_dev, saturated, tau, kept_above,
                        exact_counts,
                    )
                if repaired.size:
                    keep_mask = ~np.isin(flat_q, repaired)
                    flat_s = np.concatenate([flat_s[keep_mask], rep_s])
                    flat_q = np.concatenate([flat_q[keep_mask], rep_q])
                    flat_r = np.concatenate([flat_r[keep_mask], rep_r])

        # Searchers that reorder their staged corpus (the IVF tier's
        # cluster-contiguous permutation) map device row ids back to
        # the caller's ids HERE — before the final sort — so the
        # (q, r) tie order below is on the ids the caller sees.
        flat_r = self._map_ref_ids(flat_r)

        # Final exact sort: score desc, then (q, r) asc for determinism.
        # Pre-filter to entries ≥ the k-th score so we only lexsort
        # ~k survivors; score ties at the boundary are cut by (q, r)
        # order, not by partition arbitrariness.
        if k_eff < flat_s.size:
            tau = np.partition(flat_s, flat_s.size - k_eff)[flat_s.size - k_eff]
            keep = flat_s >= tau
            flat_s, flat_q, flat_r = flat_s[keep], flat_q[keep], flat_r[keep]
        order = np.lexsort((flat_r, flat_q, -flat_s))[:k_eff]
        flat_s, flat_q, flat_r = flat_s[order], flat_q[order], flat_r[order]
        if self.metric == "L2":
            flat_s = -flat_s
        return flat_q, flat_r, flat_s
