"""IVF pruned-search tier: cluster-contiguous corpus + block bounds.

The reference's ``codec_str`` reaches ``faiss.index_factory``
(/root/reference/vsc/index.py:78-82), which admits IVF indexes — FAISS
IVF partitions the corpus into nlist k-means cells and scans only the
``nprobe`` nearest cells per query, trading recall for speed. A
faithful translation (per-cell inverted lists, scattered row gathers)
would be a terrible TPU program: gathers measured ~5x the cost of
everything else in this codebase's collection phase, and ragged lists
defeat XLA's static shapes.

The TPU-native formulation here keeps the streamed-matmul search
EXACT and makes pruning a property of the corpus LAYOUT:

1. Build: spherical-ish Lloyd k-means (all-MXU: assignment is a
   [N, nlist] matmul, the centroid update a one-hot matmul) yields a
   permutation that stores each cluster's rows contiguously. Search
   kernels are untouched — they already stream fixed col_block slabs.
2. Per STREAMING BLOCK (not per cluster) bound data: centroid c_b and
   radius r_b of the rows in each col_block slab. Clustering makes
   r_b small; correctness never depends on it. For any query q and
   any row x in block b:  q.x <= q.c_b + |q| * r_b   (Cauchy-Schwarz).
3. Search: a tiny probe dispatch scores every block bound, takes each
   row's top-``nprobe`` blocks, and pulls the union mask (nB bits) +
   per-block row-max bounds. The candidate phase then scans ONLY the
   probed blocks (streaming_topk/streaming_count_above accept a
   block_ids subset). Exactness is restored by the SAME count-verify
   machinery as every other collection mode, made sound by the bound
   certificate: after tau (the global k-th candidate score) is known,
   any unprobed block whose row-max bound >= tau gets an extra count
   pass; blocks below tau provably hold no entry >= tau. Rows whose
   exact count exceeds their kept candidates repair through the
   existing full-corpus extraction.

Net: global_topk stays bit-exact vs the dense oracle (tie-breaks on
the CALLER's row ids — the permutation is unmapped before the final
(q, r) sort), and the matmul/count work scales with the probed +
certified fraction instead of the corpus. On corpora with real
cluster structure (embedding corpora; synthetic clustered data in
tests) the fraction is small; on isotropic random data bounds cannot
prune and the tier degrades to a full scan plus a tiny probe overhead
— measured honestly in docs/performance.md.
"""

from __future__ import annotations

import functools
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vsc2022_tpu.ops.similarity import (
    DEFAULT_COL_BLOCK,
    NEG_INF,
    SimilaritySearcher,
    _ceil_to,
    _fused_candidates_packed,
    _pad_axis0,
    _scan_row_blocks,
    _unpack_candidates,
    streaming_count_above,
)

logger = logging.getLogger(__name__)

# Slack added to every block bound: covers f32 accumulation error of
# the score matmuls (~D * eps_f32 * |q||x| ~= 1e-4 at D=513 on unit-ish
# rows) with an order of magnitude to spare. The certificate compares
# bounds against tau, so the slack must DOMINATE numeric error — a too
# -small slack risks a silently skipped block, a too-large one only
# costs extra counted blocks.
BOUND_EPS = 1e-3


@functools.partial(jax.jit, static_argnames=("nlist", "iters", "block"))
def _lloyd(rows, n_valid, cent0, nlist: int, iters: int, block: int):
    """Lloyd k-means, everything on the MXU, ONE dispatch.

    rows [N_pad, D] f32 (zero-padded; n_valid masks), cent0 [nlist, D].
    Returns (centroids [nlist, D], assignment [N_pad] int32).
    Assignment = argmin |x - c|^2 = argmax (x.c - |c|^2 / 2); the
    update accumulates one-hot matmul partial sums per row block.
    """
    n_pad = rows.shape[0]
    n_blocks = n_pad // block
    valid0 = jax.lax.iota(jnp.int32, block)

    def assign_block(cent, half_sq, bi):
        start = bi * block
        blk = jax.lax.dynamic_slice_in_dim(rows, start, block, axis=0)
        scores = (
            jnp.dot(blk, cent.T, preferred_element_type=jnp.float32)
            - half_sq[None, :]
        )
        a = jnp.argmax(scores, axis=1).astype(jnp.int32)
        valid = (valid0 + start) < n_valid
        return blk, a, valid

    def iter_body(_, cent):
        half_sq = 0.5 * jnp.sum(cent * cent, axis=1)

        def scan_body(carry, bi):
            sums, counts = carry
            blk, a, valid = assign_block(cent, half_sq, bi)
            onehot = (
                (a[:, None] == jnp.arange(nlist, dtype=jnp.int32)[None, :])
                & valid[:, None]
            ).astype(jnp.float32)
            sums = sums + jnp.dot(
                onehot.T, blk, preferred_element_type=jnp.float32
            )
            counts = counts + jnp.sum(onehot, axis=0)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            scan_body,
            (jnp.zeros((nlist, rows.shape[1]), jnp.float32),
             jnp.zeros((nlist,), jnp.float32)),
            jnp.arange(n_blocks),
        )
        # Empty clusters keep their previous centroid.
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where(counts[:, None] > 0, new, cent)

    cent = jax.lax.fori_loop(0, iters, iter_body, cent0)
    half_sq = 0.5 * jnp.sum(cent * cent, axis=1)

    def final_body(_, bi):
        _, a, valid = assign_block(cent, half_sq, bi)
        return None, jnp.where(valid, a, nlist - 1)

    _, assign = jax.lax.scan(final_body, None, jnp.arange(n_blocks))
    return cent, assign.reshape(-1)


def kmeans_assign(
    rows: np.ndarray, nlist: int, iters: int = 8, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """(assignment [N], centroids [nlist, D]) for every row (host in,
    host out; compute on the default device). Init = a seeded row
    subsample."""
    n = rows.shape[0]
    rng = np.random.RandomState(seed)
    init = rows[rng.choice(n, size=nlist, replace=False)].astype(np.float32)
    # Row-block sized so the [block, nlist] score tile stays <= ~64 MB.
    block = max(512, min(65536, (1 << 24) // max(nlist, 1)))
    block = 1 << (block - 1).bit_length()
    n_pad = _ceil_to(n, block)
    rows_dev = jnp.asarray(
        _pad_axis0(np.ascontiguousarray(rows, np.float32), n_pad)
    )
    cent, assign = _lloyd(
        rows_dev, jnp.asarray(n, jnp.int32), jnp.asarray(init),
        nlist=nlist, iters=iters, block=block,
    )
    return np.asarray(assign)[:n], np.asarray(cent)


@functools.partial(jax.jit, static_argnames=("col_block", "metric"))
def _block_stats(refs, n_valid, ref_sq, col_block: int, metric: str):
    """Per-streaming-block (centroid, radius, has_valid) over the
    STAGED corpus — computed from the same values the score kernels
    read (bf16 slabs cast to f32, int8 slabs dequantized by their
    ref_sq scales), so the bound covers exactly what search scores."""
    n_pad = refs.shape[0]
    n_blocks = n_pad // col_block
    iota = jax.lax.iota(jnp.int32, col_block)

    def body(_, bi):
        start = bi * col_block
        blk = jax.lax.dynamic_slice_in_dim(
            refs, start, col_block, axis=0
        ).astype(jnp.float32)
        if metric == "IP8":
            sc = jax.lax.dynamic_slice_in_dim(ref_sq, start, col_block, 0)
            blk = blk * sc[:, None]
        valid = (iota + start) < n_valid
        v = valid.astype(jnp.float32)
        cnt = jnp.sum(v)
        c = jnp.sum(blk * v[:, None], axis=0) / jnp.maximum(cnt, 1.0)
        d2 = jnp.sum((blk - c[None, :]) ** 2, axis=1)
        r = jnp.sqrt(jnp.max(jnp.where(valid, d2, 0.0)))
        return None, (c, r, cnt > 0)

    _, (cent, rad, has) = jax.lax.scan(body, None, jnp.arange(n_blocks))
    return cent, rad, has


@functools.partial(jax.jit, static_argnames=("nprobe",))
def _probe_packed(q, cent, rad, has, n_rows, nprobe: int):
    """One tiny dispatch: per-(row, block) score upper bounds, each
    row's top-``nprobe`` block set unioned into a probe mask, and the
    per-block max-over-rows bound for the tau certificate. Packed
    [mask int32[nB] | bitcast(rowmax) int32[nB]] for one D2H pull."""
    q32 = q.astype(jnp.float32)
    qn = jnp.sqrt(jnp.sum(q32 * q32, axis=1))
    b = (
        jnp.dot(q32, cent.T, preferred_element_type=jnp.float32)
        + qn[:, None] * rad[None, :]
        + BOUND_EPS
    )
    b = jnp.where(has[None, :], b, NEG_INF)
    row_ok = jax.lax.iota(jnp.int32, q.shape[0]) < n_rows
    b = jnp.where(row_ok[:, None], b, NEG_INF)
    k = min(nprobe, cent.shape[0])
    thresh = jax.lax.top_k(b, k)[0][:, -1]
    probe = (b >= thresh[:, None]) & (b > NEG_INF)
    mask = jnp.any(probe, axis=0)
    rowmax = jnp.max(b, axis=0)
    return jnp.concatenate([
        mask.astype(jnp.int32),
        jax.lax.bitcast_convert_type(rowmax, jnp.int32),
    ])


@functools.partial(
    jax.jit,
    static_argnames=("col_block", "metric", "precision", "row_block"),
)
def _subset_counts(
    q, refs, n_valid, ref_sq, tau, block_ids, col_block, metric,
    precision, row_block,
):
    """Per-row counts of entries >= tau over a block subset (the tau
    certificate's extra pass)."""
    return _scan_row_blocks(
        lambda qb: streaming_count_above(
            qb, refs, n_valid, ref_sq, tau, col_block=col_block,
            metric=metric, precision=precision, block_ids=block_ids,
        ),
        q, row_block,
    )


def _pad_block_ids(ids: np.ndarray, sentinel: int) -> np.ndarray:
    """Pad a block-id list to the next power of two with the masked
    sentinel so subset sizes bucket into few executables (remote
    compiles cost 30-60 s on relay-attached hosts)."""
    n = max(int(ids.size), 1)
    n_fix = 1 << (n - 1).bit_length()
    out = np.full(n_fix, sentinel, dtype=np.int32)
    out[: ids.size] = ids
    return out


def order_clusters(cent: np.ndarray) -> np.ndarray:
    """Greedy nearest-neighbor chain over cluster centroids.

    The prune bound's unit is the STREAMING block, and blocks that
    straddle a cluster boundary mix two clusters — k-means cluster ids
    are arbitrary, so without ordering a straddle block mixes two
    UNRELATED clusters and its radius balloons to the inter-cluster
    spread. Laying similar clusters adjacently keeps straddle blocks
    nearly as tight as interior ones. O(nlist^2) on host, nlist <= 4096.
    """
    n = cent.shape[0]
    if n <= 2:
        return np.arange(n, dtype=np.int64)
    c = cent.astype(np.float64)
    d2 = ((c[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    order = [0]
    used = np.zeros(n, dtype=bool)
    used[0] = True
    for _ in range(n - 1):
        row = d2[order[-1]].copy()
        row[used] = np.inf
        nxt = int(np.argmin(row))
        order.append(nxt)
        used[nxt] = True
    return np.asarray(order, dtype=np.int64)


class IVFSimilaritySearcher(SimilaritySearcher):
    """Exact searcher with IVF block pruning (see module docstring).

    ``nlist``: k-means cells. The default targets ~2 streaming blocks
    per cell: the prune bound's unit is the col_block slab, so cells
    must be AT LEAST block-sized for tight radii — FAISS's sqrt(N)
    rule (vsc's faiss factory default regime) would shred a 1M corpus
    into ~8 unrelated cells per 8k block and the bounds would never
    prune. Cells are laid out by a nearest-neighbor chain over
    centroids so straddle blocks stay tight too.
    ``nprobe``: blocks per query row in the probe phase (default
    ~1/8 of the corpus blocks). Raising it cuts repair work on hard
    corpora; exactness never depends on it.
    """

    def __init__(
        self,
        refs: np.ndarray,
        nlist: Optional[int] = None,
        nprobe: Optional[int] = None,
        kmeans_iters: int = 8,
        seed: int = 0,
        **kw,
    ):
        if kw.get("metric", "IP") != "IP":
            raise ValueError(
                "IVF supports metric='IP' only (the production metric; "
                "reference pipelines never use codec L2 — vsc/index.py:78)"
            )
        refs = np.asarray(refs)
        n = refs.shape[0]
        if nlist is None:
            # ~2 streaming blocks per cell (same col_block clamp as the
            # base class applies) — see the class docstring.
            cb = min(
                kw.get("col_block", DEFAULT_COL_BLOCK),
                _ceil_to(max(n, 1), 128),
            )
            n_blocks = _ceil_to(max(n, 1), cb) // cb
            nlist = max(1, min(4096, n_blocks // 2))
        self.nlist = min(nlist, max(n, 1))
        self.nprobe = nprobe
        if n > self.nlist > 1:
            assign, cent = kmeans_assign(
                refs.astype(np.float32, copy=False), self.nlist,
                iters=kmeans_iters, seed=seed,
            )
            # Chain-ordered cells, stable within a cell.
            rank = np.empty(self.nlist, dtype=np.int64)
            rank[order_clusters(cent)] = np.arange(self.nlist)
            self._perm = np.argsort(
                rank[assign], kind="stable"
            ).astype(np.int64)
        else:
            self._perm = np.arange(n, dtype=np.int64)
        super().__init__(np.ascontiguousarray(refs[self._perm]), **kw)
        self._stats_cache = None
        self.last_search_stats = None

    # ---- id translation -------------------------------------------------

    def _map_ref_ids(self, flat_r: np.ndarray) -> np.ndarray:
        # Slots that never saw a finite score can carry pad-row ids up
        # to n_pad + col_block (approx-collection contract); clip like
        # the base layout does — their -inf scores are filtered by the
        # final tau cut regardless.
        if not flat_r.size:
            return flat_r
        return self._perm[np.clip(flat_r, 0, self.n_refs - 1)]

    def row_topk(self, queries, k):
        out_s, out_i = super().row_topk(queries, k)
        if out_i.size:
            out_i = self._perm[np.clip(out_i, 0, self.n_refs - 1)]
        return out_s, out_i

    # ---- mutations keep the external id space ---------------------------

    def append_rows(self, new_rows: np.ndarray) -> None:
        """Appended rows land after the clustered region (their blocks
        get their own bounds — looser until a rebuild, never wrong)."""
        n_ext = self._perm.size
        super().append_rows(new_rows)
        self._perm = np.concatenate([
            self._perm,
            np.arange(n_ext, n_ext + (self.n_refs - n_ext), dtype=np.int64),
        ])
        self._stats_cache = None

    def keep_rows(self, keep_idx: np.ndarray) -> None:
        """``keep_idx`` is in the CALLER's id space (like every caller
        of the base primitive). Survivors compact in their current
        clustered order, so bound tightness survives removals."""
        keep_idx = np.asarray(keep_idx, dtype=np.int64)
        inv = np.empty(self.n_refs, dtype=np.int64)
        inv[self._perm] = np.arange(self.n_refs, dtype=np.int64)
        pos = inv[keep_idx]
        order = np.argsort(pos, kind="stable")
        super().keep_rows(pos[order])
        # Internal row j now holds keep_idx[order[j]], whose new
        # external id (callers renumber survivors by keep order) is
        # order[j].
        self._perm = order.astype(np.int64)
        self._stats_cache = None

    # ---- the pruned candidate phase --------------------------------------

    def _bounds(self):
        if self._stats_cache is None:
            cent, rad, has = _block_stats(
                self._refs, self._n_valid, self._ref_sq,
                col_block=self.col_block, metric=self._kernel_metric,
            )
            self._stats_cache = (cent, rad, has)
        return self._stats_cache

    def _effective_nprobe(self, n_blocks: int) -> int:
        if self.nprobe is not None:
            return max(1, min(self.nprobe, n_blocks))
        return max(1, n_blocks // 8)

    def global_topk(self, queries, k, kappa=None, approx_candidates=True):
        nq = queries.shape[0]
        n_blocks = self._refs.shape[0] // self.col_block
        if (
            not approx_candidates
            or n_blocks < 4
            or nq == 0
            or k <= 0
            or self.n_refs == 0
        ):
            self.last_search_stats = None  # probe phase never ran
            return super().global_topk(queries, k, kappa, approx_candidates)
        kappa, k_eff = self._plan(nq, k, kappa)
        block_rows = self._plan_row_block(nq)
        q_dev = self._stage_queries(queries, block_rows)
        cent, rad, has = self._bounds()

        nprobe = self._effective_nprobe(n_blocks)
        buf = np.asarray(_probe_packed(
            q_dev, cent, rad, has, jnp.asarray(nq, jnp.int32),
            nprobe=nprobe,
        ))
        mask = buf[:n_blocks].astype(bool)
        rowmax = buf[n_blocks:].view(np.float32)
        probe_ids = np.nonzero(mask)[0].astype(np.int32)
        if probe_ids.size >= max(n_blocks - 1, (7 * n_blocks) // 8):
            # The probe union covers (almost) everything: pruning buys
            # nothing here — run the production full-scan path, which
            # also unlocks the pooled collection at large corpora.
            # Hand it the ALREADY-STAGED device queries (sliced back to
            # nq rows; _stage_queries re-pads on device) — measured at
            # [9216×1M]: restaging from host cost ~0.6 s of the 1.27 s
            # fallback wall, nearly the full production search again.
            self.last_search_stats = {
                "n_blocks": n_blocks, "probed": int(probe_ids.size),
                "certified_extra": 0, "pruned": False,
            }
            return super().global_topk(q_dev[:nq], k, kappa, approx_candidates)

        m = q_dev.shape[0]
        n_rb = max(1, -(-m // self.row_block))
        if m % n_rb and m > self.row_block:
            # Unexpected staging (not a whole number of near-even row
            # blocks): the base loop path handles it exactly.
            self.last_search_stats = {
                "n_blocks": n_blocks, "probed": int(probe_ids.size),
                "certified_extra": 0, "pruned": False,
            }
            return super().global_topk(q_dev[:nq], k, kappa, approx_candidates)
        rb = m if m % n_rb else m // n_rb
        packed, _, _ = _fused_candidates_packed(
            q_dev.astype(self._q_dtype), self._refs, self._n_valid,
            self._ref_sq, jnp.asarray(nq, jnp.int32),
            jnp.asarray(k_eff, jnp.int32), kappa=kappa,
            col_block=self.col_block, metric=self._kernel_metric,
            precision=self.precision, approx=True, row_block=rb,
            block_ids=jnp.asarray(_pad_block_ids(probe_ids, n_blocks)),
        )
        all_s, all_i, counts, tau, _ = _unpack_candidates(
            np.asarray(packed), nq, kappa, with_counts=True
        )
        if tau == NEG_INF:
            # Degenerate k (more than the collected candidates, e.g. a
            # caller-forced tiny kappa): the verify counts must be
            # FULL-corpus to drive the repair, and the subset counts
            # here are not — run the production full-scan path.
            self.last_search_stats = {
                "n_blocks": n_blocks, "probed": int(probe_ids.size),
                "certified_extra": 0, "pruned": False,
            }
            return super().global_topk(q_dev[:nq], k, kappa, approx_candidates)

        extra = np.nonzero(~mask & (rowmax >= tau))[0].astype(np.int32)
        if tau > NEG_INF and extra.size:
            # tau certificate: unprobed blocks whose bound clears tau
            # get the extra count pass; the rest provably hold no
            # entry >= tau, so `counts` become exact corpus counts.
            counts = counts + np.asarray(_subset_counts(
                q_dev.astype(self._q_dtype), self._refs, self._n_valid,
                self._ref_sq, jnp.float32(tau),
                jnp.asarray(_pad_block_ids(extra, n_blocks)),
                col_block=self.col_block, metric=self._kernel_metric,
                precision=self.precision, row_block=rb,
            ))[:nq].astype(np.int64)
        self.last_search_stats = {
            "n_blocks": n_blocks, "probed": int(probe_ids.size),
            "certified_extra": int(extra.size), "pruned": True,
        }
        return self._finalize_global_topk(
            all_s, all_i, counts, tau, queries, q_dev, nq, kappa,
            k_eff, True, block_rows,
        )
