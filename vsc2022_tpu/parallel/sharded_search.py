"""Corpus-sharded brute-force search over a device mesh.

The TPU analog of FAISS multi-GPU — but sharding the *reference corpus*
instead of replicating it (reference replicates via
``index_cpu_to_all_gpus``; vsc/index.py:169-171): each device holds
1/n of the reference descriptors in HBM, computes its local per-row
top-κ with the same streaming matmul kernel, and partial results merge
over ICI with one all-gather + top-k. Queries are replicated (they are
small relative to the corpus). Corpus capacity and matmul throughput
both scale linearly with devices; the merge traffic is O(M·κ·n_dev),
independent of corpus size.

Exactness: per-shard top-κ ⊇ each shard's contribution to the full
top-κ, so the merged top-κ equals the single-device result and the host
global-k logic (threshold + saturation fallback) applies unchanged.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vsc2022_tpu.ops.similarity import (
    NEG_INF,
    POOL_BYTES_BUDGET,
    POOL_MIN_CORPUS,
    POOL_SEG_KEEP,
    POOL_SEG_LANES,
    SimilaritySearcher,
    _ceil_to,
    _pack_candidates,
    _pad_axis0,
    _pool_select,
    _scan_row_blocks,
    _start_host_copy,
    quantize_rows_int8,
    pool_build_xla,
    streaming_count_above,
    streaming_topk,
)


@jax.jit
def _pack_vals_ids(s: jax.Array, i: jax.Array) -> jax.Array:
    """[vals, ids] packed int32 buffer in the _drain_extractions
    layout (one D2H pull per repair bucket)."""
    return jnp.concatenate([
        jax.lax.bitcast_convert_type(
            s.astype(jnp.float32), jnp.int32
        ).reshape(-1),
        i.astype(jnp.int32).reshape(-1),
    ])


class ShardedSimilaritySearcher(SimilaritySearcher):
    """Drop-in SimilaritySearcher over a 1-D corpus mesh."""

    def __init__(
        self,
        refs: np.ndarray,
        mesh: Mesh,
        metric: str = "IP",
        precision: str = "highest",
        row_block: int = 4096,
        col_block: int = 8192,
        dtype: str = "float32",
    ):
        assert metric in ("IP", "L2"), metric
        assert dtype in ("float32", "bfloat16", "int8"), dtype
        assert dtype != "int8" or metric == "IP", (
            "int8 storage supports metric='IP' only"
        )
        assert len(mesh.axis_names) == 1, "corpus mesh must be 1-D"
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.n_dev = mesh.devices.size
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

        # Shard size: multiple of col_block so each shard streams evenly.
        per_dev = _ceil_to(max(self.n_refs, 1), self.n_dev) // self.n_dev
        self._col_block_req = col_block
        self.col_block = min(col_block, _ceil_to(per_dev, 128))
        self.shard_rows = _ceil_to(per_dev, self.col_block)
        n_pad = self.shard_rows * self.n_dev

        sharding = NamedSharding(self.mesh, P(self.axis, None))
        vec_sharding = NamedSharding(self.mesh, P(self.axis))
        if self.dtype == jnp.int8:
            refs_host, scale = quantize_rows_int8(refs)
            self._refs = jax.device_put(
                jnp.asarray(_pad_axis0(refs_host, n_pad)), sharding
            )
            self._ref_sq = jax.device_put(
                jnp.asarray(_pad_axis0(scale, n_pad)), vec_sharding
            )
        else:
            refs_host = _pad_axis0(
                np.ascontiguousarray(refs, dtype=self._np_dtype()), n_pad
            )
            self._refs = jax.device_put(jnp.asarray(refs_host), sharding)
            if metric == "L2":
                r32 = self._refs.astype(jnp.float32)
                ref_sq = jnp.sum(r32 * r32, axis=1)
            else:
                ref_sq = jnp.zeros((n_pad,), dtype=jnp.float32)
            self._ref_sq = jax.device_put(ref_sq, vec_sharding)
        self._n_valid = jnp.asarray(self.n_refs, dtype=jnp.int32)
        self._topk_fns = {}
        self._full_fns = {}

    def append_rows(self, new_rows) -> None:
        """Grow the sharded corpus in place: only the NEW rows cross
        the host link. The grown array uses the fresh-stage geometry
        (valid rows contiguous in flat id space, all padding at the
        tail — every kernel derives per-shard validity from the scalar
        n_valid), so searches are bit-identical to a full rebuild.
        When the per-shard padding must grow, the resident rows
        redistribute across shards over ICI (a GSPMD resharding inside
        one jit) — the corpus never revisits the host. A geometry
        change (shard_rows/col_block) invalidates the compiled
        per-shard kernels, which close over both."""
        if self.dtype == jnp.int8:
            new_rows, new_scale = quantize_rows_int8(new_rows)
        else:
            new_rows = np.ascontiguousarray(new_rows, dtype=self._np_dtype())
        assert new_rows.shape[1] == self.dim, (new_rows.shape, self.dim)
        new_total = self.n_refs + new_rows.shape[0]
        per_dev = _ceil_to(max(new_total, 1), self.n_dev) // self.n_dev
        new_cb = min(self._col_block_req, _ceil_to(per_dev, 128))
        new_sr = _ceil_to(per_dev, new_cb)
        n_pad = new_sr * self.n_dev
        grow = n_pad - self._refs.shape[0]
        assert grow >= 0, "corpus growth cannot shrink padding"
        sharding = NamedSharding(self.mesh, P(self.axis, None))

        def _append(refs, rows, offset):
            if grow:
                refs = jnp.pad(refs, ((0, grow), (0, 0)))
            return jax.lax.dynamic_update_slice(
                refs, rows.astype(refs.dtype), (offset, 0)
            )

        self._refs = jax.jit(_append, out_shardings=sharding)(
            self._refs,
            jnp.asarray(new_rows),
            jnp.asarray(self.n_refs, jnp.int32),
        )
        if self.dtype == jnp.int8:
            # Per-row dequant scales redistribute in lockstep with
            # their rows (same grow + fresh-stage offset, over ICI).
            def _append_sq(sq, scale, offset):
                if grow:
                    sq = jnp.pad(sq, (0, grow))
                return jax.lax.dynamic_update_slice(sq, scale, (offset,))

            self._ref_sq = jax.jit(
                _append_sq,
                out_shardings=NamedSharding(self.mesh, P(self.axis)),
            )(
                self._ref_sq,
                jnp.asarray(new_scale),
                jnp.asarray(self.n_refs, jnp.int32),
            )
        if (new_sr, new_cb) != (self.shard_rows, self.col_block):
            self._topk_fns = {}
            self._full_fns = {}
        self.shard_rows, self.col_block = new_sr, new_cb
        self.n_refs = new_total
        if self.dtype != jnp.int8:
            self._rebuild_ref_sq(n_pad)
        self._n_valid = jnp.asarray(self.n_refs, dtype=jnp.int32)

    def _rebuild_ref_sq(self, n_pad: int) -> None:
        """Recompute the sharded squared-norm side array after the
        corpus array changed shape (append/compaction)."""
        if self.metric == "L2":
            self._ref_sq = jax.jit(
                lambda r: jnp.sum(
                    r.astype(jnp.float32) * r.astype(jnp.float32), axis=1
                ),
                out_shardings=NamedSharding(self.mesh, P(self.axis)),
            )(self._refs)
        else:
            self._ref_sq = jax.device_put(
                jnp.zeros((n_pad,), dtype=jnp.float32),
                NamedSharding(self.mesh, P(self.axis)),
            )

    def keep_rows(self, keep_idx) -> None:
        """Shrink the sharded corpus to EXACTLY these surviving rows
        (argument = survivors, as in the single-device searcher). One
        jitted gather with sharded out_shardings compacts onto the
        fresh-stage geometry — survivors redistribute across shards
        over ICI (GSPMD moves them), never through the host; only the
        int32 index vector crosses the link. Shrinking geometry
        invalidates the compiled per-shard kernels, which close over
        shard_rows and col_block."""
        from vsc2022_tpu.ops.similarity import (
            _check_keep_idx,
            _compact_gather,
            _pad_keep_idx,
        )

        keep_idx = _check_keep_idx(keep_idx, self.n_refs)
        new_total = int(keep_idx.size)
        per_dev = _ceil_to(max(new_total, 1), self.n_dev) // self.n_dev
        new_cb = min(self._col_block_req, _ceil_to(per_dev, 128))
        new_sr = _ceil_to(per_dev, new_cb)
        n_pad = new_sr * self.n_dev
        sharding = NamedSharding(self.mesh, P(self.axis, None))
        import functools

        idx_dev = jnp.asarray(_pad_keep_idx(keep_idx, n_pad))
        self._refs = jax.jit(
            functools.partial(
                _compact_gather, n_pad=n_pad, new_total=new_total
            ),
            out_shardings=sharding,
        )(self._refs, idx_dev)
        if self.dtype == jnp.int8:
            # Compact the scales with the same gather (as a column).
            self._ref_sq = jax.jit(
                lambda sq, idx: _compact_gather(
                    sq[:, None], idx, n_pad=n_pad, new_total=new_total
                )[:, 0],
                out_shardings=NamedSharding(self.mesh, P(self.axis)),
            )(self._ref_sq, idx_dev)
        if (new_sr, new_cb) != (self.shard_rows, self.col_block):
            self._topk_fns = {}
            self._full_fns = {}
        self.shard_rows, self.col_block = new_sr, new_cb
        self.n_refs = new_total
        if self.dtype != jnp.int8:
            self._rebuild_ref_sq(n_pad)
        self._n_valid = jnp.asarray(self.n_refs, dtype=jnp.int32)

    # -- kernels ---------------------------------------------------------

    def _build_topk(self, kappa: int, approx: bool):
        axis, shard_rows = self.axis, self.shard_rows
        col_block, precision = self.col_block, self.precision
        metric = self._kernel_metric
        local_kappa = min(kappa, shard_rows)

        def local_fn(q, refs_local, ref_sq_local, n_valid):
            base = jax.lax.axis_index(axis) * shard_rows
            local_valid = jnp.clip(n_valid - base, 0, shard_rows)
            top_s, top_i = streaming_topk(
                q, refs_local, local_valid, ref_sq_local,
                kappa=local_kappa, col_block=col_block, metric=metric,
                precision=precision, base=base, varying_axes=(axis,),
                approx=approx,
            )
            # Merge partials over ICI: [n_dev, M, κ] → per-row top-κ.
            all_s = jax.lax.all_gather(top_s, axis)
            all_i = jax.lax.all_gather(top_i, axis)
            m = q.shape[0]
            all_s = jnp.moveaxis(all_s, 0, 1).reshape(m, -1)
            all_i = jnp.moveaxis(all_i, 0, 1).reshape(m, -1)
            merged_s, sel = jax.lax.top_k(all_s, min(kappa, all_s.shape[1]))
            merged_i = jnp.take_along_axis(all_i, sel, axis=1)
            return merged_s, merged_i

        fn = shard_map(
            local_fn,
            mesh=self.mesh,
            in_specs=(P(), P(self.axis, None), P(self.axis), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(fn)


    def _build_count(self):
        axis, shard_rows = self.axis, self.shard_rows
        col_block, precision = self.col_block, self.precision
        metric = self._kernel_metric

        def local_fn(q, refs_local, ref_sq_local, n_valid, tau):
            base = jax.lax.axis_index(axis) * shard_rows
            local_valid = jnp.clip(n_valid - base, 0, shard_rows)
            counts = streaming_count_above(
                q, refs_local, local_valid, ref_sq_local, tau,
                col_block=col_block, metric=metric, precision=precision,
                varying_axes=(axis,),
            )
            return jax.lax.psum(counts, axis)

        fn = shard_map(
            local_fn,
            mesh=self.mesh,
            in_specs=(P(), P(self.axis, None), P(self.axis), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
        return jax.jit(fn)

    def _local_candidate_phase(
        self, q, refs_local, ref_sq_local, n_valid, nq, k_eff,
        kappa: int, rb: int, mode,
    ):
        """Traceable per-shard candidate phase (runs inside shard_map;
        the shared body of every fused builder): collect — streaming
        per-shard top-κ merged over ICI, or a per-shard winner pool
        with psum'd selection — then the global k-th threshold τ and
        the verify counts. Returns (packed, pool_v, pool_i); the pool
        is None for the streaming modes. nq and k_eff are traced
        scalars (recompiles only per padded shape)."""
        axis, shard_rows = self.axis, self.shard_rows
        col_block, metric, precision = (
            self.col_block, self._kernel_metric, self.precision,
        )
        base = jax.lax.axis_index(axis) * shard_rows
        local_valid = jnp.clip(n_valid - base, 0, shard_rows)

        if mode == "pooled":
            pv, pi = pool_build_xla(
                q, refs_local, local_valid, ref_sq_local,
                col_block=col_block, metric=metric, precision=precision,
                row_block=rb, base=base, varying_axes=(axis,),
            )
            pool_per_block = POOL_SEG_KEEP * (col_block // POOL_SEG_LANES)
            top_s, top_i, counts, tau, amb = _pool_select(
                pv, pi, q.shape[0], nq, k_eff, kappa, pool_per_block,
                axis_name=axis,
            )
            return _pack_candidates(top_s, top_i, tau, counts, amb), pv, pi

        local_kappa = min(kappa, shard_rows)

        def collect(qb):
            top_s, top_i = streaming_topk(
                qb, refs_local, local_valid, ref_sq_local,
                kappa=local_kappa, col_block=col_block, metric=metric,
                precision=precision, base=base, varying_axes=(axis,),
                approx=bool(mode),
            )
            all_s = jax.lax.all_gather(top_s, axis)
            all_i = jax.lax.all_gather(top_i, axis)
            mb = qb.shape[0]
            all_s = jnp.moveaxis(all_s, 0, 1).reshape(mb, -1)
            all_i = jnp.moveaxis(all_i, 0, 1).reshape(mb, -1)
            km = min(kappa, all_s.shape[1])
            blk_s, sel = jax.lax.top_k(all_s, km)
            return blk_s, jnp.take_along_axis(all_i, sel, axis=1)

        merged_s, merged_i = _scan_row_blocks(collect, q, rb)

        row_ids = jax.lax.broadcasted_iota(jnp.int32, merged_s.shape, 0)
        masked = jnp.where(row_ids < nq, merged_s, NEG_INF)
        flat = jnp.sort(masked.reshape(-1))[::-1]
        km = merged_s.shape[1]
        k_idx = jnp.clip(k_eff, 1, flat.shape[0]) - 1
        tau = jnp.where(
            k_eff > nq * km, NEG_INF,
            jax.lax.dynamic_index_in_dim(flat, k_idx, keepdims=False),
        )

        # Exact verify counts: per-shard ≥τ counts, psum'd over ICI
        # — the host's kept≠count rule then flags exactly the
        # deficient rows (see ops/similarity._flag_deficient_rows).
        def count_rows(qb):
            return jax.lax.psum(
                streaming_count_above(
                    qb, refs_local, local_valid, ref_sq_local, tau,
                    col_block=col_block, metric=metric,
                    precision=precision, varying_axes=(axis,),
                ),
                axis,
            )

        counts = _scan_row_blocks(count_rows, q, rb)
        return _pack_candidates(merged_s, merged_i, tau, counts), None, None

    def _build_fused(self, kappa: int, approx: bool, rb: int):
        """Whole candidate phase in ONE dispatch across the mesh,
        packed for a single D2H pull — the sharded twin of
        _fused_candidates_packed."""

        def local_fn(q, refs_local, ref_sq_local, n_valid, nq, k_eff):
            packed, _, _ = self._local_candidate_phase(
                q, refs_local, ref_sq_local, n_valid, nq, k_eff,
                kappa, rb, bool(approx),
            )
            return packed

        fn = shard_map(
            local_fn,
            mesh=self.mesh,
            in_specs=(P(), P(self.axis, None), P(self.axis), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
        return jax.jit(fn)

    def _build_fused_sn(self, noise_searcher, beta: float, kappa: int,
                        rb: int, mode):
        """The ENTIRE sharded score-norm query pipeline in ONE mesh
        dispatch — the sharded twin of _fused_sn_candidates_packed:
        per-shard noise-NN bias (k=1 row max, pmax over ICI), CSLS
        bias-dimension append, then the shared per-shard candidate
        phase. Returns the packed buffer plus the bias-augmented
        queries (device-resident, for the flagged-row recompute) and,
        in pooled mode, the sharded winner pools."""
        axis = self.axis
        ns_rows, ns_cb, ns_prec = (
            noise_searcher.shard_rows, noise_searcher.col_block,
            noise_searcher.precision,
        )
        ns_metric = noise_searcher._kernel_metric

        def local_fn(q, nrefs, nsq, n_nvalid, refs_local, ref_sq_local,
                     n_valid, nq, k_eff):
            nbase = jax.lax.axis_index(axis) * ns_rows
            n_lv = jnp.clip(n_nvalid - nbase, 0, ns_rows)

            def bias_append(qb):
                b, _ = streaming_topk(
                    qb, nrefs, n_lv, nsq, kappa=1, col_block=ns_cb,
                    metric=ns_metric, precision=ns_prec,
                    varying_axes=(axis,),
                )
                b = jax.lax.pmax(b[:, 0], axis)
                return jnp.concatenate(
                    [qb, (-beta * b)[:, None].astype(qb.dtype)], axis=1
                )

            q_sn = _scan_row_blocks(bias_append, q, rb)
            packed, pv, pi = self._local_candidate_phase(
                q_sn, refs_local, ref_sq_local, n_valid, nq, k_eff,
                kappa, rb, mode,
            )
            if mode == "pooled":
                return packed, q_sn, pv, pi
            return packed, q_sn

        if mode == "pooled":
            out_specs = (
                P(), P(), P(None, self.axis), P(None, self.axis),
            )
        else:
            out_specs = (P(), P())
        fn = shard_map(
            local_fn,
            mesh=self.mesh,
            in_specs=(
                P(), P(self.axis, None), P(self.axis), P(),
                P(self.axis, None), P(self.axis), P(), P(), P(),
            ),
            out_specs=out_specs,
            check_vma=False,
        )
        return jax.jit(fn)

    # -- SimilaritySearcher kernel overrides -----------------------------

    def _topk_kernel(self, block: np.ndarray, kappa: int, approx: bool = False):
        key = (kappa, approx)
        if key not in self._topk_fns:
            self._topk_fns[key] = self._build_topk(kappa, approx)
        return self._topk_fns[key](
            jnp.asarray(block), self._refs, self._ref_sq, self._n_valid
        )

    def _count_kernel(self, block: np.ndarray, tau: float):
        if "count" not in self._full_fns:
            self._full_fns["count"] = self._build_count()
        return self._full_fns["count"](
            jnp.asarray(block), self._refs, self._ref_sq, self._n_valid,
            jnp.float32(tau),
        )


    def _collect_repairs(self, queries, q_dev, saturated, tau, kept_above,
                         exact_counts=None):
        """Verify recompute over the mesh: gather the flagged rows
        (host or device, outside the shard_map), resolve their exact
        ≥τ counts (shipped in the packed buffer by the fused path;
        psum'd count kernel otherwise), drop rows whose count equals
        their kept count (already complete), size κ₂ from the rest,
        then the exact sharded top-κ₂ kernel. (The single-device
        count-compact scheme does not apply: the score tiles live
        sharded.)"""
        parts_s, parts_q, parts_r = [], [], []
        repaired = []
        fix_rows = min(self.row_block, _ceil_to(saturated.size, 8))
        for start in range(0, saturated.size, fix_rows):
            rows = saturated[start : start + fix_rows]
            kept = kept_above[start : start + fix_rows]
            block = self._saturated_rows(queries, q_dev, rows, fix_rows)
            if exact_counts is not None:
                counts = np.asarray(
                    exact_counts[start : start + fix_rows], np.int64
                )
            else:
                counts = np.asarray(
                    self._count_kernel(block, tau)
                )[: rows.size]
            deficient = counts != kept
            if not deficient.any():
                continue
            repaired.append(rows[deficient])
            c_max = int(counts[deficient].max(initial=0))
            if c_max == 0:
                continue
            kappa2 = min(self.n_refs, 1 << (c_max - 1).bit_length())
            s, i = self._topk_kernel(block, kappa2, approx=False)
            s = np.asarray(s)[: rows.size][deficient]
            i = np.asarray(i)[: rows.size][deficient]
            sq, sr = np.nonzero(s >= tau)
            parts_s.append(s[sq, sr])
            parts_q.append(rows[deficient][sq])
            parts_r.append(i[sq, sr].astype(np.int64))
        repaired_rows = (
            np.concatenate(repaired) if repaired else np.empty(0, np.int64)
        )
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

    def _build_fused_pooled(self, kappa: int, rb: int):
        """The pooled candidate phase across the mesh in ONE dispatch:
        each shard builds its winner pool over its own corpus shard
        (ids already global via the shard base offset), the bit-level
        k-th search and the per-row/ambiguity counts psum over ICI,
        per-shard extractions merge with one all-gather (the streaming
        merge's traffic shape, O(M·κ·n_dev)), and the packed buffer
        comes back replicated for a single D2H pull. The pools stay
        device-resident AND corpus-sharded on their position axis —
        the host repair reaches flagged rows through GSPMD."""
        def local_fn(q, refs_local, ref_sq_local, n_valid, nq, k_eff):
            return self._local_candidate_phase(
                q, refs_local, ref_sq_local, n_valid, nq, k_eff,
                kappa, rb, "pooled",
            )

        fn = shard_map(
            local_fn,
            mesh=self.mesh,
            in_specs=(P(), P(self.axis, None), P(self.axis), P(), P(), P()),
            out_specs=(P(), P(None, self.axis), P(None, self.axis)),
            check_vma=False,
        )
        return jax.jit(fn)

    def _corpus_counts(self, q_dev, rows: np.ndarray, tau: float):
        """Exact ≥τ corpus counts for flagged rows over the mesh (the
        base class's streamed count kernel cannot see sharded refs):
        gather the rows, per-shard streamed counts, psum over ICI."""
        chunk = self.row_block
        pending = []
        for start in range(0, rows.size, chunk):
            part = rows[start : start + chunk]
            n_fix = max(8, 1 << (part.size - 1).bit_length())
            idx = np.zeros(n_fix, dtype=np.int32)
            idx[: part.size] = part
            block = jnp.take(q_dev, jnp.asarray(idx), axis=0)
            pending.append(
                (start, part.size, self._count_kernel(block, tau))
            )
        totals = np.empty(rows.size, np.int64)
        for pend in pending:
            _start_host_copy(pend[-1])
        for start, n, dev in pending:
            totals[start : start + n] = np.asarray(dev)[:n]
        return totals

    def _corpus_rows_topk_packed(self, q_dev, idx, kb: int):
        """Corpus re-search for the pooled repair's hidden rows: gather
        the rows, exact sharded top-kb, pack [vals, ids] in the
        _drain_extractions layout."""
        block = jnp.take(
            q_dev, jnp.asarray(np.asarray(idx, np.int32)), axis=0
        )
        s, i = self._topk_kernel(block, kb, approx=False)
        return _pack_vals_ids(s, i)

    def _collection_mode(self, m: int, kappa: int, approx: bool):
        """Pooled collection when each corpus SHARD is at the scale
        where the pool beats the streaming merges (the single-device
        crossover, measured ~256k rows) and the per-device pool fits
        the budget; chunked streaming merges otherwise.
        VSC2022_TPU_COLLECTION forces a path (tests pin both)."""
        if not approx:
            return False
        # (No Pallas exclusion here, unlike the single-device gate:
        # under shard_map the Pallas fused_topk never runs anyway —
        # streaming_topk refuses it with varying_axes set — so
        # disabling the pool would cost its win and buy nothing.)
        p_shard = POOL_SEG_KEEP * (self.shard_rows // POOL_SEG_LANES)
        pool_ok = (
            self.col_block % POOL_SEG_LANES == 0
            and p_shard >= POOL_SEG_KEEP
            and 8 * m * p_shard <= POOL_BYTES_BUDGET
            and 4 * kappa <= p_shard * self.n_dev
        )
        forced = os.environ.get("VSC2022_TPU_COLLECTION", "")
        if forced == "stream":
            return True
        if forced == "pooled":
            return "pooled" if pool_ok else True
        if pool_ok and self.shard_rows >= POOL_MIN_CORPUS:
            return "pooled"
        return True

    def _fused_kernel(self, q_dev, nq, kappa, approx, k_eff):
        m = q_dev.shape[0]
        n_rb = max(1, -(-m // self.row_block))
        if m % n_rb:
            if m > self.row_block:
                return None, approx, None  # unexpected staging: loop
            rb = m
        else:
            rb = m // n_rb
        mode = self._collection_mode(m, kappa, approx)
        args = (
            q_dev.astype(self._q_dtype), self._refs, self._ref_sq,
            self._n_valid, jnp.asarray(nq, jnp.int32),
            jnp.asarray(k_eff, jnp.int32),
        )
        if mode == "pooled":
            key = ("fused_pooled", kappa, m, rb)
            if key not in self._topk_fns:
                self._topk_fns[key] = self._build_fused_pooled(kappa, rb)
            packed, pv, pi = self._topk_fns[key](*args)
            return packed, "pooled", (pv, pi)
        key = ("fused", kappa, bool(mode), m, rb)
        if key not in self._topk_fns:
            self._topk_fns[key] = self._build_fused(kappa, bool(mode), rb)
        return self._topk_fns[key](*args), bool(mode), None
