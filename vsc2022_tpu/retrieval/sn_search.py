"""Fused score-normalized search: the production query path.

The reference runs score normalization and retrieval as separate FAISS
stages with host round-trips between them (reference:
vsc/baseline/score_normalization.py:86-105 then vsc/index.py:142-165).
Here the query-side work is one device-resident pipeline: queries are
staged to HBM once; the noise-NN bias is computed (fused row-max),
appended as the extra CSLS dimension on device, and fed straight into
the global top-k — no intermediate host transfers. References get
their constant-1 dimension once at index build.

Use this when descriptors are already normalized/prepared; the
list-of-VideoFeature pipeline (retrieval.score_norm.score_normalize)
remains the npz-compatible general path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vsc2022_tpu.ops.similarity import (
    SimilaritySearcher,
    _ceil_to,
    _fused_sn_candidates_packed,
    _unpack_candidates,
)


class ScoreNormalizedSearcher:
    """Flat-array score-norm + global-top-k searcher."""

    def __init__(
        self,
        refs: np.ndarray,  # [N, D] reference frame descriptors
        noise: np.ndarray,  # [Nn, D] independent noise corpus
        beta: float = 1.2,
        precision: str = "highest",
        mesh=None,
        dtype: str = "float32",
        ivf_nlist: Optional[int] = None,
        ivf_nprobe: Optional[int] = None,
    ):
        """``ivf_nlist`` routes the REFERENCE corpus through the IVF
        pruned tier (ops/ivf.py; single-chip, mesh-exclusive): the
        bias-augmented corpus is laid out cluster-contiguously and
        focused query batches scan a block subset — still exact. The
        pipeline then runs as two dispatches (bias, then the pruned
        candidate phase) instead of the one-dispatch fusion; the noise
        corpus stays a plain searcher (its k=1 row-max never prunes)."""
        self.beta = beta
        self._sharded = mesh is not None
        r_sn = np.concatenate(
            [refs, np.ones((refs.shape[0], 1), refs.dtype)], axis=1
        ).astype(np.float32)
        noise_f32 = np.ascontiguousarray(noise, dtype=np.float32)
        if mesh is not None:
            if ivf_nlist is not None:
                raise ValueError(
                    "IVF codecs are single-chip for now: shard the "
                    "corpus (mesh) OR prune it (IVF), not both"
                )
            from vsc2022_tpu.parallel.sharded_search import (
                ShardedSimilaritySearcher,
            )

            self.searcher = ShardedSimilaritySearcher(
                r_sn, mesh, precision=precision, dtype=dtype
            )
            self.noise_searcher = ShardedSimilaritySearcher(
                noise_f32, mesh, precision=precision, dtype=dtype
            )
        else:
            if ivf_nlist is not None:
                from vsc2022_tpu.ops.ivf import IVFSimilaritySearcher

                self.searcher = IVFSimilaritySearcher(
                    r_sn, nlist=ivf_nlist, nprobe=ivf_nprobe,
                    precision=precision, dtype=dtype,
                )
            else:
                self.searcher = SimilaritySearcher(
                    r_sn, precision=precision, dtype=dtype
                )
            self.noise_searcher = SimilaritySearcher(
                noise_f32, precision=precision, dtype=dtype
            )
        self._sharded_fns = {}
        # Device-resident bias-augmented queries from the most recent
        # global_topk (the fused dispatches compute them anyway);
        # serving reuses them for localization instead of paying a
        # second noise-NN dispatch. Single-threaded use only.
        self.last_q_sn = None

    def append_refs(self, refs_transformed: np.ndarray) -> None:
        """Grow the staged (bias-augmented) corpus with new reference
        rows already in the normalized space (dim drop + L2 applied by
        the caller); the constant-1 CSLS column appends here. The
        noise corpus is immutable. Works sharded too — the corpus
        searcher redistributes over ICI when its padding grows."""
        r_sn = np.concatenate(
            [
                np.asarray(refs_transformed, dtype=np.float32),
                np.ones((refs_transformed.shape[0], 1), np.float32),
            ],
            axis=1,
        )
        self.searcher.append_rows(r_sn)

    def keep_refs(self, keep_idx) -> None:
        """Shrink the staged (bias-augmented) corpus to EXACTLY these
        surviving rows — device-side compaction onto the fresh-stage
        layout (the constant-1 CSLS column rides along per row). The
        noise corpus is immutable."""
        self.searcher.keep_rows(keep_idx)

    def normalize_queries(self, queries: np.ndarray) -> jax.Array:
        """Stage queries and append the −β·NN-similarity bias dimension,
        entirely on device."""
        nq = queries.shape[0]
        block = min(
            self.noise_searcher.row_block, _ceil_to(max(nq, 1), 8)
        )
        q_dev = self.noise_searcher._stage_queries(queries, block)
        bias = self.noise_searcher.row_nn_device(q_dev)
        q_sn = jnp.concatenate(
            [q_dev, (-self.beta * bias)[:, None]], axis=1
        )
        return q_sn[:nq]

    def global_topk(
        self, queries: np.ndarray, k: int, kappa: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        s = self.searcher
        nq = queries.shape[0]
        fusable = (
            s.metric == "IP"
            and nq > 0
            and k > 0
            and s.n_refs > 0
            and self.noise_searcher.n_refs > 0
        )
        if fusable and self._sharded:
            out = self._sharded_fused_topk(queries, nq, k, kappa)
            if out is not None:
                return out
        if fusable and type(s) is SimilaritySearcher:
            # EXACT type: the IVF subclass must NOT take the fused
            # one-dispatch path (its probe needs the bias-augmented
            # queries, which the fusion only materializes inside the
            # dispatch) — it falls through to the two-step path below,
            # where s.global_topk runs the pruned candidate phase.
            # Whole pipeline — noise-NN bias, bias append, candidate
            # top-κ, τ, verify counts — in ONE device dispatch and ONE
            # packed D2H pull (row blocks stream inside the dispatch).
            kappa_eff, k_eff = s._plan(nq, k, kappa)
            rb = s._plan_row_block(nq)
            ns = self.noise_searcher
            q_dev = ns._stage_queries(queries, rb)
            mode = s._collection_mode(q_dev.shape[0], kappa_eff, True)
            packed, q_sn, pv, pi = _fused_sn_candidates_packed(
                q_dev,
                ns._refs, ns._n_valid, ns._ref_sq,
                s._refs, s._n_valid, s._ref_sq,
                jnp.asarray(nq, jnp.int32),
                jnp.asarray(k_eff, jnp.int32),
                beta=float(self.beta),
                kappa=kappa_eff,
                noise_col_block=ns.col_block,
                col_block=s.col_block,
                precision=s.precision,
                approx=mode,
                row_block=rb,
                metric=s._kernel_metric,
            )
            all_s, all_i, counts, tau, amb = _unpack_candidates(
                np.asarray(packed), nq, kappa_eff, with_counts=True,
                with_amb=mode == "pooled",
            )
            self.last_q_sn = q_sn
            return s._finalize_global_topk(
                all_s, all_i, counts, tau, q_sn, q_sn, nq, kappa_eff,
                k_eff, mode, rb, amb=amb,
                pool=None if pv is None else (pv, pi),
            )
        q_sn = self.normalize_queries(queries)
        self.last_q_sn = q_sn
        return s.global_topk(q_sn, k, kappa=kappa)

    def _sharded_fused_topk(self, queries, nq, k, kappa):
        """The sharded one-dispatch SN pipeline (bias + append +
        candidates + τ + counts over the corpus mesh). None when the
        two searchers don't share a mesh — the caller then falls back
        to the two-dispatch path."""
        from vsc2022_tpu.parallel.sharded_search import (
            ShardedSimilaritySearcher,
        )

        s, ns = self.searcher, self.noise_searcher
        if not (
            isinstance(s, ShardedSimilaritySearcher)
            and isinstance(ns, ShardedSimilaritySearcher)
            and s.mesh is ns.mesh
        ):
            return None
        kappa_eff, k_eff = s._plan(nq, k, kappa)
        rb = s._plan_row_block(nq)
        q_dev = ns._stage_queries(queries, rb)
        m = q_dev.shape[0]
        if m > rb and m % rb:
            return None  # unexpected staging: the loop path handles it
        mode = s._collection_mode(m, kappa_eff, True)
        # shard_rows/col_block are baked into the compiled closure;
        # corpus growth (append_refs) can change them, so they key
        # the cache (stale entries just stop being hit).
        key = ("sn", kappa_eff, mode, m, rb, s.shard_rows, s.col_block)
        if key not in self._sharded_fns:
            self._sharded_fns[key] = s._build_fused_sn(
                ns, float(self.beta), kappa_eff, rb, mode
            )
        out = self._sharded_fns[key](
            q_dev, ns._refs, ns._ref_sq, ns._n_valid,
            s._refs, s._ref_sq, s._n_valid,
            jnp.asarray(nq, jnp.int32), jnp.asarray(k_eff, jnp.int32),
        )
        if mode == "pooled":
            packed, q_sn, pv, pi = out
            pool = (pv, pi)
        else:
            packed, q_sn = out
            pool = None
        self.last_q_sn = q_sn
        all_s, all_i, counts, tau, amb = _unpack_candidates(
            np.asarray(packed), nq, kappa_eff, with_counts=True,
            with_amb=mode == "pooled",
        )
        return s._finalize_global_topk(
            all_s, all_i, counts, tau, q_sn, q_sn, nq, kappa_eff,
            k_eff, mode, rb, amb=amb, pool=pool,
        )
