"""Frame-level video search index over the TPU similarity core.

TPU-native rebuild of the FAISS-backed ``VideoIndex``
(reference: vsc/index.py:74-177). Per-video features are flattened into
one frame-level corpus with side arrays mapping frame rows back to
(video_id, frame_idx); search returns frame matches regrouped per
(query video, ref video) pair.

Search modes:
  * ``global_k >= 0`` — global top-k over all query-frame × ref-frame
    pairs (the VSC-rules-conforming mode): scores comparable across
    queries, since µAP ranks one global list.
  * ``global_k < 0`` — vanilla per-frame KNN with k = -global_k
    (explicitly against VSC rules; provided for comparison, like the
    reference; vsc/index.py:108-117).
"""

from __future__ import annotations

import collections
import logging
import re
from typing import Iterable, List, Tuple

import numpy as np

from vsc2022_tpu.ops.similarity import SimilaritySearcher
from vsc2022_tpu.types import PairMatch, PairMatches, VideoFeature

logger = logging.getLogger(__name__)

SearchIndices = Tuple[int, int, float]


class VideoIndex:
    def __init__(
        self,
        dim: int,
        codec_str: str = "Flat",
        metric: str = "IP",
        precision: str = "highest",
        mesh=None,
        dtype: str = "float32",
        ivf_nprobe=None,
    ):
        """``codec_str`` mirrors the reference's FAISS factory argument
        (reference: vsc/index.py:78): "Flat" is the exact search over
        the staged dtype; "SQ8" is FAISS's 8-bit scalar quantizer —
        here symmetric per-row int8 storage (quarter the HBM/transfer
        of f32; search is exact over the dequantized corpus, incl.
        tie-breaks). Other factory strings are rejected. ``mesh``: an
        optional 1-D jax.sharding.Mesh to shard the reference corpus
        across devices (parallel/sharded_search.py).
        ``dtype="bfloat16"`` stores/searches the corpus in bf16 (half
        the HBM and transfer, MXU-native; scores at bf16 resolution);
        ``dtype="int8"`` is the SQ8 tier under its jax-style name.

        "IVF{nlist}[,Flat|SQ8]" (the FAISS factory's IVF family,
        e.g. "IVF1024,Flat") selects the pruned tier (ops/ivf.py): a
        k-means cluster-contiguous corpus layout whose per-block score
        bounds let the candidate phase scan a block subset. Unlike
        FAISS IVF, search stays EXACT — the count-verify pass plus the
        bound certificate restore the brute-force result including
        tie-breaks; ``ivf_nprobe`` (FAISS sets nprobe at runtime, not
        in the factory string) tunes speed, never correctness."""
        self._ivf_nlist = None
        m = re.fullmatch(r"IVF(\d+)(?:,(Flat|SQ8))?", codec_str)
        if m:
            self._ivf_nlist = int(m.group(1))
            if m.group(2) == "SQ8":
                dtype = "int8"
        elif codec_str == "SQ8":
            dtype = "int8"
        elif codec_str != "Flat":
            raise ValueError(
                f"Unsupported codec '{codec_str}': the TPU searcher is "
                "exact brute-force over Flat (f32/bf16), SQ8 (int8), or "
                "IVF{nlist}[,Flat|SQ8] (exact pruned tier) storage"
            )
        if self._ivf_nlist is not None and mesh is not None:
            raise ValueError(
                "IVF codecs are single-chip for now: shard the corpus "
                "(mesh) OR prune it (IVF), not both"
            )
        self._ivf_nprobe = ivf_nprobe
        self.dim = dim
        self.metric = metric
        self.precision = precision
        self.mesh = mesh
        self.dtype = dtype
        self.video_clip_idx: List[int] = []
        self.video_clip_to_video_ids: List[str] = []
        self.video_metadata = {}
        self._feature_blocks: List[np.ndarray] = []
        # Per-block identity AND timing: repeated-id adds (legal, like
        # FAISS add) keep one block per add, so each block must carry
        # its OWN timestamps — video_metadata only holds the last.
        self._block_meta: List = []
        self._searcher: SimilaritySearcher | None = None

    def add(self, db: List[VideoFeature]) -> None:
        """Append reference videos (repeatable, like FAISS add;
        reference: vsc/index.py:87-94). Before the first search this
        only records host blocks; after a searcher is staged, the new
        rows append DEVICE-side (only the new rows cross the host
        link — resident serving's `add`). Sharded corpora grow the
        same way: re-padding redistributes resident rows over ICI, not
        through the host. Searchers without append support fall back
        to a lazy full restage."""
        self._validate_add(db)
        new_blocks = []
        for vf in db:
            n = vf.feature.shape[0]
            self.video_clip_idx.extend(range(n))
            self.video_clip_to_video_ids.extend([vf.video_id] * n)
            self.video_metadata[vf.video_id] = vf.metadata()
            block = np.asarray(vf.feature, dtype=np.float32)
            self._feature_blocks.append(block)
            self._block_meta.append(vf.metadata())
            new_blocks.append(block)
        if self._searcher is not None and new_blocks:
            try:
                self._append_to_searcher(
                    np.concatenate(new_blocks, axis=0)
                )
            except NotImplementedError:
                self._searcher = None  # staged lazily on next search
            except Exception:
                # Unexpected device-append failure (e.g. HBM exhausted):
                # the host blocks already hold the validated rows, so
                # dropping the staged searcher keeps ids consistent —
                # the next search restages the full corpus.
                self._searcher = None
                raise

    def remove(self, video_ids) -> int:
        """Drop reference videos from the index (the FAISS
        ``remove_ids`` analog — the reference's VideoIndex never
        removes, it rebuilds; serving needs in-place shrink). A staged
        searcher compacts its corpus DEVICE-side onto the exact
        fresh-stage layout, so post-remove searches are bit-identical
        to an index freshly built over the survivors. Returns the
        number of frame rows removed. Unknown ids raise before any
        state mutates."""
        drop = set(video_ids)
        missing = [str(v) for v in drop if v not in self.video_metadata]
        if missing:
            raise KeyError(f"Video ids not indexed: {sorted(missing)[:5]}")
        row_ids = np.asarray(self.video_clip_to_video_ids, dtype=object)
        keep_mask = ~np.isin(row_ids, list(drop))
        keep_idx = np.flatnonzero(keep_mask).astype(np.int32)
        n_removed = int(keep_mask.size - keep_idx.size)
        clip_idx = np.asarray(self.video_clip_idx, dtype=np.int64)
        self.video_clip_idx = [int(i) for i in clip_idx[keep_mask]]
        self.video_clip_to_video_ids = [v for v in row_ids[keep_mask]]
        for vid in drop:
            del self.video_metadata[vid]
        survivors = [
            (b, m)
            for b, m in zip(self._feature_blocks, self._block_meta)
            if m.video_id not in drop
        ]
        self._feature_blocks = [b for b, _ in survivors]
        self._block_meta = [m for _, m in survivors]
        if self._searcher is not None:
            try:
                self._remove_from_searcher(keep_idx)
            except NotImplementedError:
                self._searcher = None  # staged lazily on next search
            except Exception:
                # Host bookkeeping already shrank consistently; drop
                # the staged searcher so the next search restages.
                self._searcher = None
                raise
        return n_removed

    def _remove_from_searcher(self, keep_idx: np.ndarray) -> None:
        self._searcher.keep_rows(keep_idx)

    def features(self) -> List[VideoFeature]:
        """Reconstruct the indexed reference videos exactly as added
        (raw host-side features, add order — the corpus row order).
        Serving `save` snapshots through this: storing the result and
        restarting on the npz reproduces the live index bit-for-bit,
        tie-breaks included."""
        return [
            VideoFeature(
                video_id=meta.video_id,
                timestamps=meta.timestamps,
                feature=block,
            )
            for block, meta in zip(self._feature_blocks, self._block_meta)
        ]

    def _validate_add(self, db: List[VideoFeature]) -> None:
        """All-or-nothing validation BEFORE any state mutates — a
        rejected add must leave no partial host bookkeeping, or later
        adds would map searcher rows to phantom frames. The SN
        subclass adds its noise-overlap check here."""
        for vf in db:
            f = vf.feature
            if f.ndim != 2 or f.shape[1] != self.dim:
                raise ValueError(
                    f"Video {vf.video_id}: feature shape {f.shape} "
                    f"does not match index dimension {self.dim}"
                )

    def _append_to_searcher(self, new_rows: np.ndarray) -> None:
        self._searcher.append_rows(new_rows)

    def _get_searcher(self) -> SimilaritySearcher:
        if self._searcher is None:
            corpus = (
                np.concatenate(self._feature_blocks, axis=0)
                if self._feature_blocks
                else np.zeros((0, self.dim), dtype=np.float32)
            )
            if self.mesh is not None:
                from vsc2022_tpu.parallel.sharded_search import (
                    ShardedSimilaritySearcher,
                )

                self._searcher = ShardedSimilaritySearcher(
                    corpus, self.mesh, metric=self.metric,
                    precision=self.precision, dtype=self.dtype,
                )
            elif self._ivf_nlist is not None:
                from vsc2022_tpu.ops.ivf import IVFSimilaritySearcher

                self._searcher = IVFSimilaritySearcher(
                    corpus, nlist=self._ivf_nlist,
                    nprobe=self._ivf_nprobe, metric=self.metric,
                    precision=self.precision, dtype=self.dtype,
                )
            else:
                self._searcher = SimilaritySearcher(
                    corpus, metric=self.metric, precision=self.precision,
                    dtype=self.dtype,
                )
        return self._searcher

    def search(
        self,
        queries: List[VideoFeature],
        global_k: int,
    ) -> List[PairMatches]:
        if not queries:
            return []
        query_ids: List[str] = []
        query_indices: List[int] = []
        for q in queries:
            query_ids.extend([q.video_id] * len(q))
            query_indices.extend(range(len(q)))
        query_metadatas = {q.video_id: q.metadata() for q in queries}
        query_features = self._prep_query_features(
            np.concatenate([q.feature for q in queries])
        )

        if global_k < 0:
            logger.warning(
                "Per-query KNN mode violates the VSC rules: it makes each "
                "query-ref prediction depend on the other references. "
                "Use it for comparison only; global-k is the conforming mode."
            )
            search_indices = self._knn_search(query_features, -global_k)
        else:
            search_indices = self._global_search(query_features, global_k)

        pair_nns = collections.defaultdict(list)
        for i, j, score in search_indices:
            query_id = query_ids[i]
            ref_id = self.video_clip_to_video_ids[j]
            match = PairMatch(
                query_timestamps=query_metadatas[query_id].get_timestamps(
                    query_indices[i]
                ),
                ref_timestamps=self.video_metadata[ref_id].get_timestamps(
                    self.video_clip_idx[j]
                ),
                score=score,
            )
            pair_nns[query_id, ref_id].append(match)

        return [
            PairMatches(query_id, ref_id, matches)
            for ((query_id, ref_id), matches) in pair_nns.items()
        ]

    def _prep_query_features(self, q: np.ndarray) -> np.ndarray:
        """Per-search query-matrix transform hook (identity here; the
        score-normalized index applies its dimension drop + L2)."""
        return q

    def _global_search(
        self, query_features: np.ndarray, global_k: int
    ) -> Iterable[SearchIndices]:
        qi, ri, scores = self._get_searcher().global_topk(query_features, global_k)
        return zip(qi.tolist(), ri.tolist(), scores.tolist())

    @staticmethod
    def _yield_rows(scores, ids) -> Iterable[SearchIndices]:
        for i in range(ids.shape[0]):
            for j in range(ids.shape[1]):
                yield (i, int(ids[i, j]), float(scores[i, j]))

    def _knn_search(
        self, query_features: np.ndarray, k: int
    ) -> Iterable[SearchIndices]:
        scores, ids = self._get_searcher().row_topk(query_features, k)
        return self._yield_rows(scores, ids)


class ScoreNormalizedVideoIndex(VideoIndex):
    """A persistent frame index whose searches are score-normalized on
    device: the CSLS noise-NN bias rides an extra descriptor dimension
    (retrieval/score_norm.py semantics; reference:
    vsc/baseline/score_normalization.py:31-105), computed inside the
    fused search dispatch rather than as a separate FAISS stage.

    Built for resident serving (retrieval/serve.py): the reference
    corpus AND the noise corpus stage to device HBM once; every
    subsequent query batch pays only the fused bias+search dispatch.
    The one-off transforms (min-variance dimension drop chosen on the
    noise corpus, row L2 normalization) follow the reference exactly,
    and the query side of those transforms is applied per search.
    """

    def __init__(
        self,
        dim: int,
        noise_features: List[VideoFeature],
        beta: float = 1.2,
        l2_normalize: bool = True,
        replace_dim: bool = True,
        **kwargs,
    ):
        super().__init__(dim, **kwargs)
        from vsc2022_tpu.retrieval.score_norm import (
            l2_normalize_rows,
            min_variance_dim,
        )

        if self.metric != "IP":
            raise ValueError(
                "Score-normalized search realizes the CSLS bias as an "
                "extra inner-product dimension; only metric='IP' is "
                f"meaningful (got {self.metric!r})"
            )
        self._l2 = l2_normalize_rows if l2_normalize else (lambda x: x)
        self.beta = beta
        noise_flat = np.concatenate(
            [np.asarray(f.feature, dtype=np.float32) for f in noise_features],
            axis=0,
        )
        self._noise_ids = {f.video_id for f in noise_features}
        if replace_dim:
            self._victim = min_variance_dim(noise_flat)
            logger.info(f"Dropping min-variance dimension {self._victim}")
            noise_flat = np.delete(noise_flat, self._victim, axis=1)
        else:
            self._victim = None
        self._noise_flat = self._l2(noise_flat)

    def _prep_query_features(self, q: np.ndarray) -> np.ndarray:
        q = np.asarray(q, dtype=np.float32)
        if self._victim is not None:
            q = np.delete(q, self._victim, axis=1)
        return self._l2(q)

    def _get_searcher(self):
        if self._searcher is None:
            from vsc2022_tpu.retrieval.score_norm import (
                check_independent_ids,
            )
            from vsc2022_tpu.retrieval.sn_search import (
                ScoreNormalizedSearcher,
            )

            check_independent_ids(self.video_metadata, self._noise_ids)

            corpus = (
                np.concatenate(self._feature_blocks, axis=0)
                if self._feature_blocks
                else np.zeros((0, self.dim), dtype=np.float32)
            )
            self._searcher = ScoreNormalizedSearcher(
                self._prep_query_features(corpus),
                self._noise_flat,
                beta=self.beta,
                precision=self.precision,
                mesh=self.mesh,
                dtype=self.dtype,
                ivf_nlist=self._ivf_nlist,
                ivf_nprobe=self._ivf_nprobe,
            )
        return self._searcher

    def _knn_search(
        self, query_features: np.ndarray, k: int
    ) -> Iterable[SearchIndices]:
        sn = self._get_searcher()
        q_sn = np.asarray(sn.normalize_queries(query_features))
        scores, ids = sn.searcher.row_topk(q_sn, k)
        return self._yield_rows(scores, ids)

    def _validate_add(self, db: List[VideoFeature]) -> None:
        from vsc2022_tpu.retrieval.score_norm import check_independent_ids

        super()._validate_add(db)
        check_independent_ids(
            (vf.video_id for vf in db), self._noise_ids
        )

    def _append_to_searcher(self, new_rows: np.ndarray) -> None:
        self._searcher.append_refs(self._prep_query_features(new_rows))

    def _remove_from_searcher(self, keep_idx: np.ndarray) -> None:
        self._searcher.keep_refs(keep_idx)

    # -- serving-side feature spaces -------------------------------------

    def localizer_ref_features(
        self, refs: List[VideoFeature]
    ) -> List[VideoFeature]:
        """Reference features in the score-normalized similarity space
        the matching pipeline localizes in (dim drop + L2 + the
        constant-1 CSLS dimension; reference:
        vsc/baseline/sscd_baseline.py:192-203 localizes on the
        score_normalize-transformed features)."""
        import dataclasses

        out = []
        for vf in refs:
            f = self._prep_query_features(vf.feature)
            f = np.concatenate([f, np.ones_like(f[:, :1])], axis=1)
            out.append(dataclasses.replace(vf, feature=f))
        return out

    def localizer_queries(
        self, queries: List[VideoFeature]
    ) -> List[VideoFeature]:
        """Query features in the same space (dim drop + L2 + the
        −β·noise-NN bias dimension). Reuses the bias-augmented matrix
        the immediately preceding search() computed on device when
        available (single-threaded serving pattern); recomputes via a
        noise-NN dispatch otherwise."""
        import dataclasses

        sn = self._get_searcher()
        total = sum(len(q) for q in queries)
        q_dev = sn.last_q_sn
        if q_dev is not None and q_dev.shape[0] >= total:
            q_sn = np.asarray(q_dev)[:total]
        else:
            flat = self._prep_query_features(
                np.concatenate([q.feature for q in queries], axis=0)
            )
            q_sn = np.asarray(sn.normalize_queries(flat))
        out = []
        offset = 0
        for q in queries:
            out.append(
                dataclasses.replace(
                    q, feature=q_sn[offset : offset + len(q)]
                )
            )
            offset += len(q)
        return out
