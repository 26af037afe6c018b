"""Host-side localization drivers over the TN alignment kernel.

Mirrors the reference localization API (reference:
vsc/baseline/localization.py) but replaces the VCSL multiprocessing
pool with one batched device program: candidate pairs are bucketed by
padded (query_len, ref_len) shape, their similarity matrices computed
as one batched matmul on the MXU, and TN alignment runs as a scan DP
over the whole batch (ops/tn_align.py).

Box → Match conversion keeps reference semantics: boxes are inclusive
frame-index rectangles; query_start = get_timestamps(x1)[0],
query_end = get_timestamps(x2)[1] (reference:
vsc/baseline/localization.py:65-75).
"""

from __future__ import annotations

import abc
import functools
import logging
from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vsc2022_tpu.metrics import CandidatePair, Match
from vsc2022_tpu.ops.tn_align import TNParams, tn_align_packed
from vsc2022_tpu.types import VideoFeature

logger = logging.getLogger(__name__)

# Per-chunk progress lines only matter on runs big enough to have
# waited for: single small calls (tests, per-pair probes) stay quiet.
_PROGRESS_MIN = 256

# Max elements per batched similarity tensor (B·NQ·NR); bounds HBM use.
# NOTE: lag-1 chunk pipelining keeps up to TWO chunks' buffers
# enqueued at once (chunk n+1's sims output is allocated at dispatch
# while chunk n's is still pinned by its pending TN execution), so the
# peak is ~2 budgets' worth of sims, not one — 512 MB f32 here.
SIM_ELEMENT_BUDGET = 64 * 1024 * 1024


def _bucket(n: int, minimum: int = 32) -> int:
    """Round up to the next power of two (≥ minimum) for shape bucketing."""
    n = max(n, minimum)
    return 1 << (n - 1).bit_length()


@functools.partial(jax.jit, static_argnames=("precision",))
def _pair_sims(
    q: jax.Array,  # [B, NQ, D]
    r: jax.Array,  # [B, NR, D]
    bias: jax.Array,  # scalar
    precision: str = "highest",
) -> jax.Array:
    prec = jax.lax.Precision(precision)
    return (
        jnp.einsum("bqd,brd->bqr", q, r, precision=prec,
                   preferred_element_type=jnp.float32)
        + bias
    )


@functools.partial(jax.jit, static_argnames=("precision",))
def _gathered_pair_sims(
    q_table: jax.Array,  # [Tq, D] query frame features (row 0 = zeros)
    r_table: jax.Array,  # [Tr, D] ref frame features (row 0 = zeros)
    q_idx: jax.Array,  # [B, NQ] int32 rows into q_table (0 = pad)
    r_idx: jax.Array,  # [B, NR] int32 rows into r_table
    bias: jax.Array,
    precision: str = "highest",
) -> jax.Array:
    q = jnp.take(q_table, q_idx, axis=0)  # [B, NQ, D]
    # Ref tables may be stored bfloat16 (capacity); compute in f32.
    r = jnp.take(r_table, r_idx, axis=0).astype(jnp.float32)
    return _pair_sims(q, r, bias, precision)


@functools.lru_cache(maxsize=None)
def _sharded_sims_fn(mesh, axis: str, shard_rows: int, precision: str):
    """Pair similarities from a ROW-SHARDED ref table.

    The resident ref table shards over the corpus mesh (HBM capacity
    for localization scales with the pod instead of one chip); each
    shard gathers the rows it owns (others masked to zero) and runs
    the same einsum as the unsharded path, so every (q, r) inner
    product is computed whole on exactly one shard and every other
    shard contributes exact zeros — the psum_scatter sum is therefore
    bit-identical to the unsharded similarity, and it lands the sims
    already batch-sharded for the TN DP (which partitions over pairs).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    prec = jax.lax.Precision(precision)

    def body(r_local, q_table, q_idx, r_idx, bias):
        start = jax.lax.axis_index(axis) * shard_rows
        loc = r_idx - start
        ok = (loc >= 0) & (loc < shard_rows)
        r = jnp.take(r_local, jnp.clip(loc, 0, shard_rows - 1), axis=0)
        r = jnp.where(ok[..., None], r, 0.0).astype(jnp.float32)
        q = jnp.take(q_table, q_idx, axis=0)
        part = jnp.einsum(
            "bqd,brd->bqr", q, r, precision=prec,
            preferred_element_type=jnp.float32,
        )
        sims = jax.lax.psum_scatter(
            part, axis, scatter_dimension=0, tiled=True
        )
        return sims + bias

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(None, None), P(), P(), P()),
        out_specs=P(axis),
    )
    return jax.jit(fn)


def _fetch(x) -> np.ndarray:
    """Device→host pull that also works when the array is sharded over
    a multi-PROCESS mesh (pod serving): non-addressable shards can't be
    np.asarray'd directly, so all ranks all-gather the global value —
    every rank calls this from the same SPMD request, so the collective
    stays in lockstep."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


class Localization(abc.ABC):
    @abc.abstractmethod
    def localize(self, candidate: CandidatePair) -> List[Match]:
        ...

    def localize_all(self, candidates: List[CandidatePair]) -> List[Match]:
        matches = []
        for candidate in candidates:
            matches.extend(self.localize(candidate))
        return matches


class LocalizationWithMetadata(Localization):
    def __init__(self, queries: List[VideoFeature], refs: List[VideoFeature]):
        self.queries = {m.video_id: m for m in queries}
        self.refs = {m.video_id: m for m in refs}

    def similarity(self, candidate: CandidatePair) -> np.ndarray:
        a = self.queries[candidate.query_id].feature
        b = self.refs[candidate.ref_id].feature
        return np.matmul(a, b.T)


class TNLocalization(LocalizationWithMetadata):
    """Temporal-network localization, batched on device.

    Accepts the reference's construction signature
    (model_type="TN", tn_max_step, min_length, concurrency,
    similarity_bias; reference: vsc/baseline/sscd_baseline.py:118-135).
    ``concurrency`` is accepted and ignored — batching replaces the CPU
    process pool.
    """

    def __init__(
        self,
        queries: List[VideoFeature],
        refs: List[VideoFeature],
        model_type: str = "TN",
        similarity_bias: float = 0.0,
        tn_max_step: int = 5,
        min_length: int = 4,
        concurrency: int = 0,
        min_sim: float = 0.2,
        top_k_per_row: int = 10,
        max_paths: int = 10,
        adaptive_sigma: float = 2.5,
        vcsl_faithful: bool = False,
        mesh=None,
        shard_ref_table: bool = False,
        table_dtype: str = "float32",
        **kwargs,
    ):
        super().__init__(queries, refs)
        if model_type != "TN":
            raise ValueError(f"Unsupported alignment model type: {model_type}")
        del concurrency, kwargs
        self.similarity_bias = similarity_bias
        # Resident REF tables may store bfloat16 (2x matching capacity
        # per chip, matching the retrieval corpus's --bf16 story); the
        # gathered rows upcast to f32 before the similarity einsum, so
        # only the stored feature values round. Query tables stay f32
        # (per-request, never corpus-sized).
        if table_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"Unsupported table_dtype: {table_dtype}")
        self._table_dtype = (
            jnp.float32 if table_dtype == "float32" else jnp.bfloat16
        )
        # Optional jax.sharding.Mesh: candidate batches shard across its
        # first axis (each pair's DP is independent, so XLA partitions
        # the batched alignment with zero collectives — the TPU analog
        # of the reference's 16-process VCSL pool, but over chips).
        self._align_sharding = None
        # shard_ref_table additionally ROW-SHARDS the resident ref
        # frame table over the same mesh axis: matching capacity scales
        # with the pod (the table was previously one single-device
        # array) and results stay bit-identical (_sharded_sims_fn).
        self._table_mesh = None
        if shard_ref_table and mesh is None:
            raise ValueError("shard_ref_table requires a mesh")
        if mesh is not None:
            from vsc2022_tpu.parallel.mesh import (
                first_axis_sharding,
                first_axis_size,
            )

            self._mesh_devices = first_axis_size(mesh)
            self._align_sharding = first_axis_sharding(mesh)
            if shard_ref_table:
                self._table_mesh = mesh
        if vcsl_faithful:
            # Parity configuration: published VCSL TN gating/extraction
            # (absolute min_sim, top-K=5, path-cell masking, max_iou
            # dedup) instead of the tuned adaptive gate.
            self.params = TNParams.vcsl_faithful(
                max_step=tn_max_step,
                min_length=min_length,
                max_paths=max_paths,
            )
        else:
            self.params = TNParams(
                max_step=tn_max_step,
                min_length=min_length,
                max_paths=max_paths,
                min_sim=min_sim,
                top_k_per_row=top_k_per_row,
                adaptive_sigma=adaptive_sigma,
            )

    def similarity(self, candidate: CandidatePair) -> np.ndarray:
        """Biased similarity — some alignment methods do not tolerate
        negative values well (reference: vsc/baseline/localization.py:49-54)."""
        return super().similarity(candidate) + self.similarity_bias

    # -- batched device path --------------------------------------------

    def _features_for(
        self, candidate: CandidatePair
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Per-pair (query, ref) feature matrices used for similarity.
        DnS overrides this to use fine-grained features."""
        return (
            self.queries[candidate.query_id].feature,
            self.refs[candidate.ref_id].feature,
        )

    def set_queries(self, queries: List[VideoFeature]) -> None:
        """Replace the query set, keeping the reference frame rows
        device-resident (resident serving: per-request queries are
        small, the reference corpus is not — only the new query rows
        cross the host link; the ref table is reused on device with
        no corpus-sized copies)."""
        self.queries = {m.video_id: m for m in queries}
        self._q_table = None
        self._q_offs = None

    def add_refs(self, refs: List[VideoFeature]) -> None:
        """Extend the reference set (serving `add`). A resident ref
        table grows DEVICE-side — only the new videos' rows cross the
        host link (an HBM-to-HBM concat); without a staged table the
        next alignment builds it whole as before."""
        for m in refs:
            self.refs[m.video_id] = m
        if getattr(self, "_r_table", None) is not None:
            try:
                if self._table_mesh is not None:
                    self._r_table, self._r_rows = self._grow_sharded(
                        self._r_table, self._r_rows, self._r_offs, refs
                    )
                else:
                    self._r_table = self._grow_table(
                        self._r_table, self._r_offs, refs
                    )
            except Exception:
                # Growth failed device-side: drop the staged table so
                # the next alignment rebuilds from self.refs (which
                # already includes the new videos) instead of serving
                # a table whose offsets miss them (mirrors the
                # remove_refs failure contract).
                self._r_table, self._r_offs = None, None
                self._r_rows = None
                raise

    def remove_refs(self, video_ids) -> None:
        """Drop reference videos (serving `remove`). A staged ref table
        compacts DEVICE-side: one gather keeps the survivors' rows in
        insertion order behind the pad row — the exact fresh-build
        layout — reclaiming the removed rows' HBM (and any dead weight
        left by id overwrites). Unknown ids raise before any state
        mutates."""
        drop = set(video_ids)
        missing = [str(v) for v in drop if v not in self.refs]
        if missing:
            raise KeyError(f"Video ids not staged: {sorted(missing)[:5]}")
        for v in drop:
            del self.refs[v]
        if getattr(self, "_r_table", None) is not None:
            try:
                if self._table_mesh is not None:
                    (
                        self._r_table, self._r_offs, self._r_rows,
                    ) = self._compact_sharded(
                        self._r_table, self._r_offs, self.refs
                    )
                else:
                    self._r_table, self._r_offs = self._compact_table(
                        self._r_table, self._r_offs, self.refs
                    )
            except Exception:
                # Compaction failed device-side: drop the staged table
                # so the next alignment rebuilds from self.refs (which
                # already shrank) instead of serving stale rows.
                self._r_table, self._r_offs = None, None
                self._r_rows = None
                raise

    @staticmethod
    def _compact_table(table, offsets, source):
        """Gather the surviving videos' rows into a fresh-layout table
        (pad row 0 first, then each video of ``source`` in insertion
        order — the same order ``_build_table`` walks). Only the int32
        gather indices cross the host link; the index vector builds
        vectorized (corpus-scale removes must not walk Python ints)."""
        spans = [(offsets[vid], vid) for vid in source]
        idx = np.concatenate(
            [np.zeros(1, dtype=np.int32)]
            + [
                np.arange(start, start + n, dtype=np.int32)
                for (start, n), _ in spans
            ]
        )
        new_offs = {}
        cursor = 1
        for (_, n), vid in spans:
            new_offs[vid] = (cursor, n)
            cursor += n
        return jnp.take(table, jnp.asarray(idx), axis=0), new_offs

    def _grow_sharded(self, table, logical, offsets, vids, row_fn=None):
        """Sharded-table append (serving `add`): the new rows write at
        the logical row count inside one jit whose out_shardings keeps
        the table row-sharded — when the padding must grow, GSPMD
        redistributes the resident rows over ICI; the corpus never
        revisits the host link (same pattern as the sharded searcher's
        append_rows)."""
        cursor = int(logical)
        rows = []
        for vf in vids:
            feat = (
                np.asarray(vf.feature, dtype=np.float32)
                if row_fn is None else row_fn(vf)
            )
            offsets[vf.video_id] = (cursor, feat.shape[0])
            rows.append(feat)
            cursor += feat.shape[0]
        if not rows:
            return table, logical
        new_rows = np.concatenate(rows, axis=0)
        n_dev = self._table_mesh.devices.size
        n_pad = _ceil_to(cursor, n_dev)
        grow = n_pad - int(table.shape[0])

        def _append(tab, rws, offset):
            if grow > 0:
                tab = jnp.pad(tab, ((0, grow), (0, 0)))
            return jax.lax.dynamic_update_slice(
                tab, rws.astype(tab.dtype), (offset, 0)
            )

        table = jax.jit(_append, out_shardings=self._row_sharding())(
            table, jnp.asarray(new_rows),
            jnp.asarray(int(logical), jnp.int32),
        )
        return table, cursor

    def _compact_sharded(self, table, offsets, source, row_fn=None):
        """Sharded-table compaction (serving `remove`): one jitted
        gather with sharded out_shardings lands the survivors on the
        fresh-stage layout — survivors rebalance across shards over
        ICI, only the int32 index vector crosses the host link."""
        import functools as _ft

        from vsc2022_tpu.ops.similarity import _compact_gather

        del row_fn
        spans = [(offsets[vid], vid) for vid in source]
        idx = np.concatenate(
            [np.zeros(1, dtype=np.int32)]
            + [
                np.arange(start, start + n, dtype=np.int32)
                for (start, n), _ in spans
            ]
        )
        new_total = int(idx.size)
        n_dev = self._table_mesh.devices.size
        n_pad = _ceil_to(new_total, n_dev)
        idx_pad = np.zeros((n_pad,), dtype=np.int32)
        idx_pad[:new_total] = idx
        table = jax.jit(
            _ft.partial(_compact_gather, n_pad=n_pad, new_total=new_total),
            out_shardings=self._row_sharding(),
        )(table, jnp.asarray(idx_pad))
        new_offs = {}
        cursor = 1
        for (_, n), vid in spans:
            new_offs[vid] = (cursor, n)
            cursor += n
        return table, new_offs, new_total

    def _grow_table(self, table, offsets, vids, row_fn=None):
        """Append videos' rows to a staged device table, extending
        ``offsets`` in place; the resident rows never re-transfer. The
        result is gather-equivalent to a fresh build (offsets address
        rows absolutely, so row order never matters)."""
        cursor = int(table.shape[0])
        rows = []
        for vf in vids:
            if row_fn is None:
                feat = np.asarray(vf.feature, dtype=np.float32)
            else:
                feat = row_fn(vf)
            offsets[vf.video_id] = (cursor, feat.shape[0])
            rows.append(feat)
            cursor += feat.shape[0]
        if not rows:
            return table
        new = jnp.asarray(np.concatenate(rows, axis=0)).astype(table.dtype)
        return jnp.concatenate([table, new], axis=0)

    @staticmethod
    def _build_table(source, d_fallback: int = 1, row_fn=None):
        """One device table of a source's frame rows (row 0 is a zero
        pad row for masked gathers) + per-video (start, n) offsets.
        ``row_fn`` maps a VideoFeature to its [n, d] float32 rows
        (subclass hook: the DnS fine features rescale + flatten)."""
        offsets = {}
        rows = []
        cursor = 1
        d = d_fallback
        for vid, vf in source.items():
            if row_fn is None:
                feat = np.asarray(vf.feature, dtype=np.float32)
            else:
                feat = row_fn(vf)
            d = feat.shape[1]
            offsets[vid] = (cursor, feat.shape[0])
            rows.append(feat)
            cursor += feat.shape[0]
        table = np.concatenate(
            [np.zeros((1, d), np.float32)] + rows, axis=0
        )
        return jnp.asarray(table), offsets

    # -- sharded resident ref table (capacity scales with the mesh) ----

    def _row_sharding(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self._table_mesh
        return NamedSharding(mesh, P(mesh.axis_names[0], None))

    def _place_row_sharded(self, table):
        """Pad a freshly built table to the mesh multiple and lay it
        out row-sharded; returns (sharded table, logical row count).
        Offsets address rows absolutely, so tail padding is invisible
        to every gather."""
        n_dev = self._table_mesh.devices.size
        logical = int(table.shape[0])
        n_pad = _ceil_to(logical, n_dev)
        if n_pad != logical:
            table = jnp.pad(table, ((0, n_pad - logical), (0, 0)))
        return jax.device_put(table, self._row_sharding()), logical

    def _pair_tables(self):
        """Separate query/ref device tables: the ref table stages once
        and ``set_queries`` rebuilds only the query side — per-request
        cost is the new query rows, never a corpus-sized concat/copy.
        (The DnS subclass mirrors this split for its fine tables.)
        Under ``shard_ref_table`` the ref table is row-sharded over the
        corpus mesh and the query table replicated."""
        if getattr(self, "_r_table", None) is None:
            self._r_table, self._r_offs = self._build_table(self.refs)
            if self._table_dtype != jnp.float32:
                self._r_table = self._r_table.astype(self._table_dtype)
            self._r_rows = None
            if self._table_mesh is not None:
                self._r_table, self._r_rows = self._place_row_sharded(
                    self._r_table
                )
        if getattr(self, "_q_table", None) is None:
            self._q_table, self._q_offs = self._build_table(
                self.queries, d_fallback=int(self._r_table.shape[1])
            )
            if self._table_mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                self._q_table = jax.device_put(
                    self._q_table,
                    NamedSharding(self._table_mesh, P(None, None)),
                )
        return self._q_table, self._q_offs, self._r_table, self._r_offs

    @staticmethod
    def _indices_from(offsets, video_ids: Sequence, n_pad: int):
        """[B, n_pad] row indices into one table (0 = pad row). Videos
        longer than the pad truncate (DnS: ragged fine vs coarse frame
        counts bucket by the coarse side)."""
        idx = np.zeros((len(video_ids), n_pad), dtype=np.int32)
        lengths = np.empty(len(video_ids), dtype=np.int32)
        for i, vid in enumerate(video_ids):
            start, n = offsets[vid]
            n = min(n, n_pad)
            idx[i, :n] = np.arange(start, start + n, dtype=np.int32)
            lengths[i] = n
        return idx, lengths

    def _batch_sims(
        self, candidates: Sequence[CandidatePair], nq: int, nr: int
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Build [B, nq, nr] similarity matrices for same-bucket pairs
        via on-device gathers from the staged query/ref tables."""
        q_table, q_offs, r_table, r_offs = self._pair_tables()
        q_idx, q_len = self._indices_from(
            q_offs, [c.query_id for c in candidates], nq
        )
        r_idx, r_len = self._indices_from(
            r_offs, [c.ref_id for c in candidates], nr
        )
        if self._table_mesh is not None:
            # psum_scatter tiles the pair batch over the mesh, so pad
            # it to the device count up front (pad rows gather the
            # zero row and carry length 0; _localize_bucket's own
            # padding then no-ops and its device_put sees the sims
            # already laid out batch-sharded).
            n_dev = self._table_mesh.devices.size
            b_pad = _ceil_to(len(candidates), n_dev)
            if b_pad != len(candidates):
                grow = b_pad - len(candidates)
                q_idx = np.pad(q_idx, ((0, grow), (0, 0)))
                r_idx = np.pad(r_idx, ((0, grow), (0, 0)))
                q_len = np.pad(q_len, (0, grow))
                r_len = np.pad(r_len, (0, grow))
            axis = self._table_mesh.axis_names[0]
            fn = _sharded_sims_fn(
                self._table_mesh, axis,
                int(r_table.shape[0]) // n_dev, "highest",
            )
            sims = fn(
                r_table, q_table, jnp.asarray(q_idx), jnp.asarray(r_idx),
                jnp.float32(self.similarity_bias),
            )
        else:
            sims = _gathered_pair_sims(
                q_table, r_table, jnp.asarray(q_idx), jnp.asarray(r_idx),
                jnp.float32(self.similarity_bias),
            )
        return sims, jnp.asarray(q_len), jnp.asarray(r_len)

    # Overridable per subclass: fused DnS similarity needs ~11 live
    # [B, NQ, NR] tensors, so it uses a smaller budget.
    sim_element_budget = SIM_ELEMENT_BUDGET

    def localize_all(self, candidates: List[CandidatePair]) -> List[Match]:
        # Geometry trail of this call's alignment dispatches
        # [(batch, nq_bucket, nr_bucket), ...]: the serving `probe`
        # command replays the shapes (the TN DP is shape-bound) to
        # report a relay-jitter-free per-request compute figure.
        self.last_align_geoms = []
        buckets: Dict[Tuple[int, int], List[int]] = defaultdict(list)
        for idx, c in enumerate(candidates):
            qf, rf = self._features_for(c)
            buckets[(_bucket(qf.shape[0]), _bucket(rf.shape[0]))].append(idx)

        # Lag-1 pipelining over chunks (the inference extractor's
        # dispatch pattern, inference/pipeline.py): chunk n+1's sims +
        # TN DP are dispatched BEFORE chunk n's packed result is
        # pulled, so the per-chunk D2H round trip overlaps device
        # compute instead of serializing with it. Multi-process pods
        # stay in lockstep: every rank runs the same chunk order, and
        # the fetch's collective (if sharded) happens at the same
        # program point on all ranks.
        matches: List[Match] = []
        pending = None  # (chunk, packed device array)
        done = 0

        def finish(chunk, packed_dev):
            nonlocal done
            matches.extend(self._finish_bucket(chunk, packed_dev))
            done += len(chunk)
            if done < len(candidates) or done > _PROGRESS_MIN:
                logger.info(
                    "%d/%d pairs aligned (%d predictions)",
                    done, len(candidates), len(matches),
                )

        for (nq, nr), idxs in sorted(buckets.items()):
            max_b = max(1, self.sim_element_budget // (nq * nr))
            for chunk_start in range(0, len(idxs), max_b):
                chunk = [
                    candidates[i] for i in idxs[chunk_start : chunk_start + max_b]
                ]
                packed_dev = self._dispatch_bucket(chunk, nq, nr)
                if pending is not None:
                    finish(*pending)
                pending = (chunk, packed_dev)
        if pending is not None:
            finish(*pending)
        return matches

    def _localize_bucket(
        self, chunk: Sequence[CandidatePair], nq: int, nr: int
    ) -> List[Match]:
        return self._finish_bucket(
            chunk, self._dispatch_bucket(chunk, nq, nr)
        )

    def _dispatch_bucket(
        self, chunk: Sequence[CandidatePair], nq: int, nr: int
    ):
        """Dispatch one chunk's whole device program — gathered sims +
        TN DP + output packing — returning the (unfetched) packed
        device array so the caller can overlap the pull."""
        if not hasattr(self, "last_align_geoms"):
            self.last_align_geoms = []
        self.last_align_geoms.append((len(chunk), nq, nr))
        sims, q_len, r_len = self._batch_sims(chunk, nq, nr)
        if self._align_sharding is not None:
            # Pad the pair batch to the mesh axis and place it
            # shard-wise; the batched DP partitions along it.
            b = sims.shape[0]
            b_pad = -(-b // self._mesh_devices) * self._mesh_devices
            if b_pad != b:
                sims = jnp.pad(sims, ((0, b_pad - b), (0, 0), (0, 0)))
                q_len = jnp.pad(q_len, (0, b_pad - b))
                r_len = jnp.pad(r_len, (0, b_pad - b))
            sims = jax.device_put(sims, self._align_sharding)
            q_len = jax.device_put(q_len, self._align_sharding)
            r_len = jax.device_put(r_len, self._align_sharding)
        return tn_align_packed(sims, q_len, r_len, self.params)

    def _finish_bucket(
        self, chunk: Sequence[CandidatePair], packed_dev
    ) -> List[Match]:
        # One packed D2H pull for the whole alignment batch: three
        # separate pulls cost three dispatch round trips on a relayed
        # host link (~60% of the 512-pair DnS wall measured round 4 —
        # tools/profile_dns.py).
        packed = _fetch(packed_dev)[: len(chunk)]
        boxes = packed[..., :4].astype(np.int32)
        valid = packed[..., 4] > 0.5
        box_scores = packed[..., 5]

        matches = []
        for bi, candidate in enumerate(chunk):
            query = self.queries[candidate.query_id]
            ref = self.refs[candidate.ref_id]
            for pi in range(boxes.shape[1]):
                if not valid[bi, pi]:
                    continue
                x1, y1, x2, y2 = (int(v) for v in boxes[bi, pi])
                match = Match(
                    query_id=candidate.query_id,
                    ref_id=candidate.ref_id,
                    query_start=query.get_timestamps(x1)[0],
                    query_end=query.get_timestamps(x2)[1],
                    ref_start=ref.get_timestamps(y1)[0],
                    ref_end=ref.get_timestamps(y2)[1],
                    score=self.score(candidate, float(box_scores[bi, pi])),
                )
                matches.append(match)
        return matches

    def localize(self, candidate: CandidatePair) -> List[Match]:
        return self.localize_all([candidate])

    def score(self, candidate: CandidatePair, box_max_sim: float) -> float:
        return 1.0


class TNLocalizationMaxSim(TNLocalization):
    """Score = max similarity inside the box, bias-corrected
    (reference: vsc/baseline/localization.py:88-91)."""

    def score(self, candidate: CandidatePair, box_max_sim: float) -> float:
        return box_max_sim - self.similarity_bias


class TNLocalizationCandidateScore(TNLocalization):
    """Score = the candidate pair's retrieval score
    (reference: vsc/baseline/localization.py:94-96)."""

    def score(self, candidate: CandidatePair, box_max_sim: float) -> float:
        return candidate.score


# Reference-compatible aliases: users migrating from the reference can
# keep their class names (the VCSL engine itself is replaced by the
# on-device TN kernel).
VCSLLocalizationMaxSim = TNLocalizationMaxSim
VCSLLocalizationCandidateScore = TNLocalizationCandidateScore
