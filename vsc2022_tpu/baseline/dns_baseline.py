#!/usr/bin/env python3
"""DnS matching baseline: retrieval on coarse descriptors, localization
on fine-grained chamfer similarity fused with the coarse similarity.

Reference contract (reference: vsc/baseline/dns_baseline.py): search on
1024-d coarse (score-normed) descriptors; per-candidate similarity is
the fine-grained student similarity — optionally symmetrized
((sim + sim(r,q)ᵀ)/2), rescaled to [0,1] — geometric-mean fused with
the coarse similarity (√(clip(fg)·clip(cg))), then TN-aligned with the
same parameters as the SSCD path.

TPU design: the reference computes fine similarity one pair at a time
through TorchScript (dns_baseline.py:138-163 — a device round-trip per
pair). Here the region-chamfer, symmetrization, rescale and fusion are
one fused jit over a whole padded candidate batch.
"""

import argparse
import functools
import logging
import os
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vsc2022_tpu.baseline import pipeline
from vsc2022_tpu.localization.localize import TNLocalizationMaxSim
from vsc2022_tpu.metrics import CandidatePair, Dataset, Match
from vsc2022_tpu.models.dns import NUM_REGIONS
from vsc2022_tpu.storage import convert_to_dict, load_features
from vsc2022_tpu.types import VideoFeature

from vsc2022_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

logging.basicConfig(
    format="%(asctime)s %(levelname)-8s %(message)s",
    level=logging.INFO,
    datefmt="%Y-%m-%d %H:%M:%S",
)
logger = logging.getLogger("dns_baseline.py")
logger.setLevel(logging.INFO)


parser = argparse.ArgumentParser()
parser.add_argument(
    "--query_coarse_features", type=str, required=True,
    help="Path to query coarse descriptors",
)
parser.add_argument(
    "--ref_coarse_features", type=str, required=True,
    help="Path to reference coarse descriptors",
)
parser.add_argument(
    "--query_fine_features", type=str, required=True,
    help="Path to query fine descriptors",
)
parser.add_argument(
    "--ref_fine_features", type=str, required=True,
    help="Path to reference fine descriptors",
)
parser.add_argument(
    "--fg_type", choices=["att", "bin"], default="att",
    help="Fine-grained feature variant (bin features are rescaled to ±1).",
)
parser.add_argument(
    "--output_path", type=str, required=True,
    help="The path to write match predictions.",
)
parser.add_argument(
    "--ground_truth", type=str, help="Path to the ground truth (labels) CSV file."
)
parser.add_argument(
    "--overwrite", help="Overwrite prediction files, if found.", action="store_true"
)
parser.add_argument(
    "--vcsl_faithful_tn", action="store_true",
    help="Align with the published VCSL TN configuration (absolute "
    "min_sim gate, top-K=5, path-cell masking, max_iou dedup) instead "
    "of the tuned adaptive gate.",
)
parser.add_argument(
    "--torchscript_path", type=str, default=None,
    help="Accepted for reference-invocation compatibility "
    "(vsc/baseline/dns_baseline.py uses the fg student TorchScript to "
    "compute fine similarity; here the tested native chamfer formula "
    "computes it from the indexed fine features). When given, the "
    "module's student_type is validated and fg_type inferred.",
)
parser.add_argument(
    "--accelerator", choices=["cpu", "tpu"], default="tpu",
)


def _chamfer_fuse(qf, rf, qc, rc, bias, symmetric, prec,
                  default_kernel_ok=False):
    """Batched chamfer similarity, symmetrized, rescaled, geo-fused.

    All R·R region pair products come from ONE batched matmul: query
    frames flatten region-minor ([B, NQ·R, D]) and ref frames flatten
    region-MAJOR ([B, R·NR, D]), so the [B, NQ·R, R·NR] product
    reshapes to [B, NQ, R(a), R(c), NR] with the frame axes in the
    lane dimension — both chamfer reductions (max over one region
    axis, mean over the other) then run over sublane axes at full lane
    width. One MXU contraction replaces the 9×9 separate einsums with
    VPU running-max chains this path used through round 2 (~10x fewer
    HBM round trips at the production bucket)."""
    b, nq, r, d = qf.shape
    nr = rf.shape[1]
    chamfer_flag = os.environ.get("VSC2022_TPU_CHAMFER_PALLAS", "")
    if chamfer_flag == "interpret":
        use_kernel = True
    elif chamfer_flag == "1":
        use_kernel = jax.default_backend() == "tpu"
    elif chamfer_flag == "0":
        use_kernel = False
    else:
        # DEFAULT-ON for the unsharded TPU path (round-4 A/B,
        # in-dispatch differenced at the 512-pair bench bucket:
        # kernel 12.1 vs XLA 14.9 ms at highest precision, 8.5 vs
        # 10.4 at default — tools/profile_dns.py; bench.py records
        # the standing e2e A/B every round). The sharded shard_map
        # body stays opt-in ("1") until Pallas-in-shard_map is
        # validated on real multi-chip hardware.
        use_kernel = (
            default_kernel_ok and jax.default_backend() == "tpu"
        )
    if use_kernel:
        # Fused Pallas chamfer: the [B, NQ, R, R, NR] region-pair
        # product stays tile-local in VMEM instead of round-tripping
        # HBM for the reduction passes (ops/pallas_kernels.py
        # chamfer_fine_sims). Same values as the einsum below.
        from vsc2022_tpu.ops.pallas_kernels import chamfer_fine_sims

        fg = chamfer_fine_sims(
            qf, rf, symmetric=symmetric,
            precision=(
                "default" if prec == jax.lax.Precision.DEFAULT
                else "highest"
            ),
            interpret=chamfer_flag == "interpret",
        )
    else:
        p = jnp.einsum(
            "bmd,bnd->bmn",
            qf.reshape(b, nq * r, d),
            jnp.moveaxis(rf, 2, 1).reshape(b, r * nr, d),
            precision=prec, preferred_element_type=jnp.float32,
        ).reshape(b, nq, r, r, nr)  # [B, NQ, a, c, NR]
        fg = jnp.mean(jnp.max(p, axis=3), axis=2)  # mean_a max_c
        if symmetric:
            # sim(ref, query)ᵀ: mean over ref regions of max over
            # query regions.
            fg = (fg + jnp.mean(jnp.max(p, axis=2), axis=2)) / 2.0
    fg = fg / 2.0 + 0.5  # rescale [-1,1] → [0,1]

    cg = (
        jnp.einsum("bqd,bnd->bqn", qc, rc, precision=prec,
                   preferred_element_type=jnp.float32)
        + bias
    )
    return jnp.sqrt(jnp.clip(fg, 1e-7) * jnp.clip(cg, 1e-7))


@functools.partial(jax.jit, static_argnames=("symmetric", "precision"))
def _fused_fine_coarse_sims(
    qf: jax.Array,  # [B, NQ, R, D] fine
    rf: jax.Array,  # [B, NR, R, D]
    qc: jax.Array,  # [B, NQ, DC] coarse
    rc: jax.Array,  # [B, NR, DC]
    bias: jax.Array,
    symmetric: bool = True,
    precision: str = "highest",
) -> jax.Array:
    """Chamfer+coarse fusion over explicit feature batches."""
    return _chamfer_fuse(
        qf, rf, qc, rc, bias, symmetric, jax.lax.Precision(precision)
    )


@functools.partial(
    jax.jit, static_argnames=("symmetric", "precision", "regions")
)
def _gathered_dns_sims(
    qc_table: jax.Array,  # [1+Tq, DC] coarse (row 0 = zero pad)
    rc_table: jax.Array,  # [1+Tr, DC]
    qf_table: jax.Array,  # [1+Tq, R*D] fine (row 0 = zero pad)
    rf_table: jax.Array,  # [1+Tr, R*D]
    qc_idx: jax.Array, rc_idx: jax.Array,  # [B, N*] int32 rows
    qf_idx: jax.Array, rf_idx: jax.Array,
    bias: jax.Array,
    symmetric: bool = True,
    precision: str = "highest",
    regions: int = NUM_REGIONS,
) -> jax.Array:
    """Chamfer+coarse fusion from device-resident feature tables: the
    per-batch inputs are tiny index matrices instead of re-shipped
    feature tensors (the host-assembled variant moved ~90 MB per
    512-pair batch through the host link). Query and ref tables are
    split so a resident server replaces the query side per request
    without restaging the reference rows."""
    qc = jnp.take(qc_table, qc_idx, axis=0)
    # Ref tables may be stored bfloat16 (capacity); compute in f32.
    rc = jnp.take(rc_table, rc_idx, axis=0).astype(jnp.float32)
    qf = jnp.take(qf_table, qf_idx, axis=0)
    rf = jnp.take(rf_table, rf_idx, axis=0).astype(jnp.float32)
    qf = qf.reshape(*qf.shape[:2], regions, -1)
    rf = rf.reshape(*rf.shape[:2], regions, -1)
    return _chamfer_fuse(
        qf, rf, qc, rc, bias, symmetric, jax.lax.Precision(precision),
        default_kernel_ok=True,
    )


@functools.lru_cache(maxsize=None)
def _sharded_dns_sims_fn(
    mesh, axis: str, mc: int, mf: int, symmetric: bool, precision: str,
    regions: int,
):
    """Fused DnS similarities from ROW-SHARDED reference tables.

    The chamfer is nonlinear in the gathered ref rows (max/mean over
    regions), so — unlike the linear SSCD-track sims — the ROWS
    themselves cross shards: each shard masks-and-gathers the coarse
    and fine rows it owns (exact zeros elsewhere) and a psum_scatter
    over the pair batch hands every shard the TRUE rows of its pair
    tile. The fused chamfer then runs per tile, landing the sims
    already pair-sharded for the TN DP. Each ref row is owned by
    exactly one shard, so the scattered rows are exact and the tile
    chamfer sees the same inputs as the unsharded path."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    prec = jax.lax.Precision(precision)

    def _tile_rows(local, idx, m):
        start = jax.lax.axis_index(axis) * m
        loc = idx - start
        ok = (loc >= 0) & (loc < m)
        rows = jnp.take(local, jnp.clip(loc, 0, m - 1), axis=0)
        rows = jnp.where(ok[..., None], rows, 0.0)
        # Scatter in the stored dtype (bf16 tables halve the ICI
        # bytes; owner-row + exact zeros sums exactly), upcast after.
        return jax.lax.psum_scatter(
            rows, axis, scatter_dimension=0, tiled=True
        ).astype(jnp.float32)

    def body(
        rc_local, rf_local, qc_table, qf_table,
        qc_idx, rc_idx, qf_idx, rf_idx, bias,
    ):
        rc = _tile_rows(rc_local, rc_idx, mc)  # [B/S, NR, DC]
        rf = _tile_rows(rf_local, rf_idx, mf)  # [B/S, NR, R*D]
        qc = jnp.take(qc_table, qc_idx, axis=0)  # qc_idx arrives tiled
        qf = jnp.take(qf_table, qf_idx, axis=0)
        qf = qf.reshape(*qf.shape[:2], regions, -1)
        rf = rf.reshape(*rf.shape[:2], regions, -1)
        return _chamfer_fuse(qf, rf, qc, rc, bias, symmetric, prec)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(
            P(axis, None), P(axis, None), P(None, None), P(None, None),
            P(axis), P(), P(axis), P(), P(),
        ),
        out_specs=P(axis),
    )
    return jax.jit(fn)


class DnSLocalization(TNLocalizationMaxSim):
    """Fine+coarse fused similarity feeding the TN aligner
    (the reference's VCSLLocalizationDnS; dns_baseline.py:108-163)."""

    # Budget unit is B·NQ·NR; the fused chamfer's region-pair product
    # is 81× that unit ([B, 9·NQ, 9·NR]), so 4M units ≈ a 1.3 GB
    # transient per alignment dispatch plus the running-max
    # intermediates — sized to leave HBM headroom for the resident
    # fine+coarse feature tables AND the extra in-flight chunk that
    # localize_all's lag-1 pipelining keeps enqueued.
    sim_element_budget = 4 * 1024 * 1024

    def __init__(
        self,
        queries_fine: Dict[str, VideoFeature],
        refs_fine: Dict[str, VideoFeature],
        queries_coarse: List[VideoFeature],
        refs_coarse: List[VideoFeature],
        model_type: str = "TN",
        fg_type: str = "att",
        symmetric: bool = True,
        geometric_mean: bool = True,
        **kwargs,
    ):
        super().__init__(queries_coarse, refs_coarse, model_type, **kwargs)
        self.queries_fine = queries_fine
        self.refs_fine = refs_fine
        self.fg_type = fg_type
        self.symmetric = symmetric
        self.geometric_mean = geometric_mean

    def set_queries(self, queries, queries_fine=None):
        """Query replacement must swap the fine features too. Both the
        coarse and fine REFERENCE tables stay device-resident (the
        base class keeps split query/ref tables); only the new query
        rows cross the host link."""
        if queries_fine is None:
            raise ValueError(
                "DnS localization needs fine features: pass queries_fine"
            )
        super().set_queries(queries)
        self.queries_fine = dict(queries_fine)
        self._fine_q_tab = None
        self._fine_q_offs = None

    def add_refs(self, refs_coarse, refs_fine=None):
        """Reference growth must extend the fine side too; both
        resident ref tables grow device-side (only the new videos'
        rows cross the host link)."""
        if refs_fine is None:
            raise ValueError(
                "DnS localization needs fine features: pass refs_fine"
            )
        # Fine dict first: if the coarse table grow fails device-side
        # (base class drops its table and raises), BOTH sides' host
        # dicts still hold the new videos — the next alignment rebuilds
        # both tables rather than KeyError-ing on a half-added id.
        self.refs_fine.update(refs_fine)
        try:
            super().add_refs(refs_coarse)
        except Exception:
            # The staged FINE table's offsets now miss the new videos
            # too (its grow never ran): drop it alongside the coarse
            # table so the next alignment rebuilds both from the grown
            # dicts instead of KeyError-ing on the added ids.
            self._fine_r_tab, self._fine_r_offs = None, None
            self._fine_r_rows = None
            raise
        if getattr(self, "_fine_r_tab", None) is not None:
            # Overwrites repoint their offsets at the appended rows
            # (the old rows become dead weight, same as the base
            # class); serving rejects duplicate ids before this.
            try:
                if self._table_mesh is not None:
                    self._fine_r_tab, self._fine_r_rows = (
                        self._grow_sharded(
                            self._fine_r_tab, self._fine_r_rows,
                            self._fine_r_offs, list(refs_fine.values()),
                            row_fn=self._fine_rows,
                        )
                    )
                else:
                    self._fine_r_tab = self._grow_table(
                        self._fine_r_tab, self._fine_r_offs,
                        list(refs_fine.values()), row_fn=self._fine_rows,
                    )
            except Exception:
                # Same failure contract as the base class: drop the
                # staged fine table so the next alignment rebuilds it
                # from refs_fine (already grown) instead of serving a
                # table whose offsets miss the new videos.
                self._fine_r_tab, self._fine_r_offs = None, None
                self._fine_r_rows = None
                raise

    def remove_refs(self, video_ids) -> None:
        """Reference removal must drop the fine side too; both staged
        ref tables compact device-side onto the fresh-build layout."""
        super().remove_refs(video_ids)
        for v in video_ids:
            self.refs_fine.pop(v, None)
        if getattr(self, "_fine_r_tab", None) is not None:
            try:
                if self._table_mesh is not None:
                    (
                        self._fine_r_tab, self._fine_r_offs,
                        self._fine_r_rows,
                    ) = self._compact_sharded(
                        self._fine_r_tab, self._fine_r_offs,
                        self.refs_fine,
                    )
                else:
                    (
                        self._fine_r_tab, self._fine_r_offs,
                    ) = self._compact_table(
                        self._fine_r_tab, self._fine_r_offs,
                        self.refs_fine,
                    )
            except Exception:
                self._fine_r_tab, self._fine_r_offs = None, None
                self._fine_r_rows = None
                raise

    def _fine(self, vf: VideoFeature) -> np.ndarray:
        f = np.asarray(vf.feature, dtype=np.float32)
        if "bin" in self.fg_type:
            f = 2.0 * f - 1.0  # {0,1} → {-1,+1} (dns_baseline.py:133-136)
        return f.reshape(f.shape[0], NUM_REGIONS, -1)

    def _fine_rows(self, vf: VideoFeature) -> np.ndarray:
        feat = self._fine(vf)
        return feat.reshape(feat.shape[0], -1)

    def _fine_pair_tables(self):
        """Split query/ref device tables of fine region rows — the DnS
        twin of the base class's coarse ``_pair_tables``: the ref side
        stages once, ``set_queries`` rebuilds only the query side."""
        if getattr(self, "_fine_r_tab", None) is None:
            self._fine_r_tab, self._fine_r_offs = self._build_table(
                self.refs_fine, row_fn=self._fine_rows
            )
            if self._table_dtype != jnp.float32:
                self._fine_r_tab = self._fine_r_tab.astype(
                    self._table_dtype
                )
            self._fine_r_rows = None
            if self._table_mesh is not None:
                (
                    self._fine_r_tab, self._fine_r_rows,
                ) = self._place_row_sharded(self._fine_r_tab)
        if getattr(self, "_fine_q_tab", None) is None:
            self._fine_q_tab, self._fine_q_offs = self._build_table(
                self.queries_fine,
                d_fallback=int(self._fine_r_tab.shape[1]),
                row_fn=self._fine_rows,
            )
            if self._table_mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                self._fine_q_tab = jax.device_put(
                    self._fine_q_tab,
                    NamedSharding(self._table_mesh, P(None, None)),
                )
        return (
            self._fine_q_tab, self._fine_q_offs,
            self._fine_r_tab, self._fine_r_offs,
        )

    def _batch_sims(
        self, candidates: Sequence[CandidatePair], nq: int, nr: int
    ):
        qc_tab, qc_offs, rc_tab, rc_offs = self._pair_tables()
        qf_tab, qf_offs, rf_tab, rf_offs = self._fine_pair_tables()
        q_ids = [c.query_id for c in candidates]
        r_ids = [c.ref_id for c in candidates]
        qc_idx, q_len_c = self._indices_from(qc_offs, q_ids, nq)
        rc_idx, r_len_c = self._indices_from(rc_offs, r_ids, nr)
        qf_idx, q_len_f = self._indices_from(qf_offs, q_ids, nq)
        rf_idx, r_len_f = self._indices_from(rf_offs, r_ids, nr)
        # A pair contributes min(fine, coarse) frames (they should
        # match; be robust to ragged inputs) — frames beyond that
        # gather the zero pad row on BOTH tables.
        q_len = np.minimum(q_len_c, q_len_f)
        r_len = np.minimum(r_len_c, r_len_f)
        qcol = np.arange(nq, dtype=np.int32)[None, :]
        rcol = np.arange(nr, dtype=np.int32)[None, :]
        q_mask = qcol < q_len[:, None]
        r_mask = rcol < r_len[:, None]
        qc_m = np.where(q_mask, qc_idx, 0)
        rc_m = np.where(r_mask, rc_idx, 0)
        qf_m = np.where(q_mask, qf_idx, 0)
        rf_m = np.where(r_mask, rf_idx, 0)
        if self._table_mesh is not None:
            # Row-sharded ref tables: pad the pair batch to the mesh
            # multiple (psum_scatter tiles it; pad rows gather the zero
            # row and carry length 0, exactly like the SSCD path).
            n_dev = self._table_mesh.devices.size
            b = len(candidates)
            b_pad = -(-b // n_dev) * n_dev
            if b_pad != b:
                grow = b_pad - b
                qc_m = np.pad(qc_m, ((0, grow), (0, 0)))
                rc_m = np.pad(rc_m, ((0, grow), (0, 0)))
                qf_m = np.pad(qf_m, ((0, grow), (0, 0)))
                rf_m = np.pad(rf_m, ((0, grow), (0, 0)))
                q_len = np.pad(q_len, (0, grow))
                r_len = np.pad(r_len, (0, grow))
            fn = _sharded_dns_sims_fn(
                self._table_mesh, self._table_mesh.axis_names[0],
                int(rc_tab.shape[0]) // n_dev,
                int(rf_tab.shape[0]) // n_dev,
                self.symmetric, "highest", NUM_REGIONS,
            )
            sims = fn(
                rc_tab, rf_tab, qc_tab, qf_tab,
                jnp.asarray(qc_m), jnp.asarray(rc_m),
                jnp.asarray(qf_m), jnp.asarray(rf_m),
                jnp.float32(self.similarity_bias),
            )
        else:
            sims = _gathered_dns_sims(
                qc_tab, rc_tab, qf_tab, rf_tab,
                jnp.asarray(qc_m), jnp.asarray(rc_m),
                jnp.asarray(qf_m), jnp.asarray(rf_m),
                jnp.float32(self.similarity_bias),
                symmetric=self.symmetric,
            )
        return sims, jnp.asarray(q_len), jnp.asarray(r_len)


def search(
    queries: List[VideoFeature],
    refs: List[VideoFeature],
    retrieve_per_query: float = pipeline.RETRIEVE_PER_QUERY,
    candidates_per_query: float = pipeline.CANDIDATES_PER_QUERY,
) -> List[CandidatePair]:
    return pipeline.retrieve_candidates(
        queries, refs, retrieve_per_query, candidates_per_query
    )


def localize_and_verify(
    queries_fine: Dict[str, VideoFeature],
    refs_fine: Dict[str, VideoFeature],
    queries_coarse: List[VideoFeature],
    refs_coarse: List[VideoFeature],
    candidates: List[CandidatePair],
    localize_per_query: float = 5.0,
    fg_type: str = "att",
    vcsl_faithful: bool = False,
) -> List[Match]:
    num_to_localize = int(len(queries_fine) * localize_per_query)
    candidates = candidates[:num_to_localize]

    alignment = DnSLocalization(
        queries_fine,
        refs_fine,
        queries_coarse,
        refs_coarse,
        model_type="TN",
        fg_type=fg_type,
        tn_max_step=5,
        min_length=4,
        similarity_bias=0.5,
        vcsl_faithful=vcsl_faithful,
    )

    return pipeline.align_candidates(alignment, candidates)


def match(
    queries_fine: Dict[str, VideoFeature],
    refs_fine: Dict[str, VideoFeature],
    queries_coarse: List[VideoFeature],
    refs_coarse: List[VideoFeature],
    output_path: str,
    fg_type: str = "att",
    vcsl_faithful: bool = False,
) -> Tuple[str, str]:
    candidates = search(queries_coarse, refs_coarse)
    candidate_file, _ = pipeline.write_stage_artifacts(output_path, candidates)
    matches = localize_and_verify(
        queries_fine, refs_fine, queries_coarse, refs_coarse, candidates,
        fg_type=fg_type, vcsl_faithful=vcsl_faithful,
    )
    _, match_file = pipeline.write_stage_artifacts(
        output_path, candidates, matches
    )
    return candidate_file, match_file


create_pr_plot = pipeline.create_pr_plot


def main(args):
    if getattr(args, "accelerator", "tpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if os.path.exists(args.output_path) and not args.overwrite:
        raise Exception(
            f"Output path already exists: {args.output_path}. "
            "Do you want to --overwrite?"
        )
    if getattr(args, "torchscript_path", None):
        import torch

        module = torch.jit.load(args.torchscript_path, map_location="cpu")
        student_type = getattr(module, "student_type", "fg")
        if student_type != "fg":
            raise Exception(
                "Only fine-grained students are accepted for similarity "
                "calculation."
            )
        args.fg_type = getattr(module, "fg_type", args.fg_type)

    queries_fine = convert_to_dict(
        load_features(args.query_fine_features, Dataset.QUERIES)
    )
    refs_fine = convert_to_dict(load_features(args.ref_fine_features, Dataset.REFS))
    queries_coarse = load_features(args.query_coarse_features, Dataset.QUERIES)
    refs_coarse = load_features(args.ref_coarse_features, Dataset.REFS)

    candidate_file, match_file = match(
        queries_fine, refs_fine, queries_coarse, refs_coarse, args.output_path,
        fg_type=args.fg_type,
        vcsl_faithful=getattr(args, "vcsl_faithful_tn", False),
    )

    if args.ground_truth:
        pipeline.report_metrics(
            args.ground_truth, candidate_file, match_file, args.output_path,
            logger,
        )


if __name__ == "__main__":
    main(parser.parse_args())
