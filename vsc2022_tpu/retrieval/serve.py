"""Resident retrieval server: stage the corpus once, serve query
batches at search speed.

The reference has no serving story — every eval/baseline invocation
reloads the reference corpus and rebuilds its FAISS index from scratch
(reference: vsc/descriptor_eval_lib.py:27-60, vsc/candidates.py:29-34).
On a TPU that start-up cost dominates repeat usage: staging a 1M-frame
corpus to HBM takes ~50-60 s on a thin host link, while one 9k-video
query batch then searches in ~1 s (docs/performance.md). This
long-lived process pays staging and compilation once; each request
runs the standard candidate protocol — global top-k over all frame
pairs, max-score aggregation to video pairs, per-query budgets
(vsc/descriptor_eval_lib.py:23-24) — and writes a candidates CSV.

Score normalization is served fused: with ``--score_norm_features``
the noise corpus stages alongside the references and every request's
CSLS bias rides the search dispatch (ScoreNormalizedVideoIndex), so
"normalize then search" costs one device round trip, not two stages.

With ``--matches`` the server serves the FULL matching track: after
candidate retrieval it runs the TN temporal localizer over the top
``--localize_per_query`` pairs per query (the sscd_baseline stage with
the same parameters) and writes a matches CSV as well. The localizer's
reference frame rows stay device-resident across requests
(TNLocalization.set_queries) — only each request's query rows cross
the host link.

With ``--ref_fine_features`` the server serves the DnS two-stage
matching track: retrieval runs on the staged coarse corpus (the
score-normalized cg npz that dns_index produces) and localization on
the fused fine-chamfer + coarse similarity (the dns_baseline stage,
same parameters). Both the coarse and fine reference tables stay
device-resident; each request ships only its query rows. Requests
then carry TWO query files — coarse and fine (reference two-level
contract: vsc/baseline/dns_baseline.py:279-286).

Wire protocol (line-oriented, identical over stdin/stdout or — with
``--listen HOST:PORT`` — a TCP socket, so any language can drive it):

    request:   <query_npz_path>[\t<candidates_csv>[\t<matches_csv>]]\n
    DnS mode:  <query_coarse_npz>\t<query_fine_npz>[\t<candidates_csv>[\t<matches_csv>]]\n
    add refs:  add\t<refs_npz>\n   (DnS: add\t<coarse_npz>\t<fine_npz>\n)
    remove:    remove\t<video_id>[\t<video_id>...]\n
    save:      save\t<refs_npz>\n   (DnS: save\t<coarse_npz>\t<fine_npz>\n)
    extract:   extract\t<videos_dir>\t<output_npz>\n
    video in:  searchv\t<videos_dir>[\t<candidates_csv>[\t<matches_csv>]]\n
    stats:     stats\n
    response:  ok\t<candidates_csv>\t<n_pairs>\t<seconds>\n
         or:   ok\t<candidates_csv>\t<n_pairs>\t<matches_csv>\t<n_matches>\t<seconds>\n
         or:   ok\tadded\t<n_new_videos>\t<seconds>\n
         or:   ok\tremoved\t<n_videos>\t<n_frame_rows>\t<seconds>\n
         or:   ok\tsaved\t<n_videos>\t<refs_npz>[\t<fine_npz>]\t<seconds>\n
         or:   ok\textracted\t<n_videos>\t<n_frames>\t<output_npz>\t<seconds>\n
         or:   ok\tstats\t<n_videos>\t<n_frames>\t<dtype>\t<sharded>\t<matches>\n
    error:     error\t<message>\n        (the server keeps serving)
    startup:   ready\t<n_ref_videos>\t<stage_seconds>\n

In-band forms (for clients with no filesystem in common with the
server — the payload bytes ride the request stream itself, length-
prefixed, immediately after the header line):

    search:    searchb\t<query_npz_len>[\t<fine_npz_len>]\n<bytes...>
    add refs:  addb\t<refs_npz_len>[\t<fine_npz_len>]\n<bytes...>
    snapshot:  saveb\n
    response:  okb\t<n_pairs>\t<cand_csv_len>[\t<n_matches>\t<match_csv_len>]\t<seconds>\n<bytes...>
         or:   ok\tadded\t<n_new_videos>\t<seconds>\n
         or:   okb\t<n_videos>\t<coarse_npz_len>[\t<fine_npz_len>]\t<seconds>\n<bytes...>

Both request forms run the same retrieval/TN core, so in-band results
are bit-identical to the path protocol (tests/test_serve.py).

End-to-end serving: with ``--baseline`` + ``--checkpoint_path`` a
descriptor model stays device-resident next to the corpus, and
requests can start from RAW VIDEOS — ``extract`` decodes + embeds a
video directory to a descriptor npz (the serving analog of one
inference CLI run, minus the per-invocation model/compile startup),
and ``searchv`` embeds then searches in one request, query
descriptors never touching disk. searchv results are bit-identical
to extracting with the inference CLI and searching the npz.

``add`` grows the served corpus without a restart (the FAISS-``add``
analog, reference: vsc/index.py:87-94): new reference videos join the
index and the localizer's resident tables; duplicate video ids are
rejected. The staged corpus grows DEVICE-side — only the new rows
cross the host link, and searches recompile only when the padded
corpus shape crosses a block boundary. Sharded corpora re-balance
over ICI when their per-shard padding grows; the resident rows never
revisit the host.

``remove`` shrinks it the same way (the FAISS ``remove_ids`` analog):
the named videos leave the index and the localizer tables, and the
staged corpus compacts DEVICE-side onto the exact fresh-stage layout —
post-remove results are bit-identical to a server freshly started
over the survivors, and the removed rows' HBM is reclaimed. Unknown
ids are rejected without mutating anything.

``save`` persists the mutated corpus: it snapshots the CURRENT
reference set (after any adds/removes) to npz in the standard frozen
schema, in corpus row order — restarting the server on the snapshot
reproduces the live state bit-for-bit. DnS servers save the fine
features to a second npz.

Multi-host (DCN) pods: every rank runs this CLI with the same flags
plus its ``--process_id``; ``--coordinator`` rendezvouses
``jax.distributed`` so the ``--sharded`` corpus mesh spans all ranks'
chips (pod-scale HBM). Rank 0 speaks the client protocol; every
request it accepts is first relayed verbatim to the follower ranks
over the ``--control`` socket, so all ranks execute the same device
program in the same order — a collective entered by one rank alone
would deadlock the mesh. Followers never write files (CSV/npz outputs
are the leader's); path-based commands assume a shared filesystem,
while the in-band forms (searchb/addb) need none since their payload
bytes ride the relay. Leader exit (quit/shutdown/EOF) releases the
followers.

Omitted output paths default to ``<query_npz_path>.candidates.csv`` /
``.matches.csv``. ``quit`` (or EOF) ends the session — in TCP mode
that closes one client connection and the server accepts the next;
``shutdown`` stops the whole server from either transport. TCP
sessions run concurrently (one thread per client — an idle
connection never blocks others) with requests serialized on a device
lock (one chip, one request at a time); each client is greeted with
the ``ready`` line, and the parent stdout gets
``listening\t<host>:<port>`` with the actually-bound port (so
``:0`` picks a free one). Requests with new padded query shapes
recompile once (the persistent compilation cache makes repeats across
server restarts warm too).
"""

from __future__ import annotations

import argparse
import logging
import sys
import time

from vsc2022_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import numpy as np

from vsc2022_tpu.metrics import CandidatePair, Dataset
from vsc2022_tpu.retrieval.candidates import (
    MaxScoreAggregation,
    rank_candidates,
)
from vsc2022_tpu.retrieval.index import (
    ScoreNormalizedVideoIndex,
    VideoIndex,
)
from vsc2022_tpu.storage import load_features, store_features

# Module-level like the other CLIs: `python -m vsc2022_tpu serve`
# dispatches through __main__.py, where __name__ is not "__main__".
logging.basicConfig(
    format="%(asctime)s %(levelname)-8s %(message)s",
    level=logging.INFO,
    datefmt="%Y-%m-%d %H:%M:%S",
    stream=sys.stderr,
)
logger = logging.getLogger("retrieval.serve")

parser = argparse.ArgumentParser(
    description="Resident retrieval server over stdin/stdout"
)
parser.add_argument(
    "--ref_features", required=True,
    help="Reference descriptors npz, staged to device HBM once",
)
parser.add_argument(
    "--score_norm_features",
    help="Noise descriptors npz: serve fused score-normalized search",
)
parser.add_argument("--beta", type=float, default=1.2)
parser.add_argument(
    "--retrieval_per_query", type=int, default=1200,
    help="Frame-hit budget per query video (challenge protocol: 1200)",
)
parser.add_argument(
    "--pairs_per_query", type=int, default=25,
    help="Aggregated pair budget per query video (protocol: 25)",
)
parser.add_argument(
    "--sharded", action="store_true",
    help="Shard the reference corpus across all local devices",
)
_dtype_group = parser.add_mutually_exclusive_group()
_dtype_group.add_argument(
    "--bf16", action="store_true",
    help="Store the corpus AND the resident localizer ref tables in "
    "bfloat16 (2x HBM capacity; similarities still accumulate in f32). "
    "This is the serving DEFAULT since quality validation "
    "(docs/synthetic_results.md): the flag is kept for compatibility.",
)
_dtype_group.add_argument(
    "--f32", action="store_true",
    help="Stage the corpus and localizer ref tables in float32 — "
    "strict bit-parity with the batch pipelines' default dtype, at "
    "half the corpus capacity per chip.",
)
_dtype_group.add_argument(
    "--int8", action="store_true",
    help="Stage the SEARCH corpus in symmetric per-row int8 (the "
    "FAISS SQ8 analog: 4x f32 / 2x bf16 corpus capacity per chip; "
    "search is exact over the dequantized corpus). Localizer ref "
    "tables stay bfloat16 — localization reads raw similarities.",
)
parser.add_argument(
    "--ivf", type=int, default=None, metavar="NLIST",
    help="Lay the search corpus out in NLIST k-means cells (the IVF "
    "pruned tier, ops/ivf.py; 0 = the block-derived default): focused "
    "requests scan only the probed block subset, still EXACT incl. "
    "tie-breaks. Single-chip only (exclusive with --sharded).",
)
parser.add_argument(
    "--ivf_nprobe", type=int, default=None,
    help="Blocks probed per query row under --ivf (default ~1/8 of "
    "the corpus blocks). Tunes speed, never correctness.",
)
parser.add_argument(
    "--no_warmup", action="store_true",
    help="Skip the staging/compile warm-up search before 'ready'",
)
parser.add_argument(
    "--matches", action="store_true",
    help="Also localize (TN alignment) and write a matches CSV",
)
parser.add_argument(
    "--localize_per_query", type=float, default=5,
    help="Pairs per query to localize (sscd_baseline budget: 5)",
)
parser.add_argument(
    "--vcsl_faithful_tn", action="store_true",
    help="Published VCSL TN parity mode for the localizer",
)
parser.add_argument(
    "--ref_fine_features",
    help="DnS fine-grained reference npz: serve the DnS two-stage "
    "matching track (coarse retrieval + fused fine-chamfer "
    "localization). Requests then carry two query files: "
    "<coarse_npz>\\t<fine_npz>. Implies --matches; --ref_features "
    "must be the score-normalized coarse npz from dns_index",
)
parser.add_argument(
    "--fg_type", choices=["att", "bin"], default="att",
    help="DnS fine-grained feature variant (bin rescales to ±1)",
)
parser.add_argument(
    "--listen",
    help="HOST:PORT — serve the same line protocol over a TCP socket "
    "instead of stdin/stdout (port 0 binds a free port, reported on "
    "stdout as listening\\t<host>:<port>)",
)
multihost_parser = parser.add_argument_group(
    "Multi-host (DCN)",
    "Pod serving: every rank runs this CLI with the same flags (plus "
    "its --process_id); the corpus mesh spans all ranks' chips, rank "
    "0 speaks the client protocol, and every device-touching request "
    "is relayed to the follower ranks over --control so the SPMD "
    "program stays in lockstep. Path-based commands need a shared "
    "filesystem; the in-band forms (searchb/addb) need none — their "
    "payload bytes are relayed verbatim. Requires --sharded.",
)
multihost_parser.add_argument(
    "--coordinator",
    help="HOST:PORT of the jax.distributed coordinator (rank 0)",
)
multihost_parser.add_argument("--num_processes", type=int, default=1)
multihost_parser.add_argument("--process_id", type=int, default=0)
multihost_parser.add_argument(
    "--control",
    help="HOST:PORT of rank 0's request-relay socket (same value on "
    "every rank; rank 0 binds it, followers connect)",
)
extract_parser = parser.add_argument_group(
    "Resident extraction",
    "Optional end-to-end serving: keep a descriptor model resident "
    "next to the staged corpus so requests can start from raw videos "
    "(`extract` decodes + embeds a video directory to npz; `searchv` "
    "embeds then searches in one request — query descriptors never "
    "touch disk). Enabled by --baseline.",
)
extract_parser.add_argument(
    "--baseline", choices=["sscd", "dino", "dns"],
    help="Keep this descriptor model resident for extract/searchv "
    "requests (weights via --checkpoint_path/--torchscript_path)",
)
extract_parser.add_argument(
    "--checkpoint_path",
    help="npz variable tree for the resident --baseline model",
)
extract_parser.add_argument(
    "--torchscript_path",
    help="TorchScript weights, converted at startup (requires torch)",
)
extract_parser.add_argument(
    "--extract_transforms", default="RESIZE_320_CENTER",
    help="InferenceTransforms preprocessing variant for the resident "
    "model (RESIZE_320_CENTER for SSCD, RESIZE_224_SQUARE for DINO)",
)
extract_parser.add_argument("--extract_batch_size", type=int, default=32)
extract_parser.add_argument(
    "--extract_compute_dtype", choices=["float32", "bfloat16"],
    default="float32",
    help="bfloat16 runs the resident model forward MXU-native",
)
extract_parser.add_argument(
    "--fold_bn", action="store_true",
    help="Fold BatchNorm affines into the resident model's convs "
    "(ResNet-family baselines)",
)
extract_parser.add_argument("--fps", type=float, default=1)
extract_parser.add_argument("--ffmpeg_path", default="ffmpeg")
extract_parser.add_argument("--video_extensions", default="mp4")


def table_dtype(args) -> str:
    """Resident localizer ref-table dtype: as staging_dtype, except
    int8 staging keeps bf16 tables (alignment reads raw similarity
    tiles; the searcher's per-row scales don't apply there)."""
    dt = staging_dtype(args)
    return "bfloat16" if dt == "int8" else dt


def staging_dtype(args) -> str:
    """The serving staging dtype: bfloat16 by DEFAULT (2x corpus and
    ref-table capacity per chip, faster staging; candidate µAP and
    segment AP hold within seed noise across corruption regimes and
    both collection designs — docs/synthetic_results.md). ``--f32``
    opts out for strict bit-parity with the batch pipelines' default;
    ``--int8`` stages the search corpus as SQ8-style per-row int8 (4x
    f32 capacity); the reference has no capacity story at all (FAISS
    Flat is f32-only, vsc/index.py:82)."""
    if getattr(args, "int8", False):
        return "int8"
    return "float32" if getattr(args, "f32", False) else "bfloat16"


def build_index(args):
    refs = load_features(args.ref_features, Dataset.REFS)
    dim = refs[0].dimensions()
    mesh = None
    if args.sharded:
        from vsc2022_tpu.parallel.mesh import corpus_mesh

        mesh = corpus_mesh()
    dtype = staging_dtype(args)
    codec = "Flat"
    nprobe = getattr(args, "ivf_nprobe", None)
    if getattr(args, "ivf", None) is not None:
        # 0 = "IVF with the block-derived default nlist"; the searcher
        # computes it from the corpus size (~2 streaming blocks/cell).
        n = args.ivf if args.ivf > 0 else max(
            2, sum(v.feature.shape[0] for v in refs) // 16384
        )
        codec = f"IVF{n}"
    if args.score_norm_features:
        noise = load_features(args.score_norm_features, Dataset.REFS)
        index = ScoreNormalizedVideoIndex(
            dim, noise, beta=args.beta, mesh=mesh, dtype=dtype,
            codec_str=codec, ivf_nprobe=nprobe,
        )
    else:
        index = VideoIndex(
            dim, mesh=mesh, dtype=dtype, codec_str=codec,
            ivf_nprobe=nprobe,
        )
    index.add(refs)
    return index, refs, dim


def build_localizer(index, refs, args):
    """Resident TN localizer over the (transformed) reference frames,
    with the sscd_baseline stage parameters (reference:
    vsc/baseline/sscd_baseline.py:117-135): score-norm features use
    MaxSim over +0.5-biased similarity; raw features are L2-normalized
    and inherit the candidate's retrieval score. DnS mode fuses the
    fine-chamfer similarity with the coarse one under MaxSim scoring
    (reference: vsc/baseline/dns_baseline.py:196-208)."""
    import dataclasses

    from vsc2022_tpu.localization import (
        TNLocalizationCandidateScore,
        TNLocalizationMaxSim,
    )
    from vsc2022_tpu.retrieval.score_norm import l2_normalize_rows

    if args.ref_fine_features:
        from vsc2022_tpu.baseline.dns_baseline import DnSLocalization
        from vsc2022_tpu.storage import convert_to_dict

        refs_fine = convert_to_dict(
            load_features(args.ref_fine_features, Dataset.REFS)
        )
        # Same coverage rule the `add` path enforces: every coarse
        # video needs fine rows, or localization/save would fail on
        # exactly that video deep into the server's lifetime.
        missing = [
            str(vf.video_id) for vf in refs
            if vf.video_id not in refs_fine
        ]
        if missing:
            raise ValueError(
                "Fine npz is missing reference videos: "
                f"{missing[:5]} (coarse and fine sets must cover the "
                "same video ids)"
            )
        return DnSLocalization(
            {}, refs_fine, [], refs, model_type="TN",
            fg_type=args.fg_type, tn_max_step=5, min_length=4,
            similarity_bias=0.5, vcsl_faithful=args.vcsl_faithful_tn,
            mesh=index.mesh, shard_ref_table=index.mesh is not None,
            table_dtype=table_dtype(args),
        )
    if args.score_norm_features:
        return TNLocalizationMaxSim(
            [], index.localizer_ref_features(refs), model_type="TN",
            tn_max_step=5, min_length=4, similarity_bias=0.5,
            vcsl_faithful=args.vcsl_faithful_tn, mesh=index.mesh,
            shard_ref_table=index.mesh is not None,
            table_dtype=table_dtype(args),
        )
    refs_loc = [
        dataclasses.replace(vf, feature=l2_normalize_rows(vf.feature))
        for vf in refs
    ]
    return TNLocalizationCandidateScore(
        [], refs_loc, model_type="TN", tn_max_step=5, min_length=4,
        vcsl_faithful=args.vcsl_faithful_tn, mesh=index.mesh,
        shard_ref_table=index.mesh is not None,
        table_dtype=table_dtype(args),
    )


def build_extractor(args):
    """Resident descriptor extractor for end-to-end serving: the
    model's variables go device-resident once at startup, so
    `extract` / `searchv` requests pay decode + forward only (the
    one-shot analog re-loads the model per invocation:
    vsc/baseline/inference_impl.py:173). Returns (extractor,
    reader_factory) or None when no --baseline was requested."""
    if not args.baseline:
        if args.checkpoint_path or args.torchscript_path:
            raise ValueError(
                "--checkpoint_path/--torchscript_path need --baseline "
                "to pick the model architecture"
            )
        return None
    if not (args.checkpoint_path or args.torchscript_path):
        raise ValueError(
            "A resident model needs weights: --checkpoint_path or "
            "--torchscript_path"
        )
    from functools import partial

    from vsc2022_tpu.inference.cli import build_model
    from vsc2022_tpu.inference.pipeline import DescriptorExtractor
    from vsc2022_tpu.inference.transforms import InferenceTransforms
    from vsc2022_tpu.inference.video_reader import FFMpegVideoReader

    apply_fn, variables = build_model(args)
    extractor = DescriptorExtractor(
        apply_fn,
        variables,
        transform=InferenceTransforms[args.extract_transforms],
        batch_size=args.extract_batch_size,
        compute_dtype=args.extract_compute_dtype,
    )
    reader_factory = partial(
        FFMpegVideoReader,
        required_fps=args.fps,
        ffmpeg_path=args.ffmpeg_path,
    )
    return extractor, reader_factory


def _extract_feature_list(extractor_bundle, videos_path, args):
    """Decode + embed every video in a directory on the resident
    model, in sorted-filename order (the inference CLI's dataset
    contract: vsc/baseline/inference_impl.py:94-109)."""
    import os

    from vsc2022_tpu.inference.pipeline import VideoDataset

    if extractor_bundle is None:
        raise ValueError(
            "No resident model: start the server with --baseline and "
            "--checkpoint_path to serve extract/searchv requests"
        )
    extractor, reader_factory = extractor_bundle
    if not os.path.isdir(videos_path):
        raise ValueError(f"Not a video directory: {videos_path}")
    dataset = VideoDataset(
        path=videos_path,
        reader_factory=reader_factory,
        extensions=args.video_extensions.split(","),
    )
    return list(extractor.extract(dataset))


def _extract_videos(extractor_bundle, parts, args, leader=True) -> str:
    """`extract`: embed a video directory to a descriptor npz on the
    resident model — the serving analog of one inference CLI run,
    without the per-invocation process/model/compile startup. The
    output npz is leader-only (multi-host followers run the same
    device program but never write files)."""
    t0 = time.perf_counter()
    if len(parts) < 3:
        raise ValueError(
            "extract needs: extract\\t<videos_dir>\\t<output_npz>"
        )
    feats = _extract_feature_list(extractor_bundle, parts[1], args)
    if leader:
        store_features(parts[2], feats)
    n_frames = sum(len(vf) for vf in feats)
    return (
        f"ok\textracted\t{len(feats)}\t{n_frames}\t{parts[2]}"
        f"\t{time.perf_counter() - t0:.3f}"
    )


def _localizer_queries(index, queries, args):
    """Per-request query features in the localizer's space: the full
    score-norm transform incl. the device noise-NN bias dimension,
    plain row L2 for the raw pipeline, or unchanged for DnS (the cg
    npz from dns_index is already normalized + score-normed)."""
    import dataclasses

    from vsc2022_tpu.retrieval.score_norm import l2_normalize_rows

    if args.ref_fine_features:
        return queries
    if args.score_norm_features:
        return index.localizer_queries(queries)
    return [
        dataclasses.replace(q, feature=l2_normalize_rows(q.feature))
        for q in queries
    ]


def _add_refs(index, localizer, parts, args, payloads=None) -> str:
    """Serving-time corpus growth: extend the index (and the resident
    localizer tables) with new reference videos; the next search
    restages. Duplicate ids are rejected — the reference's FAISS add
    would silently append duplicate rows (vsc/index.py:87-94), but at
    serving time a repeated id is a client bug. The in-band form
    (`addb`, npz payload bytes on the wire) shares this body — its
    sources are BytesIO instead of paths."""
    import dataclasses
    import io

    t0 = time.perf_counter()
    if payloads is not None:
        want = 2 if (args.ref_fine_features and localizer is not None) else 1
        if len(payloads) != want:
            raise ValueError(
                "addb needs payload lengths: addb\\t<npz_len>"
                + ("\\t<fine_npz_len>" if want == 2 else "")
            )
        sources = [io.BytesIO(b) for b in payloads]
    else:
        if len(parts) < 2:
            raise ValueError("add needs a reference npz: add\\t<refs_npz>")
        sources = parts[1:]
    refs = load_features(sources[0], Dataset.REFS)
    dup = [
        str(r.video_id) for r in refs
        if r.video_id in index.video_metadata
    ]
    if dup:
        raise ValueError(f"Reference ids already indexed: {dup[:5]}")
    fine = None
    if args.ref_fine_features and localizer is not None:
        if len(sources) < 2:
            raise ValueError(
                "DnS add needs two files: add\\t<coarse_npz>\\t<fine_npz>"
            )
        from vsc2022_tpu.storage import convert_to_dict

        # Load + cross-check the fine side BEFORE anything mutates: a
        # bad fine path failing after index.add would leave the index
        # grown but the localizer not, with the duplicate-id check
        # blocking a corrected retry forever.
        fine = convert_to_dict(load_features(sources[1], Dataset.REFS))
        missing = [
            str(vf.video_id) for vf in refs if vf.video_id not in fine
        ]
        if missing:
            raise ValueError(
                f"Fine npz is missing coarse videos: {missing[:5]}"
            )
    def grow_localizer():
        if fine is not None:
            localizer.add_refs(refs, refs_fine=fine)
        elif args.score_norm_features:
            localizer.add_refs(index.localizer_ref_features(refs))
        else:
            from vsc2022_tpu.retrieval.score_norm import l2_normalize_rows

            localizer.add_refs([
                dataclasses.replace(
                    vf, feature=l2_normalize_rows(vf.feature)
                )
                for vf in refs
            ])

    # Index next: it validates (dims, noise-id overlap) before
    # mutating, so a rejected add never leaves the localizer
    # half-extended.
    try:
        index.add(refs)
    except Exception:
        if (
            localizer is not None
            and refs
            and refs[0].video_id in index.video_metadata
        ):
            # Past validation the index raises only on a device-append
            # failure — and then its HOST bookkeeping already holds the
            # new rows (staged searcher dropped; the next search
            # restages). Grow the localizer too before surfacing the
            # error, or the holders would disagree and a remove of
            # these ids would be rejected forever (mirrors the
            # _remove_refs failure contract). A secondary device
            # failure inside the localizer grow still leaves its host
            # dicts grown and its staged tables dropped (the
            # localizer's own failure contract), so the holders agree
            # either way; surface the ORIGINAL error.
            try:
                grow_localizer()
            except Exception:
                pass
        raise
    if localizer is not None:
        grow_localizer()
    return f"ok\tadded\t{len(refs)}\t{time.perf_counter() - t0:.3f}"


def _remove_refs(index, localizer, parts) -> str:
    """Serving-time corpus shrink: drop reference videos from the
    index and the resident localizer tables; the staged buffers
    compact device-side onto the fresh-stage layout. Validation runs
    against BOTH holders before either mutates, so a rejected remove
    never leaves them disagreeing."""
    t0 = time.perf_counter()
    ids = list(dict.fromkeys(p for p in parts[1:] if p))
    if not ids:
        raise ValueError(
            "remove needs video ids: remove\\t<video_id>[\\t<video_id>...]"
        )
    missing = [v for v in ids if v not in index.video_metadata]
    if not missing and localizer is not None:
        missing = [v for v in ids if v not in localizer.refs]
    if missing:
        raise ValueError(f"Video ids not indexed: {missing[:5]}")
    try:
        n_rows = index.remove(ids)
    except Exception:
        # Past validation, index.remove only raises on a device-side
        # compaction failure — and then its HOST bookkeeping is already
        # consistently shrunk (the staged searcher is dropped; the next
        # search restages). Shrink the localizer too before surfacing
        # the error, or the holders would disagree and the retry would
        # be blocked forever by the validation above.
        if localizer is not None:
            localizer.remove_refs(ids)
        raise
    if localizer is not None:
        localizer.remove_refs(ids)
    return (
        f"ok\tremoved\t{len(ids)}\t{n_rows}"
        f"\t{time.perf_counter() - t0:.3f}"
    )


def _save_refs(index, localizer, parts, args, leader=True) -> str:
    """Snapshot the current (possibly add/remove-mutated) reference
    set to npz in the standard schema, corpus row order — a restart on
    the snapshot reproduces the live server bit-for-bit. Snapshots are
    pure host work off the add-order feature blocks; follower ranks
    skip the writes (leader-only files)."""
    t0 = time.perf_counter()
    if len(parts) < 2:
        raise ValueError("save needs an output path: save\\t<refs_npz>")
    feats = index.features()
    if not feats:
        raise ValueError(
            "Nothing to save: the served corpus is empty "
            "(every reference video was removed)"
        )
    fine = None
    if args.ref_fine_features:
        if len(parts) < 3:
            raise ValueError(
                "DnS save needs two paths: save\\t<coarse_npz>\\t<fine_npz>"
            )
        # Fine rows saved in the SAME video order as the coarse side
        # (the fine dict may have its own insertion order). Coverage is
        # guaranteed by the startup and `add` cross-checks.
        fine = [localizer.refs_fine[vf.video_id] for vf in feats]
    # Coarse first: if it fails, no partial snapshot is left behind
    # (a coarse-only leftover from a fine-write failure at least loads).
    if leader:
        store_features(parts[1], feats, Dataset.REFS)
        if fine is not None:
            store_features(parts[2], fine, Dataset.REFS)
    tail = f"\t{parts[2]}" if args.ref_fine_features else ""
    return (
        f"ok\tsaved\t{len(feats)}\t{parts[1]}{tail}"
        f"\t{time.perf_counter() - t0:.3f}"
    )


def _search_candidates(index, aggregation, queries, args):
    """Shared retrieval core of the path and in-band request forms:
    retrieval budget → ranked candidate pairs."""
    budget = args.retrieval_per_query * len(queries)
    matches = index.search(queries, global_k=budget)
    candidates = rank_candidates(matches, aggregation)
    keep = args.pairs_per_query * len(queries)
    return candidates[:keep]


def _localize_candidates(
    index, localizer, queries, queries_fine, candidates, args
):
    """Shared TN stage: swap the localizer's query side (ref tables
    stay resident) and align the top candidate pairs."""
    from vsc2022_tpu.baseline.pipeline import align_candidates

    if queries_fine is not None:
        localizer.set_queries(queries, queries_fine=queries_fine)
    else:
        localizer.set_queries(_localizer_queries(index, queries, args))
    to_localize = candidates[: int(args.localize_per_query * len(queries))]
    return align_candidates(localizer, to_localize)


def _search_bytes(index, aggregation, localizer, payloads, args):
    """In-band search (`searchb`): query npz bytes arrive on the wire
    and the result CSVs return the same way — no shared filesystem
    between client and a remote --listen server. Responses:
    okb\\t<n_pairs>\\t<cand_len>[\\t<n_matches>\\t<match_len>]\\t<s>
    followed by the CSV payload bytes."""
    import io

    from vsc2022_tpu.metrics import Match

    t0 = time.perf_counter()
    want = 2 if args.ref_fine_features else 1
    if payloads is None or len(payloads) != want:
        raise ValueError(
            "searchb needs payload lengths: searchb\\t<npz_len>"
            + ("\\t<fine_npz_len>" if want == 2 else "")
        )
    queries = load_features(io.BytesIO(payloads[0]), Dataset.QUERIES)
    queries_fine = None
    if want == 2:
        from vsc2022_tpu.storage import convert_to_dict

        queries_fine = convert_to_dict(
            load_features(io.BytesIO(payloads[1]), Dataset.QUERIES)
        )
    candidates = _search_candidates(index, aggregation, queries, args)
    found = None
    if localizer is not None:
        found = _localize_candidates(
            index, localizer, queries, queries_fine, candidates, args
        )
    cand_io = io.StringIO()
    CandidatePair.write_csv(candidates, cand_io)
    blobs = [cand_io.getvalue().encode("utf-8")]
    header = f"okb\t{len(candidates)}\t{len(blobs[0])}"
    if found is not None:
        match_io = io.StringIO()
        Match.write_csv(found, match_io)
        blobs.append(match_io.getvalue().encode("utf-8"))
        header += f"\t{len(found)}\t{len(blobs[1])}"
    return header + f"\t{time.perf_counter() - t0:.3f}", blobs


def _save_bytes(index, localizer, args, leader=True):
    """In-band snapshot (`saveb`): the npz bytes return on the wire
    (coarse, then fine in DnS mode) instead of server-side paths.
    Snapshots are pure host work, so multi-host follower ranks skip
    the (corpus-sized) serialization entirely — only the leader has a
    client to send the bytes to."""
    import io

    t0 = time.perf_counter()
    feats = index.features()
    if not feats:
        raise ValueError(
            "Nothing to save: the served corpus is empty "
            "(every reference video was removed)"
        )
    if not leader:
        return f"ok\tfollower-save\t{len(feats)}", []
    coarse_io = io.BytesIO()
    store_features(coarse_io, feats, Dataset.REFS)
    blobs = [coarse_io.getvalue()]
    if args.ref_fine_features:
        fine_io = io.BytesIO()
        store_features(
            fine_io,
            [localizer.refs_fine[vf.video_id] for vf in feats],
            Dataset.REFS,
        )
        blobs.append(fine_io.getvalue())
    header = f"okb\t{len(feats)}\t" + "\t".join(
        str(len(b)) for b in blobs
    )
    return header + f"\t{time.perf_counter() - t0:.3f}", blobs


def _respond_search(
    index, aggregation, localizer, queries, queries_fine,
    out_csv, matches_csv, args, t0, leader=True
) -> str:
    """Candidates (+ optional TN matches) to CSVs, shared by the
    path-based search and `searchv`. Candidates land on disk before
    the TN stage so a localization failure still leaves them behind
    (the error response names it). Follower ranks (multi-host SPMD)
    run the same device program but skip the file writes — those are
    the leader's."""
    from vsc2022_tpu.metrics import Match

    candidates = _search_candidates(index, aggregation, queries, args)
    if leader:
        CandidatePair.write_csv(candidates, out_csv)
    if localizer is None:
        return (
            f"ok\t{out_csv}\t{len(candidates)}"
            f"\t{time.perf_counter() - t0:.3f}"
        )
    found = _localize_candidates(
        index, localizer, queries, queries_fine, candidates, args
    )
    if leader:
        Match.write_csv(found, matches_csv)
    return (
        f"ok\t{out_csv}\t{len(candidates)}\t{matches_csv}\t{len(found)}"
        f"\t{time.perf_counter() - t0:.3f}"
    )


def _search_videos(
    index, aggregation, localizer, extractor, parts, args, leader=True
) -> str:
    """`searchv`: raw videos in, candidate/match CSVs out — extraction
    on the resident model feeds the search core directly; query
    descriptors never touch disk."""
    import io

    t0 = time.perf_counter()
    if args.ref_fine_features:
        raise ValueError(
            "searchv does not serve the DnS track: DnS queries need "
            "the dns_index re-encoding — run extract, then dns_index, "
            "then the two-file search form"
        )
    if len(parts) < 2:
        raise ValueError(
            "searchv needs: searchv\\t<videos_dir>"
            "[\\t<candidates_csv>[\\t<matches_csv>]]"
        )
    feats = _extract_feature_list(extractor, parts[1], args)
    # Round-trip through the frozen npz schema in memory so video ids
    # and dtypes match the one-shot flow (inference CLI npz →
    # Dataset.QUERIES load) exactly.
    buf = io.BytesIO()
    store_features(buf, feats)
    buf.seek(0)
    queries = load_features(buf, Dataset.QUERIES)
    base = parts[1].rstrip("/")
    out_csv = (
        parts[2] if len(parts) > 2 and parts[2]
        else base + ".candidates.csv"
    )
    matches_csv = (
        parts[3] if len(parts) > 3 and parts[3]
        else base + ".matches.csv"
    )
    return _respond_search(
        index, aggregation, localizer, queries, None,
        out_csv, matches_csv, args, t0, leader=leader,
    )


def _probe_compute(index, localizer, parts, args):
    """`probe\\t<query_npz>`: relay-jitter-free device-compute figure
    for a warm request at this query file's shapes — the fused SN
    search dispatch plus (in --matches mode) the TN alignment batches
    of the most recent request, each repetition-differenced inside one
    executable (utils/compute_probe.py). The wall-clock request
    metrics on this rig fold in a ~25-60 ms per-dispatch relay RPC
    that swings ~2x across processes; this figure cannot swing on it.
    Response: ok\\tprobe\\t<search_s>\\t<tn_s>."""
    from vsc2022_tpu.retrieval.sn_search import ScoreNormalizedSearcher
    from vsc2022_tpu.utils.compute_probe import (
        sn_search_compute_probe,
        tn_align_compute_probe,
    )

    if len(parts) < 2 or not parts[1]:
        raise ValueError("probe needs a query npz: probe\\t<query_npz>")
    queries = load_features(parts[1], Dataset.QUERIES)
    sn = index._get_searcher()
    if not isinstance(sn, ScoreNormalizedSearcher):
        raise ValueError(
            "probe needs a score-normalized index (--score_norm_features)"
        )
    qmat = index._prep_query_features(
        np.concatenate([q.feature for q in queries])
    )
    k = args.retrieval_per_query * len(queries)
    search_s = sn_search_compute_probe(sn, qmat, qmat.shape[0], k)
    tn_s = 0.0
    if localizer is not None:
        for b, nq, nr in getattr(localizer, "last_align_geoms", []):
            tn_s += tn_align_compute_probe(b, nq, nr, localizer.params)
    return f"ok\tprobe\t{search_s:.6f}\t{tn_s:.6f}"


def serve_request(index, aggregation, localizer, line: str, args,
                  payloads=None, extractor=None, leader=True):
    parts = line.split("\t")
    if parts[0] == "add":
        return _add_refs(index, localizer, parts, args)
    if parts[0] == "remove":
        return _remove_refs(index, localizer, parts)
    if parts[0] == "save":
        return _save_refs(index, localizer, parts, args, leader=leader)
    if parts[0] == "searchb":
        return _search_bytes(index, aggregation, localizer, payloads, args)
    if parts[0] == "addb":
        return _add_refs(index, localizer, parts, args, payloads=payloads)
    if parts[0] == "saveb":
        return _save_bytes(index, localizer, args, leader=leader)
    if parts[0] == "extract":
        return _extract_videos(extractor, parts, args, leader=leader)
    if parts[0] == "searchv":
        return _search_videos(
            index, aggregation, localizer, extractor, parts, args,
            leader=leader,
        )
    if parts[0] == "probe":
        return _probe_compute(index, localizer, parts, args)
    if parts[0] == "stats":
        return (
            "ok\tstats"
            f"\t{len(index.video_metadata)}"
            f"\t{len(index.video_clip_to_video_ids)}"
            f"\t{index.dtype}"
            f"\t{int(index.mesh is not None)}"
            f"\t{int(args.matches)}"
        )
    query_path = parts[0]
    fine_path = None
    if args.ref_fine_features:
        # DnS two-file protocol: the second field is the fine npz.
        if len(parts) < 2:
            raise ValueError(
                "DnS serving requests need two query files: "
                "<coarse_npz>\\t<fine_npz>[\\t<candidates_csv>...]"
            )
        fine_path = parts[1]
        parts = [parts[0]] + parts[2:]
    # Empty fields mean "use the default" so a client can name the
    # matches CSV without naming the candidates CSV.
    out_csv = (
        parts[1]
        if len(parts) > 1 and parts[1]
        else query_path + ".candidates.csv"
    )
    t0 = time.perf_counter()
    queries = load_features(query_path, Dataset.QUERIES)
    queries_fine = None
    if fine_path is not None:
        from vsc2022_tpu.storage import convert_to_dict

        queries_fine = convert_to_dict(
            load_features(fine_path, Dataset.QUERIES)
        )
    matches_csv = (
        parts[2]
        if len(parts) > 2 and parts[2]
        else query_path + ".matches.csv"
    )
    return _respond_search(
        index, aggregation, localizer, queries, queries_fine,
        out_csv, matches_csv, args, t0, leader=leader,
    )


def main(args):
    multihost = (args.num_processes or 1) > 1
    if multihost:
        if not args.coordinator:
            raise Exception(
                "--num_processes > 1 requires --coordinator host:port "
                "(rank 0's jax.distributed rendezvous address)"
            )
        if not args.control:
            raise Exception(
                "--num_processes > 1 requires --control host:port "
                "(rank 0's request-relay socket)"
            )
        if not args.sharded:
            raise Exception(
                "Multi-host serving shards the corpus over the pod "
                "mesh: pass --sharded on every rank"
            )
        if not 0 <= args.process_id < args.num_processes:
            raise Exception(
                f"--process_id {args.process_id} out of range "
                f"[0, {args.num_processes})"
            )
        from vsc2022_tpu.parallel.mesh import initialize_distributed

        logger.info(
            "Joining serving pod as rank %d of %d (coordinator: %s)",
            args.process_id, args.num_processes, args.coordinator,
        )
        initialize_distributed(
            args.coordinator, args.num_processes, args.process_id
        )
    elif args.coordinator or args.control or args.process_id:
        raise Exception(
            "--coordinator/--control/--process_id need "
            "--num_processes > 1"
        )
    if args.ref_fine_features:
        if args.score_norm_features:
            # The reference applies score normalization at dns_index
            # time (vsc/baseline/dns_index.py:143-161); the coarse npz
            # served here arrives pre-normalized.
            raise Exception(
                "DnS serving expects the score-normalized coarse npz "
                "from dns_index; --score_norm_features does not apply."
            )
        args.matches = True
    t0 = time.perf_counter()
    # Extractor first: its flag validation (--baseline vs weights)
    # should fail fast, before corpus staging pays the host link.
    extractor = build_extractor(args)
    index, refs, dim = build_index(args)
    localizer = build_localizer(index, refs, args) if args.matches else None
    if not args.no_warmup:
        # Force corpus staging + compile one search shape so the first
        # request doesn't pay them. 8 rows = the smallest padded shape.
        # Random unit vectors, NOT zeros: a zero query scores every
        # corpus row exactly 0.0 == τ, which drives the count-verify
        # into its worst case (every row flagged, need = n_refs — a
        # full-corpus repair extraction at serving scale).
        from vsc2022_tpu.metrics import CandidatePair
        from vsc2022_tpu.types import VideoFeature

        rng = np.random.RandomState(0)
        f = rng.standard_normal((8, dim)).astype(np.float32)
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        warm = VideoFeature(
            video_id="Q999999",
            timestamps=np.arange(8, dtype=np.float64),
            feature=f,
        )
        index.search([warm], global_k=8)
        if localizer is not None and refs:
            # Stage the localizer's device ref table + compile one TN
            # bucket before 'ready' — otherwise the first matching
            # request pays the full corpus H2D staging.
            if args.ref_fine_features:
                fine_dim = next(
                    iter(localizer.refs_fine.values())
                ).dimensions()
                warm_fine = VideoFeature(
                    video_id=warm.video_id,
                    timestamps=warm.timestamps,
                    feature=rng.standard_normal((8, fine_dim)).astype(
                        np.float32
                    ),
                )
                localizer.set_queries(
                    [warm], queries_fine={warm.video_id: warm_fine}
                )
            else:
                localizer.set_queries(
                    _localizer_queries(index, [warm], args)
                )
            localizer.localize_all(
                [CandidatePair(warm.video_id, refs[0].video_id, 1.0)]
            )
    stage_s = time.perf_counter() - t0
    aggregation = MaxScoreAggregation()
    if multihost and args.process_id != 0:
        # Follower rank: no client protocol — execute the leader's
        # relayed requests in lockstep until it releases the pod.
        print(f"follower\t{args.process_id}\t{stage_s:.1f}", flush=True)
        _follow(index, aggregation, localizer, args, extractor=extractor)
        logger.info("Follower rank released by the leader; exiting")
        return
    relay = _Relay(args) if multihost else None
    try:
        ready = f"ready\t{len(refs)}\t{stage_s:.1f}"
        print(ready, flush=True)
        logger.info(
            f"Serving {len(refs)} reference videos "
            f"(staged in {stage_s:.1f}s)"
        )
        if args.listen:
            _serve_tcp(
                index, aggregation, localizer, args, stage_s,
                extractor=extractor, relay=relay,
            )
        else:
            _serve_stream(
                index, aggregation, localizer, args,
                sys.stdin.buffer, sys.stdout.buffer,
                extractor=extractor, relay=relay,
            )
    finally:
        if relay is not None:
            relay.close()


def _read_payloads(rfile, head):
    """Read the in-band payload bytes a binary command announces in
    its header (`<cmd>\\t<len1>[\\t<len2>...]`). Raises on malformed
    lengths BEFORE consuming any payload bytes, and on short reads
    (client hung up mid-payload)."""
    try:
        sizes = [int(n) for n in head[1:]]
    except ValueError:
        raise ValueError(
            f"{head[0]} needs integer payload lengths, got {head[1:]}"
        )
    if not sizes or any(n < 0 for n in sizes):
        raise ValueError(f"{head[0]} needs positive payload lengths")
    payloads = []
    for n in sizes:
        blob = rfile.read(n)
        if len(blob) != n:
            raise EOFError(
                f"short payload: expected {n} bytes, got {len(blob)}"
            )
        payloads.append(blob)
    return payloads


class _Relay:
    """Leader-side fan-out of every device-touching request to the
    follower ranks, in execution order (forward() runs under the
    device lock): multi-host SPMD means every rank must execute the
    same program — the leader alone entering a collective would
    deadlock the mesh. close() releases the followers (idempotent;
    wired into main's finally so any leader exit path frees the pod).
    """

    def __init__(self, args):
        import socket

        host, port = args.control.rsplit(":", 1)
        srv = socket.create_server((host, int(port)))
        # Staging is collective, so live followers arrive at connect()
        # when the leader arrives here; a rank that is minutes late is
        # dead, and hanging in accept() would wedge the whole pod.
        srv.settimeout(180.0)
        self._conns = []
        logger.info(
            "Waiting for %d follower rank(s) on %s",
            args.num_processes - 1, args.control,
        )
        for _ in range(args.num_processes - 1):
            conn, addr = srv.accept()
            self._conns.append(conn)
            logger.info("Follower attached from %s:%d", *addr[:2])
        srv.close()
        self._closed = False

    def forward(self, raw: bytes, payloads) -> None:
        """Relay one request to every follower, failing FAST if any
        rank died: executing a collective on a broken pod would hang
        the leader, so a dead follower turns device requests into
        error responses instead. Followers never write on the control
        socket, so readability (EOF) is the liveness check; a race
        where a rank dies after its relay is the distributed runtime's
        heartbeat to surface."""
        import select

        if self._closed:
            raise RuntimeError(
                "The pod is degraded (a follower rank died); restart "
                "every rank"
            )
        readable, _, _ = select.select(self._conns, [], [], 0)
        if readable:
            self.close()
            raise RuntimeError(
                "A follower rank died (control channel EOF); the pod "
                "mesh is broken — restart every rank"
            )
        try:
            for conn in self._conns:
                conn.sendall(raw)
                for blob in payloads or ():
                    conn.sendall(blob)
        except OSError as exc:
            self.close()
            raise RuntimeError(
                f"Relaying to a follower rank failed ({exc}); the pod "
                "mesh is broken — restart every rank"
            )

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        for conn in self._conns:
            try:
                conn.sendall(b"shutdown\n")
                conn.close()
            except OSError:
                pass


def _follow(index, aggregation, localizer, args, extractor=None) -> None:
    """Follower-rank request loop: execute every request the leader
    relays (same bytes, same order) so the collective device program
    stays in lockstep. File outputs are leader-only; request errors
    are deterministic across ranks (same inputs), so an erroring
    request leaves every rank equally clean."""
    import socket

    host, port = args.control.rsplit(":", 1)
    deadline = time.monotonic() + 120
    while True:
        try:
            sock = socket.create_connection((host, int(port)))
            break
        except OSError:
            if time.monotonic() > deadline:
                raise
            time.sleep(0.2)
    logger.info("Follower rank connected to the leader control channel")
    with sock:
        rfile = sock.makefile("rb")
        while True:
            raw = rfile.readline()
            if not raw:
                return
            line = raw.decode("utf-8", errors="replace").strip()
            if not line:
                continue
            if line == "shutdown":
                return
            head = line.split("\t")
            try:
                payloads = (
                    _read_payloads(rfile, head)
                    if head[0] in ("searchb", "addb")
                    else None
                )
                serve_request(
                    index, aggregation, localizer, line, args,
                    payloads=payloads, extractor=extractor, leader=False,
                )
            except EOFError:
                return
            except Exception as exc:
                logger.info("Follower request error: %s", exc)


def _serve_stream(
    index, aggregation, localizer, args, rfile, wfile, lock=None,
    extractor=None, relay=None,
) -> bool:
    """Answer one request stream until quit/shutdown/EOF; True = the
    whole server should stop (not just this client session). ``lock``
    serializes device + localizer-state access across TCP client
    threads (one chip, one request at a time). The streams are BINARY:
    text commands arrive as lines, and the in-band commands (searchb /
    addb / saveb) carry length-prefixed npz/CSV payload bytes on the
    same stream — a remote --listen client needs no shared filesystem.
    """
    import contextlib

    while True:
        raw = rfile.readline()
        if not raw:
            return False
        line = raw.decode("utf-8", errors="replace").strip()
        if not line:
            continue
        if line == "quit":
            return False
        if line == "shutdown":
            return True
        head = line.split("\t")
        blobs = None
        try:
            payloads = (
                _read_payloads(rfile, head)
                if head[0] in ("searchb", "addb")
                else None
            )
            with lock if lock is not None else contextlib.nullcontext():
                if relay is not None:
                    # Fan the raw request out to the follower ranks
                    # BEFORE executing it, under the same lock, so
                    # every rank runs the collectives in this order.
                    relay.forward(raw, payloads)
                response = serve_request(
                    index, aggregation, localizer, line, args,
                    payloads=payloads, extractor=extractor,
                )
            if isinstance(response, tuple):
                response, blobs = response
        except EOFError:
            # Client died mid-payload: the stream is unrecoverable.
            return False
        except Exception as exc:  # keep serving on request errors
            response = "error\t" + str(exc).replace("\n", " ")
        wfile.write((response + "\n").encode("utf-8"))
        if blobs:
            for blob in blobs:
                wfile.write(blob)
        wfile.flush()


def _serve_tcp(index, aggregation, localizer, args, stage_s: float,
               extractor=None, relay=None) -> None:
    """TCP accept loop speaking the stdin protocol, one thread per
    client: sessions interleave (an idle connection never blocks
    others) while a device lock serializes the actual requests —
    one chip serves one request at a time."""
    import socket
    import threading

    host, port = args.listen.rsplit(":", 1)
    srv = socket.create_server((host, int(port)))
    bound = srv.getsockname()[1]
    print(f"listening\t{host}:{bound}", flush=True)
    logger.info(f"Listening on {host}:{bound}")
    device_lock = threading.Lock()
    stop = threading.Event()

    def client_session(conn, addr):
        try:
            with conn:
                rfile = conn.makefile("rb")
                wfile = conn.makefile("wb")
                # The greeting's video count is read live (under the
                # device lock): `add` grows the corpus mid-lifetime,
                # so the startup count would mislead late clients.
                with device_lock:
                    ready = (
                        f"ready\t{len(index.video_metadata)}"
                        f"\t{stage_s:.1f}"
                    )
                wfile.write((ready + "\n").encode("utf-8"))
                wfile.flush()
                if _serve_stream(
                    index, aggregation, localizer, args, rfile, wfile,
                    lock=device_lock, extractor=extractor, relay=relay,
                ):
                    stop.set()
        except (BrokenPipeError, ConnectionResetError):
            logger.info(f"Client {addr[0]}:{addr[1]} disconnected")

    # A 1 s accept timeout polls the stop flag: close() from a client
    # thread would not wake a blocked accept() on Linux.
    srv.settimeout(1.0)
    threads = []
    while not stop.is_set():
        try:
            conn, addr = srv.accept()
        except socket.timeout:
            continue
        except OSError:
            break
        logger.info(f"Client connected: {addr[0]}:{addr[1]}")
        t = threading.Thread(
            target=client_session, args=(conn, addr), daemon=True
        )
        t.start()
        threads.append(t)
    srv.close()
    # Let in-flight requests finish (their sockets stay open until
    # each session ends); new connections are refused.
    for t in threads:
        t.join(timeout=60)


if __name__ == "__main__":
    main(parser.parse_args())
