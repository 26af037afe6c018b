#!/usr/bin/env python3
"""Descriptor inference CLI.

Reference-compatible flags (reference: vsc/baseline/inference.py:52-81)
plus native-checkpoint loading. Unlike the reference — where
``--baseline`` is parsed but never consumed (inference.py:55; model
choice is entirely the TorchScript file) — here ``--baseline`` selects
the Flax architecture and ``--checkpoint_path`` provides its weights
(npz variable tree; convert published torch weights with
``python -m vsc2022_tpu.baseline.adapt_model``). ``--torchscript_path``
is accepted for drop-in compatibility and converted on the fly (needs
torch).

Distribution model: each worker is one process owning its accelerator,
sharded by ``--distributed_rank/size`` with per-rank npz outputs merged
afterwards — the same share-nothing scheme as the reference.
``--processes N`` spawns N local CPU workers (useful for decode-bound
CPU runs); on TPU run one process per host and let XLA use the chips.
"""

import argparse
import enum
import logging
import multiprocessing
import os
import tempfile
from functools import partial

from vsc2022_tpu.inference.transforms import InferenceTransforms

from vsc2022_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

logging.basicConfig(
    format="%(asctime)s %(levelname)-8s %(message)s",
    level=logging.INFO,
    datefmt="%Y-%m-%d %H:%M:%S",
)
logger = logging.getLogger("inference")
logger.setLevel(logging.INFO)


class Accelerator(enum.Enum):
    CPU = enum.auto()
    TPU = enum.auto()


class VideoReaderType(enum.Enum):
    FFMPEG = enum.auto()


class Baseline(enum.Enum):
    SSCD = enum.auto()
    DNS = enum.auto()
    DINO = enum.auto()


parser = argparse.ArgumentParser()
inference_parser = parser.add_argument_group("Inference")
inference_parser.add_argument(
    "--baseline", default="sscd", choices=[x.name.lower() for x in Baseline]
)
inference_parser.add_argument(
    "--checkpoint_path", default=None,
    help="npz variable tree for the selected baseline model",
)
inference_parser.add_argument(
    "--torchscript_path", default=None,
    help="TorchScript weights; converted on the fly (requires torch)",
)
inference_parser.add_argument("--batch_size", type=int, default=32)
inference_parser.add_argument(
    "--fold_bn", action="store_true",
    help="Fold BatchNorm affines into conv weights before inference "
    "(ResNet-family baselines; ~6-8%% faster forward). Descriptors "
    "match the unfolded model to float32 roundoff.",
)
inference_parser.add_argument(
    "--compute_dtype", choices=["float32", "bfloat16"], default="float32",
    help="bfloat16 runs the model forward MXU-native (~2-4x conv "
    "throughput); descriptors are stored as float32 (or fp16 with "
    "--store_fp16) either way, at bf16 resolution.",
)
inference_parser.add_argument("--distributed_rank", type=int, default=0)
inference_parser.add_argument("--distributed_size", type=int, default=1)
inference_parser.add_argument("--processes", type=int, default=1)
inference_parser.add_argument(
    "--transforms",
    choices=[x.name for x in InferenceTransforms],
    default="RESIZE_320_CENTER",
)
inference_parser.add_argument(
    "--accelerator", choices=[x.name.lower() for x in Accelerator], default="tpu"
)
inference_parser.add_argument("--output_file", required=True)
inference_parser.add_argument("--scratch_path", required=False)
inference_parser.add_argument("--store_fp16", action="store_true")
inference_parser.add_argument(
    "--profile_dir", default=None,
    help="Write a JAX profiler trace of the extraction run.",
)
inference_parser.add_argument(
    "--resume", action="store_true",
    help="Skip videos already present in this worker's output file and "
    "append only the missing ones (per-video checkpointing).",
)

multihost_parser = parser.add_argument_group(
    "Multi-host (DCN)",
    "Run one process per host and let jax.distributed connect them. "
    "Replaces the reference's torch.distributed rendezvous "
    "(vsc/baseline/inference.py:95-99,140-158); the video shard follows "
    "process_id % num_processes.",
)
multihost_parser.add_argument(
    "--coordinator", default=None,
    help="coordinator address host:port, e.g. 10.0.0.1:8476 "
    "(passed to jax.distributed.initialize)",
)
multihost_parser.add_argument(
    "--num_processes", type=int, default=1,
    help="total number of host processes in the job",
)
multihost_parser.add_argument(
    "--process_id", type=int, default=0,
    help="this host's index in [0, num_processes)",
)

dataset_parser = parser.add_argument_group("Dataset")
dataset_parser.add_argument("--dataset_path", required=True)
dataset_parser.add_argument("--fps", default=1, type=float)
dataset_parser.add_argument("--video_extensions", default="mp4")
dataset_parser.add_argument(
    "--video_reader", choices=[x.name for x in VideoReaderType], default="FFMPEG"
)
dataset_parser.add_argument("--ffmpeg_path", default="ffmpeg")
dataset_parser.add_argument(
    "--reference_compat_timestamps", action="store_true",
    help="Stamp every sampled frame with a 1-second span regardless of "
    "--fps, reproducing the reference reader bit-for-bit (it hardcodes "
    "1 s spans; only correct at fps=1). Default: spans scale with --fps.",
)


def build_model(args):
    """Instantiate the architecture + variables for --baseline."""
    import jax

    from vsc2022_tpu.models import DinoViT, SSCDModel
    from vsc2022_tpu.models.dns import L3iMACExtractor
    from vsc2022_tpu.utils.checkpoint import load_variables

    baseline = Baseline[args.baseline.upper()]
    fold_bn = getattr(args, "fold_bn", False)
    if baseline == Baseline.SSCD:
        model = SSCDModel(fold_bn=fold_bn)
        probe_hw = 320
    elif baseline == Baseline.DINO:
        if fold_bn:
            raise ValueError("--fold_bn applies to ResNet-family "
                             "baselines only (DINO has no BatchNorm)")
        model = DinoViT()
        probe_hw = 224
    else:
        model = L3iMACExtractor(fold_bn=fold_bn)
        probe_hw = 224

    if args.checkpoint_path:
        variables = load_variables(args.checkpoint_path)
    elif args.torchscript_path:
        from vsc2022_tpu.models.convert import (
            dino_vit_from_torch,
            load_torchscript_state,
            sscd_from_torch,
        )

        state = load_torchscript_state(args.torchscript_path)
        if baseline == Baseline.DINO:
            variables = dino_vit_from_torch(state)
        elif baseline == Baseline.SSCD:
            variables = sscd_from_torch(state)
        else:
            raise ValueError(
                "DnS extractor conversion requires --checkpoint_path "
                "(convert once with vsc2022_tpu.baseline.adapt_model)"
            )
    else:
        logger.warning(
            "No weights given (--checkpoint_path/--torchscript_path); "
            "using random init — descriptors will be meaningless."
        )
        import jax.numpy as jnp

        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, probe_hw, probe_hw, 3), jnp.float32),
        )

    if fold_bn and "batch_stats" in variables:
        # Loaded/converted weights are unfolded; random init under
        # fold_bn=True is already in folded form.
        from vsc2022_tpu.models.fold import fold_batchnorm

        variables = fold_batchnorm(variables)

    if isinstance(model, L3iMACExtractor):
        # Flatten region features for 2-D npz storage.
        def apply_fn(vars_, images):
            out = model.apply(vars_, images)
            return out.reshape(out.shape[0], -1)
    else:
        def apply_fn(vars_, images):
            return model.apply(vars_, images)

    return apply_fn, variables


def worker_process(args, rank, world_size, output_filename):
    # Workers are CPU-decode fan-out, but lifetime hygiene still
    # applies: a SIGKILLed spawner must not leave orphans churning.
    from vsc2022_tpu.utils.procs import die_with_parent

    die_with_parent()
    import tqdm

    from vsc2022_tpu.inference.pipeline import (
        DescriptorExtractor,
        VideoDataset,
    )
    from vsc2022_tpu.inference.video_reader import FFMpegVideoReader
    from vsc2022_tpu.storage import store_features

    logger.info(f"Starting worker {rank} of {world_size}.")
    if Accelerator[args.accelerator.upper()] == Accelerator.CPU:
        import jax

        jax.config.update("jax_platforms", "cpu")

    apply_fn, variables = build_model(args)
    reader_factory = partial(
        FFMpegVideoReader,
        required_fps=args.fps,
        ffmpeg_path=args.ffmpeg_path,
        reference_compat_timestamps=getattr(
            args, "reference_compat_timestamps", False
        ),
    )
    dataset = VideoDataset(
        path=args.dataset_path,
        reader_factory=reader_factory,
        extensions=args.video_extensions.split(","),
        distributed_rank=rank,
        distributed_world_size=world_size,
    )
    done_features = []
    if getattr(args, "resume", False) and os.path.exists(output_filename):
        from vsc2022_tpu.storage import load_features

        done_features = load_features(output_filename)
        done_ids = {vf.video_id for vf in done_features}
        dataset.selected_videos = [
            (i, video)
            for (i, video) in dataset.selected_videos
            if os.path.basename(video).split(".")[0] not in done_ids
        ]
        logger.info(
            "Resuming: %d videos already extracted, %d remaining",
            len(done_ids), dataset.num_videos(),
        )
    extractor = DescriptorExtractor(
        apply_fn,
        variables,
        transform=InferenceTransforms[args.transforms],
        batch_size=args.batch_size,
        compute_dtype=getattr(args, "compute_dtype", "float32"),
    )
    from vsc2022_tpu.utils.profiling import maybe_profile

    progress = tqdm.tqdm(total=dataset.num_videos())
    with maybe_profile(getattr(args, "profile_dir", None)):
        vfs = list(
            extractor.extract(
                dataset, store_fp16=args.store_fp16, progress=progress.update
            )
        )
    logger.info(f"Storing worker {rank} outputs")
    all_features = done_features + vfs
    store_features(output_filename, all_features)
    logger.info(
        f"Wrote worker {rank} features for {len(all_features)} videos "
        f"({len(vfs)} new) to {output_filename}"
    )


def main(args):
    if Accelerator[args.accelerator.upper()] == Accelerator.CPU:
        # Select the platform before anything (jax.distributed included)
        # can initialize a backend: a CPU run must never grab an
        # accelerator, and multi-host CPU jobs would otherwise race for
        # the same chip.
        import jax

        jax.config.update("jax_platforms", "cpu")
    n_hosts = getattr(args, "num_processes", 1) or 1
    if args.processes > 1 and args.distributed_size > 1:
        raise Exception(
            "Set either --processes (single-machine distributed) or "
            "both --distributed_size and --distributed_rank (arbitrary "
            "distributed)"
        )
    if n_hosts > 1 and (args.processes > 1 or args.distributed_size > 1):
        raise Exception(
            "--num_processes (multi-host DCN) excludes --processes and "
            "--distributed_rank/--distributed_size; pick one distribution "
            "scheme"
        )
    if n_hosts > 1:
        if not getattr(args, "coordinator", None):
            raise Exception(
                "--num_processes > 1 requires --coordinator host:port "
                "(the jax.distributed rendezvous address)"
            )
        if not 0 <= args.process_id < n_hosts:
            raise Exception(
                f"--process_id {args.process_id} out of range "
                f"[0, {n_hosts})"
            )
    if args.processes > 1 and Accelerator[args.accelerator.upper()] != Accelerator.CPU:
        raise Exception(
            "--processes > 1 is a CPU-decode fan-out; a TPU host runs one "
            "process (use --distributed_rank/--distributed_size across hosts)"
        )
    success = False
    with tempfile.TemporaryDirectory() as tmp_path:
        os.makedirs(os.path.dirname(args.output_file) or ".", exist_ok=True)
        scratch = args.scratch_path or tmp_path
        os.makedirs(scratch, exist_ok=True)
        if args.processes > 1:
            logger.info(f"Spawning {args.processes} processes")
            ctx = multiprocessing.get_context("spawn")
            worker_files = [
                os.path.join(scratch, f"{rank}.npz")
                for rank in range(args.processes)
            ]
            processes = [
                ctx.Process(
                    target=worker_process,
                    args=(args, rank, args.processes, worker_files[rank]),
                )
                for rank in range(args.processes)
            ]
            try:
                for p in processes:
                    p.start()
                for p in processes:
                    p.join()
                success = all(p.exitcode == os.EX_OK for p in processes)
            finally:
                for p in processes:
                    p.kill()
            if success:
                from vsc2022_tpu.inference.pipeline import merge_feature_files

                num = merge_feature_files(worker_files, args.output_file)
                logger.info(f"Features for {num} videos saved to {args.output_file}")
        elif n_hosts > 1:
            # Multi-host DCN: jax.distributed connects the hosts; the
            # video shard is this host's slice, written to a per-host
            # output (merge the shards afterwards, as in the reference's
            # multi-machine mode).
            from vsc2022_tpu.parallel.mesh import initialize_distributed

            logger.info(
                f"Joining distributed job as process {args.process_id} of "
                f"{n_hosts} (coordinator: {args.coordinator})"
            )
            initialize_distributed(args.coordinator, n_hosts, args.process_id)
            worker_process(args, args.process_id, n_hosts, args.output_file)
            success = True
        else:
            worker_process(
                args, args.distributed_rank, args.distributed_size,
                args.output_file,
            )
            success = True

    if success:
        logger.info("Inference succeeded.")
    else:
        logger.error("Inference FAILED!")


if __name__ == "__main__":
    main(parser.parse_args())
