#!/usr/bin/env python3
"""Descriptor-model training CLI: SSCD-style self-supervised
fine-tuning on video frames.

The reference ships inference-only pretrained artifacts; this trainer
closes the loop so descriptor models can be (re)trained in-framework.
Frames come from a video directory (host ffmpeg decode) or a synthetic
source (--synthetic, for smoke tests and benchmarks); two augmented
views are generated on device (train/augment.py) and the sharded train
step (train/sscd_train.py) runs on a ("data", "model") mesh over all
local devices.
"""

import argparse
import logging
import os
import time

import numpy as np

from vsc2022_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

logging.basicConfig(
    format="%(asctime)s %(levelname)-8s %(message)s",
    level=logging.INFO,
    datefmt="%Y-%m-%d %H:%M:%S",
)
logger = logging.getLogger("train")
logger.setLevel(logging.INFO)

parser = argparse.ArgumentParser()
parser.add_argument(
    "--objective", choices=["sscd", "dns_distill"], default="sscd",
    help="sscd: self-supervised descriptor training on frames. "
    "dns_distill: train a DnS student to match a teacher's video-pair "
    "similarity (Distill-and-Select).",
)
parser.add_argument("--student", choices=["cg", "fg"], default="fg")
parser.add_argument("--fg_type", choices=["att", "bin"], default="att")
parser.add_argument(
    "--distill_pairs", default=None,
    help="npz with arrays q_regions [N,T,9,3840], r_regions, teacher_sim "
    "[N] — the distillation dataset (teacher similarities precomputed "
    "by any fine-grained model).",
)
parser.add_argument(
    "--frames_per_video", type=int, default=4,
    help="frames per synthetic distillation pair",
)
parser.add_argument("--dataset_path", help="Directory of videos", default=None)
parser.add_argument(
    "--synthetic", type=int, default=0,
    help="Train on N synthetic frames (smoke test / benchmark) instead "
    "of decoding videos.",
)
parser.add_argument("--steps", type=int, default=100)
parser.add_argument("--batch_size", type=int, default=64)
parser.add_argument("--image_size", type=int, default=224)
parser.add_argument("--learning_rate", type=float, default=1e-4)
parser.add_argument("--weight_decay", type=float, default=1e-2)
parser.add_argument("--fps", type=float, default=1.0)
parser.add_argument("--ffmpeg_path", default="ffmpeg")
parser.add_argument(
    "--init_checkpoint", default=None,
    help="npz variable tree to fine-tune from (random init otherwise)",
)
parser.add_argument("--checkpoint_out", required=True)
parser.add_argument("--checkpoint_every", type=int, default=500)
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--log_every", type=int, default=10)


def frame_source(args):
    """Yield uint8 frame batches [B, H, W, 3] forever."""
    rng = np.random.RandomState(args.seed)
    size = args.image_size
    if args.synthetic:
        frames = (rng.rand(args.synthetic, size, size, 3) * 255).astype(
            np.uint8
        )
        while True:
            idx = rng.randint(0, args.synthetic, size=args.batch_size)
            yield frames[idx]
    else:
        from functools import partial

        from vsc2022_tpu.inference.pipeline import VideoDataset, _prefetch
        from vsc2022_tpu.inference.video_reader import FFMpegVideoReader

        dataset = VideoDataset(
            path=args.dataset_path,
            reader_factory=partial(
                FFMpegVideoReader,
                required_fps=args.fps,
                ffmpeg_path=args.ffmpeg_path,
            ),
        )
        buf = []
        while True:
            for _, frames, _ in _prefetch(dataset.iter_decoded()):
                # Center-crop/resize frames to a uniform square on host
                # (cheap nearest sampling; fine for training data).
                n, h, w, _ = frames.shape
                ys = (np.arange(size) * h) // size
                xs = (np.arange(size) * w) // size
                buf.extend(frames[:, ys][:, :, xs])
                while len(buf) >= args.batch_size:
                    batch = np.stack(buf[: args.batch_size])
                    del buf[: args.batch_size]
                    yield batch


def distill_batches(args):
    """Yield distillation batches forever (npz file or synthetic)."""
    import jax.numpy as jnp

    from vsc2022_tpu.models.dns import L3_IMAC_DIM, NUM_REGIONS
    from vsc2022_tpu.train.dns_distill import _frame_chamfer

    rng = np.random.RandomState(args.seed)
    if args.distill_pairs:
        data = np.load(args.distill_pairs)
        q, r, sim = data["q_regions"], data["r_regions"], data["teacher_sim"]
    else:
        n, t = max(args.synthetic, args.batch_size), args.frames_per_video

        def regions(k):
            x = rng.randn(k, t, NUM_REGIONS, L3_IMAC_DIM).astype(np.float32)
            return x / np.linalg.norm(x, axis=-1, keepdims=True)

        q, r = regions(n), regions(n)
        for i in range(0, n, 2):  # half the pairs are noisy copies
            r[i] = q[i] + 0.05 * rng.randn(*q[i].shape).astype(np.float32)
            r[i] /= np.linalg.norm(r[i], axis=-1, keepdims=True)
        sim = np.asarray(
            [float(_frame_chamfer(jnp.asarray(q[i]), jnp.asarray(r[i])))
             for i in range(n)],
            dtype=np.float32,
        )
    while True:
        idx = rng.randint(0, q.shape[0], size=args.batch_size)
        yield {
            "q_regions": q[idx],
            "r_regions": r[idx],
            "teacher_sim": sim[idx],
        }


def run_distillation(args):
    import jax
    import optax

    from vsc2022_tpu.parallel.mesh import corpus_mesh
    from vsc2022_tpu.train.dns_distill import (
        build_student_module,
        create_distill_state,
        make_distill_step,
    )
    from vsc2022_tpu.utils.checkpoint import save_variables

    from vsc2022_tpu.utils.checkpoint import load_variables

    module = build_student_module(args.student, args.fg_type)
    tx = optax.adam(args.learning_rate)
    state = create_distill_state(jax.random.PRNGKey(args.seed), module, tx)
    if args.init_checkpoint:
        state = state._replace(params=load_variables(args.init_checkpoint))
        logger.info("Initialized student from %s", args.init_checkpoint)
    n_dev = len(jax.devices())
    # DP-shard the pair batch when it divides the device count.
    mesh = corpus_mesh() if n_dev > 1 and args.batch_size % n_dev == 0 else None
    qw = 0.1 if (args.student, args.fg_type) == ("fg", "bin") else 0.0
    step_fn = make_distill_step(
        module, tx, args.student, quantization_weight=qw, mesh=mesh
    )
    logger.info(
        "Distilling %s student on %d device(s)",
        args.student if args.student == "cg" else f"fg_{args.fg_type}",
        n_dev,
    )
    source = distill_batches(args)
    t_start = time.time()
    for step in range(1, args.steps + 1):
        state, loss = step_fn(state, next(source))
        if step % args.log_every == 0 or step == args.steps:
            rate = step * args.batch_size / (time.time() - t_start)
            logger.info(
                "step %d/%d loss %.4f (%.1f pairs/s)",
                step, args.steps, float(loss), rate,
            )
        if step % args.checkpoint_every == 0 or step == args.steps:
            os.makedirs(
                os.path.dirname(args.checkpoint_out) or ".", exist_ok=True
            )
            save_variables(args.checkpoint_out, jax.device_get(state.params))
            logger.info("Checkpoint written to %s", args.checkpoint_out)


def main(args):
    if args.objective == "dns_distill":
        if not args.distill_pairs and not args.synthetic:
            raise Exception("Provide --distill_pairs or --synthetic N")
        return run_distillation(args)
    if not args.synthetic and not args.dataset_path:
        raise Exception("Provide --dataset_path or --synthetic N")

    import jax
    import jax.numpy as jnp
    import optax

    from vsc2022_tpu.models.sscd import SSCDModel
    from vsc2022_tpu.parallel.mesh import train_mesh
    from vsc2022_tpu.train import create_train_state, make_train_step
    from vsc2022_tpu.train.augment import two_views
    from vsc2022_tpu.utils.checkpoint import load_variables, save_variables

    model = SSCDModel()
    tx = optax.adamw(args.learning_rate, weight_decay=args.weight_decay)
    state = create_train_state(
        jax.random.PRNGKey(args.seed), model, tx,
        input_shape=(1, args.image_size, args.image_size, 3),
    )
    if args.init_checkpoint:
        variables = load_variables(args.init_checkpoint)
        state = state._replace(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", state.batch_stats),
        )
        logger.info("Initialized from %s", args.init_checkpoint)

    n_dev = len(jax.devices())
    mesh = train_mesh() if n_dev > 1 else None
    step_fn = make_train_step(model, tx, mesh)
    logger.info(
        "Training on %d device(s)%s", n_dev,
        f" (mesh {dict(mesh.shape)})" if mesh else "",
    )

    rng = jax.random.PRNGKey(args.seed + 1)
    source = frame_source(args)
    t_start = time.time()
    for step in range(1, args.steps + 1):
        frames = next(source)
        rng, view_rng = jax.random.split(rng)
        view_a, view_b = two_views(
            view_rng, jnp.asarray(frames), out_hw=args.image_size
        )
        state, loss = step_fn(state, {"view_a": view_a, "view_b": view_b})
        if step % args.log_every == 0 or step == args.steps:
            loss_val = float(loss)
            rate = step * args.batch_size / (time.time() - t_start)
            logger.info(
                "step %d/%d loss %.4f (%.1f frames/s)",
                step, args.steps, loss_val, rate,
            )
        if step % args.checkpoint_every == 0 or step == args.steps:
            os.makedirs(
                os.path.dirname(args.checkpoint_out) or ".", exist_ok=True
            )
            save_variables(
                args.checkpoint_out,
                {
                    "params": jax.device_get(state.params),
                    "batch_stats": jax.device_get(state.batch_stats),
                },
            )
            logger.info("Checkpoint written to %s", args.checkpoint_out)


if __name__ == "__main__":
    main(parser.parse_args())
