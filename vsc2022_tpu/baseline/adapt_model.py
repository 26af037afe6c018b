#!/usr/bin/env python3
"""Convert published torch weights to native Flax npz checkpoints.

The analog of the reference's ``adapt_sscd_model.py`` (which strips the
trailing L2Norm from the SSCD TorchScript model; reference:
vsc/baseline/adapt_sscd_model.py). In this framework L2 normalization
is a model flag, not serialized structure, so "adaptation" is just
weight conversion: TorchScript → Flax variable tree stored as npz.

When torch is available, the conversion is numerically verified by
running both models on random input (the reference's equivalence check,
adapt_sscd_model.py:44-51).
"""

import argparse
import logging
import os

import numpy as np

logging.basicConfig(
    format="%(asctime)s %(levelname)-8s %(message)s",
    level=logging.INFO,
    datefmt="%Y-%m-%d %H:%M:%S",
)
logger = logging.getLogger("adapt_model")
logger.setLevel(logging.INFO)

parser = argparse.ArgumentParser()
parser.add_argument(
    "--input_torchscript", type=str, required=True,
    help="Path to the torch model to convert.",
)
parser.add_argument(
    "--output_checkpoint", type=str, required=True,
    help="The Flax npz checkpoint to write.",
)
parser.add_argument(
    "--model",
    choices=["sscd", "dino", "dns_cg", "dns_fg_att", "dns_fg_bin"],
    default="sscd",
)
parser.add_argument(
    "--strip_prefix", default="",
    help="Leading module prefix to strip from serialized parameter "
    "names (e.g. 'student.').",
)
parser.add_argument(
    "--verify", action="store_true",
    help="Numerically compare torch vs Flax outputs on random input.",
)


def main(args):
    from vsc2022_tpu.models.convert import (
        dino_vit_from_torch,
        dns_student_from_torch,
        load_torchscript_state,
        sscd_from_torch,
    )
    from vsc2022_tpu.utils.checkpoint import save_variables

    if os.path.exists(args.output_checkpoint):
        raise Exception("Output file already exists")

    state = load_torchscript_state(
        args.input_torchscript, strip_prefix=args.strip_prefix
    )
    if args.model == "sscd":
        variables = sscd_from_torch(state)
    elif args.model == "dino":
        variables = dino_vit_from_torch(state)
    else:  # dns_cg / dns_fg_att / dns_fg_bin
        _, student_type, *fg = args.model.split("_")
        variables = dns_student_from_torch(
            state, student_type, fg[0] if fg else "att"
        )

    if args.verify:
        import jax.numpy as jnp
        import torch

        from vsc2022_tpu.models import DinoViT, SSCDModel

        torch_model = torch.jit.load(args.input_torchscript).eval()
        rng = np.random.RandomState(0)
        if args.model.startswith("dns_"):
            from vsc2022_tpu.models.dns import DnSStudent

            _, student_type, *fg = args.model.split("_")
            student = DnSStudent(
                student_type, fg[0] if fg else None, params=variables
            )
            regions = rng.randn(3, 9, 3840).astype(np.float32)
            regions /= np.linalg.norm(regions, axis=-1, keepdims=True)
            with torch.no_grad():
                if student_type == "cg":
                    # Reference feeds cg with an unsqueezed dim
                    # (dns_index.py:110-111).
                    expect = torch_model.index_video(
                        torch.from_numpy(regions).unsqueeze(1)
                    ).numpy()
                else:
                    expect = torch_model.index_video(
                        torch.from_numpy(regions)
                    ).numpy()
            got = student.index_video(regions.reshape(regions.shape[0], -1))
            expect = expect.reshape(got.shape)
        else:
            x = rng.randn(2, 3, 64, 64).astype(np.float32)
            with torch.no_grad():
                expect = torch_model(torch.from_numpy(x)).numpy()
            model = SSCDModel() if args.model == "sscd" else DinoViT()
            got = np.asarray(
                model.apply(
                    variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
                )
            )
        dist = ((got - expect) ** 2).reshape(got.shape[0], -1).sum(axis=1)
        if (dist > 1e-3).any():
            raise Exception(
                f"Conversion mismatch: max squared distance {dist.max():.2e}"
            )
        logger.info("Verified: outputs match within tolerance")

    save_variables(args.output_checkpoint, variables)
    logger.info(f"Wrote {args.output_checkpoint}")


if __name__ == "__main__":
    main(parser.parse_args())
