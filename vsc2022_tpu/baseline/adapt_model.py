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
    "--model", choices=["sscd", "dino"], default="sscd",
)
parser.add_argument(
    "--verify", action="store_true",
    help="Numerically compare torch vs Flax outputs on random input.",
)


def main(args):
    from vsc2022_tpu.models.convert import (
        dino_vit_from_torch,
        load_torchscript_state,
        sscd_from_torch,
    )
    from vsc2022_tpu.utils.checkpoint import save_variables

    if os.path.exists(args.output_checkpoint):
        raise Exception("Output file already exists")

    state = load_torchscript_state(args.input_torchscript)
    if args.model == "sscd":
        variables = sscd_from_torch(state)
    else:
        variables = dino_vit_from_torch(state)

    if args.verify:
        import jax.numpy as jnp
        import torch

        from vsc2022_tpu.models import DinoViT, SSCDModel

        torch_model = torch.jit.load(args.input_torchscript).eval()
        x = np.random.RandomState(0).randn(2, 3, 64, 64).astype(np.float32)
        with torch.no_grad():
            expect = torch_model(torch.from_numpy(x)).numpy()
        model = SSCDModel() if args.model == "sscd" else DinoViT()
        got = np.asarray(
            model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
        )
        dist = ((got - expect) ** 2).sum(axis=1)
        if (dist > 1e-3).any():
            raise Exception(
                f"Conversion mismatch: max squared distance {dist.max():.2e}"
            )
        logger.info("Verified: outputs match within tolerance")

    save_variables(args.output_checkpoint, variables)
    logger.info(f"Wrote {args.output_checkpoint}")


if __name__ == "__main__":
    main(parser.parse_args())
