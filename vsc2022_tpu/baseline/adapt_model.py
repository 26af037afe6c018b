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
    "--output_checkpoint", type=str, default=None,
    help="The Flax npz checkpoint to write (required unless --probe).",
)
parser.add_argument(
    "--probe", action="store_true",
    help="Dry run for real-artifact day: print the artifact's "
    "serialized key tree, the alias-normalized mapping the converter "
    "will consume, and per-parameter shape agreement against the Flax "
    "model — without writing a checkpoint. On a missing key, prints "
    "the unmet requirement next to the closest serialized names (the "
    "fix is one ALIAS_RULES entry in models/convert.py).",
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


def convert_state(model: str, state):
    """state dict → Flax variables for the --model choice."""
    from vsc2022_tpu.models.convert import (
        dino_vit_from_torch,
        dns_student_from_torch,
        sscd_from_torch,
    )

    if model == "sscd":
        return sscd_from_torch(state)
    if model == "dino":
        return dino_vit_from_torch(state)
    _, student_type, *fg = model.split("_")  # dns_cg / dns_fg_att / dns_fg_bin
    return dns_student_from_torch(state, student_type, fg[0] if fg else "att")


def _shape_tree(variables):
    """{'params/backbone/conv1/kernel': (h, w, i, o), ...}"""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    return {
        "/".join(str(getattr(p, "key", p)) for p in path): tuple(leaf.shape)
        for path, leaf in flat
    }


def _expected_shapes(model: str):
    """Reference shape tree from a fresh Flax init (None for DnS
    students, whose parameters are construction inputs, not an init)."""
    if model.startswith("dns_"):
        return None
    import jax
    import jax.numpy as jnp

    from vsc2022_tpu.models import DinoViT, SSCDModel

    if model == "sscd":
        net, hw = SSCDModel(), 64
    else:
        net, hw = DinoViT(), 224
    variables = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3), jnp.float32)
    )
    return _shape_tree(variables)


def probe(args, state) -> int:
    """Report what conversion WOULD do: artifact tree → alias-normalized
    names → converted tree → shape agreement. Returns an exit code."""
    from collections import Counter

    from vsc2022_tpu.models.convert import ConversionKeyError, apply_aliases

    family = "dns" if args.model.startswith("dns_") else args.model
    normalized = apply_aliases(state, family)
    renames = {}
    for old in state:
        (new,) = apply_aliases({old: state[old]}, family)
        if new != old:
            renames[old] = new

    groups = Counter(k.split(".")[0] for k in state)
    print(f"Artifact: {len(state)} parameters; top-level groups:")
    for name, count in sorted(groups.items()):
        print(f"  {name:<24} x{count}")
    if renames:
        print(f"Alias rules ({family}) rename {len(renames)} keys, e.g.:")
        for old in sorted(renames)[:5]:
            print(f"  {old} -> {renames[old]}")
    else:
        print(f"Alias rules ({family}): no renames needed")

    try:
        variables = convert_state(args.model, state)
    except ConversionKeyError as exc:
        print(f"CONVERSION WOULD FAIL: {exc}")
        print("Serialized keys after alias normalization (first 40):")
        for k in sorted(normalized)[:40]:
            print(f"  {k}  {tuple(normalized[k].shape)}")
        return 1

    got = _shape_tree(variables)
    expected = _expected_shapes(args.model)
    if expected is None:
        print(f"Converted tree: {len(got)} parameters (DnS students have "
              "no init reference; shapes below)")
        for name in sorted(got):
            print(f"  {name:<56} {got[name]}")
        return 0
    bad = sorted(
        set(expected) ^ set(got)
        | {n for n in set(expected) & set(got) if expected[n] != got[n]}
    )
    if bad:
        print(f"SHAPE DISAGREEMENT on {len(bad)} parameters:")
        for name in bad[:40]:
            print(
                f"  {name:<56} artifact={got.get(name)} "
                f"model={expected.get(name)}"
            )
        return 1
    print(f"OK: all {len(got)} parameters map with matching shapes")
    return 0


def main(args):
    from vsc2022_tpu.models.convert import load_torchscript_state
    from vsc2022_tpu.utils.checkpoint import save_variables

    if not getattr(args, "probe", False):
        if not args.output_checkpoint:
            raise Exception("--output_checkpoint is required (or use --probe)")
        if os.path.exists(args.output_checkpoint):
            raise Exception("Output file already exists")

    state = load_torchscript_state(
        args.input_torchscript, strip_prefix=args.strip_prefix
    )
    if getattr(args, "probe", False):
        raise SystemExit(probe(args, state))
    variables = convert_state(args.model, state)

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
