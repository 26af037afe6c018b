"""Umbrella entry point: ``python -m vsc2022_tpu <command> ...``.

Routes to the framework's CLIs (each also runnable directly as
``python -m vsc2022_tpu.<module>``).
"""

import sys

COMMANDS = {
    "inference": ("vsc2022_tpu.inference.cli", "Extract frame descriptors"),
    "sscd-baseline": (
        "vsc2022_tpu.baseline.sscd_baseline",
        "SSCD/DINO matching pipeline",
    ),
    "dns-index": ("vsc2022_tpu.baseline.dns_index", "DnS student indexing"),
    "dns-baseline": (
        "vsc2022_tpu.baseline.dns_baseline",
        "DnS two-stage matching pipeline",
    ),
    "adapt-model": (
        "vsc2022_tpu.baseline.adapt_model",
        "Convert torch weights to Flax checkpoints",
    ),
    "train": ("vsc2022_tpu.train.cli", "Self-supervised descriptor training"),
    "serve": (
        "vsc2022_tpu.retrieval.serve",
        "Resident retrieval server (corpus staged once)",
    ),
    "parity": (
        "vsc2022_tpu.parity",
        "One-command real-data parity dress rehearsal",
    ),
}


def main(argv):
    if not argv or argv[0] in ("-h", "--help") or argv[0] not in COMMANDS:
        print("usage: python -m vsc2022_tpu <command> [args]\n\ncommands:")
        for name, (_, desc) in COMMANDS.items():
            print(f"  {name:15s} {desc}")
        print(
            "\n(descriptor_eval.py and matching_eval.py live at the repo "
            "root, mirroring the reference layout)"
        )
        return 0 if argv and argv[0] in ("-h", "--help") else 2

    import importlib

    module = importlib.import_module(COMMANDS[argv[0]][0])
    module.main(module.parser.parse_args(argv[1:]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
