"""Flat npz checkpointing for model variable trees.

Durable artifacts in this framework are npz files (matching the
reference's stage-artifact resume story; SURVEY.md §5). A variable tree
is stored as one npz with '/'-joined keys — dependency-free, portable,
and mmap-friendly. For sharded/async training checkpoints use orbax;
inference models don't need it.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(v, f"{prefix}{k}/"))
    else:
        flat[prefix[:-1]] = np.asarray(tree)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def save_variables(path: str, variables: Any) -> None:
    np.savez(path, **_flatten(variables))


def load_variables(path: str) -> Any:
    with np.load(path, allow_pickle=False) as data:
        return _unflatten({k: data[k] for k in data.files})
