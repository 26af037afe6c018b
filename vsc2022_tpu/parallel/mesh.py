"""Device mesh construction.

The reference's multi-device story is FAISS ``index_cpu_to_all_gpus``
(replicated index, queries split; reference: vsc/index.py:169-171) plus
torch.distributed process groups that never issue a collective
(reference: vsc/baseline/inference.py:152-157). The TPU-native story
inverts it: one process per host, a ``jax.sharding.Mesh`` over all
chips, the *reference corpus* sharded across devices (HBM capacity
scales with the pod) and queries replicated; partial top-k results merge
over ICI with an all-gather. Multi-host initialization is
``jax.distributed.initialize`` (replacing the reference's NCCL/gloo
rendezvous dance).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def local_device_count() -> int:
    return len(jax.devices())


def corpus_mesh(n_devices: Optional[int] = None, axis: str = "corpus") -> Mesh:
    """1-D mesh over the corpus-sharding axis."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"Requested {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def train_mesh(n_devices: Optional[int] = None) -> Mesh:
    """2-D ("data", "model") mesh for training: TP over a small model
    axis when the device count allows, DP over the rest."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"Requested {n} devices, have {len(devices)}")
    model_par = 2 if n % 2 == 0 and n >= 2 else 1
    grid = np.asarray(devices[:n]).reshape(n // model_par, model_par)
    return Mesh(grid, ("data", "model"))


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (DCN); no-op for single-host runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def first_axis_sharding(mesh: Mesh):
    """NamedSharding that splits an array's leading dim over the mesh's
    first axis — the framework's convention for batch/pair DP sharding."""
    from jax.sharding import NamedSharding, PartitionSpec

    return NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))


def first_axis_size(mesh: Mesh) -> int:
    return int(mesh.shape[mesh.axis_names[0]])
