"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharded
code paths are testable without a TPU pod (SURVEY.md §4).

The environment's sitecustomize force-selects the TPU ("axon") platform
via jax.config, ignoring JAX_PLATFORMS — so we override the config here,
before any backend is initialized. Tests must be fast and reproducible;
the benchmark harness (bench.py) targets the real TPU separately.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
