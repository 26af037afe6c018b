"""Persistent XLA compilation cache setup.

First compiles through the remote-compile path can take tens of
seconds; the persistent cache makes repeat CLI/bench invocations start
hot. Call before any jit executes."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    # Escape hatch for CI/tests: force the CPU backend even where a
    # sitecustomize pre-selects an accelerator platform.
    if os.environ.get("VSC2022_TPU_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    cache_dir = path or os.environ.get(
        "VSC2022_TPU_JAX_CACHE",
        os.path.expanduser("~/.cache/vsc2022_tpu/jax"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
