"""Persistent XLA compilation cache setup.

First compiles through the remote-compile path can take tens of
seconds; the persistent cache makes repeat CLI/bench invocations start
hot. Call before any jit executes."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get(
        "VSC2022_TPU_JAX_CACHE",
        os.path.expanduser("~/.cache/vsc2022_tpu/jax"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
