"""Optional JAX profiler hook.

The reference has no tracing/profiling beyond tqdm progress bars
(SURVEY.md §5); production TPU pipelines need traces. Any driver can
wrap its hot section:

    with maybe_profile(args.profile_dir):
        ...

writing a TensorBoard-compatible trace when a directory is given and
being a no-op otherwise.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional


@contextlib.contextmanager
def maybe_profile(profile_dir: Optional[str]) -> Iterator[None]:
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
