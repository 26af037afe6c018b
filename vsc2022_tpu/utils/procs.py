"""Child-process lifetime hygiene for chip-holding subprocesses.

Only ONE process can hold the TPU chip on this rig, and an orphaned
child (its spawner SIGKILLed — e.g. a bench harness killed at a budget
deadline, or a driver killing the harness itself) keeps the chip lease
and poisons every later run's backend init. Every spawned process that
may touch the chip sets PR_SET_PDEATHSIG so the kernel kills it the
instant its parent dies — no reaping logic can be skipped by SIGKILL.
"""

from __future__ import annotations

import os
import signal
import sys

PR_SET_PDEATHSIG = 1


def die_with_parent() -> None:
    """preexec_fn: kill me when my parent dies (Linux; no-op elsewhere).

    Runs in the forked child before exec. The post-prctl getppid check
    closes the race where the parent died first (the death signal only
    fires for deaths AFTER the call)."""
    if sys.platform != "linux":
        return
    try:
        import ctypes

        libc = ctypes.CDLL(None, use_errno=True)
        libc.prctl(PR_SET_PDEATHSIG, signal.SIGKILL, 0, 0, 0)
        if os.getppid() == 1:
            os._exit(1)
    except Exception:  # noqa: BLE001 — hygiene must never block a spawn
        pass
