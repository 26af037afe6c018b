#!/usr/bin/env python3
"""Tiny TPU relay probe: exit 0 iff the chip answers a matmul.

The relay on this rig can go down for hours (CLAUDE.md); any heavier
probe (or a full CLI) hangs at ~0% CPU in backend init. Run this under
a watchdog, e.g.:

    timeout 90 python tools/relay_probe.py && echo UP || echo DOWN

It must run with the default PYTHONPATH (/root/.axon_site present) so
the axon platform plugin registers.
"""

import sys
import time


def main() -> int:
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    x = jnp.ones((128, 128))
    total = float((x @ x).sum())
    dev = jax.devices()[0]
    print(f"up\t{dev.platform}\t{total:.0f}\t{time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
