"""D2H transfer helpers for relay-attached hosts.

Through this rig's loopback relay every blocking host pull pays
~25-60 ms of link latency before the first byte moves. Issuing the
copy asynchronously as soon as the producing dispatch is enqueued
lets transfers overlap device compute and each other; the later
blocking ``np.asarray`` then finds the data en route or landed.
"""


def start_host_copy(dev_buf) -> None:
    """Kick off a D2H transfer without blocking. No-op for host/numpy
    arrays and for non-fully-addressable (multi-process) arrays, whose
    fetch goes through a collective instead of a direct copy."""
    start = getattr(dev_buf, "copy_to_host_async", None)
    if start is None or not getattr(dev_buf, "is_fully_addressable", True):
        return
    start()
