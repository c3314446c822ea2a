"""Device-memory introspection helpers (HBM budgeting + diagnostics).

PJRT exposes allocator counters via Device.memory_stats(); availability
varies by backend (present on TPU, absent on some CPU builds), so every
reader degrades to None.
"""

import os
import sys


def device_mem_stats():
    """(bytes_in_use, peak_bytes_in_use, bytes_limit) or Nones."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        stats = {}
    return (stats.get("bytes_in_use"), stats.get("peak_bytes_in_use"),
            stats.get("bytes_limit"))


def pytree_nbytes(tree):
    """Total bytes of all array leaves (analytic; relay-safe)."""
    import jax

    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves(tree)
        if hasattr(x, "dtype")
    )


def log_mem(tag):
    """Print one line of allocator state when DROID_MEM_LOG is set."""
    if not os.environ.get("DROID_MEM_LOG"):
        return
    use, peak, lim = device_mem_stats()
    fmt = lambda b: f"{b / 1e9:.2f}" if b is not None else "?"
    print(f"[mem] {tag}: in_use={fmt(use)} GB peak={fmt(peak)} GB "
          f"limit={fmt(lim)} GB", file=sys.stderr, flush=True)
