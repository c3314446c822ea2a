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


def probe_free_gb(step_mb=512, max_gb=20, settle=True):
    """Measure allocatable HBM by trial allocation (the relay exposes no
    allocator stats).  Fills step_mb device buffers until OOM, frees
    them, returns the GB that fit.

    settle=True blocks until the probe's OWN buffers are re-allocatable
    (deallocations land asynchronously through the relay — a large
    allocation a few seconds after an un-settled probe fails even
    though the memory is logically free, runs/r4/backend_1000f.log)."""
    import time

    import jax
    import jax.numpy as jnp

    n = int(step_mb * 1e6 / 4)
    fill = jax.jit(lambda: jnp.zeros((n,), jnp.float32))

    def is_oom(e):
        return ("RESOURCE_EXHAUSTED" in str(e)) or ("Out of memory"
                                                    in str(e))

    bufs = []
    try:
        for _ in range(int(max_gb * 1000 / step_mb)):
            b = fill()
            b.block_until_ready()
            bufs.append(b)
    except Exception as e:  # noqa: BLE001
        if not is_oom(e):
            raise
    free = len(bufs) * step_mb / 1000
    del bufs

    if settle and free > 0:
        # canary: half the measured amount must be allocatable again
        m = int(free / 2 * 1e9 / 4)
        canary = jax.jit(lambda: jnp.zeros((max(m, 1),), jnp.float32))
        for _ in range(60):
            try:
                c = canary()
                c.block_until_ready()
                del c
                break
            except Exception as e:  # noqa: BLE001
                if not is_oom(e):
                    raise
                time.sleep(2)
        time.sleep(5)      # and let the canary itself free
    return free


def log_mem(tag):
    """Print one line of allocator state when DROID_MEM_LOG is set.
    With DROID_MEM_PROBE also trial-allocates to report true free HBM
    (synchronizes the stream — diagnostic runs only)."""
    if not os.environ.get("DROID_MEM_LOG"):
        return
    use, peak, lim = device_mem_stats()
    fmt = lambda b: f"{b / 1e9:.2f}" if b is not None else "?"
    probe = ""
    if os.environ.get("DROID_MEM_PROBE"):
        probe = f" free={probe_free_gb():.1f} GB (probed)"
    print(f"[mem] {tag}: in_use={fmt(use)} GB peak={fmt(peak)} GB "
          f"limit={fmt(lim)} GB{probe}", file=sys.stderr, flush=True)
