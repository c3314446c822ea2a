"""Wait for a quiet chip: probe free HBM by trial allocation, retry
until a target amount is free.

Why this exists (PERF.md round 3): device buffers free ASYNCHRONOUSLY
(~1-2 min) after a prior client exits, and PJRT allocator stats are
unavailable through the axon relay — so back-to-back chip jobs can
inherit a near-full device and die with RESOURCE_EXHAUSTED in the first
large allocation (this felled three 512/1000-keyframe backend attempts
across rounds 2-3, runs/chip2/backend_*.log).  The only reliable signal
is a trial allocation: fill 1 GB buffers until OOM, count what fits,
free them, and retry with backoff until the target is available.

The 1 GB buffers are created by an on-device fill (jnp.zeros), NOT a
host transfer — the relay moves ~6 MB/s, a device fill is instant after
the one-time compile.

Usage:
  from tools.quiet_chip import wait_for_free_hbm
  free_gb = wait_for_free_hbm(min_gb=12)

  python tools/quiet_chip.py --min_gb 12        # CLI: block until free
"""

import time


def probe_free_hbm(max_gb=16):
    """Count how many 1 GB buffers fit on device 0 right now."""
    import jax
    import jax.numpy as jnp

    fill = jax.jit(lambda: jnp.zeros((1 << 28,), jnp.float32))  # 1 GB
    bufs = []
    try:
        for _ in range(max_gb):
            b = fill()
            b.block_until_ready()
            bufs.append(b)
    except Exception as e:  # noqa: BLE001 - RESOURCE_EXHAUSTED variants
        if "RESOURCE_EXHAUSTED" not in str(e) and "Out of memory" not in str(e):
            raise
    n = len(bufs)
    del bufs
    return n


def wait_for_free_hbm(min_gb=12, timeout_s=900, poll_s=20, verbose=True):
    """Block until >= min_gb of HBM is allocatable; return the measured
    free GB.  Raises TimeoutError if the chip never quiets down."""
    t0 = time.time()
    while True:
        free = probe_free_hbm(max_gb=min_gb)
        if verbose:
            print(f"[quiet_chip] {free} GB allocatable "
                  f"(target {min_gb}, t+{time.time() - t0:.0f}s)",
                  flush=True)
        if free >= min_gb:
            return free
        if time.time() - t0 > timeout_s:
            raise TimeoutError(
                f"chip never freed {min_gb} GB within {timeout_s}s "
                f"(last probe: {free} GB)")
        time.sleep(poll_s)


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--min_gb", type=int, default=12)
    p.add_argument("--timeout_s", type=int, default=900)
    args = p.parse_args()
    free = wait_for_free_hbm(args.min_gb, args.timeout_s)
    print(f"[quiet_chip] ready: {free} GB free", flush=True)
