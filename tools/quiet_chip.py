"""Wait for a quiet chip: probe free HBM by trial allocation in a
SUBPROCESS, retry until a target amount is free.

Why this exists (PERF.md round 3 + round-4 findings):
  * Device buffers free ASYNCHRONOUSLY (~1-2 min) after a client exits,
    so back-to-back chip jobs inherit a near-full device and die with
    RESOURCE_EXHAUSTED (three 512/1000-kf backend attempts across
    rounds 2-3, runs/chip2/backend_*.log).
  * Under the axon relay `block_until_ready` is NOT a barrier — only a
    scalar readback synchronizes.  An unbarriered probe over-reports
    (20 "GB" on a ~15 GB-usable chip) and its queued deallocations
    poison the next allocations (runs/r4/backend_1000{f,g,h}.log).
  * Even a BARRIERED in-process probe leaves the chip effectively full:
    its own frees take minutes to land (a re-probe 20 s later measured
    0 GB).  Probing in a throwaway subprocess sidesteps both problems —
    process exit reliably releases everything, and the parent just
    waits out the cross-client free latency.

Measured with the barriered probe on an idle chip: 15 x 1 GB fit (the
16th OOMs) => ~15 GB usable; tools default DROID_HBM_GB to 14.

Usage:
  from tools.quiet_chip import wait_for_free_hbm
  free_gb = wait_for_free_hbm(min_gb=12)   # blocks; settles after probe

  python tools/quiet_chip.py --min_gb 12
"""

import os.path as osp
import subprocess
import sys
import time

_REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def probe_free_hbm(max_gb=16):
    """Count how many 1 GB buffers fit on device 0 right now.

    IN-PROCESS: poisons this process's next allocations for minutes
    (see module docstring) — call via probe_free_hbm_subprocess unless
    this process will not touch the chip again.
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    fill = jax.jit(lambda: jnp.ones((1 << 28,), jnp.float32))  # 1 GB
    bufs = []
    try:
        for _ in range(max_gb):
            b = fill()
            _ = float(np.asarray(b[0]))     # true barrier via readback
            bufs.append(b)
    except Exception as e:  # noqa: BLE001 - RESOURCE_EXHAUSTED variants
        if ("RESOURCE_EXHAUSTED" not in str(e)
                and "Out of memory" not in str(e)):
            raise
    n = len(bufs)
    del bufs
    return n


def probe_free_hbm_subprocess(max_gb=16, timeout_s=420):
    """Run the probe in a throwaway process; returns GB or None."""
    src = (f"import sys; sys.path.insert(0, {_REPO!r}); "
           f"from tools.quiet_chip import probe_free_hbm; "
           f"print('FREE_GB=%d' % probe_free_hbm({max_gb}))")
    try:
        out = subprocess.run([sys.executable, "-c", src],
                             capture_output=True, text=True,
                             timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None
    for ln in out.stdout.splitlines():
        if ln.startswith("FREE_GB="):
            return int(ln.split("=")[1])
    return None


def wait_for_free_hbm(min_gb=12, timeout_s=1200, poll_s=30, verbose=True,
                      settle_s=90, measure_max=16):
    """Block until >= min_gb of HBM is allocatable (subprocess probe),
    then wait settle_s for the probe's own cross-client frees to land.
    Returns the measured free GB.  Raises TimeoutError on a chip that
    never quiets down."""
    t0 = time.time()
    while True:
        free = probe_free_hbm_subprocess(max_gb=max(min_gb, measure_max))
        if verbose:
            print(f"[quiet_chip] {free} GB allocatable "
                  f"(target {min_gb}, t+{time.time() - t0:.0f}s)",
                  flush=True)
        if free is not None and free >= min_gb:
            if verbose:
                print(f"[quiet_chip] settling {settle_s}s "
                      f"(probe frees land cross-client)", flush=True)
            time.sleep(settle_s)
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
    p.add_argument("--timeout_s", type=int, default=1200)
    args = p.parse_args()
    free = wait_for_free_hbm(args.min_gb, args.timeout_s)
    print(f"[quiet_chip] ready: {free} GB free", flush=True)
