"""bench.py unreachable-accelerator path: must fail FAST with a
structured JSON error line on stdout and exit code 3.

Round-4 postmortem: the driver's official capture (BENCH_r04) was nulled
because a dead relay sent bench.py into a ~25-minute probe crawl that
exceeded the driver's timeout (rc=124, no parseable output).  The
contract now is: dead relay => one JSON line with an "error" field,
rc=3, within seconds (probe knobs are env-overridable; the test forces
the probe body to fail instantly via DROID_BENCH_PROBE_SRC).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_fails_fast_with_structured_error(tmp_path):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        DROID_BENCH_PROBES="2",
        DROID_BENCH_PROBE_TIMEOUT="5",
        DROID_BENCH_BACKOFF="0",
        # probe subprocess exits non-zero immediately: the failure mode a
        # dead relay produces (timeout) without waiting for one
        DROID_BENCH_PROBE_SRC="import sys; sys.exit(1)",
    )
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=120, env=env,
        cwd=str(tmp_path),  # watchdog log lands in tmp, not the repo
    )
    elapsed = time.time() - t0
    assert out.returncode == 3, (out.returncode, out.stderr[-800:])
    # last stdout line is the structured record
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert lines, out.stdout
    rec = json.loads(lines[-1])
    assert rec["error"] == "accelerator unreachable"
    assert rec["value"] is None and rec["vs_baseline"] is None
    assert rec["metric"] == "frontend_keyframes_per_s_240x320"
    # fail-fast: well under the driver's per-probe budget
    assert elapsed < 60, elapsed
    # diagnostic artifact written where the run happened
    assert (tmp_path / "runs" / "bench_watchdog.jsonl").exists()


def test_default_probe_budget_is_fast():
    """The default knobs must keep worst-case under ~2 minutes so a dead
    relay can never run the driver into its timeout again."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    import inspect

    sig = inspect.signature(mod._wait_for_accelerator)
    p = sig.parameters
    worst = (p["probes"].default * p["probe_timeout_s"].default
             + (p["probes"].default - 1) * p["backoff_s"].default)
    # 90 s/probe since the probe EXECUTES an op (a healthy-but-cold
    # relay attach takes ~40-60 s; an enumeration-only probe passed
    # while executions hung forever on 08-20) — worst case ~3.2 min,
    # still far inside the driver's capture timeout
    assert worst <= 240, worst
