"""Controlled persistent-compilation-cache experiment (VERDICT r4 item 4).

Question: does a client-side persistent-cache HIT actually skip the
relay-side executable build?  bench_2 (runs/r5) hit the cache for every
big program (no duplicate writes) yet still paid 560 s at init frame 1 —
either the relay recompiles on deserialize, or the relay itself had
degraded.  This probe de-confounds the two:

  phase A (given --phase a): compile a mid-size program P1 (fresh key),
     record T_cold; run it again in-process (T_warm ~ 0).
  phase B (fresh process, --phase b): compile P1 again — persistent-cache
     hit — record T_hit; then compile a DIFFERENT same-shape program P2
     (fresh key, cache miss) as the contemporaneous cold control T_cold2.

  T_hit << T_cold2  -> the cache works through the relay; bench_2's wall
                       was relay degradation, not a cache miss.
  T_hit ~= T_cold2  -> a hit does not skip relay-side compile: the
                       persistent cache cannot amortize cross-process
                       through this plugin; document + mitigate by
                       long-lived serving processes.

Usage (serialized, one chip client at a time):
  python tools/cache_probe.py --phase a && python tools/cache_probe.py --phase b
"""

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def build(salt):
    """A mid-size conv+matmul program whose key changes with `salt`."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x, w1, w2):
        y = jax.lax.conv_general_dilated(
            x, w1, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jax.nn.relu(y + salt)
        for _ in range(8):
            y = jnp.tanh(y @ w2)
        return y.sum()

    x = jnp.ones((2, 64, 64, 32))
    w1 = jnp.ones((3, 3, 32, 32)) * 0.01
    w2 = jnp.ones((32, 32)) * 0.05
    return f, (x, w1, w2)


def timed(f, args):
    t0 = time.time()
    out = float(f(*args))
    return time.time() - t0, out


def canary():
    """Raw device matmul rate — detects relay slow-down independent of
    any compile cost (uses a pre-compiled tiny op)."""
    import jax.numpy as jnp
    a = jnp.ones((1024, 1024), jnp.bfloat16)
    (a @ a).block_until_ready()
    t0 = time.time()
    for _ in range(20):
        a = (a @ a * 1e-3)
    float(a.sum())
    return 20 / (time.time() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["a", "b"], required=True)
    args = ap.parse_args()

    from droid_slam_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    rec = {"phase": args.phase, "ts": time.time()}
    rec["canary_matmul_per_s"] = round(canary(), 1)

    if args.phase == "a":
        f, fa = build(0.125)            # P1
        rec["t_cold_P1"], _ = timed(f, fa)
        rec["t_warm_P1"], _ = timed(f, fa)
    else:
        f, fa = build(0.125)            # P1 again: persistent-cache hit
        rec["t_hit_P1"], _ = timed(f, fa)
        g, ga = build(0.250)            # P2: fresh key, cold control
        rec["t_cold_P2"], _ = timed(g, ga)

    rec["canary_matmul_per_s_end"] = round(canary(), 1)
    for k, v in rec.items():
        if k.startswith("t_"):
            rec[k] = round(v, 2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
