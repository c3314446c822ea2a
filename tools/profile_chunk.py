"""Capture a JAX profiler trace of the fused streaming chunk program.

The round-level timers (PERF.md) show each in-context component costs
3-6x its standalone time; the working hypothesis is a long serial chain
of small ops (selector matmuls, chunked Schur scans, per-round GN
iterations) whose per-op dispatch latency dominates.  A device trace
settles it: run this when the chip is free, then inspect the trace with
TensorBoard (or read the trace.json.gz event durations directly).

Usage:
  python tools/profile_chunk.py [--frames 40] [--logdir runs/profile_chunk]
"""

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--logdir", default="runs/profile_chunk")
    ap.add_argument("--size", type=int, nargs=2, default=(240, 320))
    ap.add_argument("--chunk", type=int, default=0,
                    help="if >0, trace the micro-batched track_batch "
                         "program (bench mode) with this many frames per "
                         "dispatch instead of the per-frame program")
    args = ap.parse_args()

    from droid_slam_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax

    from droid_slam_tpu.config import SLAMConfig
    from droid_slam_tpu.runtime.slam import Droid

    H, W = args.size
    cfg = SLAMConfig(image_size=(H, W), buffer=96, warmup=8,
                     filter_thresh=0.0)
    wpath = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                     "weights", "droid_synth.npz")
    droid = Droid(cfg, weights_path=wpath if osp.exists(wpath) else None,
                  seed=0)

    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)

    def frame(t):
        img = (127 + 60 * np.sin(0.15 * (x + 4 * t)) *
               np.cos(0.12 * (y + 3 * t))
               + 40 * np.sin(0.04 * (x - y + 6 * t)))
        img = np.clip(img + rng.normal(0, 2, (H, W)), 0, 255).astype(
            np.uint8)
        return np.stack([img] * 3, axis=-1)

    intr = np.asarray([W / 2, W / 2, W / 2, H / 2], np.float32)

    # warm up: compile + pass the init phase so the trace captures the
    # steady-state chunked program only
    warm = args.frames
    print(f"warmup: {warm} frames (compiles)...", flush=True)
    t = 0
    for _ in range(warm - (args.chunk or 0)):
        droid.track(t, frame(t), intrinsics=intr)
        t += 1

    def hard_sync():
        _ = float(np.asarray(droid.video.state.poses[0, 0]))

    if args.chunk:
        # compile + warm the chunked program outside the trace
        ts = list(range(t, t + args.chunk))
        droid.track_batch(ts, [frame(x) for x in ts], intrinsics=intr)
        t += args.chunk
        droid._sync()
    if hasattr(droid.frontend, "sync"):
        droid.frontend.sync()
    hard_sync()
    print("warm; tracing...", flush=True)

    jax.profiler.start_trace(args.logdir)
    t0 = time.perf_counter()
    if args.chunk:
        for c in range(0, args.frames, args.chunk):
            ts = list(range(t, t + args.chunk))
            droid.track_batch(ts, [frame(x) for x in ts], intrinsics=intr)
            t += args.chunk
        droid._sync()
    else:
        for _ in range(args.frames):
            droid.track(t, frame(t), intrinsics=intr)
            t += 1
        if hasattr(droid.frontend, "sync"):
            droid.frontend.sync()
    # force completion through the relay
    hard_sync()
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"traced {args.frames} frames in {dt:.2f}s "
          f"({args.frames / dt:.2f} fps) -> {args.logdir}", flush=True)


if __name__ == "__main__":
    main()
