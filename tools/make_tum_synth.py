"""Write a synthetic TUM-RGBD-format sequence for full-resolution
protocol exercise.

The eval scripts' protocol constants are audited against the reference
(/root/reference/evaluation_scripts/test_tum.py:23-73) and fixture-tested
at tiny sizes (tests/test_cli_e2e.py), but the real 240x320 preset had
only ever run through bench.py, never through an eval script's terminate
path (VERDICT r2 weak #7).  This renders a box scene at the TUM native
640x480, writes `rgb/<timestamp>.png` + `groundtruth.txt`, and the
sequence then drives evaluation_scripts/test_tum.py with the REAL preset
(240x320 after the undistort/resize/crop chain, buffer 512, backend 7/12).

The renders are pinhole images; tum_stream's fr1 undistortion warps them
slightly, so the reported ATE measures the pipeline, not the renderer —
fine for a protocol-exercise artifact.

  python tools/make_tum_synth.py --out /tmp/tum_synth [--frames 60]
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--seed", type=int, default=21)
    p.add_argument("--motion", type=float, default=0.06)
    args = p.parse_args()

    # CPU only: the renderer must NEVER claim the tunneled TPU (the axon
    # hook pins jax to it in every process; a concurrent chip job would
    # inherit a poisoned HBM budget)
    import jax
    jax.config.update("jax_platforms", "cpu")

    import cv2

    from droid_slam_tpu.data.synthetic import render_box_scene

    scene = render_box_scene(
        n_frames=args.frames, H=480, W=640, seed=args.seed,
        motion_scale=args.motion, box=(3.5, 2.5, 8.0),
    )

    rgb_dir = osp.join(args.out, "rgb")
    os.makedirs(rgb_dir, exist_ok=True)
    t0 = 1305031102.0  # TUM-like epoch; any float timestamps work
    gt = []
    for k in range(args.frames):
        ts = t0 + k / 30.0
        cv2.imwrite(
            osp.join(rgb_dir, f"{ts:.6f}.png"),
            cv2.cvtColor(scene["images"][k], cv2.COLOR_RGB2BGR),
        )
        gt.append([ts, *scene["poses_c2w"][k]])
    np.savetxt(osp.join(args.out, "groundtruth.txt"), np.asarray(gt),
               fmt="%.6f")
    print(f"wrote {args.frames} frames to {args.out}")


if __name__ == "__main__":
    main()
