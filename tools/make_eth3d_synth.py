"""Write a synthetic ETH3D-SLAM-format RGB-D sequence for full protocol
exercise of the RGB-D pipeline (VERDICT r4 item 3).

The RGB-D path (disps_sens depth prior with alpha=0.05 in the BA,
metric-scale SE3 ATE with correct_scale=False) has only run at 64x96 in
tests/test_slam_e2e.py; this emits the ETH3D on-disk layout — rgb.txt /
depth.txt association lists, uint16 depth PNGs at x5000, calibration.txt
— and drives evaluation_scripts/test_eth3d.py end to end at protocol
resolution (480x736 after the stream's /8 crop).  Reference layout:
/root/reference/evaluation_scripts/test_eth3d.py image_stream (rgb.txt,
depth.txt, calibration.txt, depth/5000).

Depth maps are the renderer's analytic z-depth, so the depth prior is
exact and the metric ATE measures the pipeline.

  python tools/make_eth3d_synth.py --out /root/eth3d_synth [--frames 100]
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

DEPTH_SCALE = 5000.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--seed", type=int, default=44)
    p.add_argument("--motion", type=float, default=0.05)
    p.add_argument("--size", type=int, nargs=2, default=(480, 736),
                   metavar=("H", "W"))
    args = p.parse_args()

    # CPU only: must never claim the tunneled TPU (memory: chip-discipline)
    import jax
    jax.config.update("jax_platforms", "cpu")

    import cv2

    from droid_slam_tpu.data.synthetic import render_box_scene

    H, W = args.size
    scene = render_box_scene(
        n_frames=args.frames, H=H, W=W, seed=args.seed,
        motion_scale=args.motion, box=(3.5, 2.5, 9.0), n_obstacles=3,
    )

    rgb_dir = osp.join(args.out, "rgb")
    dep_dir = osp.join(args.out, "depth")
    os.makedirs(rgb_dir, exist_ok=True)
    os.makedirs(dep_dir, exist_ok=True)

    t0 = 1500.0
    rgb_rows, dep_rows, gt = [], [], []
    for k in range(args.frames):
        ts = t0 + k / 30.0
        name = f"{ts:.6f}.png"
        cv2.imwrite(osp.join(rgb_dir, name),
                    cv2.cvtColor(scene["images"][k], cv2.COLOR_RGB2BGR))
        d16 = np.clip(scene["depths"][k] * DEPTH_SCALE, 0,
                      65535).astype(np.uint16)
        cv2.imwrite(osp.join(dep_dir, name), d16)
        rgb_rows.append(f"{ts:.6f} rgb/{name}")
        dep_rows.append(f"{ts:.6f} depth/{name}")
        gt.append([ts, *scene["poses_c2w"][k]])

    with open(osp.join(args.out, "rgb.txt"), "w") as f:
        f.write("\n".join(rgb_rows) + "\n")
    with open(osp.join(args.out, "depth.txt"), "w") as f:
        f.write("\n".join(dep_rows) + "\n")
    np.savetxt(osp.join(args.out, "calibration.txt"),
               scene["intrinsics"][0][None], fmt="%.6f")
    np.savetxt(osp.join(args.out, "groundtruth.txt"), np.asarray(gt),
               fmt="%.6f")
    print(f"wrote {args.frames} RGB-D frames to {args.out} ({H}x{W})")


if __name__ == "__main__":
    main()
