"""Write a synthetic EuRoC-MAV-format stereo sequence for full protocol
exercise of the stereo pipeline (VERDICT r4 item 3).

The stereo path (self rig edges with the fixed tx=-0.1 baseline,
rectified EuRoC streams, 320x512 preset, x1.10 position scaling) has
only ever run at 64x96 in tests/test_slam_e2e.py; this renders a box
scene from a stereo rig with the REAL EuRoC rectified calibration
(P_L/P_R of /root/reference/evaluation_scripts/test_euroc.py:29-49) and
drives evaluation_scripts/test_euroc.py end to end at preset scale.

Geometry is exact end-to-end:
  * both views are rendered under the rectified pinhole model
    (fx=fy=435.2047, cx=367.4517, cy=252.2009, 752x480), with the right
    camera rigidly offset by the true rectified baseline
    b = 47.90639384 / 435.2046960 = 0.110078 m — so the protocol's x1.10
    position scaling (test_euroc.py:129), which exists because the
    pipeline's internal stereo unit is the fixed tx=-0.1 rig edge, maps
    the estimate back to metres for this GT too (0.07% residual).
  * the rendered RECTIFIED views are then inverse-warped into the raw
    distorted camera frames (cv2.undistortPoints builds the raw->rect
    map), so euroc_stream's rectification recovers the rendered images
    and the full undistort/rectify chain is exercised, not bypassed.

  python tools/make_euroc_synth.py --out /root/euroc_synth [--frames 80]
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def _inverse_rect_map(K, D, R, P, size):
    """(H, W, 2) map: for each RAW pixel, its RECTIFIED-image coords.

    cv2.initUndistortRectifyMap gives rect->raw; producing a raw image
    whose rectification equals a rendered rect image needs the inverse,
    which undistortPoints computes exactly (raw pixel -> normalized
    undistorted -> R -> P)."""
    import cv2

    W, H = size
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    pts = np.stack([xs, ys], axis=-1).reshape(-1, 1, 2)
    rect = cv2.undistortPoints(pts, K, D, R=R, P=P)
    return rect.reshape(H, W, 2).astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--frames", type=int, default=80)
    p.add_argument("--seed", type=int, default=33)
    p.add_argument("--motion", type=float, default=0.05)
    args = p.parse_args()

    # CPU only: must never claim the tunneled TPU (memory: chip-discipline)
    import jax
    jax.config.update("jax_platforms", "cpu")

    import cv2

    from droid_slam_tpu.data.streams import (
        _EUROC_D_L, _EUROC_D_R, _EUROC_K_L, _EUROC_K_R, _EUROC_P_L,
        _EUROC_P_R, _EUROC_R_L, _EUROC_R_R,
    )
    from droid_slam_tpu.data.synthetic import render_box_scene
    from droid_slam_tpu.lie import so3

    import jax.numpy as jnp

    H0, W0 = 480, 752
    fx = _EUROC_P_L[0, 0]
    intr = (fx, _EUROC_P_L[1, 1], _EUROC_P_L[0, 2], _EUROC_P_L[1, 2])
    baseline = -_EUROC_P_R[0, 3] / fx        # 0.110078 m

    common = dict(n_frames=args.frames, H=H0, W=W0, seed=args.seed,
                  motion_scale=args.motion, box=(3.5, 2.5, 9.0),
                  intrinsics=intr, n_obstacles=3)
    left = render_box_scene(**common)

    # right camera: same orientation, center offset by +b along the
    # left camera's x axis (rectified rig)
    poses_l = left["poses_c2w"]
    off = np.asarray(so3.act(
        jnp.asarray(poses_l[:, 3:7]),
        jnp.tile(jnp.asarray([baseline, 0.0, 0.0], jnp.float32),
                 (args.frames, 1)),
    ))
    poses_r = poses_l.copy()
    poses_r[:, :3] += off
    right = render_box_scene(**{**common, "poses_c2w": poses_r})

    # inverse rectification: rendered rect view -> raw distorted frame
    inv_l = _inverse_rect_map(_EUROC_K_L, _EUROC_D_L, _EUROC_R_L,
                              _EUROC_P_L, (W0, H0))
    inv_r = _inverse_rect_map(_EUROC_K_R, _EUROC_D_R, _EUROC_R_R,
                              _EUROC_P_R, (W0, H0))

    d0 = osp.join(args.out, "mav0", "cam0", "data")
    d1 = osp.join(args.out, "mav0", "cam1", "data")
    os.makedirs(d0, exist_ok=True)
    os.makedirs(d1, exist_ok=True)

    t0_ns = 1403636579763555584            # EuRoC-like ns epoch
    gt = []
    for k in range(args.frames):
        ts_ns = t0_ns + int(k * 1e9 / 20)  # 20 Hz
        raw_l = cv2.remap(left["images"][k], inv_l[..., 0], inv_l[..., 1],
                          interpolation=cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_REPLICATE)
        raw_r = cv2.remap(right["images"][k], inv_r[..., 0], inv_r[..., 1],
                          interpolation=cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_REPLICATE)
        cv2.imwrite(osp.join(d0, f"{ts_ns}.png"),
                    cv2.cvtColor(raw_l, cv2.COLOR_RGB2BGR))
        cv2.imwrite(osp.join(d1, f"{ts_ns}.png"),
                    cv2.cvtColor(raw_r, cv2.COLOR_RGB2BGR))
        gt.append([ts_ns / 1e9, *poses_l[k]])

    np.savetxt(osp.join(args.out, "groundtruth.txt"), np.asarray(gt),
               fmt="%.9f")
    print(f"wrote {args.frames} stereo pairs to {args.out} "
          f"(baseline {baseline:.6f} m)")


if __name__ == "__main__":
    main()
