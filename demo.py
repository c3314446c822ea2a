"""Run visual SLAM on an image stream (demo CLI).

TPU-native equivalent of /root/reference/demo.py: load a calibration
file, stream images from a directory (undistorting/resizing as needed),
track every frame, and emit the final camera trajectory.

Examples:
  python demo.py --imagedir data/images --calib calib/tum3.txt
  python demo.py --synthetic 30            # built-in synthetic sequence
"""

import argparse
import sys

import numpy as np


def synthetic_stream(n, H=64, W=96, seed=0):
    rng = np.random.default_rng(seed)
    intr = np.asarray([0.8 * W, 0.8 * W, W / 2, H / 2], np.float32)
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    for t in range(n):
        img = (
            127 + 60 * np.sin(0.2 * (x + 3 * t)) * np.cos(0.15 * (y + 2 * t))
            + 40 * np.sin(0.05 * (x - y + 5 * t))
        )
        img = np.clip(img + rng.normal(0, 2, (H, W)), 0, 255).astype(np.uint8)
        yield t, np.stack([img] * 3, -1), intr


def image_stream(imagedir, calib, stride=1, t0=0, target_area=384 * 512):
    """Stream (t, image, intrinsics) from a directory of images.

    Calibration file format: `fx fy cx cy [k1 k2 p1 p2 [k3 ...]]`
    (reference README.md:85-89); images are undistorted, resized so the
    area is ~384·512, and cropped to a multiple of 8 (demo.py:44-49).
    """
    import glob
    import os

    import cv2

    calib = np.loadtxt(calib, delimiter=" ")
    fx, fy, cx, cy = calib[:4]
    K = np.eye(3)
    K[0, 0], K[0, 2], K[1, 1], K[1, 2] = fx, cx, fy, cy

    paths = sorted(
        glob.glob(os.path.join(imagedir, "*.png"))
        + glob.glob(os.path.join(imagedir, "*.jpg"))
    )[t0::stride]

    for t, path in enumerate(paths):
        image = cv2.imread(path)
        if len(calib) > 4:
            image = cv2.undistort(image, K, calib[4:])

        h0, w0 = image.shape[:2]
        h1 = int(h0 * np.sqrt(target_area / (h0 * w0)))
        w1 = int(w0 * np.sqrt(target_area / (h0 * w0)))
        image = cv2.resize(image, (w1, h1))
        image = image[: h1 - h1 % 8, : w1 - w1 % 8]
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)

        intr = np.asarray(
            [fx * (w1 / w0), fy * (h1 / h0), cx * (w1 / w0), cy * (h1 / h0)],
            np.float32,
        )
        yield t, image, intr


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--imagedir", help="directory of input images")
    p.add_argument("--calib", help="calibration file (fx fy cx cy [dist])")
    p.add_argument("--datapath", default=None,
                   help="dataset directory; layout auto-detected "
                        "(ETH3D/TartanAir/TUM/EuRoC/KITTI, "
                        "data/factory.py:create_stream)")
    p.add_argument("--weights", default=None,
                   help="converted droid.pth checkpoint (torch format)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="run on N synthetic frames instead of images")
    p.add_argument("--preset", default="demo",
                   choices=["demo", "tum", "euroc", "eth3d", "tartanair"])
    p.add_argument("--buffer", type=int, default=None)
    p.add_argument("--stride", type=int, default=1)
    p.add_argument("--t0", type=int, default=0)
    p.add_argument("--filter_thresh", type=float, default=None)
    p.add_argument("--warmup", type=int, default=None)
    p.add_argument("--backend_steps", type=int, nargs=2, default=(7, 12))
    p.add_argument("--target_area", type=int, default=384 * 512,
                   help="resize input so H*W is about this (demo.py:44)")
    p.add_argument("--output", default="trajectory.txt",
                   help="output trajectory file (t x y z qx qy qz qw)")
    p.add_argument("--export_ply", default=None,
                   help="write the filtered keyframe point cloud here")
    p.add_argument("--viewer", type=int, default=None, metavar="PORT",
                   help="serve a live WebGL map view on this port "
                        "(reference visualization.py analog; 0 = any "
                        "free port)")
    args = p.parse_args()

    if not args.synthetic and not args.datapath \
            and not (args.imagedir and args.calib):
        p.error("provide --imagedir and --calib, --datapath, "
                "or --synthetic N")

    if args.synthetic:
        frames = list(synthetic_stream(args.synthetic))
    elif args.datapath:
        from droid_slam_tpu.data.factory import create_stream
        # normalize every stream family to (t, image[, depth], intr):
        # RGB streams yield 3-tuples, RGB-D 4- or 5-tuples (w/ tstamp)
        frames = []
        for tup in create_stream(args.datapath, stride=args.stride):
            if len(tup) == 3:
                frames.append(tup)
            else:
                frames.append(tuple(tup[:4]))
    else:
        frames = list(image_stream(args.imagedir, args.calib,
                                   args.stride, args.t0,
                                   args.target_area))
    if not frames:
        print("no input frames found", file=sys.stderr)
        sys.exit(1)

    H, W = frames[0][1].shape[:2]

    import dataclasses

    from droid_slam_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from droid_slam_tpu.config import PRESETS
    from droid_slam_tpu.runtime.slam import Droid

    cfg = PRESETS[args.preset]
    overrides = {"image_size": (H, W)}
    for k in ("buffer", "filter_thresh", "warmup"):
        if getattr(args, k) is not None:
            overrides[k] = getattr(args, k)
    if args.synthetic:
        overrides.update(
            buffer=max(32, args.synthetic), warmup=5, filter_thresh=0.0,
            frontend_window=10, frontend_pose_cap=32, frontend_depth_cap=32,
        )
    cfg = dataclasses.replace(cfg, **overrides)

    droid = Droid(cfg, weights_path=args.weights)

    viewer = None
    if args.viewer is not None:
        from droid_slam_tpu.runtime.viewer import start_viewer
        viewer = start_viewer(droid.video, port=args.viewer)

    for tup in frames:
        if len(tup) == 4:
            t, image, depth, intr = tup
        else:
            (t, image, intr), depth = tup, None
        droid.track(t, image, depth=depth, intrinsics=intr)
        print(f"\rframe {t}  keyframes={droid.video.counter}",
              end="", flush=True)
    print()

    if args.export_ply:
        from droid_slam_tpu.runtime.visualization import export_point_cloud
        n_pts = export_point_cloud(droid.video, args.export_ply)
        print(f"wrote {n_pts} points to {args.export_ply}")

    rgb_frames = [(f[0], f[1], f[-1]) for f in frames]
    traj = droid.terminate(iter(rgb_frames),
                           backend_steps=tuple(args.backend_steps))

    ts = np.asarray([f[0] for f in frames], np.float64)
    out = np.column_stack([ts, traj[:, :3], traj[:, 3:]])
    np.savetxt(args.output, out, fmt="%.6f")
    print(f"wrote {len(out)} poses to {args.output}")


if __name__ == "__main__":
    main()
