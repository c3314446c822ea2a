"""Evaluate monocular SLAM on TUM-RGBD fr1 sequences.

TPU-native equivalent of /root/reference/evaluation_scripts/test_tum.py:
stride-2 tracking on undistorted 240x320 frames, full terminate path
(2 global-BA passes + trajectory fill), Sim3-aligned ATE against the
sequence groundtruth.txt.

Usage: python evaluation_scripts/test_tum.py --datapath <seq_dir> \
           [--weights droid.pth]
"""

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datapath", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--stride", type=int, default=2)
    p.add_argument("--backend_steps", type=int, nargs=2, default=(7, 12))
    # dry-run overrides (default = the reference evaluation protocol,
    # test_tum.py:56-73); smaller values let the pipeline be exercised
    # end-to-end on CPU CI
    p.add_argument("--image_size", type=int, nargs=2, default=None)
    p.add_argument("--buffer", type=int, default=None)
    p.add_argument("--warmup", type=int, default=None)
    p.add_argument("--filter_thresh", type=float, default=None)
    args = p.parse_args()

    from droid_slam_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from droid_slam_tpu.config import PRESETS
    from droid_slam_tpu.data.streams import tum_stream
    from droid_slam_tpu.geom.align import associate, ate_rmse
    from droid_slam_tpu.runtime.slam import Droid

    cfg = PRESETS["tum"]
    import dataclasses
    overrides = {}
    for k in ("buffer", "warmup", "filter_thresh"):
        if getattr(args, k) is not None:
            overrides[k] = getattr(args, k)
    if args.image_size is not None:
        overrides["image_size"] = tuple(args.image_size)
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)

    droid = Droid(cfg, weights_path=args.weights)

    frames = list(tum_stream(args.datapath, stride=args.stride))
    if args.image_size is not None:
        import cv2
        Ht, Wt = args.image_size
        frames = [
            (t, cv2.resize(im, (Wt, Ht)),
             intr * np.array([Wt / im.shape[1], Ht / im.shape[0],
                              Wt / im.shape[1], Ht / im.shape[0]],
                             np.float32))
            for (t, im, intr) in frames
        ]
    for (t, image, intr) in frames:
        droid.track(t, image, intrinsics=intr)

    traj = droid.terminate(iter(frames),
                           backend_steps=tuple(args.backend_steps))

    # groundtruth association by timestamp
    import glob

    gt = np.loadtxt(osp.join(args.datapath, "groundtruth.txt"))
    rgb_files = sorted(
        glob.glob(osp.join(args.datapath, "rgb", "*.png"))
    )[::args.stride]
    tstamps = [float(osp.basename(f)[:-4]) for f in rgb_files]

    matches = associate(tstamps, gt[:, 0], max_dt=0.08)
    est = np.asarray([traj[i, :3] for i, _ in matches])
    ref = np.asarray([gt[j, 1:4] for _, j in matches])

    ate = ate_rmse(ref, est, correct_scale=True)
    print(f"TUM {osp.basename(args.datapath)}: "
          f"ATE RMSE (Sim3-aligned) = {ate:.4f} m over {len(matches)} poses")


if __name__ == "__main__":
    main()
