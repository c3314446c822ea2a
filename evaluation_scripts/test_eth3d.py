"""Evaluate RGB-D SLAM on ETH3D-SLAM sequences.

TPU-native equivalent of /root/reference/evaluation_scripts/test_eth3d.py:
associated rgb/depth pairs (depth/5000), depth-prior BA terms
(disps_sens, alpha=0.05), metric-scale ATE (correct_scale=False,
test_eth3d.py:130-131).
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
    p.add_argument("--stride", type=int, default=1)
    p.add_argument("--backend_steps", type=int, nargs=2, default=(7, 12))
    p.add_argument("--buffer", type=int, default=None,
                   help="keyframe buffer override (protocol default 1024 "
                        "per the reference test_eth3d.py:62; short "
                        "synthetic sessions need not allocate it)")
    args = p.parse_args()

    from droid_slam_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import dataclasses

    from droid_slam_tpu.config import PRESETS
    from droid_slam_tpu.data.streams import eth3d_stream
    from droid_slam_tpu.geom.align import associate, ate_rmse
    from droid_slam_tpu.runtime.slam import Droid

    frames = list(eth3d_stream(args.datapath, stride=args.stride))
    H, W = frames[0][1].shape[:2]
    over = {} if args.buffer is None else {"buffer": args.buffer}
    cfg = dataclasses.replace(PRESETS["eth3d"], image_size=(H, W), **over)
    droid = Droid(cfg, weights_path=args.weights)

    for (t, image, depth, intr, _) in frames:
        droid.track(t, image, depth=depth, intrinsics=intr)

    fill = ((t, im, intr) for (t, im, _, intr, _) in frames)
    traj = droid.terminate(fill, backend_steps=tuple(args.backend_steps))

    gt_path = osp.join(args.datapath, "groundtruth.txt")
    if not osp.isfile(gt_path):
        np.savetxt("eth3d_trajectory.txt", np.column_stack(
            [[ts for (_, _, _, _, ts) in frames], traj]
        ))
        print("no groundtruth.txt; wrote eth3d_trajectory.txt")
        return

    gt = np.loadtxt(gt_path)
    tstamps = [ts for (_, _, _, _, ts) in frames]
    matches = associate(tstamps, gt[:, 0], max_dt=0.05)
    est = np.asarray([traj[i, :3] for i, _ in matches])
    ref = np.asarray([gt[j, 1:4] for _, j in matches])

    # RGB-D is metric: no scale correction (test_eth3d.py:130-131)
    ate = ate_rmse(ref, est, correct_scale=False)
    print(f"ETH3D {osp.basename(args.datapath)}: "
          f"ATE RMSE (SE3-aligned) = {ate:.4f} m over {len(matches)} poses")


if __name__ == "__main__":
    main()
