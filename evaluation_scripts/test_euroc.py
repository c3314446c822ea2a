"""Evaluate mono/stereo SLAM on EuRoC MAV sequences.

TPU-native equivalent of /root/reference/evaluation_scripts/test_euroc.py:
rectified stereo pairs at 320x512, stride-2 tracking / stride-1 fill,
positions scaled by 1.10 before alignment (test_euroc.py:129), ATE with
(mono) or without (stereo) scale correction.
"""

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datapath", required=True)
    p.add_argument("--gt", required=True, help="groundtruth txt (t x y z ...)")
    p.add_argument("--weights", default=None)
    p.add_argument("--stereo", action="store_true")
    p.add_argument("--stride", type=int, default=2)
    p.add_argument("--backend_steps", type=int, nargs=2, default=(7, 12))
    p.add_argument("--buffer", type=int, default=None,
                   help="keyframe buffer override (protocol default 512; "
                        "short synthetic sessions need not allocate it)")
    args = p.parse_args()

    from droid_slam_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import dataclasses

    from droid_slam_tpu.config import PRESETS
    from droid_slam_tpu.data.streams import euroc_stream
    from droid_slam_tpu.geom.align import associate, ate_rmse
    from droid_slam_tpu.runtime.slam import Droid

    over = {} if args.buffer is None else {"buffer": args.buffer}
    cfg = dataclasses.replace(PRESETS["euroc"], stereo=args.stereo, **over)
    droid = Droid(cfg, weights_path=args.weights)

    frames = list(euroc_stream(args.datapath, stereo=args.stereo,
                               stride=args.stride))
    for (t, image, intr, _) in frames:
        droid.track(t, image, intrinsics=intr)

    fill = ((t, im if not args.stereo else im[0], intr)
            for (t, im, intr, _) in frames)
    traj = droid.terminate(fill, backend_steps=tuple(args.backend_steps))

    # 1.10 position scale applied by the reference before alignment
    positions = 1.10 * traj[:, :3]
    tstamps = np.asarray([ts for (_, _, _, ts) in frames]) / 1e9

    gt = np.loadtxt(args.gt, delimiter=" ")
    matches = associate(tstamps, gt[:, 0], max_dt=0.05)
    est = np.asarray([positions[i] for i, _ in matches])
    ref = np.asarray([gt[j, 1:4] for _, j in matches])

    ate = ate_rmse(ref, est, correct_scale=not args.stereo)
    mode = "stereo" if args.stereo else "mono"
    print(f"EuRoC {osp.basename(args.datapath)} ({mode}): "
          f"ATE RMSE = {ate:.4f} m over {len(matches)} poses")
    if args.stereo:
        # diagnostic: if the Sim3-corrected ATE is much smaller, the
        # SE3 error above is dominated by the stereo-unit scale (rig
        # tx=-0.1 => 1 internal unit = baseline/0.1 m), not by tracking
        ate_s = ate_rmse(ref, est, correct_scale=True)
        n_e = np.linalg.norm(est - est.mean(0), axis=1)
        n_r = np.linalg.norm(ref - ref.mean(0), axis=1)
        s = float((n_e * n_r).sum() / max((n_e ** 2).sum(), 1e-12))
        print(f"  [diag] Sim3-corrected ATE = {ate_s:.4f} m; "
              f"best-fit scale ref/est = {s:.4f}")


if __name__ == "__main__":
    main()
