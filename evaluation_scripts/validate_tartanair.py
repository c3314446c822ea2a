"""Validate mono/stereo SLAM on the TartanAir test split.

TPU-native equivalent of
/root/reference/evaluation_scripts/validate_tartanair.py: 384x512 frames,
ATE/RPE via the framework's own evaluator (replacing
thirdparty/tartanair_tools): Umeyama alignment with scale for mono.
"""

import argparse
import glob
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def tartan_stream(scene_dir, stride=1, image_size=(384, 512)):
    import cv2

    H, W = image_size
    images = sorted(glob.glob(osp.join(scene_dir, "image_left/*.png")))
    intr0 = np.array([320.0, 320.0, 320.0, 240.0])
    for t, path in enumerate(images[::stride]):
        img = cv2.imread(path)
        h0, w0 = img.shape[:2]
        img = cv2.cvtColor(cv2.resize(img, (W, H)), cv2.COLOR_BGR2RGB)
        intr = intr0 * np.array([W / w0, H / h0, W / w0, H / h0])
        yield t, img, intr.astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datapath", required=True, help="scene directory")
    p.add_argument("--weights", default=None)
    p.add_argument("--stride", type=int, default=1)
    p.add_argument("--backend_steps", type=int, nargs=2, default=(5, 10))
    args = p.parse_args()

    from droid_slam_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from droid_slam_tpu.config import PRESETS
    from droid_slam_tpu.data.tartan import NED_PERMUTATION
    from droid_slam_tpu.geom.align import ate_rmse, kitti_metric, rpe
    from droid_slam_tpu.runtime.slam import Droid

    cfg = PRESETS["tartanair"]
    droid = Droid(cfg, weights_path=args.weights)

    frames = list(tartan_stream(args.datapath, stride=args.stride))
    for (t, image, intr) in frames:
        droid.track(t, image, intrinsics=intr)

    traj = droid.terminate(iter(frames),
                           backend_steps=tuple(args.backend_steps))

    gt = np.loadtxt(osp.join(args.datapath, "pose_left.txt"), delimiter=" ")
    gt = gt[::args.stride][: len(traj), NED_PERMUTATION]

    ate = ate_rmse(gt[:, :3], traj[:, :3], correct_scale=True)
    r = rpe(gt[:, :3], traj[:, :3])
    # TartanAir protocol also reports the KITTI segment-drift pair on
    # the ATE-aligned estimate (tartanair_evaluator.py:45-70)
    k_rot, k_tra = kitti_metric(gt[:, :7], traj[:, :7],
                                align=True, correct_scale=True)
    print(f"TartanAir {osp.basename(args.datapath)}: "
          f"ATE = {ate:.4f}  RPE(t) = {r:.4f}  "
          f"KITTI = ({k_rot:.4f} deg/m, {k_tra:.4f} m/m) "
          f"over {len(traj)} poses")


if __name__ == "__main__":
    main()
