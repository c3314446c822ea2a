"""Evaluate learned tracking on synthetic ground-truth scenes.

Runs the full Droid pipeline (motion filter with the trained update
operator, frontend, backend) over rendered textured-plane sequences and
reports Sim3-aligned ATE against the exact ground truth.  This is the
dataset-free accuracy harness: it quantifies how much a trained
checkpoint improves over random initialization, without TUM/EuRoC data.

Usage:
  python evaluation_scripts/eval_synthetic.py                # random init
  python evaluation_scripts/eval_synthetic.py --ckpt checkpoints/synth/step_001500
"""

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None,
                   help="orbax train-state checkpoint directory")
    p.add_argument("--n_frames", type=int, default=16)
    p.add_argument("--size", type=int, nargs=2, default=(64, 96))
    p.add_argument("--seeds", type=int, nargs="+", default=[11, 12])
    p.add_argument("--motion", type=float, default=0.08)
    p.add_argument("--scene", default="box", choices=["box", "plane"],
                   help="held-out scene family (seeds disjoint from the "
                        "training curriculum)")
    p.add_argument("--backend_steps", type=int, nargs=2, default=(3, 3))
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="runtime network compute dtype")
    p.add_argument("--backend_thresh", type=float, default=64.0,
                   help="backend proximity distance threshold (the "
                        "default SLAMConfig value targets 240x320 real "
                        "scenes; small synthetic scenes need a looser "
                        "graph)")
    p.add_argument("--backend_nms", type=int, default=1)
    p.add_argument("--compare", action="store_true",
                   help="also run random-init on the same scenes and "
                        "report the learned/random ATE ratio")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (safe to run while a "
                        "training job holds the TPU; the axon hook "
                        "ignores JAX_PLATFORMS, so this flag is the only "
                        "reliable off-chip switch)")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from droid_slam_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax.numpy as jnp

    from droid_slam_tpu.config import SLAMConfig
    from droid_slam_tpu.data.synthetic import (
        render_box_scene, render_plane_scene,
    )
    from droid_slam_tpu.geom.align import ate_rmse
    from droid_slam_tpu.runtime.slam import Droid

    H, W = args.size

    params = None
    if args.ckpt and str(args.ckpt).endswith(".npz"):
        from droid_slam_tpu.models.convert import load_npz_weights
        params = load_npz_weights(args.ckpt)
        print(f"loaded npz weights {args.ckpt}")
    elif args.ckpt:
        from droid_slam_tpu.config import TrainConfig
        from droid_slam_tpu.models.droidnet import DroidNet
        from droid_slam_tpu.training.train_step import create_train_state
        from droid_slam_tpu.training.trainer import restore_checkpoint

        tc = TrainConfig(image_size=(H, W), n_frames=4, steps=10)
        net = DroidNet(dtype=jnp.bfloat16)
        state, _ = create_train_state(net, tc)
        state = restore_checkpoint(args.ckpt, state)
        params = state.params
        print(f"loaded checkpoint at step {int(state.step)}")

    def run_scene(seed, run_params, tag=""):
        render = (render_box_scene if args.scene == "box"
                  else render_plane_scene)
        scene = render(args.n_frames, H, W, seed=seed,
                       motion_scale=args.motion)
        cfg = SLAMConfig(
            image_size=(H, W),
            compute_dtype=args.dtype,
            buffer=args.n_frames + 20,   # keyframes + filler batch
            filler_batch=8,
            warmup=6, filter_thresh=0.0, keyframe_thresh=0.01,
            frontend_window=10, frontend_pose_cap=32,
            frontend_depth_cap=32, schur_degree_cap=48,
            frontend_thresh=64.0,
            backend_thresh=args.backend_thresh,
            backend_nms=args.backend_nms,
        )
        droid = Droid(cfg, params=run_params, seed=0)

        intr = scene["intrinsics"][0]
        for t in range(args.n_frames):
            droid.track(t, scene["images"][t], intrinsics=intr)

        stream = ((t, scene["images"][t], intr)
                  for t in range(args.n_frames))
        traj_c2w = droid.terminate(stream,
                                   backend_steps=tuple(args.backend_steps))

        gt_c2w = scene["poses_c2w"]
        ate = ate_rmse(gt_c2w[:, :3], traj_c2w[:, :3], correct_scale=True)
        gt_span = np.linalg.norm(
            gt_c2w[:, :3] - gt_c2w[:1, :3], axis=1
        ).max()
        print(f"seed {seed}{tag}: ATE = {ate:.4f} m "
              f"(trajectory span {gt_span:.3f} m, "
              f"{droid.video.counter} keyframes)")
        return ate

    results = [run_scene(s, params) for s in args.seeds]
    def agg(vals, name):
        """Mean over finite runs + divergence count (a single inf —
        divergence-guard sentinel — must not poison the aggregate) and
        the median as the robust headline."""
        v = np.asarray(vals, np.float64)
        fin = v[np.isfinite(v)]
        n_div = int(np.sum(~np.isfinite(v)))
        mean = float(fin.mean()) if len(fin) else float("inf")
        med = float(np.median(fin)) if len(fin) else float("inf")
        print(f"{name}: median {med:.4f} m, mean(finite) {mean:.4f} m"
              + (f", {n_div} diverged" if n_div else ""))
        return med

    med_l = agg(results, f"learned ATE over {len(results)} scenes")

    if args.compare:
        base = [run_scene(s, None, tag=" [random-init]")
                for s in args.seeds]
        med_r = agg(base, "random-init ATE")
        print(f"learned/random median ratio {med_l / med_r:.3f} "
              f"(improvement {med_r / med_l:.2f}x)")
    return float(med_l)


if __name__ == "__main__":
    main()
