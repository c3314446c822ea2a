"""Medium-scale distributed-backend parity artifact (VERDICT r4 item 7).

Runs the Backend-routed edge-sharded distributed global BA on the
8-device virtual CPU mesh at a >=128-keyframe synthetic session and
asserts poses/disps match the single-device backend — the regime where
the compact per-shard Schur tables (pose_cap buckets to 256 at t=160),
the per-shard capacity bucket ladder, and the psum pose-system merge
carry real load, unlike the 6-frame dryrun or the 10-frame unit test
(tests/test_parallel.py::TestBackendDistributed).

Update targets come from an oracle graph (ground-truth reprojections)
so the artifact isolates the BA/sharding machinery from network quality;
the real-network path is covered by the chip protocol runs.

  python tools/backend_parity_mesh.py [--frames 160] [--steps 2]

Exit 0 and a parity table on success; non-zero on mismatch.
"""

import argparse
import os
import os.path as osp
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=160)
    p.add_argument("--steps", type=int, default=2)
    p.add_argument("--atol_pose", type=float, default=2e-3)
    p.add_argument("--atol_disp", type=float, default=2e-3)
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from droid_slam_tpu.config import SLAMConfig
    from droid_slam_tpu.data.synthetic import render_box_scene
    from droid_slam_tpu.geom import projective
    from droid_slam_tpu.lie import se3
    from droid_slam_tpu.runtime.backend import Backend
    from droid_slam_tpu.runtime.factor_graph import FactorGraph
    from droid_slam_tpu.runtime.state import DepthVideo

    n_dev = len(jax.devices())
    print(f"devices: {n_dev} ({jax.devices()[0].platform})", flush=True)
    assert n_dev == 8, "expected the 8-device virtual mesh"

    H, W = 96, 128
    N = args.frames
    t0 = time.time()
    scene = render_box_scene(N, H, W, seed=11, motion_scale=0.03,
                             box=(3.5, 2.5, 9.0), n_obstacles=2)
    print(f"rendered {N} frames in {time.time() - t0:.1f}s", flush=True)

    gt_poses = se3.inv(jnp.asarray(scene["poses_c2w"]))
    gt_disps = jnp.asarray(1.0 / scene["depths"][:, 3::8, 3::8])
    intr8 = jnp.asarray(scene["intrinsics"] / 8.0)

    class OracleGraph(FactorGraph):
        def _run_update_op(self):
            ii, jj, mask = self._edge_arrays()
            ii_c = np.clip(ii, 0, N - 1)
            jj_c = np.clip(jj, 0, N - 1)
            coords_gt, valid = projective.projective_transform(
                gt_poses[None], gt_disps[None], intr8[None],
                jnp.asarray(ii_c), jnp.asarray(jj_c),
            )
            m = jnp.asarray(mask)[:, None, None, None]
            self.target = jnp.where(m, coords_gt[0], self.target)
            self.weight = jnp.where(
                m, valid[0] * jnp.ones_like(self.target), self.weight)
            st = self.video.state
            self.video.state = st.replace(
                damping=1e-4 * jnp.ones_like(st.damping))

    def run(distributed):
        cfg = SLAMConfig(image_size=(H, W), buffer=N + 8, warmup=6)
        video = DepthVideo(cfg)
        h8, w8 = H // 8, W // 8
        zf = jnp.zeros((1, h8, w8, 128), jnp.bfloat16)
        zc = jnp.zeros((h8, w8, 128))
        # perturbed init so BA has real work: noisy GT poses, flat disps
        rng = np.random.default_rng(7)
        noise = se3.exp(jnp.asarray(
            0.01 * rng.standard_normal((N, 6)), jnp.float32))
        poses0 = se3.mul(noise, gt_poses)
        for t in range(N):
            video.append(
                float(t), jnp.asarray(scene["images"][t]), None, None,
                None, intr8[0], zf, zc, zc,
            )
        st = video.state
        video.state = st.replace(
            poses=st.poses.at[:N].set(poses0),
            disps=st.disps.at[:N].set(
                jnp.mean(gt_disps) * jnp.ones_like(st.disps[:N])),
        )
        backend = Backend(None, None, video, cfg, distributed=distributed)
        backend.graph_cls = OracleGraph
        t1 = time.time()
        backend(steps=args.steps)
        dt = time.time() - t1
        return (np.asarray(video.state.poses[:N]),
                np.asarray(video.state.disps[:N]), dt)

    print("=== single-device backend ===", flush=True)
    p_single, d_single, dt_s = run(False)
    print(f"single: {dt_s:.1f}s", flush=True)
    print("=== distributed backend (8-shard mesh) ===", flush=True)
    p_dist, d_dist, dt_d = run(True)
    print(f"distributed: {dt_d:.1f}s", flush=True)

    assert np.all(np.isfinite(p_dist)) and np.all(np.isfinite(d_dist))
    dp = np.abs(p_dist - p_single).max()
    dd = np.abs(d_dist - d_single).max()
    # accuracy vs GT (sanity: BA actually converged, not just matched)
    err = np.asarray(se3.log(se3.mul(
        jnp.asarray(p_dist), se3.inv(gt_poses))))
    print(f"parity: max|pose delta| {dp:.2e}  max|disp delta| {dd:.2e}")
    print(f"accuracy: max|log(T_est T_gt^-1)| {np.abs(err).max():.2e}")
    ok = dp < args.atol_pose and dd < args.atol_disp
    print(f"RESULT: {'PASS' if ok else 'FAIL'} "
          f"(N={N}, steps={args.steps}, atol={args.atol_pose})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
