"""Golden-trajectory test: the full SLAM machinery with an ORACLE update
operator must recover ground-truth camera motion.

No trained weights exist in this environment, so the learned update
operator is replaced by an oracle that sets each edge's flow target to
the ground-truth reprojection (unit confidence).  Everything else is the
real system: keyframe map state, slot-based factor graph, proximity/NMS
edge selection, windowed frontend BA with culling, backend global BA with
gauge normalization, and SE3-seeded motion-only trajectory filling.  The
recovered trajectory must match ground truth after Sim3 alignment — the
"golden trajectory regression" SURVEY.md §4 calls for.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from droid_slam_tpu.config import SLAMConfig
from droid_slam_tpu.data.synthetic import render_plane_scene
from droid_slam_tpu.geom import projective
from droid_slam_tpu.geom.align import ate_rmse
from droid_slam_tpu.lie import se3
from droid_slam_tpu.runtime.backend import Backend
from droid_slam_tpu.runtime.factor_graph import FactorGraph
from droid_slam_tpu.runtime.frontend import Frontend
from droid_slam_tpu.runtime.state import DepthVideo

H, W = 96, 128
N_FRAMES = 12


@pytest.fixture(scope="module")
def scene():
    return render_plane_scene(N_FRAMES, H, W, seed=3, motion_scale=0.05)


def make_oracle_graph_cls(scene):
    """FactorGraph whose update operator is a GT-reprojection oracle."""
    gt_poses = se3.inv(jnp.asarray(scene["poses_c2w"]))    # w2c
    # 1/8-resolution GT disparities at pixel centers (as the runtime does,
    # depth_video.py:64)
    gt_disps = jnp.asarray(1.0 / scene["depths"][:, 3::8, 3::8])
    intr8 = jnp.asarray(scene["intrinsics"] / 8.0)

    class OracleGraph(FactorGraph):
        def _run_update_op(self):
            ii, jj, mask = self._edge_arrays()
            # frames beyond the scene (filler temp slots) clamp to GT range
            ii_c = np.clip(ii, 0, N_FRAMES - 1)
            jj_c = np.clip(jj, 0, N_FRAMES - 1)
            coords_gt, valid = projective.projective_transform(
                gt_poses[None], gt_disps[None], intr8[None],
                jnp.asarray(ii_c), jnp.asarray(jj_c),
            )
            m = jnp.asarray(mask)[:, None, None, None]
            self.target = jnp.where(m, coords_gt[0], self.target)
            self.weight = jnp.where(
                m, valid[0] * jnp.ones_like(self.target), self.weight
            )
            st = self.video.state
            self.video.state = st.replace(
                damping=1e-4 * jnp.ones_like(st.damping)
            )

    return OracleGraph


@pytest.mark.slow
def test_oracle_frontend_backend_recover_gt(scene):
    cfg = SLAMConfig(
        image_size=(H, W), buffer=24, warmup=6, filter_thresh=0.0,
        keyframe_thresh=0.01,   # keep all keyframes (synthetic motion small)
        frontend_window=10, frontend_edge_cap=64, frontend_pose_cap=24,
        frontend_depth_cap=24, schur_degree_cap=48, frontend_thresh=64.0,
    )
    video = DepthVideo(cfg)
    OracleGraph = make_oracle_graph_cls(scene)

    # ingest every frame as a keyframe (oracle bypasses the motion filter)
    intr = scene["intrinsics"][0]
    zeros_f = jnp.zeros((1, H // 8, W // 8, 128), jnp.bfloat16)
    zeros_c = jnp.zeros((H // 8, W // 8, 128))
    frontend = Frontend.__new__(Frontend)
    frontend.video = video
    frontend.cfg = cfg
    frontend.graph = OracleGraph(video, None, None, max_factors=48)
    frontend.t0 = 0
    frontend.t1 = 0
    frontend.is_initialized = False
    frontend.count = 0
    frontend.max_age = cfg.max_age
    frontend.iters1 = cfg.frontend_iters1
    frontend.iters2 = cfg.frontend_iters2

    for t in range(N_FRAMES):
        video.append(
            float(t), jnp.asarray(scene["images"][t]), None, None, None,
            jnp.asarray(intr / 8.0), zeros_f, zeros_c, zeros_c,
        )
        frontend()

    assert frontend.is_initialized
    t_kf = video.counter
    assert t_kf >= cfg.warmup

    # frontend-only accuracy (mono: Sim3-aligned)
    gt_c2w = scene["poses_c2w"][:t_kf]
    est_w2c = np.asarray(video.state.poses[:t_kf])
    est_c2w = np.asarray(se3.inv(jnp.asarray(est_w2c)))
    ate_frontend = ate_rmse(gt_c2w[:, :3], est_c2w[:, :3],
                            correct_scale=True)
    # plane at z=2, motions ~5cm: sub-centimeter recovery expected
    assert ate_frontend < 0.02, ate_frontend

    # backend global BA tightens it further
    backend = Backend(None, None, video, cfg)
    backend.graph_cls = OracleGraph
    backend(steps=4)

    est_c2w2 = np.asarray(
        se3.inv(jnp.asarray(np.asarray(video.state.poses[:t_kf])))
    )
    ate_backend = ate_rmse(gt_c2w[:, :3], est_c2w2[:, :3],
                           correct_scale=True)
    assert ate_backend < 0.015, (ate_frontend, ate_backend)

    # depth recovery (up to the mono gauge): correlation with GT disps
    d_est = np.asarray(video.state.disps[: t_kf]).ravel()
    d_gt = (1.0 / scene["depths"][:t_kf, 3::8, 3::8]).ravel()
    corr = np.corrcoef(d_est, d_gt)[0, 1]
    assert corr > 0.9, corr
