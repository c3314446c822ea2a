"""Tests for trajectory alignment / ATE metrics and training losses."""

import jax.numpy as jnp
import numpy as np
import pytest

from droid_slam_tpu.geom import align, losses
from droid_slam_tpu.lie import se3


class TestUmeyama:
    def test_recovers_similarity(self):
        rng = np.random.default_rng(0)
        src = rng.standard_normal((50, 3))
        from scipy.spatial.transform import Rotation
        R_gt = Rotation.random(random_state=1).as_matrix()
        s_gt, t_gt = 2.5, np.asarray([1.0, -2.0, 0.5])
        dst = (s_gt * (R_gt @ src.T)).T + t_gt

        s, R, t = align.umeyama(src, dst, with_scale=True)
        np.testing.assert_allclose(s, s_gt, rtol=1e-6)
        np.testing.assert_allclose(R, R_gt, atol=1e-6)
        np.testing.assert_allclose(t, t_gt, atol=1e-6)

    def test_ate_zero_for_similar_trajectories(self):
        rng = np.random.default_rng(1)
        gt = np.cumsum(rng.standard_normal((40, 3)), axis=0)
        est = 1.7 * gt @ np.diag([1, 1, 1]) + 3.0
        assert align.ate_rmse(gt, est, correct_scale=True) < 1e-9
        # without scale correction the error is nonzero
        assert align.ate_rmse(gt, est, correct_scale=False) > 0.1

    def test_ate_measures_noise(self):
        rng = np.random.default_rng(2)
        gt = np.cumsum(rng.standard_normal((100, 3)), axis=0)
        est = gt + 0.05 * rng.standard_normal((100, 3))
        e = align.ate_rmse(gt, est)
        assert 0.01 < e < 0.1

    def test_associate(self):
        a = [0.0, 1.0, 2.0, 3.0]
        b = [0.01, 1.5, 2.005, 3.019]
        m = align.associate(a, b, max_dt=0.02)
        assert (0, 0) in m and (2, 2) in m and (3, 3) in m
        assert all(j != 1 for _, j in m)


class TestKittiMetric:
    """Hand-computed cases for the TartanAir KITTI segment metric
    (reference evaluate_kitti.py:45-107 semantics)."""

    def _straight(self, n=60, step=1.0):
        traj = np.zeros((n, 7))
        traj[:, 0] = step * np.arange(n)
        traj[:, 6] = 1.0  # identity quaternion, scalar last
        return traj

    def test_zero_for_identical(self):
        gt = self._straight()
        rot, tra = align.kitti_metric(gt, gt.copy(), align=False)
        assert rot == pytest.approx(0.0, abs=1e-9)
        assert tra == pytest.approx(0.0, abs=1e-9)

    def test_translation_drift_hand_computed(self):
        # gt: 1 m/frame along x; est: 1.1 m/frame.  dist[i]=i, so a
        # segment of nominal length L ends at the FIRST frame strictly
        # beyond L meters = f+L+1 (the reference's > test,
        # evaluate_kitti.py:20-23), i.e. actual span L+1 m and drift
        # 0.1(L+1); normalized by the nominal L.
        gt = self._straight()
        est = self._straight(step=1.1)
        lengths = (5, 10, 15, 20)
        rot, tra = align.kitti_metric(gt, est, lengths=lengths, align=False)
        expect = np.mean([0.1 * (L + 1) / L for L in lengths])
        assert rot == pytest.approx(0.0, abs=1e-9)
        assert tra == pytest.approx(expect, rel=1e-9)

    def test_rotation_drift_hand_computed(self):
        # est yaws by theta per frame: segment rotation error is
        # (L+1)*theta over the L+1-frame span, /L, in degrees
        theta = 0.002
        gt = self._straight()
        est = self._straight()
        ang = theta * np.arange(len(est))
        est[:, 5] = np.sin(ang / 2)   # qz
        est[:, 6] = np.cos(ang / 2)   # qw
        lengths = (5, 10)
        rot, tra = align.kitti_metric(gt, est, lengths=lengths, align=False)
        expect = np.degrees(np.mean([theta * (L + 1) / L for L in lengths]))
        assert rot == pytest.approx(expect, rel=1e-6)

    def test_alignment_absorbs_similarity(self):
        rng = np.random.default_rng(4)
        gt = self._straight()
        gt[:, 1] = np.cumsum(0.3 * rng.standard_normal(len(gt)))
        from scipy.spatial.transform import Rotation
        Rr = Rotation.random(random_state=5)
        R = Rr.as_matrix()
        est = gt.copy()
        est[:, :3] = 1.6 * (R @ gt[:, :3].T).T + np.array([3.0, -1.0, 2.0])
        est[:, 3:7] = Rr.as_quat()  # consistent rotations: R @ identity
        rot, tra = align.kitti_metric(gt, est, align=True, correct_scale=True)
        # a consistent similarity transform of the gt trajectory is fully
        # absorbed by the Umeyama alignment — both drifts vanish
        assert rot < 1e-6 and tra < 1e-6

    def test_rpe_pose_identity(self):
        gt = self._straight()
        rot, tra = align.rpe_pose(gt, gt.copy())
        assert rot == pytest.approx(0.0, abs=1e-9)
        assert tra == pytest.approx(0.0, abs=1e-9)


class TestLosses:
    def _setup(self):
        rng = np.random.default_rng(3)
        B, N, h, w = 1, 4, 6, 8
        xs = np.cumsum(0.1 * rng.standard_normal((N, 6)), 0)
        Ps = se3.exp(jnp.asarray(xs, jnp.float32))[None]
        disps = jnp.asarray(0.5 + 0.3 * rng.random((B, N, h, w)), jnp.float32)
        intr = jnp.asarray(np.tile([[8.0, 8, 4, 3]], (N, 1))[None], jnp.float32)
        ii = np.array([0, 1, 2, 1, 2, 3])
        jj = np.array([1, 2, 3, 0, 1, 2])
        return Ps, disps, intr, ii, jj

    def test_geodesic_zero_at_gt(self):
        Ps, disps, intr, ii, jj = self._setup()
        loss, metrics = losses.geodesic_loss(Ps, [Ps], ii, jj, do_scale=False)
        assert float(loss) < 1e-5
        assert float(metrics["rot_error"]) < 1e-3

    def test_geodesic_scale_fitting(self):
        """With do_scale, a uniformly scaled trajectory fits s exactly and
        the loss decreases (the fit doesn't fully cancel scale error —
        composition mixes s into translation — matching the reference's
        Sim3 formulation)."""
        Ps, disps, intr, ii, jj = self._setup()
        Gs = jnp.concatenate([2.0 * Ps[..., :3], Ps[..., 3:]], axis=-1)
        loss_s, _ = losses.geodesic_loss(Ps, [Gs], ii, jj, do_scale=True)
        loss_ns, _ = losses.geodesic_loss(Ps, [Gs], ii, jj, do_scale=False)
        assert float(loss_s) < float(loss_ns)
        assert np.isfinite(float(loss_s))

    def test_residual_loss_weighting(self):
        r1 = jnp.ones((1, 2, 4, 4, 2))
        loss, m = losses.residual_loss([r1, 2 * r1], gamma=0.5)
        np.testing.assert_allclose(float(loss), 0.5 * 1 + 1.0 * 2, rtol=1e-6)

    def test_flow_loss_zero_at_gt(self):
        Ps, disps, intr, ii, jj = self._setup()
        loss, m = losses.flow_loss(Ps, disps, [Ps], [disps], intr)
        assert float(loss) < 1e-5
        assert float(m["1px"]) > 0.99
