"""Tests for the differentiable dense bundle adjustment.

Synthetic convergence problems: generate ground-truth poses/depths, form
targets from the GT reprojection, perturb the initial state, and check that
Gauss-Newton iterations recover the ground truth — the validation strategy
SURVEY.md §7 prescribes (the reference itself has no BA tests).
"""

import jax
import jax.numpy as jnp
import numpy as np

from droid_slam_tpu.geom import ba, projective
from droid_slam_tpu.lie import se3


def build_problem(rng, P=5, ht=12, wd=16):
    # ground-truth trajectory: small forward motion + rotation
    xs = np.cumsum(0.08 * rng.standard_normal((P, 6)), axis=0)
    xs[0] = 0
    poses_gt = se3.exp(jnp.asarray(xs, dtype=jnp.float32))[None]
    disps_gt = jnp.asarray(
        0.6 + 0.25 * rng.random((1, P, ht, wd)), dtype=jnp.float32
    )
    intr = jnp.asarray(np.tile([[wd * 1.2, wd * 1.2, wd / 2, ht / 2]], (P, 1))[None],
                       dtype=jnp.float32)

    # dense-ish edge set
    ii, jj = np.meshgrid(np.arange(P), np.arange(P), indexing="ij")
    keep = (np.abs(ii - jj) >= 1) & (np.abs(ii - jj) <= 2)
    ii, jj = ii[keep], jj[keep]

    target, valid = projective.projective_transform(
        poses_gt, disps_gt, intr, jnp.asarray(ii), jnp.asarray(jj)
    )
    weight = jnp.ones_like(target)
    return poses_gt, disps_gt, intr, ii, jj, target, weight


def pose_err(a, b):
    d = se3.log(se3.mul(a, se3.inv(b)))
    return float(jnp.abs(d).max())


class TestFullBA:
    def test_recovers_poses_and_depth(self):
        rng = np.random.default_rng(0)
        poses_gt, disps_gt, intr, ii, jj, target, weight = build_problem(rng)
        P = poses_gt.shape[1]

        # perturb all but the two anchored poses; perturb depths
        noise = 0.02 * rng.standard_normal((1, P, 6))
        noise[:, :2] = 0
        poses = se3.retr(poses_gt, jnp.asarray(noise, dtype=jnp.float32))
        disps = jnp.ones_like(disps_gt)

        eta = 1e-4 * jnp.ones((1, P) + disps.shape[-2:], jnp.float32)

        for _ in range(12):
            poses, disps = ba.ba(
                target, weight, eta, poses, disps, intr, ii, jj, fixedp=2
            )

        assert pose_err(poses, poses_gt) < 5e-3
        depth_err = float(jnp.abs(disps - disps_gt).mean())
        assert depth_err < 5e-2

    def test_residual_decreases(self):
        rng = np.random.default_rng(1)
        poses_gt, disps_gt, intr, ii, jj, target, weight = build_problem(rng)
        P = poses_gt.shape[1]
        noise = 0.05 * rng.standard_normal((1, P, 6))
        noise[:, :2] = 0
        poses = se3.retr(poses_gt, jnp.asarray(noise, dtype=jnp.float32))
        disps = disps_gt

        def resid(p, d):
            c, v = projective.projective_transform(
                p, d, intr, jnp.asarray(ii), jnp.asarray(jj)
            )
            return float(jnp.sum(v * jnp.abs(target - c)))

        eta = 1e-4 * jnp.ones((1, P) + disps_gt.shape[-2:], jnp.float32)
        r0 = resid(poses, disps)
        for _ in range(8):
            poses, disps = ba.ba(
                target, weight, eta, poses, disps, intr, ii, jj, fixedp=2
            )
        r1 = resid(poses, disps)
        assert r1 < 0.05 * r0

    def test_differentiable(self):
        """Gradient must flow through BA to the target/weight inputs
        (the training loop relies on this, reference train.py:110-115)."""
        rng = np.random.default_rng(2)
        poses_gt, disps_gt, intr, ii, jj, target, weight = build_problem(
            rng, P=3, ht=6, wd=8
        )
        eta = 1e-4 * jnp.ones((1, 3, 6, 8), jnp.float32)

        def loss(tgt):
            p, d = ba.ba(
                tgt, weight, eta, poses_gt, jnp.ones_like(disps_gt), intr,
                ii, jj, fixedp=1,
            )
            return jnp.sum(se3.log(p) ** 2) + jnp.sum(d ** 2)

        g = jax.grad(loss)(target)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).sum()) > 0


class TestMoBA:
    def test_recovers_poses(self):
        rng = np.random.default_rng(3)
        poses_gt, disps_gt, intr, ii, jj, target, weight = build_problem(rng)
        P = poses_gt.shape[1]
        noise = 0.03 * rng.standard_normal((1, P, 6))
        noise[:, 0] = 0
        poses = se3.retr(poses_gt, jnp.asarray(noise, dtype=jnp.float32))

        for _ in range(10):
            poses = ba.moba(
                target, weight, poses, disps_gt, intr, ii, jj, fixedp=1
            )
        assert pose_err(poses, poses_gt) < 5e-3


class TestSolvers:
    def test_schur_matches_direct_solve(self):
        """Schur-complement solution must equal solving the full KKT system."""
        from droid_slam_tpu.geom.chol import schur_solve

        rng = np.random.default_rng(4)
        B, P, M, D, HW = 1, 3, 2, 6, 10
        # build a guaranteed-PD KKT system with diagonal depth block
        Jp = rng.standard_normal((B, 40, P * D))
        Hpp = np.einsum("bnk,bnl->bkl", Jp, Jp) + 10.0 * np.eye(P * D)
        Hpz = 0.05 * rng.standard_normal((B, P * D, M * HW))
        Cdiag = np.abs(rng.standard_normal((B, M * HW))) + 1.0
        rhs = rng.standard_normal((B, P * D + M * HW))

        H = Hpp.reshape(B, P, D, P, D).transpose(0, 1, 3, 2, 4)
        E = Hpz.reshape(B, P, D, M, HW).transpose(0, 1, 3, 2, 4)
        C = Cdiag.reshape(B, M, HW)
        v = rhs[:, : P * D].reshape(B, P, D)
        w = rhs[:, P * D:].reshape(B, M, HW)

        dx, dz = schur_solve(
            jnp.asarray(H), jnp.asarray(E), jnp.asarray(C),
            jnp.asarray(v), jnp.asarray(w), ep=0.0, lm=0.0,
        )

        A = np.block([
            [Hpp[0], Hpz[0]],
            [Hpz[0].T, np.diag(Cdiag[0])],
        ])
        ref = np.linalg.solve(A, rhs[0])
        np.testing.assert_allclose(
            np.asarray(dx).reshape(-1), ref[: P * D], rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(dz).reshape(-1), ref[P * D:], rtol=1e-3, atol=1e-4
        )
