"""Tests for projective geometry: transforms, Jacobians, induced flow."""

import jax
import jax.numpy as jnp
import numpy as np

from droid_slam_tpu.geom import projective
from droid_slam_tpu.lie import se3


def make_scene(rng, P=3, ht=12, wd=16):
    """Random small scene: poses near identity, smooth positive disps."""
    xi = 0.05 * rng.standard_normal((P, 6))
    poses = se3.exp(jnp.asarray(xi))[None]           # (1,P,7)
    disps = jnp.asarray(
        0.5 + 0.3 * rng.random((1, P, ht, wd)), dtype=jnp.float32
    )
    intrinsics = jnp.asarray(
        np.tile([[wd, wd, wd / 2, ht / 2]], (P, 1))[None], dtype=jnp.float32
    )
    return poses, disps, intrinsics


class TestProjectiveTransform:
    def test_identity_maps_to_grid(self):
        rng = np.random.default_rng(0)
        _, disps, intrinsics = make_scene(rng)
        poses = se3.identity((1, 3))
        ii = np.array([0, 1])
        jj = np.array([1, 2])
        coords, valid = projective.projective_transform(
            poses, disps, intrinsics, jnp.asarray(ii), jnp.asarray(jj)
        )
        grid = projective.coords_grid(12, 16)
        np.testing.assert_allclose(
            np.asarray(coords), np.broadcast_to(np.asarray(grid), coords.shape),
            atol=1e-4,
        )
        assert np.all(np.asarray(valid) == 1.0)

    def test_stereo_edge_uses_fixed_baseline(self):
        """ii == jj edges must apply the tx=-0.1 rig transform
        (reference projective_ops.py:105)."""
        rng = np.random.default_rng(1)
        poses, disps, intrinsics = make_scene(rng)
        ii = np.array([1])
        jj = np.array([1])
        coords, _ = projective.projective_transform(
            poses, disps, intrinsics, jnp.asarray(ii), jnp.asarray(jj)
        )
        # manual: X = (x-cx)/fx + d*(-0.1); disparity shift = fx * d * (-0.1)
        grid = projective.coords_grid(12, 16)
        fx = float(intrinsics[0, 1, 0])
        expect_x = np.asarray(grid[..., 0]) - 0.1 * fx * np.asarray(disps[0, 1])
        np.testing.assert_allclose(np.asarray(coords[0, 0, ..., 0]), expect_x, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(coords[0, 0, ..., 1]), np.asarray(grid[..., 1]), atol=1e-4
        )

    def test_pose_jacobians_match_autodiff(self):
        """Analytic Ji/Jj must equal d(coords)/dξ of the left-retraction."""
        rng = np.random.default_rng(2)
        poses, disps, intrinsics = make_scene(rng, P=2, ht=6, wd=8)
        ii = jnp.asarray([0])
        jj = jnp.asarray([1])

        coords0, valid, (Ji, Jj, Jz) = projective.projective_transform(
            poses, disps, intrinsics, ii, jj, jacobian=True
        )

        def f(xi):
            xi_full = jnp.zeros((1, 2, 6)).at[:, :, :].set(0.0)
            p = se3.retr(poses, xi_full.at[0, 0].set(xi[:6]).at[0, 1].set(xi[6:]))
            c, _ = projective.projective_transform(p, disps, intrinsics, ii, jj)
            return c

        J = jax.jacobian(f)(jnp.zeros(12))      # (1,1,H,W,2,12)
        J_i = np.asarray(J[..., :6])
        J_j = np.asarray(J[..., 6:])
        np.testing.assert_allclose(np.asarray(Ji), J_i, atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(Jj), J_j, atol=1e-3, rtol=1e-3)

    def test_depth_jacobian_matches_autodiff(self):
        rng = np.random.default_rng(3)
        poses, disps, intrinsics = make_scene(rng, P=2, ht=6, wd=8)
        ii = jnp.asarray([0])
        jj = jnp.asarray([1])
        _, _, (_, _, Jz) = projective.projective_transform(
            poses, disps, intrinsics, ii, jj, jacobian=True
        )

        def f(d):
            c, _ = projective.projective_transform(
                poses, disps.at[:, 0].set(d), intrinsics, ii, jj
            )
            return c

        J = jax.jacobian(f)(disps[:, 0])        # (1,1,H,W,2, 1,H,W)
        # extract the diagonal over pixels
        J = np.asarray(J)[0, 0, :, :, :, 0]
        H, W = 6, 8
        diag = np.zeros((H, W, 2))
        for y in range(H):
            for x in range(W):
                diag[y, x] = J[y, x, :, y, x]
        np.testing.assert_allclose(
            np.asarray(Jz)[0, 0, ..., 0], diag, atol=1e-4, rtol=1e-3
        )

    def test_valid_mask_flags_behind_camera(self):
        poses = se3.identity((1, 2))
        # large forward translation of frame 1 puts frame-0 points behind it
        poses = poses.at[0, 1, 2].set(-5.0)  # t_z = -5 (w2c): camera at z=+5
        disps = jnp.ones((1, 2, 8, 8), jnp.float32)
        intr = jnp.asarray([[[8.0, 8, 4, 4]] * 2])
        _, valid = projective.projective_transform(
            poses, disps, intr, jnp.asarray([0]), jnp.asarray([1])
        )
        assert float(valid.mean()) == 0.0

    def test_induced_flow_zero_for_identity(self):
        rng = np.random.default_rng(4)
        _, disps, intrinsics = make_scene(rng)
        poses = se3.identity((1, 3))
        flow, valid = projective.induced_flow(
            poses, disps, intrinsics, jnp.asarray([0]), jnp.asarray([1])
        )
        np.testing.assert_allclose(np.asarray(flow), 0.0, atol=1e-4)


class TestFrameDistance:
    """Semantics of the frame-distance metric (droid_kernels.cu:518-657)."""

    def test_identity_zero(self):
        from droid_slam_tpu.ops.distance import frame_distance
        from droid_slam_tpu.lie import se3 as _se3

        poses = _se3.identity((4,))
        disps = 0.5 * jnp.ones((4, 12, 16))
        intr = jnp.asarray([16.0, 16.0, 8.0, 6.0])
        d = frame_distance(poses, disps, intr, jnp.asarray([0, 1]),
                           jnp.asarray([1, 2]))
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-4)

    def test_translation_flow_magnitude(self):
        """Pure x-translation of magnitude tx at disparity d induces
        uniform flow fx·d·tx for both the full and translation-only terms."""
        from droid_slam_tpu.ops.distance import frame_distance
        from droid_slam_tpu.lie import se3 as _se3

        poses = np.tile([0, 0, 0, 0, 0, 0, 1.0], (3, 1)).astype(np.float32)
        poses[1, 0] = -0.2      # w2c translation
        disps = 0.5 * jnp.ones((3, 12, 16))
        fx = 16.0
        intr = jnp.asarray([fx, 16.0, 8.0, 6.0])
        d = frame_distance(jnp.asarray(poses), disps, intr,
                           jnp.asarray([0]), jnp.asarray([1]), beta=0.3)
        # relative motion 0->1: t = -0.2 => |flow| = fx * disp * 0.2 = 1.6
        np.testing.assert_allclose(float(d[0]), fx * 0.5 * 0.2, rtol=1e-3)

    def test_low_overlap_sentinel(self):
        """Pairs with <75% of pixels valid must return the 1000 sentinel."""
        from droid_slam_tpu.ops.distance import frame_distance
        from droid_slam_tpu.lie import se3 as _se3

        poses = np.tile([0, 0, 0, 0, 0, 0, 1.0], (2, 1)).astype(np.float32)
        poses[1, 2] = -10.0     # camera far ahead: everything behind it
        disps = jnp.ones((2, 12, 16))
        intr = jnp.asarray([16.0, 16.0, 8.0, 6.0])
        d = frame_distance(jnp.asarray(poses), disps, intr,
                           jnp.asarray([0]), jnp.asarray([1]))
        assert float(d[0]) == 1000.0
