"""Property tests for the SO3/SE3/Sim3 Lie-group layer.

The reference has no unit tests (SURVEY.md §4); these pin down the group
conventions reconstructed from /root/reference/src/droid_kernels.cu:58-175
and lietorch call sites: exp/log roundtrips, composition/action consistency,
adjoint identities, and the left-retraction convention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from droid_slam_tpu.lie import se3, sim3, so3

jax.config.update("jax_enable_x64", False)


def rand_quat(rng, shape=()):
    q = rng.standard_normal(shape + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def rand_se3(rng, shape=()):
    return np.concatenate(
        [0.5 * rng.standard_normal(shape + (3,)), rand_quat(rng, shape)], axis=-1
    )


class TestSO3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(0)
        # keep |φ| < π: log returns the principal rotation vector
        phi = rng.standard_normal((64, 3))
        phi = phi / np.linalg.norm(phi, axis=-1, keepdims=True) \
            * rng.uniform(0, 3.0, (64, 1))
        phi2 = np.asarray(so3.log(so3.exp(jnp.asarray(phi))))
        np.testing.assert_allclose(phi, phi2, atol=1e-5)

    def test_exp_small_angle(self):
        phi = jnp.asarray([[1e-9, 0, 0], [0.0, 0.0, 0.0]])
        q = so3.exp(phi)
        np.testing.assert_allclose(np.asarray(q[1]), [0, 0, 0, 1], atol=1e-7)
        # gradient must be finite through the small-angle branch
        g = jax.grad(lambda p: jnp.sum(so3.exp(p)))(phi)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_act_matches_matrix(self):
        rng = np.random.default_rng(1)
        q = jnp.asarray(rand_quat(rng, (32,)))
        v = jnp.asarray(rng.standard_normal((32, 3)))
        np.testing.assert_allclose(
            np.asarray(so3.act(q, v)),
            np.einsum("nij,nj->ni", np.asarray(so3.to_matrix(q)), np.asarray(v)),
            atol=1e-5,
        )

    def test_mul_matches_matrix(self):
        rng = np.random.default_rng(2)
        q1 = jnp.asarray(rand_quat(rng, (8,)))
        q2 = jnp.asarray(rand_quat(rng, (8,)))
        R = np.asarray(so3.to_matrix(so3.mul(q1, q2)))
        R12 = np.asarray(so3.to_matrix(q1)) @ np.asarray(so3.to_matrix(q2))
        np.testing.assert_allclose(R, R12, atol=1e-5)

    def test_from_matrix_roundtrip(self):
        rng = np.random.default_rng(3)
        q = jnp.asarray(rand_quat(rng, (64,)))
        q2 = so3.from_matrix(so3.to_matrix(q))
        # sign ambiguity: compare rotations
        np.testing.assert_allclose(
            np.asarray(so3.to_matrix(q2)), np.asarray(so3.to_matrix(q)), atol=1e-5
        )


class TestSE3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(4)
        xi = rng.standard_normal((64, 6))
        # keep the rotation part below π so log is the principal value
        xi[:, 3:] *= 0.9
        xi2 = np.asarray(se3.log(se3.exp(jnp.asarray(xi))))
        np.testing.assert_allclose(xi, xi2, atol=1e-4)

    def test_mul_inv_identity(self):
        rng = np.random.default_rng(5)
        g = jnp.asarray(rand_se3(rng, (16,)))
        e = se3.mul(g, se3.inv(g))
        np.testing.assert_allclose(np.asarray(e[..., :3]), 0, atol=1e-6)
        np.testing.assert_allclose(np.abs(np.asarray(e[..., 6])), 1, atol=1e-6)

    def test_act_matches_matrix(self):
        rng = np.random.default_rng(6)
        g = jnp.asarray(rand_se3(rng, (16,)))
        X = jnp.asarray(rng.standard_normal((16, 4)))
        Y = se3.act(g, X)
        T = np.asarray(se3.matrix(g))
        # homogeneous action with W as inverse depth: [R Xv + W t, W]
        Yv = np.einsum("nij,nj->ni", T[:, :3, :3], np.asarray(X[..., :3])) \
            + np.asarray(X[..., 3:4]) * T[:, :3, 3]
        np.testing.assert_allclose(np.asarray(Y[..., :3]), Yv, atol=1e-5)
        np.testing.assert_allclose(np.asarray(Y[..., 3]), np.asarray(X[..., 3]))

    def test_retr_left_convention(self):
        """retr(g, ξ) must equal exp(ξ) ∘ g (droid_kernels.cu:877-895)."""
        rng = np.random.default_rng(7)
        g = jnp.asarray(rand_se3(rng, (8,)))
        xi = jnp.asarray(0.1 * rng.standard_normal((8, 6)))
        a = np.asarray(se3.retr(g, xi))
        b = np.asarray(se3.mul(se3.exp(xi), g))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_adjoint_identity(self):
        """g ∘ exp(ξ) = exp(Ad_g ξ) ∘ g."""
        rng = np.random.default_rng(8)
        g = jnp.asarray(rand_se3(rng, (8,)))
        xi = jnp.asarray(0.3 * rng.standard_normal((8, 6)))
        lhs = se3.mul(g, se3.exp(xi))
        rhs = se3.mul(se3.exp(se3.adj(g, xi)), g)
        np.testing.assert_allclose(
            np.asarray(se3.matrix(lhs)), np.asarray(se3.matrix(rhs)), atol=1e-5
        )

    def test_adjT_is_transpose_of_adj(self):
        rng = np.random.default_rng(9)
        g = jnp.asarray(rand_se3(rng))
        xi = jnp.asarray(rng.standard_normal((6,)))
        a = jnp.asarray(rng.standard_normal((6,)))
        lhs = jnp.dot(a, se3.adj(g, xi))
        rhs = jnp.dot(se3.adjT(g, a), xi)
        np.testing.assert_allclose(float(lhs), float(rhs), atol=1e-5)

    def test_relative_pose(self):
        rng = np.random.default_rng(10)
        gi = jnp.asarray(rand_se3(rng))
        gj = jnp.asarray(rand_se3(rng))
        gij = se3.relative(gi, gj)
        X = jnp.asarray(np.concatenate([rng.standard_normal(3), [1.0]]))
        np.testing.assert_allclose(
            np.asarray(se3.act(gij, se3.act(gi, X))),
            np.asarray(se3.act(gj, X)),
            atol=1e-5,
        )

    def test_interp_endpoints(self):
        rng = np.random.default_rng(11)
        g0 = jnp.asarray(rand_se3(rng))
        g1 = jnp.asarray(rand_se3(rng))
        m0 = np.asarray(se3.matrix(se3.interp(g0, g1, 0.0)))
        m1 = np.asarray(se3.matrix(se3.interp(g0, g1, 1.0)))
        np.testing.assert_allclose(m0, np.asarray(se3.matrix(g0)), atol=1e-5)
        np.testing.assert_allclose(m1, np.asarray(se3.matrix(g1)), atol=1e-5)


class TestSim3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(12)
        xi = rng.standard_normal((64, 7)) * np.asarray([1, 1, 1, 0.5, 0.5, 0.5, 0.3])
        xi2 = np.asarray(sim3.log(sim3.exp(jnp.asarray(xi))))
        np.testing.assert_allclose(xi, xi2, atol=1e-4)

    def test_se3_embedding_consistency(self):
        rng = np.random.default_rng(13)
        g = jnp.asarray(rand_se3(rng, (8,)))
        gs = sim3.from_se3(g)
        X = jnp.asarray(rng.standard_normal((8, 4)))
        np.testing.assert_allclose(
            np.asarray(sim3.act(gs, X)), np.asarray(se3.act(g, X)), atol=1e-6
        )

    def test_mul_inv(self):
        rng = np.random.default_rng(14)
        xi = jnp.asarray(rng.standard_normal((8, 7)) * 0.5)
        g = sim3.exp(xi)
        e = sim3.mul(g, sim3.inv(g))
        np.testing.assert_allclose(np.asarray(e[..., :3]), 0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(e[..., 7]), 1, atol=1e-5)

    def test_scale_action(self):
        rng = np.random.default_rng(15)
        g = sim3.exp(jnp.asarray(rng.standard_normal((4, 7)) * 0.3))
        g2 = sim3.scale_by(g, 2.0)
        np.testing.assert_allclose(
            np.asarray(g2[..., 7]), 2 * np.asarray(g[..., 7]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(g2[..., :3]), 2 * np.asarray(g[..., :3]), atol=1e-6
        )


class TestJitVmap:
    def test_jit_vmap_compose(self):
        rng = np.random.default_rng(16)
        g = jnp.asarray(rand_se3(rng, (32,)))
        f = jax.jit(jax.vmap(lambda a, b: se3.log(se3.mul(a, se3.inv(b)))))
        out = f(g, jnp.roll(g, 1, axis=0))
        assert out.shape == (32, 6)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_grad_through_retr(self):
        rng = np.random.default_rng(17)
        g = jnp.asarray(rand_se3(rng, (4,)))

        def loss(xi):
            g2 = se3.retr(g, xi)
            return jnp.sum(se3.log(g2) ** 2)

        grads = jax.grad(loss)(jnp.zeros((4, 6)))
        assert np.all(np.isfinite(np.asarray(grads)))
        assert float(jnp.abs(grads).sum()) > 0


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
