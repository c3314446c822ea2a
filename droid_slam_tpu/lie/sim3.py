"""Sim(3) operations on 8-vectors ``[tx,ty,tz,qx,qy,qz,qw,s]``, pure JAX.

Replaces the lietorch Sim3 group used by the reference's training losses
(/root/reference/droid_slam/geom/losses.py:30-74: scale-fitted geodesic loss)
and the Sim3 branch of the projective-transform Jacobian
(/root/reference/droid_slam/geom/projective_ops.py:79-88).

Tangent ordering is ``[τ (3), φ (3), σ (1)]`` — translation, rotation,
log-scale.  Group action on homogeneous points [Xv, W]: ``[s·R·Xv + W·t, W]``.
"""

import jax.numpy as jnp

from . import so3

_EPS = 1e-8

DIM = 8
MANIFOLD_DIM = 7


def identity(shape=()):
    g = jnp.zeros(tuple(shape) + (8,))
    return g.at[..., 6].set(1.0).at[..., 7].set(1.0)


def t(g):
    return g[..., :3]


def q(g):
    return g[..., 3:7]


def s(g):
    return g[..., 7:8]


def make(trans, quat, scale):
    return jnp.concatenate([trans, quat, scale], axis=-1)


def from_se3(g_se3):
    """Embed an SE(3) 7-vector with unit scale."""
    return jnp.concatenate([g_se3, jnp.ones_like(g_se3[..., :1])], axis=-1)


def scale_by(g, factor):
    """Left-multiply by a pure scaling element (lietorch ``Sim3.scale``):
    (0, I, s) ∘ (t, R, σ) = (s·t, R, s·σ) — both the translation and the
    scale component are multiplied."""
    factor = jnp.broadcast_to(
        jnp.asarray(factor, dtype=g.dtype), g[..., 7:8].shape
    )
    return jnp.concatenate(
        [g[..., :3] * factor, g[..., 3:7], g[..., 7:8] * factor], axis=-1
    )


def mul(g1, g2):
    """(t1,R1,s1)∘(t2,R2,s2) = (s1 R1 t2 + t1, R1R2, s1 s2)."""
    q12 = so3.mul(q(g1), q(g2))
    t12 = s(g1) * so3.act(q(g1), t(g2)) + t(g1)
    return make(t12, q12, s(g1) * s(g2))


def inv(g):
    qi = so3.inv(q(g))
    si = 1.0 / jnp.maximum(s(g), _EPS)
    ti = -si * so3.act(qi, t(g))
    return make(ti, qi, si)


def act(g, X):
    """Apply to homogeneous points [Xv, W]: [s R Xv + W t, W]."""
    Xv, W = X[..., :3], X[..., 3:4]
    Yv = s(g) * so3.act(q(g), Xv) + W * t(g)
    return jnp.concatenate([Yv, W], axis=-1)


def _w_coeffs(phi, sigma):
    """Coefficients (A, B, C) of W = C·I + A·[φ]× + B·[φ]×².

    trans = W τ in the Sim(3) exponential (Strasdat's thesis / Sophus).
    All four small-parameter regimes are handled with nested jnp.where.
    """
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    sg = sigma
    scale = jnp.exp(sg)

    sig_small = jnp.abs(sg) < 1e-5
    th_small = theta_sq < 1e-10
    sg_safe = jnp.where(sig_small, 1.0, sg)
    th_safe = jnp.sqrt(jnp.where(th_small, 1.0, theta_sq))

    C = jnp.where(sig_small, 1.0 + sg / 2.0 + sg * sg / 6.0, (scale - 1.0) / sg_safe)

    # σ≈0 branch
    A_s0 = jnp.where(th_small, 0.5, (1.0 - jnp.cos(th_safe)) / jnp.maximum(theta_sq, _EPS))
    B_s0 = jnp.where(
        th_small, 1.0 / 6.0,
        (th_safe - jnp.sin(th_safe)) / jnp.maximum(theta_sq * th_safe, _EPS),
    )

    # σ≠0 branch
    a_ = scale * jnp.sin(th_safe)
    b_ = scale * jnp.cos(th_safe)
    c_ = theta_sq + sg_safe * sg_safe
    A_t = (a_ * sg_safe + (1.0 - b_) * th_safe) / jnp.maximum(th_safe * c_, _EPS)
    B_t = (C - ((b_ - 1.0) * sg_safe + a_ * th_safe) / jnp.maximum(c_, _EPS)) \
        / jnp.maximum(theta_sq, _EPS)
    # θ≈0, σ≠0
    A_t0 = ((sg_safe - 1.0) * scale + 1.0) / jnp.maximum(sg_safe * sg_safe, _EPS)
    B_t0 = (scale * (0.5 * sg_safe * sg_safe - sg_safe + 1.0) - 1.0) \
        / jnp.maximum(sg_safe ** 3, _EPS)

    A = jnp.where(sig_small, A_s0, jnp.where(th_small, A_t0, A_t))
    B = jnp.where(sig_small, B_s0, jnp.where(th_small, B_t0, B_t))
    return A, B, C


def exp(xi):
    """Sim(3) exponential: (...,7) [τ, φ, σ] -> (...,8)."""
    tau, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6:7]
    quat = so3.exp(phi)
    A, B, C = _w_coeffs(phi, sigma)
    c1 = jnp.cross(phi, tau)
    c2 = jnp.cross(phi, c1)
    trans = C * tau + A * c1 + B * c2
    return make(trans, quat, jnp.exp(sigma))


def log(g):
    """Sim(3) logarithm: (...,8) -> (...,7) [τ, φ, σ].

    τ is recovered by solving W τ = t with the 3×3 W matrix (exact inverse,
    batched with jnp.linalg.solve — tiny systems, negligible cost).
    """
    phi = so3.log(q(g))
    sigma = jnp.log(jnp.maximum(s(g), _EPS))
    A, B, C = _w_coeffs(phi, sigma)
    px, py, pz = phi[..., 0], phi[..., 1], phi[..., 2]
    zeros = jnp.zeros_like(px)
    hat = jnp.stack(
        [zeros, -pz, py, pz, zeros, -px, -py, px, zeros], axis=-1
    ).reshape(phi.shape[:-1] + (3, 3))
    eye = jnp.eye(3, dtype=g.dtype)
    W = C[..., None] * eye + A[..., None] * hat + B[..., None] * (hat @ hat)
    tau = jnp.linalg.solve(W, t(g)[..., None])[..., 0]
    return jnp.concatenate([tau, phi, sigma], axis=-1)
