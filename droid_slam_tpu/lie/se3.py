"""SE(3) operations on 7-vectors ``[tx,ty,tz,qx,qy,qz,qw]``, pure JAX.

This module replaces the reference's `lietorch` CUDA extension (API surface
reconstructed in SURVEY.md §2.9) and the device math in
/root/reference/src/droid_kernels.cu:58-175,877-895.

Conventions (matching the reference exactly):
  * Tangent vectors are ``[τ (translation), φ (rotation)]`` — translation first.
  * ``retr(g, ξ) = exp(ξ) ∘ g`` (left retraction; retrSE3 in droid_kernels.cu:877).
  * ``adjT(g, a) = Ad_gᵀ a`` — the dual adjoint used for the pose-i Jacobian
    (projective_ops.py:118, adjSE3 in droid_kernels.cu:80).
  * Group elements act on homogeneous points ``[X, Y, Z, W]`` (W = inverse
    depth): ``g · X = [R·Xv + W·t, W]`` (actSE3, droid_kernels.cu:71).

All functions broadcast over leading batch dims and are jit/vmap/grad safe.
"""

import jax.numpy as jnp

from . import so3

_EPS = 1e-8

DIM = 7         # storage dimension
MANIFOLD_DIM = 6


def identity(shape=()):
    g = jnp.zeros(tuple(shape) + (7,))
    return g.at[..., 6].set(1.0)


def t(g):
    return g[..., :3]


def q(g):
    return g[..., 3:7]


def make(trans, quat):
    return jnp.concatenate([trans, quat], axis=-1)


def mul(g1, g2):
    """Group composition g1 ∘ g2."""
    q12 = so3.mul(q(g1), q(g2))
    t12 = so3.act(q(g1), t(g2)) + t(g1)
    return make(t12, q12)


def inv(g):
    qi = so3.inv(q(g))
    ti = -so3.act(qi, t(g))
    return make(ti, qi)


def relative(gi, gj):
    """g_ij = gj ∘ gi⁻¹ (maps frame-i camera coords to frame-j).

    Matches relSE3 in droid_kernels.cu:97-107.
    """
    return mul(gj, inv(gi))


def act(g, X):
    """Apply to homogeneous points X (...,4) = [Xv (3), W]: [R Xv + W t, W]."""
    Xv, W = X[..., :3], X[..., 3:4]
    Yv = so3.act(q(g), Xv) + W * t(g)
    return jnp.concatenate([Yv, W], axis=-1)


def act3(g, X):
    """Apply to ordinary 3D points (...,3): R X + t."""
    return so3.act(q(g), X) + t(g)


def _v_matrix_terms(phi):
    """Coefficients (a, b) of V = I + a [φ]× + b [φ]×² with Taylor fallback."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < 1e-8
    # safe sqrt: clamp operand so the gradient at θ²=0 stays finite
    theta_safe = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    a = jnp.where(
        small,
        0.5 - theta_sq / 24.0,
        (1.0 - jnp.cos(theta_safe)) / jnp.where(small, 1.0, theta_sq),
    )
    b = jnp.where(
        small,
        1.0 / 6.0 - theta_sq / 120.0,
        (theta_safe - jnp.sin(theta_safe))
        / jnp.where(small, 1.0, theta_sq * theta_safe),
    )
    return a, b


def exp(xi):
    """SE(3) exponential: twist (...,6) [τ, φ] -> group element (...,7)."""
    tau, phi = xi[..., :3], xi[..., 3:6]
    quat = so3.exp(phi)
    a, b = _v_matrix_terms(phi)
    c1 = jnp.cross(phi, tau)
    c2 = jnp.cross(phi, c1)
    trans = tau + a * c1 + b * c2
    return make(trans, quat)


def log(g):
    """SE(3) logarithm: group element (...,7) -> twist (...,6) [τ, φ]."""
    phi = so3.log(q(g))
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < 1e-8
    theta_safe = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    # V⁻¹ = I - ½[φ]× + c [φ]×²  with  c = (1 - θ cos(θ/2) / (2 sin(θ/2))) / θ²
    half = 0.5 * theta_safe
    cot_term = half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)
    c = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - cot_term) / jnp.where(small, 1.0, theta_sq),
    )
    tv = t(g)
    c1 = jnp.cross(phi, tv)
    c2 = jnp.cross(phi, c1)
    tau = tv - 0.5 * c1 + c * c2
    return jnp.concatenate([tau, phi], axis=-1)


def retr(g, xi):
    """Left retraction exp(ξ) ∘ g (retrSE3, droid_kernels.cu:877-895)."""
    out = mul(exp(xi), g)
    return make(t(out), so3.normalize(q(out)))


def adjT(g, a):
    """Dual adjoint Ad_gᵀ a for covectors a (...,6) [av, aw].

    Matches adjSE3 (droid_kernels.cu:80-95):
        out_v = R⁻¹ av
        out_w = R⁻¹ aw + R⁻¹ (av × t)
    """
    qi = so3.inv(q(g))
    av, aw = a[..., :3], a[..., 3:6]
    ov = so3.act(qi, av)
    ow = so3.act(qi, aw + jnp.cross(av, t(g)))
    return jnp.concatenate([ov, ow], axis=-1)


def adj(g, xi):
    """Adjoint Ad_g ξ for twists ξ (...,6): (R τ + t × R φ, R φ)."""
    tau, phi = xi[..., :3], xi[..., 3:6]
    rphi = so3.act(q(g), phi)
    rtau = so3.act(q(g), tau)
    return jnp.concatenate([rtau + jnp.cross(t(g), rphi), rphi], axis=-1)


def matrix(g):
    """4×4 homogeneous matrix (...,4,4)."""
    R = so3.to_matrix(q(g))
    tv = t(g)
    top = jnp.concatenate([R, tv[..., :, None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def from_matrix(T):
    """4×4 homogeneous matrix (...,4,4) -> 7-vector."""
    return make(T[..., :3, 3], so3.from_matrix(T[..., :3, :3]))


def interp(g0, g1, alpha):
    """Geodesic interpolation exp(α · log(g1 ∘ g0⁻¹)) ∘ g0.

    Used by the trajectory filler's pose seeding
    (/root/reference/droid_slam/trajectory_filler.py:50-58).
    """
    dg = mul(g1, inv(g0))
    return mul(exp(alpha * log(dg)), g0)
