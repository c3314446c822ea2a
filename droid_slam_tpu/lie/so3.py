"""SO(3) operations on quaternions, pure JAX.

Quaternions are stored as ``[qx, qy, qz, qw]`` (scalar-last), matching the
reference's pose layout (poses are ``[tx,ty,tz,qx,qy,qz,qw]``; see
/root/reference/droid_slam/depth_video.py:41 and the device math in
/root/reference/src/droid_kernels.cu:58-174).

All functions broadcast over leading batch dimensions and are jit/vmap/grad
compatible.  Small-angle branches use Taylor expansions selected with
``jnp.where`` on *safe* operands so gradients stay finite.
"""

import jax.numpy as jnp

_EPS = 1e-8


def identity(shape=()):
    """Identity quaternion(s) of batch shape `shape` + (4,)."""
    q = jnp.zeros(tuple(shape) + (4,))
    return q.at[..., 3].set(1.0)


def mul(q1, q2):
    """Hamilton product q1 ⊗ q2 (applying q2's rotation first)."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
            w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def inv(q):
    """Inverse of a unit quaternion (conjugate)."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def act(q, v):
    """Rotate 3-vector(s) v by unit quaternion(s) q.

    Uses the two-cross-product form (same as actSO3 in the reference CUDA,
    /root/reference/src/droid_kernels.cu:58-68): v' = v + qw*uv + qv×uv with
    uv = 2 qv×v.
    """
    qv = q[..., :3]
    qw = q[..., 3:4]
    uv = 2.0 * jnp.cross(qv, v)
    return v + qw * uv + jnp.cross(qv, uv)


def exp(phi):
    """SO(3) exponential map: rotation vector (...,3) -> quaternion (...,4)."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < 1e-8
    # sin(θ/2)/θ and cos(θ/2); Taylor for small θ.  sqrt is computed on a
    # clamped operand so its gradient at θ²=0 stays finite (the clamp only
    # binds inside the Taylor branch where the result is unused).
    theta_safe = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    imag_taylor = 0.5 - theta_sq / 48.0 + theta_sq * theta_sq / 3840.0
    real_taylor = 1.0 - theta_sq / 8.0 + theta_sq * theta_sq / 384.0
    imag = jnp.where(small, imag_taylor, jnp.sin(0.5 * theta_safe) / theta_safe)
    real = jnp.where(small, real_taylor, jnp.cos(0.5 * theta_safe))
    return jnp.concatenate([imag * phi, real], axis=-1)


def log(q):
    """SO(3) logarithm: quaternion (...,4) -> rotation vector (...,3)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    # enforce the shorter geodesic (qw >= 0)
    sign = jnp.where(qw >= 0, 1.0, -1.0)
    qv = qv * sign
    qw = qw * sign
    norm_sq = jnp.sum(qv * qv, axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(norm_sq, _EPS * _EPS))
    small = norm_sq < 1e-10
    angle = 2.0 * jnp.arctan2(norm, qw)
    # φ = angle * qv/|qv|; for small |qv|, angle/|qv| ≈ 2/qw (1 - |qv|²/(3qw²))
    qw_safe = jnp.maximum(qw, _EPS)
    scale_taylor = 2.0 / qw_safe * (1.0 - norm_sq / (3.0 * qw_safe * qw_safe))
    scale = jnp.where(small, scale_taylor, angle / norm)
    return scale * qv


def normalize(q):
    """Renormalize to a unit quaternion."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, _EPS)


def to_matrix(q):
    """Quaternion (...,4) -> rotation matrix (...,3,3)."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def from_matrix(R):
    """Rotation matrix (...,3,3) -> quaternion (...,4) (scalar-last).

    Shepperd's method with branch selection via where (jit friendly).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def _case(tq, a, b, c, d):
        s = jnp.sqrt(jnp.maximum(tq, _EPS)) * 2.0
        return jnp.stack([a / s, b / s, c / s, d / s], axis=-1)

    # four candidate branches
    q0 = _case(1.0 + tr, m21 - m12, m02 - m20, m10 - m01, 1.0 + tr)
    q1 = _case(1.0 + m00 - m11 - m22, 1.0 + m00 - m11 - m22, m01 + m10,
               m02 + m20, m21 - m12)
    q2 = _case(1.0 - m00 + m11 - m22, m01 + m10, 1.0 - m00 + m11 - m22,
               m12 + m21, m02 - m20)
    q3 = _case(1.0 - m00 - m11 + m22, m02 + m20, m12 + m21,
               1.0 - m00 - m11 + m22, m10 - m01)

    c0 = tr > 0
    c1 = (m00 > m11) & (m00 > m22)
    c2 = m11 > m22
    q = jnp.where(
        c0[..., None], q0,
        jnp.where(c1[..., None], q1, jnp.where(c2[..., None], q2, q3)),
    )
    return normalize(q)
