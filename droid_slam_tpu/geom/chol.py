"""Dense damped Cholesky / Schur-complement solvers, on-device.

Replaces /root/reference/droid_slam/geom/chol.py (torch CholeskySolver +
block_solve/schur_solve) and — by design — also the reference's *inference*
pose solve, which round-trips Hessian blocks to the CPU for an Eigen sparse
SimplicialLLT factorization every BA iteration
(/root/reference/src/droid_kernels.cu:1117-1219,1375-1406).  On TPU the pose
system is small (6P ≤ ~6k), so a dense on-device Cholesky on the MXU is both
simpler and faster than any host round-trip.

Damping convention matches the reference exactly: ``H += (ep + lm·H)·I``
applied to the diagonal (chol.py:41,60).  Solves fall back to zero updates
when the factorization produces non-finite values (chol.py:8-18 analog).
"""

import jax
import jax.numpy as jnp

_HIGH = jax.lax.Precision.HIGHEST


@jax.custom_vjp
def solve_psd(H, b):
    """Solve H x = b for symmetric positive-definite H, batched.

    Falls back to a zero update if the factorization fails (non-finite
    output) and uses the reference CholeskySolver's custom backward
    (chol.py:5-30): dL/db = H⁻¹ ḡ, dL/dH = −x (H⁻¹ ḡ)ᵀ, with zero
    gradients on failed factorizations — the default autodiff of
    cholesky emits NaN gradients for near-singular systems, which
    poisons training.
    """
    x, _, _ = _solve_psd_fwd_impl(H, b)
    return x


def _chol_solve(L, b):
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(L, y, lower=True, trans=1)


def _solve_psd_fwd_impl(H, b):
    L = jnp.linalg.cholesky(H)
    x = _chol_solve(L, b)
    ok = jnp.all(jnp.isfinite(x), axis=(-2, -1), keepdims=True)
    x = jnp.where(ok, x, jnp.zeros_like(x))
    L = jnp.where(ok, L, jnp.eye(L.shape[-1], dtype=L.dtype))
    return x, L, ok


def _solve_psd_fwd(H, b):
    x, L, ok = _solve_psd_fwd_impl(H, b)
    return x, (L, x, ok)


def _solve_psd_bwd(res, g):
    L, x, ok = res
    dz = _chol_solve(L, g)
    dz = jnp.where(ok & jnp.isfinite(dz), dz, 0.0)
    dH = -jnp.matmul(x, jnp.swapaxes(dz, -1, -2))
    return dH, dz


solve_psd.defvjp(_solve_psd_fwd, _solve_psd_bwd)


def _damp(H, ep, lm):
    D = H.shape[-1]
    eye = jnp.eye(D, dtype=H.dtype)
    return H + (ep + lm * H) * eye


def block_solve(H, b, ep=0.1, lm=1e-4):
    """Solve the block normal equations (motion-only BA).

    Args:
      H: (B, N, N, D, D) pose-pair Hessian blocks.
      b: (B, N, D) RHS.
    Returns:
      dx: (B, N, D).
    """
    B, N, _, D, _ = H.shape
    Hd = jnp.transpose(H, (0, 1, 3, 2, 4)).reshape(B, N * D, N * D)
    Hd = _damp(Hd, ep, lm)
    x = solve_psd(Hd, b.reshape(B, N * D, 1))
    return x.reshape(B, N, D)


def schur_solve(H, E, C, v, w, ep=0.1, lm=1e-4, sless=False):
    """Solve the pose/depth system by dense Schur complement.

    Args:
      H: (B, P, P, D, D) pose Hessian blocks.
      E: (B, P, M, D, HW) pose–depth coupling blocks.
      C: (B, M, HW) depth diagonal (already damped by caller's eta).
      v: (B, P, D) pose RHS.
      w: (B, M, HW) depth RHS.

    Returns:
      dx (B, P, D) and dz (B, M, HW) — the reference's schur_solve
      (chol.py:46-73) with fp32 MXU matmuls at HIGHEST precision.
    """
    B, P, M, D, HW = E.shape
    Hd = jnp.transpose(H, (0, 1, 3, 2, 4)).reshape(B, P * D, P * D)
    Ed = jnp.transpose(E, (0, 1, 3, 2, 4)).reshape(B, P * D, M * HW)
    Q = (1.0 / C).reshape(B, M * HW, 1)

    Hd = _damp(Hd, ep, lm)
    vd = v.reshape(B, P * D, 1)
    wd = w.reshape(B, M * HW, 1)

    Et = jnp.swapaxes(Ed, 1, 2)
    S = Hd - jnp.matmul(Ed, Q * Et, precision=_HIGH)
    rhs = vd - jnp.matmul(Ed, Q * wd, precision=_HIGH)

    dx = solve_psd(S, rhs)
    if sless:
        return dx.reshape(B, P, D)

    dz = Q * (wd - jnp.matmul(Et, dx, precision=_HIGH))
    return dx.reshape(B, P, D), dz.reshape(B, M, HW)
