"""Projective camera geometry with analytic Jacobians, pure JAX.

Re-design of /root/reference/droid_slam/geom/projective_ops.py (pinhole
inverse-projection / projection / SE3 point action and the ii→jj projective
transform with its 2×6 pose and 2×1 depth Jacobians) for TPU: everything is
expressed as batched elementwise math over (..., H, W) grids so XLA fuses it
into a handful of VPU loops; no gathers, no host control flow.

Conventions (identical to the reference):
  * Inverse-depth ("disparity") parameterization; homogeneous points are
    ``[X, Y, 1, d]`` in the source camera (projective_ops.py:18-37).
  * Poses are world-to-camera SE3; the relative motion for an edge (i, j) is
    ``G_ij = G_j ∘ G_i⁻¹``; stereo (ii == jj) edges use a fixed-baseline
    transform ``t = [-0.1, 0, 0]`` (projective_ops.py:105).
  * Pixels with transformed or source depth < MIN_DEPTH (= 0.2) are invalid.
  * The pose-i Jacobian follows the dual adjoint: ``Ji = -adjT(G_ij, Jj)``
    (projective_ops.py:118).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..lie import se3

MIN_DEPTH = 0.2


def _matmul_small(A, B):
    """Batched (..., m, k) @ (..., k, n) for tiny trailing dims.

    XLA lowers a dot_general whose contraction/output dims are tiny (2/4/6)
    over huge batch dims (B,E,H,W) to an MXU-hostile T(2,128)-tiled op
    wrapped in layout-conversion copies — profiled at ~2/3 of the whole BA
    linearization cost on v5e.  A broadcast multiply + sum stays a single
    VPU loop fusion with layout chosen by the consumer, no copies.
    """
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)

# fixed stereo baseline used for ii == jj (rig) edges, matching the
# reference's hard-coded value (projective_ops.py:105)
STEREO_TX = -0.1


def coords_grid(ht, wd, dtype=jnp.float32):
    """Pixel-center coordinate grid, shape (ht, wd, 2) ordered [x, y]."""
    y = jax.lax.broadcasted_iota(dtype, (ht, wd), 0)
    x = jax.lax.broadcasted_iota(dtype, (ht, wd), 1)
    return jnp.stack([x, y], axis=-1)


def iproj(disps, intrinsics):
    """Pinhole back-projection to homogeneous points.

    Args:
      disps: (..., H, W) inverse depths.
      intrinsics: (..., 4) [fx, fy, cx, cy].

    Returns:
      (..., H, W, 4) points [X, Y, 1, d].  The depth Jacobian is the constant
      [0, 0, 0, 1] (reference projective_ops.py:31-34), applied analytically
      by callers.
    """
    ht, wd = disps.shape[-2:]
    fx, fy, cx, cy = jnp.moveaxis(intrinsics[..., None, None, :], -1, 0)
    grid = coords_grid(ht, wd, dtype=disps.dtype)
    x, y = grid[..., 0], grid[..., 1]
    X = (x - cx) / fx
    Y = (y - cy) / fy
    return jnp.stack([X, Y, jnp.ones_like(disps), disps], axis=-1)


def proj(Xs, intrinsics, jacobian=False, return_depth=False):
    """Pinhole projection of homogeneous points.

    Args:
      Xs: (..., H, W, 4) points [X, Y, Z, D].
      intrinsics: (..., 4).

    Returns:
      coords (..., H, W, 2) (or (...,3) with inverse-source-depth when
      return_depth), and if jacobian, the 2×4 projection Jacobian
      (..., H, W, 2, 4) matching reference projective_ops.py:55-62.
    """
    fx, fy, cx, cy = jnp.moveaxis(intrinsics[..., None, None, :], -1, 0)
    X, Y, Z, D = jnp.moveaxis(Xs, -1, 0)

    Z = jnp.where(Z < 0.5 * MIN_DEPTH, jnp.ones_like(Z), Z)
    d = 1.0 / Z

    x = fx * (X * d) + cx
    y = fy * (Y * d) + cy
    if return_depth:
        coords = jnp.stack([x, y, D * d], axis=-1)
    else:
        coords = jnp.stack([x, y], axis=-1)

    if not jacobian:
        return coords, None

    o = jnp.zeros_like(d)
    Jp = jnp.stack(
        [
            fx * d, o, -fx * X * d * d, o,
            o, fy * d, -fy * Y * d * d, o,
        ],
        axis=-1,
    ).reshape(d.shape + (2, 4))
    return coords, Jp


def actp(Gij, X0, jacobian=False):
    """SE3 action on homogeneous point grids with the 4×6 generator Jacobian.

    Gij: (..., 7) broadcast over the (H, W) grid dims of X0 (..., H, W, 4).
    Jacobian matches reference projective_ops.py:73-79 (translation-first
    twist ordering).
    """
    X1 = se3.act(Gij[..., None, None, :], X0)

    if not jacobian:
        return X1, None

    X, Y, Z, d = jnp.moveaxis(X1, -1, 0)
    o = jnp.zeros_like(d)
    Ja = jnp.stack(
        [
            d, o, o, o, Z, -Y,
            o, d, o, -Z, o, X,
            o, o, d, Y, -X, o,
            o, o, o, o, o, o,
        ],
        axis=-1,
    ).reshape(d.shape + (4, 6))
    return X1, Ja


def _edge_transform(poses, ii, jj, stereo_tx=STEREO_TX):
    """Per-edge relative transforms G_ij = G_jj ∘ G_ii⁻¹ with the stereo
    fixed-baseline substitution on ii == jj edges."""
    Gi = jnp.take(poses, ii, axis=-2)
    Gj = jnp.take(poses, jj, axis=-2)
    Gij = se3.mul(Gj, se3.inv(Gi))
    stereo = jnp.asarray(
        [stereo_tx, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0], dtype=poses.dtype
    )
    rig = (ii == jj)[..., None]
    return jnp.where(rig, stereo, Gij)


@partial(jax.jit, static_argnames=("jacobian", "return_depth"))
def projective_transform(
    poses, depths, intrinsics, ii, jj, jacobian=False, return_depth=False
):
    """Map pixel grids of frames ii into frames jj.

    Args:
      poses: (B, P, 7) world-to-camera SE3.
      depths: (B, P, H, W) inverse depths.
      intrinsics: (B, P, 4).
      ii, jj: (E,) int edge endpoints.

    Returns:
      coords (B, E, H, W, 2[+1]), valid (B, E, H, W, 1) and, if jacobian,
      (Ji, Jj, Jz) with shapes (B,E,H,W,2,6), (B,E,H,W,2,6), (B,E,H,W,2,1).
    """
    # row selection via one-hot matmul (XLA gathers run at scalar rates
    # on TPU; see ops/gathers.py) — batch dim handled by vmap
    from ..ops.gathers import take_rows

    depths_ii = jax.vmap(take_rows, in_axes=(0, None))(depths, ii)
    X0 = iproj(depths_ii, jnp.take(intrinsics, ii, axis=1))
    Gij = _edge_transform(poses, ii, jj)
    X1, Ja = actp(Gij, X0, jacobian=jacobian)
    x1, Jp = proj(
        jnp.asarray(X1), jnp.take(intrinsics, jj, axis=1),
        jacobian=jacobian, return_depth=return_depth,
    )

    valid = (X1[..., 2] > MIN_DEPTH) & (X0[..., 2] > MIN_DEPTH)
    valid = valid[..., None].astype(depths.dtype)

    if not jacobian:
        return x1, valid

    Jj = _matmul_small(Jp, Ja)                     # (B,E,H,W,2,6)
    Ji = -se3.adjT(Gij[..., None, None, None, :], Jj)
    # depth Jacobian: G acting on [0,0,0,1] is [t, 1]; project through Jp.
    Jz_pt = se3.act(
        Gij[..., None, None, :],
        jnp.concatenate(
            [jnp.zeros_like(X0[..., :3]), jnp.ones_like(X0[..., 3:4])], axis=-1
        ),
    )
    Jz = _matmul_small(Jp, Jz_pt[..., None])       # (B,E,H,W,2,1)
    return x1, valid, (Ji, Jj, Jz)


def induced_flow(poses, disps, intrinsics, ii, jj):
    """Optical flow induced by camera motion (reference projective_ops.py:127)."""
    ht, wd = disps.shape[-2:]
    coords0 = coords_grid(ht, wd, dtype=disps.dtype)
    coords1, valid = projective_transform(poses, disps, intrinsics, ii, jj)
    return coords1[..., :2] - coords0, valid
