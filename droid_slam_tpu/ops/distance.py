"""Frame-distance metric: mean reprojection flow between frame pairs.

Re-design of the reference's frame_distance kernel
(/root/reference/src/droid_kernels.cu:518-657): for each pair (i, j), the
β-blend of (a) the mean flow magnitude of the full relative motion and
(b) the mean flow of the translation-only motion, each averaged over pixels
whose transformed depth exceeds MIN_DEPTH; pairs with < 75% valid pixels
get distance 1000.  Used by the keyframe policy and the proximity-edge
selection (depth_video.py:149-179).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..geom import projective
from ..lie import se3

MIN_DEPTH = projective.MIN_DEPTH


def _flow_dist(disps_i, intr, tij, qij, use_rotation):
    """Mean |flow| of frame-i pixels under relative motion (tij, qij)."""
    ht, wd = disps_i.shape[-2:]
    X0 = projective.iproj(disps_i, intr)                   # (..., H, W, 4)
    if use_rotation:
        g = jnp.concatenate([tij, qij], axis=-1)
        X1 = se3.act(g[..., None, None, :], X0)
    else:
        # translation-only: X1 = X0 + d * t (droid_kernels.cu:621-624)
        Xv = X0[..., :3] + X0[..., 3:4] * tij[..., None, None, :]
        X1 = jnp.concatenate([Xv, X0[..., 3:4]], axis=-1)

    coords, _ = projective.proj(X1, intr)
    grid = projective.coords_grid(ht, wd, dtype=disps_i.dtype)
    d = jnp.linalg.norm(coords - grid, axis=-1)
    valid = (X1[..., 2] > MIN_DEPTH).astype(d.dtype)
    acc = jnp.sum(valid * d, axis=(-2, -1))
    cnt = jnp.sum(valid, axis=(-2, -1))
    return acc, cnt, float(ht * wd)


@partial(jax.jit, static_argnames=())
def frame_distance(poses, disps, intrinsics, ii, jj, beta=0.3):
    """Distance for each pair (ii[k], jj[k]).

    Args:
      poses: (BUF, 7); disps: (BUF, h, w); intrinsics: (4,) shared
        (the reference uses intrinsics[0], depth_video.py:166).
      ii, jj: (N,) int32.
    Returns (N,) float distances.
    """
    from .gathers import take_rows

    gi = poses[ii]
    gj = poses[jj]
    gij = se3.mul(gj, se3.inv(gi))
    tij, qij = gij[..., :3], gij[..., 3:7]
    di = take_rows(disps, ii)
    intr = jnp.broadcast_to(intrinsics, ii.shape + (4,))

    acc_r, cnt_r, total = _flow_dist(di, intr, tij, qij, True)
    acc_t, cnt_t, _ = _flow_dist(di, intr, tij, qij, False)

    acc = beta * acc_r + (1.0 - beta) * acc_t
    valid = beta * cnt_r + (1.0 - beta) * cnt_t
    frac = valid / (total + 1e-8)
    dist = acc / jnp.maximum(valid, 1e-8)
    return jnp.where(frac < 0.75, 1000.0, dist)


def distance_matrix(poses, disps, intrinsics, t, beta=0.3):
    """(t, t) bidirectional mean distance matrix (depth_video.py:149-179)."""
    ii, jj = jnp.meshgrid(jnp.arange(t), jnp.arange(t), indexing="ij")
    ii, jj = ii.reshape(-1), jj.reshape(-1)
    d1 = frame_distance(poses, disps, intrinsics, ii, jj, beta)
    d2 = frame_distance(poses, disps, intrinsics, jj, ii, beta)
    return (0.5 * (d1 + d2)).reshape(t, t)
