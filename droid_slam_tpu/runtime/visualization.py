"""Map visualization / export: depth filtering, back-projection, PLY dump.

Re-design of the reference's visualization stack
(/root/reference/droid_slam/visualization.py + the iproj/depth_filter CUDA
kernels, src/droid_kernels.cu:661-850): multi-view consistency filtering
of the inverse-depth maps, back-projection to colored world points, and —
since this environment is headless — export to PLY instead of an Open3D
window.  The geometry runs as batched JAX (one jit per call set), not a
separate process: map snapshots are cheap device→host copies.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..geom import projective
from ..lie import se3


@jax.jit
def depth_filter(poses, disps, intrinsics, inds, thresh):
    """Count neighbor keyframes agreeing with each pixel's depth.

    For each frame inds[k], project its pixels into the 6 temporal
    neighbors (ix-3..ix-1, ix+1..ix+3) and count neighbors where any of
    the 4 surrounding target pixels has |1/d_proj − 1/d_neighbor| < thresh
    (droid_kernels.cu:661-775).

    Args:
      poses: (BUF, 7); disps: (BUF, h, w); intrinsics: (4,);
      inds: (K,) frame indices; thresh: (K,) per-frame thresholds.
    Returns (K, h, w) agreement counts.
    """
    num, ht, wd = disps.shape
    offsets = jnp.asarray([-1, -2, -3, 1, 2, 3])

    def one_pair(ix, jx, t):
        gij = se3.mul(poses[jx], se3.inv(poses[ix]))
        X0 = projective.iproj(disps[ix], intrinsics)
        X1 = se3.act(gij[None, None], X0)
        fx, fy, cx, cy = intrinsics
        uj = fx * (X1[..., 0] / X1[..., 2]) + cx
        vj = fy * (X1[..., 1] / X1[..., 2]) + cy
        dj = X1[..., 3] / X1[..., 2]

        u0 = jnp.floor(uj).astype(jnp.int32)
        v0 = jnp.floor(vj).astype(jnp.int32)
        inb = (u0 >= 0) & (v0 >= 0) & (u0 < wd - 1) & (v0 < ht - 1)
        u0c = jnp.clip(u0, 0, wd - 2)
        v0c = jnp.clip(v0, 0, ht - 2)

        dn = disps[jx]
        agree = jnp.zeros_like(dj, bool)
        for dv in (0, 1):
            for du in (0, 1):
                dcorner = dn[v0c + dv, u0c + du]
                agree = agree | (
                    jnp.abs(1.0 / jnp.maximum(dj, 1e-8)
                            - 1.0 / jnp.maximum(dcorner, 1e-8)) < t
                )
        valid_j = (jx >= 0) & (jx < num)
        return (agree & inb & valid_j).astype(jnp.float32)

    def one_frame(ix, t):
        counts = jnp.stack(
            [one_pair(ix, ix + o, t) for o in offsets]
        ).sum(0)
        return counts

    return jax.vmap(one_frame)(inds, thresh)


@jax.jit
def iproj_points(poses_c2w, disps, intrinsics):
    """Back-project keyframe pixels to world points.

    poses_c2w: (K, 7) camera-to-world; disps: (K, h, w); intrinsics: (4,).
    Returns (K, h, w, 3) world coordinates (iproj_kernel analog,
    droid_kernels.cu:779-850).
    """
    X0 = projective.iproj(
        disps, jnp.broadcast_to(intrinsics, (disps.shape[0], 4))
    )
    Xv = X0[..., :3] / jnp.maximum(X0[..., 3:4], 1e-8)
    return se3.act3(poses_c2w[:, None, None], Xv)


def export_point_cloud(video, path, filter_thresh=0.005, min_count=2):
    """Write the filtered keyframe map as a colored PLY file.

    Mirrors the visualization filtering (visualization.py:102-107):
    multi-view agreement >= min_count and disparity above 0.5x the frame
    mean.
    """
    t = video.counter
    st = video.state
    inds = jnp.arange(t)
    intr = st.intrinsics[0] * 8.0 / 8.0  # already at 1/8 resolution

    thresh = filter_thresh * jnp.ones((t,)) * jnp.mean(
        st.disps[:t], axis=(1, 2)
    )
    count = depth_filter(st.poses, st.disps, st.intrinsics[0], inds, thresh)

    disps = np.asarray(st.disps[:t])
    masks = (np.asarray(count) >= min_count) & (
        disps > 0.5 * disps.mean(axis=(1, 2), keepdims=True)
    )

    poses_c2w = se3.inv(st.poses[:t])
    pts = np.asarray(iproj_points(poses_c2w, st.disps[:t], st.intrinsics[0]))
    colors = np.asarray(st.images[:t])[:, 3::8, 3::8]

    h, w = disps.shape[1:]
    colors = colors[:, :h, :w]

    pts_sel = pts[masks]
    clr_sel = colors[masks]

    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(pts_sel)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        for p, c in zip(pts_sel, clr_sel):
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} "
                    f"{int(c[0])} {int(c[1])} {int(c[2])}\n")
    return len(pts_sel)
