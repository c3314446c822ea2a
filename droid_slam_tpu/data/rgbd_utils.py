"""Dataset geometry utilities: flow-distance matrices, TUM association.

Re-design of /root/reference/droid_slam/data_readers/rgbd_utils.py using
the framework's own JAX geometry (induced flow) instead of torch.
"""

import numpy as np

from ..geom import projective
from ..lie import se3


def parse_list(filepath, skiprows=0):
    return np.loadtxt(filepath, delimiter=" ", dtype=str,
                      skiprows=skiprows)


def associate_frames(tstamp_image, tstamp_depth, tstamp_pose,
                     max_dt=0.08):
    """Associate image/depth/pose streams by timestamp
    (rgbd_utils.py:29-45)."""
    associations = []
    for i, t in enumerate(tstamp_image):
        if tstamp_pose is None:
            j = np.argmin(np.abs(tstamp_depth - t))
            if np.abs(tstamp_depth[j] - t) < max_dt:
                associations.append((i, j))
        else:
            j = np.argmin(np.abs(tstamp_depth - t))
            k = np.argmin(np.abs(tstamp_pose - t))
            if (np.abs(tstamp_depth[j] - t) < max_dt) and \
               (np.abs(tstamp_pose[k] - t) < max_dt):
                associations.append((i, j, k))
    return associations


def compute_distance_matrix_flow(poses_w2c_data, disps, intrinsics,
                                 chunk=2048, max_flow=100.0):
    """All-pairs mean induced-flow magnitude (rgbd_utils.py:105-143).

    Args:
      poses_w2c_data: (N, 7) — NOTE the reference takes c2w pose vectors
        and inverts (`SE3(poses).inv()`); pass the *dataset* poses here and
        they are inverted identically.
      disps: (N, h, w) downsampled inverse depths.
      intrinsics: (N, 4) at the disps resolution.
    Returns (N, N) float32 matrix (inf where < 70% pixels valid).
    """
    import jax.numpy as jnp

    poses = se3.inv(jnp.asarray(poses_w2c_data, jnp.float32))[None]
    disps_j = jnp.asarray(disps, jnp.float32)[None]
    intr_j = jnp.asarray(intrinsics, jnp.float32)[None]

    N = disps.shape[0]
    ii, jj = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    ii = ii.reshape(-1)
    jj = jj.reshape(-1)

    matrix = np.zeros((N, N), np.float32)
    for s in range(0, len(ii), chunk):
        iis = jnp.asarray(ii[s:s + chunk])
        jjs = jnp.asarray(jj[s:s + chunk])
        flow1, val1 = projective.induced_flow(poses, disps_j, intr_j, iis, jjs)
        flow2, val2 = projective.induced_flow(poses, disps_j, intr_j, jjs, iis)

        flow = jnp.stack([flow1, flow2], axis=2)
        val = jnp.stack([val1, val2], axis=2)
        mag = jnp.clip(jnp.linalg.norm(flow, axis=-1), max=max_flow)
        mag = mag.reshape(mag.shape[1], -1)
        valf = val.reshape(val.shape[1], -1)

        vmean = valf.mean(-1)
        m = (mag * valf).mean(-1) / jnp.maximum(vmean, 1e-8)
        m = jnp.where(vmean < 0.7, jnp.inf, m)
        matrix[ii[s:s + chunk], jj[s:s + chunk]] = np.asarray(m)

    return matrix


def build_frame_graph_from_files(poses, depth_files, intrinsics, depth_read,
                                 f=16, max_flow=256):
    """Covisibility graph for a scene (base.py:69-92): subsample depths by
    f, compute the f-scaled flow matrix, keep pairs under max_flow."""

    def read_disp(fn):
        depth = depth_read(fn)[f // 2::f, f // 2::f]
        depth[depth < 0.01] = np.mean(depth)
        return 1.0 / depth

    disps = np.stack([read_disp(fn) for fn in depth_files], 0)
    d = f * compute_distance_matrix_flow(
        np.asarray(poses), disps, np.asarray(intrinsics) / f
    )

    graph = {}
    for i in range(d.shape[0]):
        j, = np.where(d[i] < max_flow)
        graph[i] = (j, d[i, j])
    return graph
