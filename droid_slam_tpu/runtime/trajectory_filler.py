"""Non-keyframe pose recovery ("trajectory filling").

Re-design of /root/reference/droid_slam/trajectory_filler.py: non-keyframe
frames are processed in batches; each gets a linearly-interpolated SE3 seed
between its bracketing keyframes, correlation features against both
brackets, and six motion-only BA iterations; recovered poses are stitched
into the full camera trajectory.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..lie import se3
from ..models.droidnet import normalize_images
from .factor_graph import FactorGraph


class TrajectoryFiller:
    # pluggable for testing (oracle-update graphs)
    graph_cls = FactorGraph

    def __init__(self, net, params, video, cfg):
        self.net = net
        self.params = params
        self.video = video
        self.cfg = cfg
        self.batch = cfg.filler_batch

        self._encode = jax.jit(
            lambda p, x: net.apply(
                p, normalize_images(x), method=lambda m, x: m.fnet(x)
            )
        )

    def _fill(self, tstamps, images, intrinsics):
        """Fill one batch (trajectory_filler.py:35-77)."""
        N = self.video.counter
        M = len(tstamps)
        st = self.video.state
        if N + M > st.poses.shape[0]:
            raise ValueError(
                f"trajectory filler needs {N + M} buffer slots "
                f"(keyframes {N} + batch {M}) but buffer={st.poses.shape[0]};"
                " increase SLAMConfig.buffer"
            )

        # host copies (device [:N] slices would compile one program per N)
        ts = np.asarray(st.tstamp)[:N]

        tt = np.asarray(tstamps, np.float64)
        t0 = np.asarray(
            [max(int((ts <= t).sum()) - 1, 0) for t in tt], np.int64
        )
        t1 = np.where(t0 < N - 1, t0 + 1, t0)

        dt = ts[t1] - ts[t0] + 1e-3
        alpha = (tt - ts[t0]) / dt

        # SE3 seed: exp(α · log(P_{t1} ∘ P_{t0}⁻¹)) ∘ P_{t0}
        Gs = se3.interp(
            st.poses[jnp.asarray(t0)], st.poses[jnp.asarray(t1)],
            jnp.asarray(alpha, jnp.float32)[:, None],
        )

        images = jnp.stack([jnp.asarray(im) for im in images], 0)
        if images.ndim == 4:
            images = images[:, None]      # (M, rig=1, H, W, 3)
        intr = jnp.stack([jnp.asarray(i) for i in intrinsics], 0)

        fmaps = self._encode(self.params, images[:, 0])

        # temporarily append the M frames to the video buffer
        for k in range(M):
            self.video.append(
                float(tt[k]), images[k, 0], Gs[k], 1.0, None, intr[k] / 8.0,
                fmaps[k][None].astype(jnp.bfloat16),
                jnp.zeros_like(self.video.state.nets[0]),
                jnp.zeros_like(self.video.state.inps[0]),
            )

        # a bracketing keyframe can be the source of up to 2·batch edges
        graph = self.graph_cls(
            self.video, self.net, self.params, corr_impl="volume",
            max_factors=4 * self.batch,
            edge_cap=2 * self.batch, inac_cap=8,
            pose_cap=self.batch + 2,
            depth_cap=3 * self.batch + 4,
            degree_cap=2 * self.batch + 2,
        )
        new_ix = np.arange(N, N + M)
        graph.add_factors(t0, new_ix)
        graph.add_factors(t1, new_ix)

        for _ in range(6):
            graph.update(N, N + M, motion_only=True)

        poses_out = np.array(self.video.state.poses)[N: N + M]
        self.video.counter = N
        return poses_out

    def __call__(self, image_stream):
        """image_stream yields (tstamp, image, intrinsics); returns the
        full (w2c) trajectory as an (n, 7) array."""
        pose_list = []
        tstamps, images, intrinsics = [], [], []

        for (tstamp, image, intr) in image_stream:
            tstamps.append(tstamp)
            images.append(image)
            intrinsics.append(intr)
            if len(tstamps) == self.batch:
                pose_list.append(self._fill(tstamps, images, intrinsics))
                tstamps, images, intrinsics = [], [], []

        if tstamps:
            # pad the final partial batch to the jit-stable batch size
            n_real = len(tstamps)
            while len(tstamps) < self.batch:
                tstamps.append(tstamps[-1] + 1e-4)
                images.append(images[-1])
                intrinsics.append(intrinsics[-1])
            out = self._fill(tstamps, images, intrinsics)
            pose_list.append(out[:n_real])

        return np.concatenate(pose_list, axis=0)
