"""Windowed local bundle-adjustment frontend.

Re-design of /root/reference/droid_slam/droid_frontend.py: after `warmup`
keyframes, initialize with a temporal-neighborhood graph and 2×8 update
rounds; then for every new keyframe evict stale edges, add proximity
edges, run 4(+2) update rounds, cull redundant keyframes by flow distance,
and extrapolate the next pose.
"""

import jax.numpy as jnp
import numpy as np

from .factor_graph import FactorGraph
from ..utils.timers import GLOBAL_TIMERS as _T


class Frontend:
    def __init__(self, net, params, video, cfg, graph_cls=FactorGraph):
        self.video = video
        self.cfg = cfg
        # update_chunk = full edge capacity: the frontend graph is small
        # enough to update in one pass, which also makes GraphAgg's
        # per-source-frame segment mean exact (chunked passes would
        # aggregate each chunk separately — reference droid_net.py:44-75
        # aggregates over ALL edges of a frame)
        self.graph = graph_cls(
            video, net, params, corr_impl="volume",
            max_factors=cfg.frontend_max_factors,
            update_chunk=cfg.frontend_edge_cap,
            upsample=cfg.upsample,
        )

        self.t0 = 0
        self.t1 = 0
        self.is_initialized = False
        self.count = 0

        self.max_age = cfg.max_age
        self.iters1 = cfg.frontend_iters1
        self.iters2 = cfg.frontend_iters2

    def __call__(self):
        if not self.is_initialized and self.video.counter == self.cfg.warmup:
            self._initialize()
        elif self.is_initialized and self.t1 < self.video.counter:
            self._update()

    # ------------------------------------------------------------------

    def _update(self):
        """Per-keyframe update (droid_frontend.py:35-73)."""
        cfg = self.cfg
        self.count += 1
        self.t1 += 1

        if self.graph.n > 0:
            with _T.phase("frontend.rm_stale"):
                self.graph.rm_factors(self.graph.age > self.max_age,
                                      store=True)

        with _T.phase("frontend.proximity"):
            self.graph.add_proximity_factors(
            self.t1 - 5, max(self.t1 - cfg.frontend_window, 0),
                rad=cfg.frontend_radius, nms=cfg.frontend_nms,
                thresh=cfg.frontend_thresh, beta=cfg.beta, remove=True,
            )

        # seed new keyframe's depth from sensor depth where available
        # (dynamic indices: python-int indexing would recompile per frame)
        from .state import read_slot, write_slot

        st = self.video.state
        ds = read_slot(st.disps_sens, self.t1 - 1)
        d_new = jnp.where(ds > 0, ds, read_slot(st.disps, self.t1 - 1))
        self.video.state = st.replace(
            disps=write_slot(st.disps, self.t1 - 1, d_new)
        )

        for _ in range(self.iters1):
            self.graph.update(None, None, use_inactive=True)

        with _T.phase("frontend.cull_check"):
            d = float(self.video.distance(
                [self.t1 - 3], [self.t1 - 2], beta=cfg.beta,
                bidirectional=True)[0])

        if d < cfg.keyframe_thresh:
            self.graph.rm_keyframe(self.t1 - 2)
            self.video.counter -= 1
            self.t1 -= 1
        else:
            for _ in range(self.iters2):
                self.graph.update(None, None, use_inactive=True)

        # extrapolate: next pose = last pose; next disp = mean of last
        st = self.video.state
        self.video.state = st.replace(
            poses=write_slot(st.poses, self.t1,
                             read_slot(st.poses, self.t1 - 1)),
            disps=write_slot(
                st.disps, self.t1,
                jnp.broadcast_to(read_slot(st.disps, self.t1 - 1).mean(),
                                 st.disps.shape[1:]),
            ),
        )

    def _initialize(self):
        """Bootstrap over the first `warmup` keyframes
        (droid_frontend.py:75-106)."""
        cfg = self.cfg
        self.t0 = 0
        self.t1 = self.video.counter

        self.graph.add_neighborhood_factors(self.t0, self.t1, r=3)
        for _ in range(8):
            self.graph.update(1, use_inactive=True)

        self.graph.add_proximity_factors(
            0, 0, rad=2, nms=2, thresh=cfg.frontend_thresh, remove=False
        )
        for _ in range(8):
            self.graph.update(1, use_inactive=True)

        from .state import read_slot, write_slot

        st = self.video.state
        last4 = jnp.take(
            st.disps,
            jnp.arange(4, dtype=jnp.int32) + jnp.int32(self.t1 - 4),
            axis=0,
        )
        self.video.state = st.replace(
            poses=write_slot(st.poses, self.t1,
                             read_slot(st.poses, self.t1 - 1)),
            disps=write_slot(
                st.disps, self.t1,
                jnp.broadcast_to(last4.mean(), st.disps.shape[1:]),
            ),
        )

        self.is_initialized = True
        self.video.ready = True

        self.graph.rm_factors(self.graph.ii < cfg.warmup - 4, store=True)
