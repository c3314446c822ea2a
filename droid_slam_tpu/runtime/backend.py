"""Global bundle-adjustment backend.

Re-design of /root/reference/droid_slam/droid_backend.py: gauge-normalize
(mono without sensor depth), build a fresh proximity factor graph over all
keyframes with the on-the-fly correlation implementation, and run
`update_lowmem` sweeps of the update operator + dense global BA.

Capacities are bucketed by keyframe count so jit compiles once per bucket.
"""

import numpy as np

from .factor_graph import FactorGraph


def _bucket(n, lo=32):
    b = lo
    while b < n:
        b *= 2
    return b


class Backend:
    # pluggable for testing (oracle-update graphs)
    graph_cls = FactorGraph

    def __init__(self, net, params, video, cfg):
        self.net = net
        self.params = params
        self.video = video
        self.cfg = cfg

    def __call__(self, steps=12):
        cfg = self.cfg
        t = self.video.counter
        if t < 2:
            return

        # host-side check (a [:t] device slice would compile per t)
        has_sens = bool(
            (np.asarray(self.video.state.disps_sens)[:t] > 0).any()
        )
        if not cfg.stereo and not has_sens:
            self.video.normalize()

        max_factors = 16 * t
        pose_cap = _bucket(t)
        graph = self.graph_cls(
            self.video, self.net, self.params, corr_impl="alt",
            max_factors=max_factors,
            edge_cap=_bucket(max_factors, lo=128),
            inac_cap=8,
            pose_cap=pose_cap, depth_cap=pose_cap,
            degree_cap=64,
        )

        graph.add_proximity_factors(
            rad=cfg.backend_radius, nms=cfg.backend_nms,
            thresh=cfg.backend_thresh, beta=cfg.beta,
        )
        graph.update_lowmem(steps=steps)
        graph.clear_edges()
