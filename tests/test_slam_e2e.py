"""Full-pipeline smoke test: Droid.track over a synthetic stream, then
terminate() with global BA and trajectory filling.

Random weights → no accuracy claims; validates that every subsystem
(motion filter, frontend, backend update_lowmem + global BA, trajectory
filler, SE3 inversion) executes and produces finite, well-shaped output.
"""

import numpy as np
import pytest

from droid_slam_tpu.config import SLAMConfig
from droid_slam_tpu.runtime.slam import Droid

H, W = 64, 96


def synth_frame(t, rng):
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    img = (
        127 + 60 * np.sin(0.2 * (x + 3 * t)) * np.cos(0.15 * (y + 2 * t))
        + 40 * np.sin(0.05 * (x - y + 5 * t))
    )
    img = np.clip(img + rng.normal(0, 2, (H, W)), 0, 255).astype(np.uint8)
    return np.stack([img] * 3, axis=-1)


@pytest.mark.slow
def test_rgbd_pipeline():
    """RGB-D input path: sensor depths feed disps_sens and the BA prior."""
    cfg = SLAMConfig(
        image_size=(H, W), buffer=16, warmup=5, filter_thresh=0.0,
        frontend_window=8, frontend_edge_cap=64, frontend_pose_cap=16,
        frontend_depth_cap=16, schur_degree_cap=32,
    )
    droid = Droid(cfg, seed=0)
    rng = np.random.default_rng(1)
    intr = np.asarray([80.0, 80.0, W / 2, H / 2], np.float32)

    for t in range(6):
        depth = 2.0 + 0.1 * rng.random((H, W)).astype(np.float32)
        droid.track(t, synth_frame(t, rng), depth=depth, intrinsics=intr)

    st = droid.video.state
    n = droid.video.counter
    # sensor priors registered at ~1/depth
    ds = np.asarray(st.disps_sens[:n])
    assert ds.min() > 0.4 and ds.max() < 0.6, (ds.min(), ds.max())
    # with random weights the data terms fight the prior; just require
    # finite, positive disparities and poses
    d = np.asarray(st.disps[:n])
    assert np.all(np.isfinite(d)) and d.min() >= 0.001
    assert np.all(np.isfinite(np.asarray(st.poses[:n])))


@pytest.mark.slow
def test_stereo_pipeline():
    """Stereo input: 2-camera feature maps, ii==jj baseline edges."""
    cfg = SLAMConfig(
        image_size=(H, W), buffer=16, warmup=5, filter_thresh=0.0,
        stereo=True, frontend_window=8, frontend_edge_cap=64,
        frontend_pose_cap=16, frontend_depth_cap=16, schur_degree_cap=32,
    )
    droid = Droid(cfg, seed=0)
    rng = np.random.default_rng(2)
    intr = np.asarray([80.0, 80.0, W / 2, H / 2], np.float32)

    for t in range(6):
        left = synth_frame(t, rng)
        right = np.roll(left, -3, axis=1)   # fake baseline shift
        droid.track(t, np.stack([left, right]), intrinsics=intr)

    assert droid.video.counter >= cfg.warmup
    ii, jj = droid.frontend.active_edges()
    assert (ii == jj).any()   # stereo self-edges present
    st = droid.video.state
    assert np.all(np.isfinite(np.asarray(st.poses[:droid.video.counter])))


@pytest.mark.slow
def test_full_pipeline():
    cfg = SLAMConfig(
        image_size=(H, W), buffer=32, warmup=5, filter_thresh=0.0,
        frontend_window=10, frontend_edge_cap=64, frontend_pose_cap=32,
        frontend_depth_cap=32, schur_degree_cap=32, filler_batch=4,
    )
    droid = Droid(cfg, seed=0)

    rng = np.random.default_rng(0)
    intr = np.asarray([80.0, 80.0, W / 2, H / 2], np.float32)

    n_frames = 8
    frames = [synth_frame(t, rng) for t in range(n_frames)]
    for t in range(n_frames - 2):
        droid.track(t, frames[t], intrinsics=intr)

    # prewarm mid-stream must be a pure compile-cache fill: no state change
    c_before = droid.video.counter
    poses_before = np.asarray(droid.video.state.poses)
    droid.prewarm(chunk_sizes=[2])
    assert droid.video.counter == c_before
    np.testing.assert_array_equal(
        np.asarray(droid.video.state.poses), poses_before)

    # the prewarmed chunk program serves the remaining frames
    droid.track_batch([n_frames - 2, n_frames - 1],
                      [frames[n_frames - 2], frames[n_frames - 1]],
                      intrinsics=intr)
    droid._sync()
    assert droid.video.counter >= cfg.warmup

    stream = ((t, frames[t], intr) for t in range(n_frames))
    traj = droid.terminate(stream, backend_steps=(2,))

    assert traj.shape == (n_frames, 7)
    assert np.all(np.isfinite(traj))
    # quaternions stay normalized
    qn = np.linalg.norm(traj[:, 3:], axis=-1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-3)


@pytest.mark.slow
def test_upsample_writes_disps_up():
    """cfg.upsample plumbs the GraphAgg upmask into convex 8x disparity
    upsampling: disps_up is written for updated frames and is convex-
    consistent with the 1/8-res disparities (reference
    factor_graph.py:235-236, depth_video.py:123-127)."""
    cfg = SLAMConfig(
        image_size=(H, W), buffer=16, warmup=5, filter_thresh=0.0,
        upsample=True, frontend_window=8, frontend_edge_cap=64,
        frontend_pose_cap=32, frontend_depth_cap=32, schur_degree_cap=32,
    )
    droid = Droid(cfg, seed=0)
    rng = np.random.default_rng(3)
    intr = np.asarray([80.0, 80.0, W / 2, H / 2], np.float32)
    for t in range(7):
        droid.track(t, synth_frame(t, rng), intrinsics=intr)
    droid._sync()

    n = droid.video.counter
    st = droid.video.state
    dup = np.asarray(st.disps_up[:n])
    d8 = np.asarray(st.disps[:n])
    assert np.any(dup != 0), "disps_up never written"
    # convexity: each upsampled value is a convex combination of a 3x3
    # coarse neighborhood -> bounded by the coarse range per frame.
    # Caveats matching the reference semantics: border taps see zero
    # padding (F.unfold padding=1), so check the interior only; and
    # disps_up is written from the update-round disparities BEFORE the
    # round's BA re-clamps them (factor_graph.py:235-240 ordering), so
    # allow multiplicative slack for that drift.
    for k in range(n):
        if not np.any(dup[k]):
            continue
        inner = dup[k][8:-8, 8:-8]
        assert inner.min() >= -1e-4                     # nonneg convexity
        assert inner.max() <= d8[k].max() * 1.25 + 1e-4
    # 8x8 block means track the coarse grid.  With random weights the BA
    # rounds after the last upsample move disparities a lot, so exact
    # field agreement is a unit-level property (TestCvxUpsample); here
    # assert the magnitudes stay in lockstep per frame.
    hh, ww = d8.shape[1], d8.shape[2]
    pooled = dup.reshape(n, hh, 8, ww, 8).mean((2, 4))
    for k in range(n):
        if not np.any(dup[k]):
            continue
        ratio = pooled[k].mean() / max(d8[k].mean(), 1e-6)
        assert 0.4 < ratio < 2.5, (k, ratio)
