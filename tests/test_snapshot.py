"""SLAM session snapshot/resume roundtrip."""

import numpy as np
import pytest

from droid_slam_tpu.config import SLAMConfig
from droid_slam_tpu.runtime.slam import Droid
from droid_slam_tpu.runtime.snapshot import load_session, save_session

H, W = 64, 96


def synth_frame(t, rng):
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    img = 127 + 60 * np.sin(0.2 * (x + 3 * t)) * np.cos(0.15 * (y + 2 * t))
    return np.clip(img, 0, 255).astype(np.uint8)[..., None].repeat(3, -1)


@pytest.mark.slow
def test_snapshot_roundtrip(tmp_path):
    cfg = SLAMConfig(
        image_size=(H, W), buffer=16, warmup=5, filter_thresh=0.0,
        frontend_window=8, frontend_edge_cap=64, frontend_pose_cap=16,
        frontend_depth_cap=16, schur_degree_cap=32,
    )
    rng = np.random.default_rng(0)
    intr = np.asarray([80.0, 80.0, W / 2, H / 2], np.float32)

    droid = Droid(cfg, seed=0)
    for t in range(6):
        droid.track(t, synth_frame(t, rng), intrinsics=intr)

    path = save_session(str(tmp_path / "session.npz"), droid)

    droid2 = Droid(cfg, seed=0)
    load_session(path, droid2)

    assert droid2.video.counter == droid.video.counter
    np.testing.assert_allclose(
        np.asarray(droid2.video.state.poses),
        np.asarray(droid.video.state.poses),
    )
    np.testing.assert_array_equal(np.asarray(droid2.frontend.gstate.ii),
                                  np.asarray(droid.frontend.gstate.ii))
    np.testing.assert_array_equal(
        np.asarray(droid2.frontend.gstate.active),
        np.asarray(droid.frontend.gstate.active))
    assert droid2.frontend.is_initialized == droid.frontend.is_initialized

    # the restored session keeps tracking (sync: the fused frontend
    # streams asynchronously and refreshes host mirrors lazily).  The new
    # frame may legitimately be culled right after its append (the fused
    # step's distance check), so assert the counter INVARIANT from the
    # device flags rather than a fixed +1: counter' = counter + kf - cull.
    droid2.track(6, synth_frame(6, rng), intrinsics=intr)
    flags = np.asarray(droid2.frontend._last_flags)
    droid2._sync()
    is_kf, cull, counter_dev = int(flags[0]), int(flags[1]), int(flags[2])
    assert droid2.video.counter == counter_dev
    assert counter_dev == droid.video.counter + is_kf - cull
    assert is_kf == 1          # filter_thresh=0: every frame is a keyframe
    assert np.all(np.isfinite(np.asarray(
        droid2.video.state.poses[: droid2.video.counter]
    )))
