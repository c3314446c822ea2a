"""Synthetic EuRoC-stereo and ETH3D-RGBD dataset generators round-trip
through the real stream readers (tools/make_{euroc,eth3d}_synth.py).

These generators exist to exercise the stereo and RGB-D protocol paths
at preset scale on the chip (VERDICT r4 item 3); the tests pin the
contract the chip runs depend on: on-disk layout readable by
data/streams.py, exact depth round-trip, and — for EuRoC — that the
inverse-distortion warp really is the inverse of the stream's
rectification (geometry preserved through the full undistort chain).
"""

import os
import os.path as osp
import runpy
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

cv2 = pytest.importorskip("cv2")


def _run_tool(name, argv):
    old = sys.argv
    sys.argv = [name] + argv
    try:
        runpy.run_path(osp.join(REPO, "tools", name), run_name="__main__")
    finally:
        sys.argv = old


def test_eth3d_synth_roundtrip(tmp_path):
    out = str(tmp_path / "eth3d")
    _run_tool("make_eth3d_synth.py",
              ["--out", out, "--frames", "5", "--size", "96", "128"])

    from droid_slam_tpu.data.streams import eth3d_stream
    from droid_slam_tpu.data.synthetic import render_box_scene

    frames = list(eth3d_stream(out))
    assert len(frames) == 5
    t, img, depth, intr, ts = frames[0]
    assert img.shape == (96, 128, 3) and depth.shape == (96, 128)
    assert np.allclose(intr, [0.9 * 128, 0.9 * 128, 64, 48])

    # depth is the analytic render, within uint16 x5000 quantization
    scene = render_box_scene(n_frames=5, H=96, W=128, seed=44,
                             motion_scale=0.05, box=(3.5, 2.5, 9.0),
                             n_obstacles=3)
    assert np.abs(scene["depths"][0] - depth).max() < 1e-3
    # and the RGB matches the render exactly (PNG is lossless)
    assert np.array_equal(scene["images"][0], img)

    gt = np.loadtxt(osp.join(out, "groundtruth.txt"))
    assert gt.shape == (5, 8)
    assert np.allclose(gt[0, 1:], [0, 0, 0, 0, 0, 0, 1])


def test_euroc_synth_rectification_roundtrip(tmp_path):
    out = str(tmp_path / "euroc")
    _run_tool("make_euroc_synth.py", ["--out", out, "--frames", "3"])

    from droid_slam_tpu.data.streams import _EUROC_P_L, euroc_stream
    from droid_slam_tpu.data.synthetic import render_box_scene

    frames = list(euroc_stream(out, stereo=True, stride=1))
    assert len(frames) == 3
    t, img, intr, ts = frames[0]
    assert img.shape == (2, 320, 512, 3)

    # the stream's rectification must recover the rendered rectified
    # view: re-render the left views and compare (central crop — the
    # inverse warp replicates borders)
    fx = _EUROC_P_L[0, 0]
    left = render_box_scene(
        n_frames=3, H=480, W=752, seed=33, motion_scale=0.05,
        box=(3.5, 2.5, 9.0), n_obstacles=3,
        intrinsics=(fx, _EUROC_P_L[1, 1], _EUROC_P_L[0, 2],
                    _EUROC_P_L[1, 2]),
    )
    ref = cv2.resize(left["images"][2], (512, 320))
    got = list(frames)[2][1][0]
    c = (slice(24, -24), slice(40, -40))
    err = (ref[c].astype(np.float32) - got[c].astype(np.float32))
    psnr = 10 * np.log10(255.0 ** 2 / np.mean(err ** 2))
    assert psnr > 30.0, psnr

    # stereo geometry: right view is the left view shifted by disparity
    # fx_resized * b / z.  Verify photometric consistency at the shifted
    # pixel for a grid of central points with near-constant local depth.
    fxr = intr[0]                                   # resized fx
    b = 0.110078
    depth = cv2.resize(left["depths"][0], (512, 320))
    L = frames[0][1][0].astype(np.float32)
    R = frames[0][1][1].astype(np.float32)
    ys, xs = np.mgrid[60:260:40, 80:440:40]
    good = 0
    total = 0
    for y, x in zip(ys.ravel(), xs.ravel()):
        d = fxr * b / depth[y, x]
        xr = x - d
        if xr < 1 or xr > 510:
            continue
        x0 = int(np.floor(xr))
        a = xr - x0
        rv = (1 - a) * R[y, x0] + a * R[y, x0 + 1]
        total += 1
        if np.abs(L[y, x] - rv).mean() < 25.0:
            good += 1
    assert total >= 20 and good / total > 0.8, (good, total)

    gt = np.loadtxt(osp.join(out, "groundtruth.txt"))
    assert gt.shape == (3, 8)
    # timestamps in seconds must associate with the stream's tstamp/1e9
    assert abs(gt[0, 0] - frames[0][3] / 1e9) < 1e-3
