"""Tests for evaluation streams against generated dataset layouts."""

import os
import os.path as osp

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from droid_slam_tpu.data import streams
from droid_slam_tpu.data.factory import create_stream


def _img(rng, h=480, w=640):
    return rng.integers(0, 255, (h, w, 3), dtype=np.uint8)


@pytest.fixture()
def tum_dir(tmp_path):
    rng = np.random.default_rng(0)
    rgb = tmp_path / "rgb"
    rgb.mkdir()
    for t in range(6):
        cv2.imwrite(str(rgb / f"{1000.0 + t * 0.1:.6f}.png"), _img(rng))
    gt = np.column_stack([
        1000.0 + np.arange(6) * 0.1,
        np.cumsum(np.ones((6, 3)) * 0.01, 0),
        np.tile([0, 0, 0, 1.0], (6, 1)),
    ])
    np.savetxt(str(tmp_path / "groundtruth.txt"), gt)
    return str(tmp_path)


class TestTumStream:
    def test_shapes_and_stride(self, tum_dir):
        frames = list(streams.tum_stream(tum_dir, stride=2))
        assert len(frames) == 3
        t, img, intr = frames[0]
        assert img.shape == (240, 320, 3)
        assert img.dtype == np.uint8
        assert intr.shape == (4,)
        # intrinsics correspond to the cropped resolution
        assert 0 < intr[2] < 320 and 0 < intr[3] < 240

    def test_factory_dispatch(self, tum_dir):
        s = create_stream(tum_dir, stride=3)
        frames = list(s)
        assert len(frames) == 2


class TestEth3dStream:
    def test_rgbd_pairs(self, tmp_path):
        rng = np.random.default_rng(1)
        (tmp_path / "rgb").mkdir()
        (tmp_path / "depth").mkdir()
        rgb_rows, d_rows = [], []
        for t in range(4):
            ts = 10.0 + t * 0.05
            rp = f"rgb/{ts:.6f}.png"
            dp = f"depth/{ts:.6f}.png"
            cv2.imwrite(str(tmp_path / rp), _img(rng, 128, 160))
            depth16 = (rng.uniform(1, 3, (128, 160)) * 5000).astype(np.uint16)
            cv2.imwrite(str(tmp_path / dp), depth16)
            rgb_rows.append((ts, rp))
            d_rows.append((ts, dp))
        with open(tmp_path / "rgb.txt", "w") as f:
            for ts, p in rgb_rows:
                f.write(f"{ts:.6f} {p}\n")
        with open(tmp_path / "depth.txt", "w") as f:
            for ts, p in d_rows:
                f.write(f"{ts:.6f} {p}\n")
        np.savetxt(str(tmp_path / "calibration.txt"),
                   np.asarray([100.0, 100.0, 80.0, 64.0]))

        frames = list(streams.eth3d_stream(str(tmp_path)))
        assert len(frames) == 4
        t, img, depth, intr, ts = frames[0]
        assert img.shape == (128, 160, 3)
        assert depth.shape == (128, 160)
        assert 0.9 < depth.mean() < 3.1   # metric depth after /5000
        np.testing.assert_allclose(intr, [100, 100, 80, 64])


class TestDirectoryStream:
    def test_resize_and_calib(self, tmp_path):
        rng = np.random.default_rng(2)
        imgdir = tmp_path / "imgs"
        imgdir.mkdir()
        for t in range(3):
            cv2.imwrite(str(imgdir / f"{t:04d}.png"), _img(rng))
        np.savetxt(str(tmp_path / "calib.txt"),
                   np.asarray([[500.0, 500.0, 320.0, 240.0]]))

        frames = list(streams.directory_stream(
            str(imgdir), str(tmp_path / "calib.txt")
        ))
        assert len(frames) == 3
        _, img, intr = frames[0]
        assert img.shape[0] % 8 == 0 and img.shape[1] % 8 == 0
        # area approximately 384*512
        assert abs(img.shape[0] * img.shape[1] - 384 * 512) < 30000


class TestGenericStereoRgbdStreams:
    def test_stereo_directory_stream(self, tmp_path):
        rng = np.random.default_rng(3)
        for sub in ("image_left", "image_right"):
            (tmp_path / sub).mkdir()
            for t in range(4):
                cv2.imwrite(str(tmp_path / sub / f"{t:04d}.png"),
                            _img(rng, 240, 320))
        np.savetxt(str(tmp_path / "calib.txt"),
                   np.asarray([[260.0, 260.0, 160.0, 120.0]]))

        frames = list(streams.stereo_directory_stream(
            str(tmp_path), str(tmp_path / "calib.txt"),
            target_area=240 * 320,
        ))
        assert len(frames) == 4
        t, left, right, intr = frames[0]
        assert left.shape == right.shape
        assert left.shape[0] % 8 == 0 and left.shape[1] % 8 == 0
        assert intr.shape == (4,)

    def test_rgbd_directory_stream(self, tmp_path):
        rng = np.random.default_rng(4)
        (tmp_path / "rgb").mkdir()
        (tmp_path / "depth").mkdir()
        for t in range(3):
            cv2.imwrite(str(tmp_path / "rgb" / f"{t:04d}.png"),
                        _img(rng, 128, 160))
            d16 = (rng.uniform(0.5, 4, (128, 160)) * 1000).astype(
                np.uint16)
            cv2.imwrite(str(tmp_path / "depth" / f"{t:04d}.png"), d16)
        np.savetxt(str(tmp_path / "calib.txt"),
                   np.asarray([[100.0, 100.0, 80.0, 64.0]]))

        frames = list(streams.rgbd_directory_stream(
            str(tmp_path), str(tmp_path / "calib.txt")
        ))
        assert len(frames) == 3
        t, img, depth, intr = frames[0]
        assert img.shape == (128, 160, 3)
        assert depth.shape == (128, 160)
        assert 0.4 < depth.mean() < 4.1


class TestKittiStream:
    @pytest.fixture()
    def kitti_dir(self, tmp_path):
        rng = np.random.default_rng(5)
        for sub in ("image_2", "image_3"):
            (tmp_path / sub).mkdir()
            for t in range(4):
                cv2.imwrite(str(tmp_path / sub / f"{t:06d}.png"),
                            _img(rng, 376, 1241))
        # odometry-style calib.txt: P0..P3 3x4 rows
        with open(tmp_path / "calib.txt", "w") as f:
            P = "7.188560e+02 0 6.071928e+02 0 0 7.188560e+02 " \
                "1.852157e+02 0 0 0 1 0"
            for k in ("P0", "P1", "P2", "P3"):
                f.write(f"{k}: {P}\n")
        return str(tmp_path)

    def test_mono(self, kitti_dir):
        frames = list(streams.kitti_stream(kitti_dir, stride=2))
        assert len(frames) == 2
        t, img, intr = frames[0]
        assert img.shape[0] % 8 == 0 and img.shape[1] % 8 == 0
        np.testing.assert_allclose(
            intr, [718.856, 718.856, 607.1928, 185.2157], rtol=1e-5)

    def test_stereo(self, kitti_dir):
        frames = list(streams.kitti_stream(kitti_dir, stereo=True))
        assert len(frames) == 4
        t, left, right, intr = frames[0]
        assert left.shape == right.shape

    def test_factory_dispatch(self, kitti_dir):
        frames = list(create_stream(kitti_dir))
        assert len(frames) == 4


class TestTartanStream:
    def test_stream_and_dispatch(self, tmp_path):
        rng = np.random.default_rng(6)
        (tmp_path / "image_left").mkdir()
        for t in range(3):
            cv2.imwrite(str(tmp_path / "image_left" / f"{t:06d}.png"),
                        _img(rng, 480, 640))
        frames = list(create_stream(str(tmp_path)))
        assert len(frames) == 3
        t, img, intr = frames[0]
        assert img.shape == (480, 640, 3)
        np.testing.assert_allclose(intr, [320.0, 320.0, 320.0, 240.0])
