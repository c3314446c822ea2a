"""Tests for depth filtering, back-projection, and PLY export."""

import jax.numpy as jnp
import numpy as np

from droid_slam_tpu.lie import se3
from droid_slam_tpu.runtime import visualization as vis


class TestDepthFilter:
    def test_consistent_depths_agree(self):
        """Identity poses + identical disparities -> every in-bounds pixel
        agrees with all 6 neighbors."""
        BUF, h, w = 10, 8, 10
        poses = jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0]), (BUF, 1))
        disps = 0.5 * jnp.ones((BUF, h, w))
        intr = jnp.asarray([10.0, 10.0, w / 2, h / 2])
        inds = jnp.asarray([4, 5])
        thresh = 0.1 * jnp.ones((2,))
        count = vis.depth_filter(poses, disps, intr, inds, thresh)
        # interior pixels see all 6 neighbors agreeing
        assert float(count[:, 2:-2, 2:-2].min()) == 6.0

    def test_inconsistent_depth_rejected(self):
        BUF, h, w = 10, 8, 10
        poses = jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0]), (BUF, 1))
        disps = 0.5 * jnp.ones((BUF, h, w))
        disps = disps.at[4].set(5.0)   # frame 4 wildly different
        intr = jnp.asarray([10.0, 10.0, w / 2, h / 2])
        count = vis.depth_filter(
            poses, disps, intr, jnp.asarray([4]), jnp.asarray([0.01])
        )
        assert float(count.max()) == 0.0


class TestIproj:
    def test_identity_backprojection(self):
        h, w = 6, 8
        disps = 0.5 * jnp.ones((1, h, w))   # depth 2
        intr = jnp.asarray([8.0, 8.0, w / 2, h / 2])
        pts = np.asarray(vis.iproj_points(se3.identity((1,)), disps, intr))
        np.testing.assert_allclose(pts[0, :, :, 2], 2.0, atol=1e-5)
        # center pixel maps near the optical axis
        np.testing.assert_allclose(pts[0, 3, 4, :2], 0.0, atol=1e-5)


class TestExport:
    def test_ply_export(self, tmp_path):
        from droid_slam_tpu.config import SLAMConfig
        from droid_slam_tpu.runtime.state import DepthVideo

        cfg = SLAMConfig(image_size=(32, 40), buffer=8)
        video = DepthVideo(cfg)
        rng = np.random.default_rng(0)
        for t in range(4):
            video.append(
                t, jnp.asarray(rng.integers(0, 255, (32, 40, 3)), jnp.uint8),
                jnp.asarray([0, 0, 0.01 * t, 0, 0, 0, 1.0]),
                0.5, None, jnp.asarray([8.0, 8, 20, 16]) / 8.0,
                jnp.zeros((1, 4, 5, 128), jnp.bfloat16),
                jnp.zeros((4, 5, 128)), jnp.zeros((4, 5, 128)),
            )
        out = tmp_path / "map.ply"
        n = vis.export_point_cloud(video, str(out), filter_thresh=10.0,
                                   min_count=1)
        assert out.exists()
        head = out.read_text().splitlines()
        assert head[0] == "ply"
        assert n > 0


class TestLiveViewer:
    def test_viewer_serves_page_and_map(self):
        """Live WebGL viewer: page + binary snapshot endpoint round-trip
        (role of the reference's Open3D visualization process,
        visualization.py:53-154)."""
        import struct
        import urllib.request

        import jax.numpy as jnp

        from droid_slam_tpu.config import SLAMConfig
        from droid_slam_tpu.runtime.state import DepthVideo
        from droid_slam_tpu.runtime.viewer import start_viewer

        cfg = SLAMConfig(image_size=(32, 40), buffer=8)
        video = DepthVideo(cfg)
        rng = np.random.default_rng(0)
        for t in range(4):
            video.append(
                t, jnp.asarray(rng.integers(0, 255, (32, 40, 3)),
                               jnp.uint8),
                jnp.asarray([0, 0, 0.01 * t, 0, 0, 0, 1.0]),
                0.5, None, jnp.asarray([8.0, 8, 20, 16]) / 8.0,
                jnp.zeros((1, 4, 5, 128), jnp.bfloat16),
                jnp.zeros((4, 5, 128)), jnp.zeros((4, 5, 128)),
            )
        viewer = start_viewer(video, port=0, filter_thresh=10.0,
                              min_count=1)
        try:
            base = f"http://127.0.0.1:{viewer.port}"
            page = urllib.request.urlopen(f"{base}/", timeout=10).read()
            assert b"<html" in page and b"map.bin" in page

            raw = urllib.request.urlopen(f"{base}/map.bin",
                                         timeout=30).read()
            n_pts, n_cams = struct.unpack_from("<ii", raw, 0)
            assert n_cams == 4
            assert n_pts > 0
            off = 8
            pts = np.frombuffer(raw, np.float32, n_pts * 3, off)
            off += n_pts * 12
            col = np.frombuffer(raw, np.uint8, n_pts * 3, off)
            off += n_pts * 3
            off += (4 - off % 4) % 4
            cams = np.frombuffer(raw, np.float32, n_cams * 7, off)
            assert np.isfinite(pts).all()
            assert np.isfinite(cams).all()
            assert col.size == n_pts * 3
        finally:
            viewer.close()
