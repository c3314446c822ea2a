"""End-to-end droid.pth import dry run.

Builds a torch nn.Module tree with the reference checkpoint's exact
layer composition (so the state_dict key names and tensor shapes come
from real module registration, not a hand-maintained list), saves a
genuine ``.pth`` with the DDP ``module.`` prefix and the 3-channel
weight/delta heads the published droid.pth carries, and drives
``models/convert.load_weights`` -> runtime ``Droid`` tracking on it.
This is the test that catches layout drift the day a real droid.pth
shows up.

Reference layout: /root/reference/droid_slam/droid_net.py:43-151
(GraphAgg/UpdateModule/DroidNet), modules/extractor.py:5-56,116-145
(ResidualBlock/BasicEncoder), modules/gru.py:5-17 (ConvGRU), and the
load-time head truncation in droid.py:45-58.
"""

import numpy as np
import pytest

import jax

pytest.importorskip("torch")
import torch  # noqa: E402
import torch.nn as nn  # noqa: E402

from droid_slam_tpu.models.convert import load_weights  # noqa: E402


def _residual_block(cin, planes, stride=1):
    """Reference ResidualBlock key surface (extractor.py:5-56): conv1,
    conv2, optional downsample.0; instance/none norms register no
    parameters (affine=False), so plain Identity keeps keys identical."""
    blk = nn.Module()
    blk.conv1 = nn.Conv2d(cin, planes, 3, padding=1, stride=stride)
    blk.conv2 = nn.Conv2d(planes, planes, 3, padding=1)
    if stride > 1:
        blk.downsample = nn.Sequential(nn.Conv2d(cin, planes, 1, stride=stride))
    return blk


def _basic_encoder(output_dim):
    """BasicEncoder key surface (extractor.py:116-145): conv1, layer1-3
    of two blocks each (stride 1,2,2), conv2."""
    enc = nn.Module()
    enc.conv1 = nn.Conv2d(3, 32, 7, stride=2, padding=3)
    enc.layer1 = nn.Sequential(_residual_block(32, 32), _residual_block(32, 32))
    enc.layer2 = nn.Sequential(_residual_block(32, 64, 2), _residual_block(64, 64))
    enc.layer3 = nn.Sequential(_residual_block(64, 128, 2), _residual_block(128, 128))
    enc.conv2 = nn.Conv2d(128, output_dim, 1)
    return enc


def _update_module():
    """UpdateModule key surface (droid_net.py:79-111) with the
    PUBLISHED checkpoint's 3-channel weight.2/delta.2 heads that
    droid.py:53-56 truncates to 2 at load time."""
    upd = nn.Module()
    cor_planes = 4 * (2 * 3 + 1) ** 2  # 196
    upd.corr_encoder = nn.Sequential(
        nn.Conv2d(cor_planes, 128, 1), nn.ReLU(), nn.Conv2d(128, 128, 3, padding=1)
    )
    upd.flow_encoder = nn.Sequential(
        nn.Conv2d(4, 128, 7, padding=3), nn.ReLU(), nn.Conv2d(128, 64, 3, padding=1)
    )
    upd.weight = nn.Sequential(
        nn.Conv2d(128, 128, 3, padding=1), nn.ReLU(), nn.Conv2d(128, 3, 3, padding=1)
    )
    upd.delta = nn.Sequential(
        nn.Conv2d(128, 128, 3, padding=1), nn.ReLU(), nn.Conv2d(128, 3, 3, padding=1)
    )
    gru = nn.Module()
    for g in ("convz", "convr", "convq"):
        setattr(gru, g, nn.Conv2d(128 + 320, 128, 3, padding=1))
        setattr(gru, f"{g}_glo", nn.Conv2d(128, 128, 1))
    gru.w = nn.Conv2d(128, 128, 1)
    upd.gru = gru
    agg = nn.Module()
    agg.conv1 = nn.Conv2d(128, 128, 3, padding=1)
    agg.conv2 = nn.Conv2d(128, 128, 3, padding=1)
    agg.eta = nn.Sequential(nn.Conv2d(128, 1, 3, padding=1))
    agg.upmask = nn.Sequential(nn.Conv2d(128, 8 * 8 * 9, 1))
    upd.agg = agg
    return upd


def make_droid_pth(path, seed=0):
    """Write a reference-layout droid.pth (random weights, module.
    DDP prefix) and return its (unprefixed) key set."""
    torch.manual_seed(seed)
    net = nn.Module()
    net.fnet = _basic_encoder(128)
    net.cnet = _basic_encoder(256)
    net.update = _update_module()
    sd = net.state_dict()
    torch.save({f"module.{k}": v for k, v in sd.items()}, path)
    return set(sd.keys())


EXPECTED_HEAD_SHAPES = {
    "update.weight.2.weight": (3, 128, 3, 3),
    "update.delta.2.weight": (3, 128, 3, 3),
    "update.agg.upmask.0.weight": (576, 128, 1, 1),
    "fnet.conv1.weight": (32, 3, 7, 7),
    "cnet.conv2.weight": (256, 128, 1, 1),
    "fnet.layer2.0.downsample.0.weight": (64, 32, 1, 1),
}


class TestPthImport:
    @pytest.fixture(scope="class")
    def pth(self, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("ckpt") / "droid.pth")
        keys = make_droid_pth(path)
        return path, keys

    def test_layout_matches_published_inventory(self, pth):
        """The torch-built state_dict must contain the spot-check keys
        and shapes known from the published droid.pth."""
        _, keys = pth
        for k, shape in EXPECTED_HEAD_SHAPES.items():
            assert k in keys, k
        # per-encoder: conv1+conv2 (2) + 6 blocks * conv1+conv2 (12)
        # + 2 downsamples = 16 convs -> 32 tensors; update: 8 seq convs
        # + 7 gru convs + 4 agg convs = 19 convs -> 38 tensors
        assert len(keys) == 2 * 32 + 38

    def test_load_weights_matches_model_tree(self, pth):
        """Converted .pth tree must exactly shape-match DroidNet.init."""
        import chex
        import jax.numpy as jnp

        from droid_slam_tpu.lie import se3
        from droid_slam_tpu.models.droidnet import DroidNet

        path, _ = pth
        params = load_weights(path)

        model = DroidNet(dtype=None)
        B, N, H, W = 1, 3, 32, 32
        ii = np.array([0, 1, 1, 2])
        jj = np.array([1, 0, 2, 1])
        init = model.init(
            jax.random.PRNGKey(0),
            se3.identity((B, N)),
            jnp.zeros((B, N, H, W, 3)),
            jnp.ones((B, N, H // 8, W // 8)),
            jnp.asarray([[[8.0, 8, 4, 4]] * N]),
            ii, jj, num_steps=1,
        )
        chex.assert_trees_all_equal_shapes(init["params"], params["params"])

        # the 3->2 head truncation happened (droid.py:53-56 semantics)
        upd = params["params"]["update"]
        assert upd["weight_2"]["kernel"].shape[-1] == 2
        assert upd["delta_2"]["kernel"].shape[-1] == 2
        assert upd["weight_2"]["bias"].shape == (2,)

    def test_droid_tracks_on_pth(self, pth):
        """Runtime Droid built straight from the .pth ingests frames and
        produces finite, unit-quaternion poses."""
        from droid_slam_tpu.config import SLAMConfig
        from droid_slam_tpu.runtime.slam import Droid

        path, _ = pth
        cfg = SLAMConfig(
            image_size=(64, 96), buffer=8, filter_thresh=0.0,
            frontend_window=4, frontend_iters1=1, frontend_iters2=1,
            warmup=3, keyframe_thresh=0.0, frontend_edge_cap=64,
            frontend_pose_cap=8, frontend_depth_cap=8, schur_degree_cap=16,
        )
        droid = Droid(cfg, weights_path=path)
        rng = np.random.default_rng(0)
        for t in range(4):
            image = rng.integers(0, 255, (64, 96, 3)).astype(np.uint8)
            intr = np.array([48.0, 48.0, 48.0, 32.0], np.float32)
            droid.track(t, image, intrinsics=intr)
        poses = np.asarray(droid.video.state.poses[: droid.video.counter])
        assert np.isfinite(poses).all()
        qn = np.linalg.norm(poses[:, 3:7], axis=-1)
        np.testing.assert_allclose(qn, 1.0, atol=1e-5)
