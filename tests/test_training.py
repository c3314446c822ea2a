"""Training pipeline tests: synthetic TartanAir scene → dataset reader →
covisibility graph → data-parallel train step → loss decreases.
"""

import numpy as np
import pytest

from droid_slam_tpu.data import synthetic


@pytest.fixture(scope="module")
def tartan_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("tartan")
    data = synthetic.write_tartanair_scene(
        str(root), n_frames=8, H=64, W=96, seed=0
    )
    return str(root), data


class TestSyntheticScene:
    def test_render_consistency(self, tartan_dir):
        """Rendered depth + poses must satisfy the projective transform:
        warping frame 0 into frame 1 with GT geometry reproduces frame 1's
        texture (photometric check on the overlap)."""
        import jax.numpy as jnp

        from droid_slam_tpu.geom import projective
        from droid_slam_tpu.lie import se3

        _, data = tartan_dir
        poses_w2c = se3.inv(jnp.asarray(data["poses_c2w"]))
        disps = jnp.asarray(1.0 / data["depths"])
        intr = jnp.asarray(data["intrinsics"])

        coords, valid = projective.projective_transform(
            poses_w2c[None], disps[None], intr[None],
            jnp.asarray([0]), jnp.asarray([1]),
        )
        coords = np.asarray(coords[0, 0])
        valid = np.asarray(valid[0, 0, ..., 0])

        img0 = data["images"][0].astype(np.float32)
        img1 = data["images"][1].astype(np.float32)
        H, W = img0.shape[:2]

        xi = np.clip(np.round(coords[..., 0]).astype(int), 0, W - 1)
        yi = np.clip(np.round(coords[..., 1]).astype(int), 0, H - 1)
        inb = (coords[..., 0] >= 0) & (coords[..., 0] < W) \
            & (coords[..., 1] >= 0) & (coords[..., 1] < H) & (valid > 0)
        diff = np.abs(img1[yi, xi] - img0).mean(-1)
        err = diff[inb].mean()
        assert err < 12.0, err  # nearest-pixel sampling tolerance

    def test_tartan_reader_roundtrip(self, tartan_dir):
        """The TartanAir reader must undo the NED permutation and depth
        scaling exactly."""
        root, data = tartan_dir

        from droid_slam_tpu.data.tartan import TartanAir

        class SmallTartan(TartanAir):
            @staticmethod
            def calib_read():
                return data["intrinsics"][0]

            @staticmethod
            def is_test_scene(scene):
                return False

        ds = SmallTartan(root, n_frames=4, do_aug=False,
                         cache_dir=root + "/cache", fmin=0.1, fmax=1000.0)
        assert len(ds) > 0

        scene = list(ds.scene_info.keys())[0]
        poses = ds.scene_info[scene]["poses"]
        # c2w poses recovered up to the depth scale on translation
        np.testing.assert_allclose(
            poses[:, 3:], data["poses_c2w"][:, 3:], atol=1e-6
        )
        np.testing.assert_allclose(
            poses[:, :3], data["poses_c2w"][:, :3], atol=1e-6
        )

        item = ds[0]
        assert item["images"].shape[0] == 4
        assert item["disps"].shape == item["images"].shape[:3]
        # scale normalization: mean valid disparity ~ 1
        d = item["disps"]
        assert abs(d[d > 0.01].mean() - 1.0) < 1e-3


class TestTrainStep:
    def test_loss_decreases(self, tartan_dir):
        """A few steps on one synthetic batch must reduce the loss."""
        import jax
        import jax.numpy as jnp

        from droid_slam_tpu.config import TrainConfig
        from droid_slam_tpu.geom.graph_utils import temporal_graph
        from droid_slam_tpu.models.droidnet import DroidNet
        from droid_slam_tpu.training.train_step import (
            create_train_state, make_train_step,
        )

        _, data = tartan_dir
        N, H, W = 4, 64, 96
        cfg = TrainConfig(image_size=(H, W), n_frames=N, steps=100,
                          lr=2e-5)
        net = DroidNet(dtype=None)
        state, tx = create_train_state(net, cfg)

        from droid_slam_tpu.training.train_step import pad_edges

        ii, jj = temporal_graph(N, r=1)
        ii_p, jj_p, emask = pad_edges(ii, jj, 8)
        accum, apply_g = make_train_step(net, tx, iters=2)

        disps_full = 1.0 / data["depths"][:N]
        batch = dict(
            images=jnp.asarray(data["images"][:N], jnp.float32)[None],
            poses=jnp.asarray(data["poses_c2w"][:N])[None],
            disps=jnp.asarray(disps_full[:, 3::8, 3::8])[None],
            disps_full=jnp.asarray(disps_full)[None],
            intrinsics=jnp.asarray(data["intrinsics"][:N])[None],
            ii=jnp.asarray(ii_p), jj=jnp.asarray(jj_p),
            edge_mask=jnp.asarray(emask),
        )

        import jax.numpy as jnp2
        Gs0 = jnp2.zeros((1, N, 7))
        disp0 = jnp2.zeros((1, N, H // 8, W // 8))
        losses = []
        for _ in range(8):
            grads = jax.tree.map(jnp2.zeros_like, state.params["params"])
            grads, metrics = accum(grads, state.params, batch, Gs0, disp0)
            state, _ = apply_g(state, grads)
            losses.append(float(metrics["loss"]))
        assert np.all(np.isfinite(losses))
        assert np.mean(losses[-3:]) < losses[0], losses

    def test_checkpoint_roundtrip(self, tmp_path):
        import jax.numpy as jnp

        from droid_slam_tpu.config import TrainConfig
        from droid_slam_tpu.models.droidnet import DroidNet
        from droid_slam_tpu.training.train_step import create_train_state
        from droid_slam_tpu.training.trainer import (
            restore_checkpoint, save_checkpoint,
        )

        cfg = TrainConfig(image_size=(32, 32), n_frames=3, steps=10)
        net = DroidNet(dtype=None)
        state, _ = create_train_state(net, cfg)
        state = state.replace(step=jnp.asarray(7))

        path = save_checkpoint(str(tmp_path), state, 7)
        restored = restore_checkpoint(path, state)
        assert int(restored.step) == 7
        import chex
        chex.assert_trees_all_close(restored.params, state.params)


class TestLossGradientFiniteness:
    def test_padded_identity_edges_give_finite_grads(self):
        """Padded edge slots (ii == jj == 0 => exactly-identity relative
        pose => zero twist) must NOT leak NaN into the gradient: the L2
        norm's backward is 0/0 at a zero vector, and mask * NaN is still
        NaN.  Regression for the safe _norm in geom/losses."""
        import jax
        import jax.numpy as jnp

        from droid_slam_tpu.geom import losses
        from droid_slam_tpu.lie import se3

        B, N, E = 1, 4, 8
        rng = np.random.default_rng(0)
        xi = 0.1 * rng.standard_normal((B, N, 6)).astype(np.float32)
        Ps = se3.exp(jnp.asarray(xi))
        # valid edges 0..3, padded slots 4..7 (ii = jj = 0)
        ii = jnp.asarray([0, 1, 2, 0, 0, 0, 0, 0])
        jj = jnp.asarray([1, 2, 3, 2, 0, 0, 0, 0])
        emask = jnp.asarray([1, 1, 1, 1, 0, 0, 0, 0], bool)

        def f(dxi):
            Gs = se3.mul(se3.exp(dxi), Ps)
            # make the estimate EXACTLY the GT on padded/self edges:
            # relative pose identity, twist exactly zero
            loss, _ = losses.geodesic_loss(
                Ps, [Gs], ii, jj, do_scale=False, edge_mask=emask
            )
            return loss

        # dxi = 0 => estimates equal GT => every edge twist is exactly 0
        g = jax.grad(f)(jnp.zeros((B, N, 6)))
        assert np.isfinite(np.asarray(g)).all()

    def test_flow_loss_nonfinite_coords_give_finite_grads(self):
        """Non-finite reprojections on masked pixels must not poison the
        flow-loss backward pass."""
        import jax
        import jax.numpy as jnp

        from droid_slam_tpu.geom import losses
        from droid_slam_tpu.lie import se3

        B, N, h, w = 1, 3, 8, 12
        rng = np.random.default_rng(1)
        xi = 0.05 * rng.standard_normal((B, N, 6)).astype(np.float32)
        Ps = se3.exp(jnp.asarray(xi))
        intr = jnp.tile(jnp.asarray([60.0, 60.0, 48.0, 32.0]), (B, N, 1))
        disps_gt = jnp.full((B, N, h, w), 0.5)

        def f(d):
            # negative/zero disparities => degenerate depths inside the
            # projective transform
            loss, _ = losses.flow_loss(
                Ps, disps_gt, [Ps], [d], intr
            )
            return loss

        d0 = jnp.asarray(
            rng.uniform(-0.5, 0.5, (B, N, h, w)).astype(np.float32)
        )
        g = jax.grad(f)(d0)
        assert np.isfinite(np.asarray(g)).all()
