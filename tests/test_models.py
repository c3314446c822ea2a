"""Tests for the network layer: encoders, GRU, update operator, upsampling,
weight conversion, and the unrolled training forward."""

import jax
import jax.numpy as jnp
import numpy as np

from droid_slam_tpu.lie import se3
from droid_slam_tpu.models.convert import convert_state_dict
from droid_slam_tpu.models.droidnet import DroidNet
from droid_slam_tpu.models.extractor import BasicEncoder
from droid_slam_tpu.models.layers import grad_clip
from droid_slam_tpu.models.update import UpdateModule, cvx_upsample


class TestEncoder:
    def test_output_shape_eighth_resolution(self):
        enc = BasicEncoder(output_dim=128, norm_fn="instance", dtype=None)
        x = jnp.zeros((2, 64, 96, 3))
        params = enc.init(jax.random.PRNGKey(0), x)
        y = enc.apply(params, x)
        assert y.shape == (2, 8, 12, 128)

    def test_leading_dims_preserved(self):
        enc = BasicEncoder(output_dim=64, norm_fn="none", dtype=None)
        x = jnp.zeros((2, 3, 32, 32, 3))
        params = enc.init(jax.random.PRNGKey(0), x)
        y = enc.apply(params, x)
        assert y.shape == (2, 3, 4, 4, 64)


class TestUpdateModule:
    def _init(self, E=4, H=6, W=8):
        mod = UpdateModule(dtype=None)
        args = (
            jnp.zeros((E, H, W, 128)),
            jnp.zeros((E, H, W, 128)),
            jnp.zeros((E, H, W, 196)),
            jnp.zeros((E, H, W, 4)),
        )
        params = mod.init(jax.random.PRNGKey(0), *args)
        return mod, params, args

    def test_shapes_no_agg(self):
        mod, params, args = self._init()
        net, delta, weight = mod.apply(params, *args)
        assert net.shape == (4, 6, 8, 128)
        assert delta.shape == (4, 6, 8, 2)
        assert weight.shape == (4, 6, 8, 2)
        assert float(weight.min()) >= 0 and float(weight.max()) <= 1

    def test_shapes_with_agg(self):
        mod = UpdateModule(dtype=None)
        E, H, W = 4, 6, 8
        args = (
            jnp.zeros((E, H, W, 128)),
            jnp.zeros((E, H, W, 128)),
            jnp.zeros((E, H, W, 196)),
            jnp.zeros((E, H, W, 4)),
        )
        ix = jnp.asarray([0, 0, 1, 1])
        params = mod.init(jax.random.PRNGKey(0), *args, ix=ix, nseg=2)
        net, delta, weight, eta, upmask = mod.apply(
            params, *args, ix=ix, nseg=2
        )
        assert eta.shape == (2, H, W)
        assert float(eta.min()) >= 0  # softplus-scaled damping
        assert upmask.shape == (2, H, W, 576)


class TestGradClip:
    def test_zeroes_large_grads(self):
        g = jax.grad(lambda x: jnp.sum(grad_clip(x * 100.0)))(jnp.ones(4))
        # d/dx sum(100x) = 100 > 0.01 -> clipped to 0
        np.testing.assert_allclose(np.asarray(g), 0.0)

    def test_passes_small_grads(self):
        # cotangent arriving at the clip node is 0.001 <= GRAD_CLIP -> passes
        g = jax.grad(lambda x: jnp.sum(grad_clip(x) * 0.001))(jnp.ones(4))
        np.testing.assert_allclose(np.asarray(g), 0.001, rtol=1e-6)


class TestCvxUpsample:
    def test_constant_field_preserved(self):
        """Softmax-convex combination of a constant field is the constant."""
        rng = np.random.default_rng(0)
        data = jnp.ones((1, 4, 5, 1)) * 3.25
        mask = jnp.asarray(rng.standard_normal((1, 4, 5, 576)), jnp.float32)
        up = cvx_upsample(data, mask)
        assert up.shape == (1, 32, 40, 1)
        # interior pixels (border taps see zero padding)
        np.testing.assert_allclose(np.asarray(up[0, 8:-8, 8:-8, 0]), 3.25,
                                   rtol=1e-5)


class TestConverter:
    def _fake_torch_sd(self):
        """Random reference-shaped state dict (keys as in droid.pth)."""
        rng = np.random.default_rng(0)
        sd = {}

        def add_conv(name, cin, cout, k):
            sd[f"{name}.weight"] = rng.standard_normal(
                (cout, cin, k, k)).astype(np.float32)
            sd[f"{name}.bias"] = rng.standard_normal(cout).astype(np.float32)

        for prefix, od in [("fnet", 128), ("cnet", 256)]:
            add_conv(f"{prefix}.conv1", 3, 32, 7)
            add_conv(f"{prefix}.conv2", 128, od, 1)
            cin = 32
            for stage, planes in [(1, 32), (2, 64), (3, 128)]:
                for blk in (0, 1):
                    bp = f"{prefix}.layer{stage}.{blk}"
                    c_in = cin if blk == 0 else planes
                    add_conv(f"{bp}.conv1", c_in, planes, 3)
                    add_conv(f"{bp}.conv2", planes, planes, 3)
                    if blk == 0 and stage > 1:
                        add_conv(f"{bp}.downsample.0", cin, planes, 1)
                cin = planes

        add_conv("update.corr_encoder.0", 196, 128, 1)
        add_conv("update.corr_encoder.2", 128, 128, 3)
        add_conv("update.flow_encoder.0", 4, 128, 7)
        add_conv("update.flow_encoder.2", 128, 64, 3)
        add_conv("update.weight.0", 128, 128, 3)
        add_conv("update.weight.2", 128, 3, 3)   # 3 channels: truncated to 2
        add_conv("update.delta.0", 128, 128, 3)
        add_conv("update.delta.2", 128, 3, 3)
        for g in ["convz", "convr", "convq"]:
            add_conv(f"update.gru.{g}", 128 + 320, 128, 3)
            add_conv(f"update.gru.{g}_glo", 128, 128, 1)
        add_conv("update.gru.w", 128, 128, 1)
        add_conv("update.agg.conv1", 128, 128, 3)
        add_conv("update.agg.conv2", 128, 128, 3)
        add_conv("update.agg.eta.0", 128, 1, 3)
        add_conv("update.agg.upmask.0", 128, 576, 1)
        return sd

    def test_converted_tree_matches_model(self):
        import chex

        sd = self._fake_torch_sd()
        params = convert_state_dict(sd)

        model = DroidNet(dtype=None)
        B, N, H, W = 1, 3, 32, 32
        ii = np.array([0, 1, 1, 2])
        jj = np.array([1, 0, 2, 1])
        init = model.init(
            jax.random.PRNGKey(0),
            se3.identity((B, N)),
            jnp.zeros((B, N, H, W, 3)),
            jnp.ones((B, N, H // 8, W // 8)) ,
            jnp.asarray([[[8.0, 8, 4, 4]] * N]),
            ii, jj, num_steps=1,
        )
        chex.assert_trees_all_equal_shapes(init["params"], params["params"])

    def test_npz_roundtrip(self, tmp_path):
        from droid_slam_tpu.models.convert import (
            load_weights, save_npz_weights,
        )

        params = convert_state_dict(self._fake_torch_sd())
        path = str(tmp_path / "w.npz")
        n = save_npz_weights(params, path)
        assert n > 0
        back = load_weights(path)

        flat0 = jax.tree_util.tree_leaves_with_path(params["params"])
        flat1 = jax.tree_util.tree_leaves_with_path(back["params"])
        assert len(flat0) == len(flat1)
        for (p0, a0), (p1, a1) in zip(flat0, flat1):
            assert p0 == p1
            np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))


class TestTrainingForward:
    def test_unrolled_forward_runs(self):
        model = DroidNet(dtype=None)
        rng = np.random.default_rng(0)
        B, N, H, W = 1, 3, 32, 48
        images = jnp.asarray(rng.integers(0, 255, (B, N, H, W, 3)),
                             jnp.float32)
        Gs = se3.identity((B, N))
        disps = jnp.ones((B, N, H // 8, W // 8))
        intr = jnp.asarray(np.tile([[12.0, 12, W / 16, H / 16]], (N, 1))[None],
                           jnp.float32)
        ii = np.array([0, 1, 1, 2])
        jj = np.array([1, 0, 2, 1])

        params = model.init(jax.random.PRNGKey(0), Gs, images, disps, intr,
                            ii, jj, num_steps=1)
        Gs_list, disp_list, res_list = model.apply(
            params, Gs, images, disps, intr, ii, jj, num_steps=2
        )
        assert len(Gs_list) == 2
        assert Gs_list[0].shape == (B, N, 7)
        assert disp_list[0].shape == (B, N, H, W)
        assert res_list[0].shape == (B, 4, H // 8, W // 8, 2)
        for x in (Gs_list[-1], disp_list[-1], res_list[-1]):
            assert np.all(np.isfinite(np.asarray(x)))
