"""Tests for correlation volumes and lookups (volume + alt paths)."""

import jax.numpy as jnp
import pytest
import numpy as np

from droid_slam_tpu.ops import corr


class TestVolume:
    def test_volume_values(self):
        rng = np.random.default_rng(0)
        f1 = jnp.asarray(rng.standard_normal((1, 2, 4, 5, 8)), jnp.float32)
        f2 = jnp.asarray(rng.standard_normal((1, 2, 4, 5, 8)), jnp.float32)
        vol = corr.corr_volume(f1, f2)
        assert vol.shape == (1, 2, 4, 5, 4, 5)
        expect = np.einsum(
            "bnhwc,bnijc->bnhwij", np.asarray(f1) / 4, np.asarray(f2) / 4
        )
        np.testing.assert_allclose(np.asarray(vol), expect, atol=1e-4)

    def test_pyramid_shapes(self):
        vol = jnp.zeros((1, 1, 8, 8, 8, 8))
        pyr = corr.build_pyramid(vol)
        assert [p.shape[-2:] for p in pyr] == [(8, 8), (4, 4), (2, 2), (1, 1)]


class TestLookup:
    def test_integer_coords_center_tap(self):
        """At integer coords the center tap must equal the volume entry."""
        rng = np.random.default_rng(1)
        vol = jnp.asarray(rng.standard_normal((1, 1, 4, 4, 6, 7)), jnp.float32)
        r = 1
        # coords at (3, 2) for every source pixel
        coords = jnp.broadcast_to(
            jnp.asarray([3.0, 2.0]), (1, 1, 4, 4, 2)
        )
        taps = corr.lookup_level(vol, coords, radius=r)
        rd = 2 * r + 1
        center = taps[..., (rd * rd) // 2]
        np.testing.assert_allclose(
            np.asarray(center), np.asarray(vol[..., 2, 3]), atol=1e-5
        )
        # tap channel ordering: channel 0 = offset (-1,-1) => volume[1,2]
        np.testing.assert_allclose(
            np.asarray(taps[..., 0]), np.asarray(vol[..., 1, 2]), atol=1e-5
        )

    def test_bilinear_interpolation(self):
        vol = jnp.zeros((1, 1, 1, 1, 4, 4)).at[0, 0, 0, 0, 1, 1].set(1.0)
        coords = jnp.asarray([[[[[0.5, 0.5]]]]])
        taps = corr.lookup_level(vol, coords, radius=1)
        # center tap samples at (0.5, 0.5): 0.25 weight on (1,1)
        np.testing.assert_allclose(float(taps[0, 0, 0, 0, 4]), 0.25, atol=1e-5)

    def test_out_of_bounds_zero(self):
        vol = jnp.ones((1, 1, 2, 2, 4, 4))
        coords = jnp.broadcast_to(jnp.asarray([-10.0, -10.0]), (1, 1, 2, 2, 2))
        taps = corr.lookup_level(vol, coords, radius=2)
        np.testing.assert_allclose(np.asarray(taps), 0.0)

    def test_pyramid_output_channels(self):
        rng = np.random.default_rng(2)
        vol = jnp.asarray(rng.standard_normal((1, 2, 4, 4, 8, 8)), jnp.float32)
        pyr = corr.build_pyramid(vol)
        coords = jnp.asarray(
            rng.uniform(0, 7, (1, 2, 4, 4, 2)), jnp.float32
        )
        out = corr.lookup_pyramid(pyr, coords, radius=3)
        assert out.shape == (1, 2, 4, 4, 196)


class TestLookupVariants:
    """All lookup formulations (gather / patch / one-hot matmul) must
    agree — they are interchangeable backends for the same op."""

    @pytest.mark.parametrize("impl_name", ["patch", "onehot"])
    def test_matches_gather_reference(self, impl_name):
        rng = np.random.default_rng(7)
        B, N, H, W, h2, w2 = 1, 3, 5, 6, 9, 11
        vol = jnp.asarray(
            rng.standard_normal((B, N, H, W, h2, w2)), jnp.float32
        )
        # include out-of-bounds and negative coordinates
        coords = jnp.asarray(
            rng.uniform(-4, 14, (B, N, H, W, 2)), jnp.float32
        )
        expect = corr.lookup_level(vol, coords, radius=3)
        impl = {
            "patch": corr.lookup_level_patch,
            "onehot": corr.lookup_level_onehot,
        }[impl_name]
        got = impl(vol, coords, radius=3)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expect), atol=1e-4, rtol=1e-4
        )


class TestAltCorr:
    def test_matches_volume_lookup_level0(self):
        """At level 0 the alt path must equal the volume path exactly."""
        rng = np.random.default_rng(3)
        E, H, W, C = 2, 4, 5, 8
        f1 = jnp.asarray(rng.standard_normal((1, E, H, W, C)), jnp.float32)
        f2 = jnp.asarray(rng.standard_normal((1, E, H, W, C)), jnp.float32)

        vol = corr.corr_volume(f1, f2)
        coords = jnp.asarray(rng.uniform(0, 4, (1, E, H, W, 2)), jnp.float32)
        taps_vol = corr.lookup_level(vol, coords, radius=2)

        pyr2 = corr.fmap_pyramid(f2[0], num_levels=1)
        taps_alt = corr.alt_lookup_level(
            f1[0] / 4.0, pyr2[0], coords[0], radius=2
        )
        # the alt path stores its on-the-fly volume in bf16 (intentional,
        # matches the reference's fp16 feature buffers) -> bf16 tolerance
        np.testing.assert_allclose(
            np.asarray(taps_vol[0]), np.asarray(taps_alt),
            atol=0.02, rtol=0.02,
        )

    def test_full_pyramid_shape(self):
        rng = np.random.default_rng(4)
        E, H, W, C = 2, 8, 8, 16
        f1 = jnp.asarray(rng.standard_normal((E, H, W, C)), jnp.float32)
        f2 = jnp.asarray(rng.standard_normal((E, H, W, C)), jnp.float32)
        pyr2 = corr.fmap_pyramid(f2)
        coords = jnp.asarray(rng.uniform(0, 7, (E, H, W, 2)), jnp.float32)
        out = corr.alt_lookup_pyramid(f1 / 4.0, pyr2, coords)
        assert out.shape == (E, H, W, 196)


class TestPixelChunkedAltCorr:
    def test_pixel_chunk_matches_unchunked(self):
        """The low-memory pixel-blocked alt-corr must equal the
        full-volume formulation bit-for-bit (VERDICT r1 #4)."""
        rng = np.random.default_rng(0)
        E, H, W, C = 3, 8, 12, 32
        f1 = jnp.asarray(rng.standard_normal((E, H, W, C)), jnp.float32)
        f2 = [
            jnp.asarray(rng.standard_normal((E, H // s, W // s, C)),
                        jnp.float32)
            for s in (1, 2, 4, 8)
        ]
        coords = jnp.asarray(
            rng.uniform(-2, [W + 2, H + 2], (E, H, W, 2)), jnp.float32
        )
        full = corr.alt_lookup_pyramid(f1, f2, coords, pixel_chunk=0)
        # force chunking at every level (h2w2 threshold bypassed by
        # calling the level fn directly)
        parts = []
        for l, f2l in enumerate(f2):
            parts.append(corr.alt_lookup_level(
                f1, f2l, coords / (2.0 ** l), pixel_chunk=40
            ))
        chunked = jnp.concatenate(parts, axis=-1)
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                                   rtol=1e-5, atol=1e-5)

    def test_gate_corr_matches_alt_at_identity_grid(self):
        """The volume-free motion-gate correlation (static shifted
        reduces) must match alt_lookup_pyramid at coords0 within alt's
        bf16 volume quantization (the gate computes in f32)."""
        from droid_slam_tpu.geom import projective
        from droid_slam_tpu.runtime.state import pool_pyramid

        rng = np.random.default_rng(5)
        for (H, W, C) in [(30, 40, 16), (12, 17, 8)]:
            f1 = jnp.asarray(rng.standard_normal((1, H, W, C)),
                             jnp.float32)
            fm2 = jnp.asarray(rng.standard_normal((1, H, W, C)),
                              jnp.float32)
            pyr = list(pool_pyramid(fm2))
            coords0 = projective.coords_grid(H, W)[None]
            want = np.asarray(corr.alt_lookup_pyramid(f1, pyr, coords0))
            got = np.asarray(corr.gate_corr_pyramid(f1, pyr))
            assert got.shape == want.shape
            scale = np.abs(want).max()
            assert np.abs(got - want).max() < 0.005 * scale
