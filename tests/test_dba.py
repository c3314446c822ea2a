"""Tests for the inference-path dense bundle adjustment (ops/dba.py).

Synthetic ground-truth problems exercising the full masked/fixed-capacity
machinery: mono convergence, RGB-D priors, stereo depth-only edges, and
motion-only solves.
"""

import jax.numpy as jnp
import numpy as np

from droid_slam_tpu.lie import se3
from droid_slam_tpu.geom import projective
from droid_slam_tpu.ops import dba


def make_problem(rng, T=6, BUF=12, ht=12, wd=16, E_cap=48):
    xs = np.cumsum(0.06 * rng.standard_normal((T, 6)), axis=0)
    xs[0] = 0
    poses_gt = np.asarray(se3.exp(jnp.asarray(xs, jnp.float32)))
    poses = np.tile([0, 0, 0, 0, 0, 0, 1.0], (BUF, 1)).astype(np.float32)
    poses[:T] = poses_gt

    disps_gt = (0.6 + 0.25 * rng.random((BUF, ht, wd))).astype(np.float32)
    intr = np.tile([wd * 1.2, wd * 1.2, wd / 2, ht / 2], (BUF, 1)).astype(
        np.float32
    )

    ii, jj = np.meshgrid(np.arange(T), np.arange(T), indexing="ij")
    keep = (np.abs(ii - jj) >= 1) & (np.abs(ii - jj) <= 2)
    ii, jj = ii[keep].astype(np.int32), jj[keep].astype(np.int32)
    E = len(ii)
    assert E <= E_cap

    target, _ = projective.projective_transform(
        jnp.asarray(poses)[None], jnp.asarray(disps_gt)[None],
        jnp.asarray(intr)[None], jnp.asarray(ii), jnp.asarray(jj),
    )
    target = np.asarray(target[0])

    # pad to capacity
    ii_p = np.zeros(E_cap, np.int32)
    jj_p = np.zeros(E_cap, np.int32)
    tgt_p = np.zeros((E_cap, ht, wd, 2), np.float32)
    msk = np.zeros(E_cap, bool)
    ii_p[:E], jj_p[:E], tgt_p[:E], msk[:E] = ii, jj, target, True
    wgt = np.where(msk[:, None, None, None], 1.0, 0.0) * np.ones(
        (E_cap, ht, wd, 2), np.float32
    )
    return poses, disps_gt, intr, ii_p, jj_p, tgt_p, wgt, msk, T, BUF


class TestInferenceBA:
    def test_mono_convergence(self):
        rng = np.random.default_rng(0)
        poses_gt, disps_gt, intr, ii, jj, target, weight, mask, T, BUF = \
            make_problem(rng)
        ht, wd = disps_gt.shape[-2:]

        # anchor TWO poses: a single anchor leaves the monocular scale
        # gauge free (translations recover only up to scale)
        noise = 0.02 * rng.standard_normal((BUF, 6)).astype(np.float32)
        noise[:2] = 0
        noise[T:] = 0   # don't perturb unused buffer slots
        poses = np.asarray(se3.retr(jnp.asarray(poses_gt), jnp.asarray(noise)))
        disps = np.ones_like(disps_gt)

        t0, t1 = 2, T
        K, D = 16, 24
        kx, kmask, table = dba.build_schur_tables(ii, mask, t0, t1, K, D)
        eta = 1e-4 * np.ones((BUF, ht, wd), np.float32)

        p, d = jnp.asarray(poses), jnp.asarray(disps)
        for _ in range(8):
            p, d = dba.ba(
                p, d, jnp.zeros_like(d), jnp.asarray(intr),
                jnp.asarray(target), jnp.asarray(weight), jnp.asarray(eta),
                jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(mask),
                jnp.asarray(kx), jnp.asarray(kmask), jnp.asarray(table),
                t0, t1, iters=2, lm=1e-4, ep=0.1, P=16,
            )

        err = np.asarray(
            se3.log(se3.mul(p[:T], se3.inv(jnp.asarray(poses_gt[:T]))))
        )
        assert np.abs(err).max() < 5e-3
        assert float(jnp.abs(d[1:T] - disps_gt[1:T]).mean()) < 5e-2
        # untouched buffer slots keep their values
        np.testing.assert_allclose(np.asarray(p[T:]), poses_gt[T:], atol=1e-6)

    def test_rgbd_prior_pulls_depth(self):
        """With disps_sens set, depth converges toward the sensor values
        even with uninformative targets (droid_kernels.cu:1396-1399)."""
        rng = np.random.default_rng(1)
        poses_gt, disps_gt, intr, ii, jj, target, weight, mask, T, BUF = \
            make_problem(rng)
        ht, wd = disps_gt.shape[-2:]
        t0, t1 = 1, T
        kx, kmask, table = dba.build_schur_tables(ii, mask, t0, t1, 16, 24)
        eta = 1e-4 * np.ones((BUF, ht, wd), np.float32)
        sens = disps_gt * 1.5   # sensor says: disparity should be 1.5x

        p, d = jnp.asarray(poses_gt), jnp.asarray(disps_gt)
        # zero weights: only the prior acts
        zero_w = jnp.zeros_like(jnp.asarray(weight))
        for _ in range(6):
            p, d = dba.ba(
                p, d, jnp.asarray(sens), jnp.asarray(intr),
                jnp.asarray(target), zero_w, jnp.asarray(eta),
                jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(mask),
                jnp.asarray(kx), jnp.asarray(kmask), jnp.asarray(table),
                t0, t1, iters=2, P=16,
            )
        gap0 = np.abs(disps_gt[1:T] - sens[1:T]).mean()
        gap1 = float(jnp.abs(d[1:T] - sens[1:T]).mean())
        assert gap1 < 0.05 * gap0

    def test_stereo_edge_fixes_scale(self):
        """A single ii==jj (stereo) edge updates depth toward the baseline-
        induced disparity but leaves poses untouched."""
        rng = np.random.default_rng(2)
        BUF, ht, wd = 4, 12, 16
        poses = np.tile([0, 0, 0, 0, 0, 0, 1.0], (BUF, 1)).astype(np.float32)
        intr = np.tile([wd * 1.2, wd * 1.2, wd / 2, ht / 2], (BUF, 1)).astype(
            np.float32
        )
        disps_gt = (0.6 + 0.25 * rng.random((BUF, ht, wd))).astype(np.float32)

        ii = np.asarray([1], np.int32)
        jj = np.asarray([1], np.int32)
        mask = np.asarray([True])
        target, _ = projective.projective_transform(
            jnp.asarray(poses)[None], jnp.asarray(disps_gt)[None],
            jnp.asarray(intr)[None], jnp.asarray(ii), jnp.asarray(jj),
        )
        target = np.asarray(target[0])
        weight = np.ones((1, ht, wd, 2), np.float32)

        t0, t1 = 1, 2
        kx, kmask, table = dba.build_schur_tables(ii, mask, t0, t1, 4, 4)
        eta = 1e-5 * np.ones((BUF, ht, wd), np.float32)

        p, d = jnp.asarray(poses), jnp.asarray(0.9 * disps_gt)
        for _ in range(10):
            p, d = dba.ba(
                p, d, jnp.zeros_like(d), jnp.asarray(intr),
                jnp.asarray(target), jnp.asarray(weight), jnp.asarray(eta),
                jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(mask),
                jnp.asarray(kx), jnp.asarray(kmask), jnp.asarray(table),
                t0, t1, iters=2, P=4,
            )
        # poses unchanged (stereo edges carry no pose information)
        np.testing.assert_allclose(np.asarray(p), poses, atol=1e-5)
        # depth recovered
        assert float(jnp.abs(d[1] - disps_gt[1]).mean()) < 1e-2

    def test_motion_only(self):
        rng = np.random.default_rng(3)
        poses_gt, disps_gt, intr, ii, jj, target, weight, mask, T, BUF = \
            make_problem(rng)
        noise = 0.02 * rng.standard_normal((BUF, 6)).astype(np.float32)
        noise[:1] = 0
        poses = np.asarray(se3.retr(jnp.asarray(poses_gt), jnp.asarray(noise)))

        t0, t1 = 1, T
        kx, kmask, table = dba.build_schur_tables(ii, mask, t0, t1, 16, 24)
        eta = 1e-4 * np.ones((BUF,) + disps_gt.shape[-2:], np.float32)

        p = jnp.asarray(poses)
        d0 = jnp.asarray(disps_gt)
        for _ in range(8):
            p, d = dba.ba(
                p, d0, jnp.zeros_like(d0), jnp.asarray(intr),
                jnp.asarray(target), jnp.asarray(weight), jnp.asarray(eta),
                jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(mask),
                jnp.asarray(kx), jnp.asarray(kmask), jnp.asarray(table),
                t0, t1, iters=2, motion_only=True, P=16,
            )
            assert d is d0 or np.allclose(np.asarray(d), np.asarray(d0))

        err = np.asarray(
            se3.log(se3.mul(p[:T], se3.inv(jnp.asarray(poses_gt[:T]))))
        )
        assert np.abs(err).max() < 5e-3


class TestChunkedLinearize:
    def test_chunked_matches_direct(self, monkeypatch):
        """The edge-chunked linearization path (used when E > LIN_CHUNK,
        i.e. large global-BA graphs) must produce the same BA result as
        the direct path."""
        import jax

        rng = np.random.default_rng(7)
        poses_gt, disps_gt, intr, ii, jj, target, weight, mask, T, BUF = \
            make_problem(rng)
        ht, wd = disps_gt.shape[-2:]
        noise = 0.02 * rng.standard_normal((BUF, 6)).astype(np.float32)
        noise[:2] = 0
        poses = np.asarray(se3.retr(jnp.asarray(poses_gt),
                                    jnp.asarray(noise)))
        disps = np.ones_like(disps_gt)
        t0, t1 = 2, T
        K, D = 16, 24
        kx, kmask, table = dba.build_schur_tables(ii, mask, t0, t1, K, D)
        eta = 1e-4 * np.ones((BUF, ht, wd), np.float32)

        args = (
            jnp.asarray(poses), jnp.asarray(disps),
            jnp.zeros_like(jnp.asarray(disps)), jnp.asarray(intr),
            jnp.asarray(target), jnp.asarray(weight), jnp.asarray(eta),
            jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(mask),
            jnp.asarray(kx), jnp.asarray(kmask), jnp.asarray(table),
            t0, t1,
        )
        p_direct, d_direct = dba.ba(*args, iters=2, P=16)

        # force the chunked path (E_cap=48 edges, chunk=16 -> 3 chunks;
        # also exercises the non-dividing remainder with chunk=20)
        for chunk in (16, 20):
            monkeypatch.setattr(dba, "LIN_CHUNK", chunk)
            jax.clear_caches()   # drop the cached trace of dba.ba
            p_c, d_c = dba.ba(*args, iters=2, P=16)
            np.testing.assert_allclose(np.asarray(p_c),
                                       np.asarray(p_direct),
                                       rtol=0, atol=2e-6)
            np.testing.assert_allclose(np.asarray(d_c),
                                       np.asarray(d_direct),
                                       rtol=0, atol=2e-5)
        monkeypatch.undo()
        jax.clear_caches()


class TestCompactSchur:
    def test_compact_matches_dense(self):
        """The compact (local-pose-table) Schur path must match the
        dense-P path, including loop-closure edges and edges whose
        targets fall outside the optimized window."""
        rng = np.random.default_rng(11)
        poses_gt, disps_gt, intr, ii, jj, target, weight, mask, T, BUF = \
            make_problem(rng)
        # add a loop-closure pair + an edge pointing outside [t0, t1)
        ii = np.concatenate([ii, [T - 1, 0]])
        jj = np.concatenate([jj, [0, T - 1]])
        E_cap = len(mask) + 2
        mask = np.concatenate([mask, [True, True]])
        ht, wd = disps_gt.shape[-2:]
        target = np.concatenate(
            [target, np.zeros((2, ht, wd, 2), np.float32)]
        )
        weight = np.concatenate(
            [weight, 0.5 * np.ones((2, ht, wd, 2), np.float32)]
        )

        noise = 0.02 * rng.standard_normal((BUF, 6)).astype(np.float32)
        noise[:2] = 0
        poses = np.asarray(se3.retr(jnp.asarray(poses_gt),
                                    jnp.asarray(noise)))
        disps = np.ones_like(disps_gt)
        t0, t1 = 2, T
        K, D = 16, 32
        kx, kmask, table = dba.build_schur_tables(ii, mask, t0, t1, K, D)
        eta = 1e-4 * np.ones((BUF, ht, wd), np.float32)

        args = (
            jnp.asarray(poses), jnp.asarray(disps),
            jnp.zeros_like(jnp.asarray(disps)), jnp.asarray(intr),
            jnp.asarray(target), jnp.asarray(weight), jnp.asarray(eta),
            jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(mask),
            jnp.asarray(kx), jnp.asarray(kmask), jnp.asarray(table),
            t0, t1,
        )
        p_dense, d_dense = dba.ba(*args, iters=2, P=16)

        CK = 4
        tabs = dba.build_compact_pose_tables(
            ii, jj, mask, kx, kmask, t0, t1, CK, 16
        )
        assert tabs is not None
        loc, val, Dp = tabs
        p_c, d_c = dba.ba(
            *args, iters=2, P=16, schur_chunk=CK,
            loc_pose=jnp.asarray(loc), loc_valid=jnp.asarray(val),
        )
        # the compact path contracts in a different order, so f32
        # accumulation differs at ~1e-4 over 2 iterations (the round-5
        # flat-Hessian dots reorder sums again); at float64 the two
        # paths agree to 9e-14 (re-verified 2026-08-20), i.e. the logic
        # is exact
        np.testing.assert_allclose(np.asarray(p_c), np.asarray(p_dense),
                                   rtol=0, atol=3e-4)
        np.testing.assert_allclose(np.asarray(d_c), np.asarray(d_dense),
                                   rtol=0, atol=1e-3)

    def test_overflow_falls_back(self):
        """Globally-connected graphs (local pose set > P) must return
        None so callers fall back to the dense path."""
        t = 12
        ii, jj = np.meshgrid(np.arange(t), np.arange(t), indexing="ij")
        keep = ii != jj
        ii, jj = ii[keep], jj[keep]
        mask = np.ones(len(ii), bool)
        kx = np.arange(t, dtype=np.int32)
        kmask = np.ones(t, bool)
        # P=8 < the 12 poses every chunk touches -> overflow
        tabs = dba.build_compact_pose_tables(
            ii, jj, mask, kx, kmask, 0, t, 4, 8
        )
        assert tabs is None


def test_pose_system_chunked_matches_dense():
    """The edge-chunked pose-system accumulation (the 1000-kf OOM fix)
    is numerically identical to the one-shot selector contraction."""
    import numpy as np

    from droid_slam_tpu.ops import dba

    rng = np.random.default_rng(3)
    E, P, t0 = 37, 16, 1
    Hblk = jnp.asarray(rng.standard_normal((E, 2, 6, 2, 6)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((E, 2, 6)), jnp.float32)
    ii = jnp.asarray(rng.integers(0, P + t0, E), jnp.int32)
    jj = jnp.asarray(rng.integers(0, P + t0, E), jnp.int32)
    mask = jnp.asarray(rng.random(E) > 0.2)

    Hd, vd, Pjd = dba._pose_system(Hblk, v, ii, jj, t0, P, mask)
    Hc, vc, Pjc = dba._pose_system(Hblk, v, ii, jj, t0, P, mask,
                                   chunk_threshold=0)
    np.testing.assert_allclose(np.asarray(Hd), np.asarray(Hc),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vd), np.asarray(vc),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(Pjd), np.asarray(Pjc))
