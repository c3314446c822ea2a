"""Multi-device tests on the virtual 8-device CPU mesh.

Distributed global BA must match the single-device solver (same math,
edges partitioned by source frame, pose system psum'd over the mesh).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from droid_slam_tpu.lie import se3
from droid_slam_tpu.geom import projective
from droid_slam_tpu.ops import dba
from droid_slam_tpu.parallel import dba as pdba


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    T, BUF, ht, wd = 10, 16, 12, 16
    xs = np.cumsum(0.05 * rng.standard_normal((T, 6)), axis=0)
    xs[0] = 0
    poses_gt = np.tile([0, 0, 0, 0, 0, 0, 1.0], (BUF, 1)).astype(np.float32)
    poses_gt[:T] = np.asarray(se3.exp(jnp.asarray(xs, jnp.float32)))
    disps_gt = (0.6 + 0.25 * rng.random((BUF, ht, wd))).astype(np.float32)
    intr = np.tile([wd * 1.2, wd * 1.2, wd / 2, ht / 2], (BUF, 1)).astype(
        np.float32
    )
    ii, jj = np.meshgrid(np.arange(T), np.arange(T), indexing="ij")
    keep = (np.abs(ii - jj) >= 1) & (np.abs(ii - jj) <= 3)
    ii, jj = ii[keep].astype(np.int32), jj[keep].astype(np.int32)

    target, _ = projective.projective_transform(
        jnp.asarray(poses_gt)[None], jnp.asarray(disps_gt)[None],
        jnp.asarray(intr)[None], jnp.asarray(ii), jnp.asarray(jj),
    )
    target = np.asarray(target[0])
    weight = np.ones_like(target)

    noise = 0.02 * rng.standard_normal((BUF, 6)).astype(np.float32)
    noise[:2] = 0
    noise[T:] = 0
    poses0 = np.asarray(
        se3.retr(jnp.asarray(poses_gt), jnp.asarray(noise))
    )
    return dict(
        poses_gt=poses_gt, poses0=poses0, disps_gt=disps_gt,
        disps0=np.ones_like(disps_gt), intr=intr, ii=ii, jj=jj,
        target=target, weight=weight, T=T, BUF=BUF, ht=ht, wd=wd,
    )


class TestDistributedBA:
    def test_matches_single_device(self, problem):
        pb = problem
        T, BUF, ht, wd = pb["T"], pb["BUF"], pb["ht"], pb["wd"]
        t0, t1 = 2, T
        eta = 1e-4 * np.ones((BUF, ht, wd), np.float32)
        E = len(pb["ii"])

        # --- single-device reference (ops.dba) ---
        mask = np.ones(E, bool)
        kx, km, tbl = dba.build_schur_tables(pb["ii"], mask, t0, t1, 16, 32)
        p1, d1 = dba.ba(
            jnp.asarray(pb["poses0"]), jnp.asarray(pb["disps0"]),
            jnp.zeros((BUF, ht, wd)), jnp.asarray(pb["intr"]),
            jnp.asarray(pb["target"]), jnp.asarray(pb["weight"]),
            jnp.asarray(eta), jnp.asarray(pb["ii"]), jnp.asarray(pb["jj"]),
            jnp.asarray(mask), jnp.asarray(kx), jnp.asarray(km),
            jnp.asarray(tbl), t0, t1, iters=2, lm=1e-5, ep=1e-2, P=16,
        )

        # --- 8-device distributed ---
        devs = np.array(jax.devices()[:8])
        mesh = Mesh(devs, ("ba",))
        shards = pdba.shard_edges_by_frame(
            pb["ii"], pb["jj"], pb["target"], pb["weight"], mask,
            n_shards=8, E_shard=16, K_shard=4, D=8, t0=t0, t1=t1,
        )
        fn = pdba.make_distributed_ba(mesh, iters=2, lm=1e-5, ep=1e-2,
                                      P_cap=16)
        p8, d8 = fn(
            jnp.asarray(pb["poses0"]), jnp.asarray(pb["disps0"]),
            jnp.zeros((BUF, ht, wd)), jnp.asarray(pb["intr"]),
            jnp.asarray(eta), *[jnp.asarray(s) for s in shards],
            t0, t1,
        )

        np.testing.assert_allclose(np.asarray(p8), np.asarray(p1),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(d8), np.asarray(d1),
                                   atol=2e-3, rtol=2e-2)

    def test_converges_distributed(self, problem):
        pb = problem
        T, BUF, ht, wd = pb["T"], pb["BUF"], pb["ht"], pb["wd"]
        t0, t1 = 2, T
        eta = 1e-4 * np.ones((BUF, ht, wd), np.float32)
        mask = np.ones(len(pb["ii"]), bool)

        devs = np.array(jax.devices()[:8])
        mesh = Mesh(devs, ("ba",))
        shards = [
            jnp.asarray(s) for s in pdba.shard_edges_by_frame(
                pb["ii"], pb["jj"], pb["target"], pb["weight"], mask,
                n_shards=8, E_shard=16, K_shard=4, D=8, t0=t0, t1=t1,
            )
        ]
        fn = pdba.make_distributed_ba(mesh, iters=2, lm=1e-4, ep=0.1,
                                      P_cap=16)
        p = jnp.asarray(pb["poses0"])
        d = jnp.asarray(pb["disps0"])
        for _ in range(8):
            p, d = fn(
                p, d, jnp.zeros((BUF, ht, wd)), jnp.asarray(pb["intr"]),
                jnp.asarray(eta), *shards, t0, t1,
            )

        err = np.asarray(se3.log(se3.mul(
            p[:T], se3.inv(jnp.asarray(pb["poses_gt"][:T]))
        )))
        assert np.abs(err).max() < 5e-3


class TestBackendDistributed:
    def test_backend_distributed_matches_single(self):
        """Backend(distributed=True) routes update_lowmem's BA through the
        edge-sharded solver over the mesh and must match the single-device
        backend (VERDICT r1 #3: terminate-path integration)."""
        from droid_slam_tpu.config import SLAMConfig
        from droid_slam_tpu.data.synthetic import render_plane_scene
        from droid_slam_tpu.runtime.backend import Backend
        from droid_slam_tpu.runtime.factor_graph import FactorGraph
        from droid_slam_tpu.runtime.state import DepthVideo

        H, W = 96, 128
        N = 10
        scene = render_plane_scene(N, H, W, seed=5, motion_scale=0.05)

        gt_poses = se3.inv(jnp.asarray(scene["poses_c2w"]))
        gt_disps = jnp.asarray(1.0 / scene["depths"][:, 3::8, 3::8])
        intr8 = jnp.asarray(scene["intrinsics"] / 8.0)

        class OracleGraph(FactorGraph):
            def _run_update_op(self):
                ii, jj, mask = self._edge_arrays()
                ii_c = np.clip(ii, 0, N - 1)
                jj_c = np.clip(jj, 0, N - 1)
                coords_gt, valid = projective.projective_transform(
                    gt_poses[None], gt_disps[None], intr8[None],
                    jnp.asarray(ii_c), jnp.asarray(jj_c),
                )
                m = jnp.asarray(mask)[:, None, None, None]
                self.target = jnp.where(m, coords_gt[0], self.target)
                self.weight = jnp.where(
                    m, valid[0] * jnp.ones_like(self.target), self.weight
                )
                st = self.video.state
                self.video.state = st.replace(
                    damping=1e-4 * jnp.ones_like(st.damping)
                )

        def run(distributed):
            cfg = SLAMConfig(image_size=(H, W), buffer=16, warmup=6)
            video = DepthVideo(cfg)
            h8, w8 = H // 8, W // 8
            zf = jnp.zeros((1, h8, w8, 128), jnp.bfloat16)
            zc = jnp.zeros((h8, w8, 128))
            for t in range(N):
                video.append(
                    float(t), jnp.asarray(scene["images"][t]), None, None,
                    None, jnp.asarray(scene["intrinsics"][0] / 8.0),
                    zf, zc, zc,
                )
            backend = Backend(None, None, video, cfg,
                              distributed=distributed)
            backend.graph_cls = OracleGraph
            backend(steps=2)
            return np.asarray(video.state.poses[:N])

        p_single = run(False)
        p_dist = run(True)
        assert np.all(np.isfinite(p_dist))
        np.testing.assert_allclose(p_dist, p_single, atol=2e-3)


class TestDistributedCompact:
    def test_compact_matches_dense_distributed(self):
        """The compact per-shard Schur path (local pose tables) must
        match the dense distributed solver, with Dp genuinely below
        P_cap so the local->global scatter is exercised (a 40-frame
        radius-3 graph gives Dp=32 against P_cap=64)."""
        rng = np.random.default_rng(5)
        T, BUF, ht, wd = 40, 44, 12, 16
        xs = np.cumsum(0.04 * rng.standard_normal((T, 6)), axis=0)
        xs[0] = 0
        poses_gt = np.tile([0, 0, 0, 0, 0, 0, 1.0], (BUF, 1)).astype(
            np.float32)
        poses_gt[:T] = np.asarray(se3.exp(jnp.asarray(xs, jnp.float32)))
        disps_gt = (0.6 + 0.25 * rng.random((BUF, ht, wd))).astype(
            np.float32)
        intr = np.tile([wd * 1.2, wd * 1.2, wd / 2, ht / 2],
                       (BUF, 1)).astype(np.float32)
        ii, jj = np.meshgrid(np.arange(T), np.arange(T), indexing="ij")
        keep = (np.abs(ii - jj) >= 1) & (np.abs(ii - jj) <= 3)
        ii, jj = ii[keep].astype(np.int32), jj[keep].astype(np.int32)
        target, _ = projective.projective_transform(
            jnp.asarray(poses_gt)[None], jnp.asarray(disps_gt)[None],
            jnp.asarray(intr)[None], jnp.asarray(ii), jnp.asarray(jj),
        )
        target = np.asarray(target[0])
        weight = np.ones_like(target)
        noise = 0.02 * rng.standard_normal((BUF, 6)).astype(np.float32)
        noise[:2] = 0
        noise[T:] = 0
        poses0 = np.asarray(se3.retr(jnp.asarray(poses_gt),
                                     jnp.asarray(noise)))
        mask = np.ones(len(ii), bool)
        t0, t1 = 2, T
        P_cap = 64
        eta = 1e-4 * np.ones((BUF, ht, wd), np.float32)

        devs = np.array(jax.devices()[:4])
        mesh = Mesh(devs, ("ba",))
        need_e, need_k, need_d = pdba.plan_shard_caps(ii, mask, t0, t1, 4)
        shards = pdba.shard_edges_by_frame(
            ii, jj, target, weight, mask, n_shards=4,
            E_shard=need_e, K_shard=need_k, D=need_d, t0=t0, t1=t1,
        )
        rep_args = (
            jnp.asarray(poses0), jnp.asarray(np.ones_like(disps_gt)),
            jnp.zeros((BUF, ht, wd)), jnp.asarray(intr),
            jnp.asarray(eta),
        )
        fn_d = pdba.make_distributed_ba(mesh, iters=2, lm=1e-5, ep=1e-2,
                                        P_cap=P_cap)
        p_d, d_d = fn_d(*rep_args, *[jnp.asarray(s) for s in shards],
                        t0, t1)

        CK = 4
        tabs = pdba.build_shard_compact_tables(
            shards[0], shards[1], shards[4], shards[5], shards[6],
            t0, t1, CK, P_cap,
        )
        assert tabs is not None
        loc, val, Dp = tabs
        assert Dp < P_cap, (Dp, P_cap)   # genuine compression
        fn_c = pdba.make_distributed_ba(mesh, iters=2, lm=1e-5, ep=1e-2,
                                        P_cap=P_cap, compact=True,
                                        schur_chunk=CK)
        p_c, d_c = fn_c(*rep_args, *[jnp.asarray(s) for s in shards],
                        jnp.asarray(loc), jnp.asarray(val), t0, t1)

        np.testing.assert_allclose(np.asarray(p_c), np.asarray(p_d),
                                   atol=1e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(d_c), np.asarray(d_d),
                                   atol=1e-3, rtol=2e-2)
