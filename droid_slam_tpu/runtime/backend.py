"""Global bundle-adjustment backend.

Re-design of /root/reference/droid_slam/droid_backend.py: gauge-normalize
(mono without sensor depth), build a fresh proximity factor graph over all
keyframes with the on-the-fly correlation implementation, and run
`update_lowmem` sweeps of the update operator + dense global BA.

Capacities are bucketed by keyframe count so jit compiles once per bucket.

With `SLAMConfig.distributed_backend` (or `distributed=True`) and more
than one device, the global BA inside update_lowmem runs the edge-sharded
distributed solver (parallel/dba.py): edges partitioned by source frame
across the device mesh, depth (Schur) elimination fully local, only the
dense pose system psum-reduced over ICI — the north-star scaling path
the single-GPU reference cannot express (droid_backend.py:24-40).
"""

import numpy as np

from .factor_graph import FactorGraph


def _bucket(n, lo=32):
    b = lo
    while b < n:
        b *= 2
    return b


class Backend:
    # pluggable for testing (oracle-update graphs)
    graph_cls = FactorGraph

    def __init__(self, net, params, video, cfg, distributed=None):
        self.net = net
        self.params = params
        self.video = video
        self.cfg = cfg
        self.distributed = (
            distributed if distributed is not None
            else getattr(cfg, "distributed_backend", False)
        )
        self._dist_fns = {}

    def __call__(self, steps=12):
        cfg = self.cfg
        t = self.video.counter
        if t < 2:
            return

        # host-side check (a [:t] device slice would compile per t)
        has_sens = bool(
            (np.asarray(self.video.state.disps_sens)[:t] > 0).any()
        )
        if not cfg.stereo and not has_sens:
            self.video.normalize()

        max_factors = 16 * t
        pose_cap = _bucket(t)
        import jax.numpy as jnp

        from ..utils.mem import device_mem_stats, log_mem

        # HBM-aware edge cap: the dominant per-edge device state is the
        # persistent GRU hidden (f16, ht·wd·128 = 786 KB at 48x64) plus
        # target/weight and the per-sweep reproject/motion transients.
        # The reference's 16·t policy assumes a 24 GB GPU at buffer=1000
        # (factor_graph.py:84 keeps fp16 state for every edge); a single
        # 16 GB v5e binds below that, so cap the graph to what fits and
        # leave full capacity to the edge-sharded distributed backend
        # (each shard holds 1/S of the edge state).
        use, _, lim = device_mem_stats()
        if lim is None and jnp.zeros(()).devices().pop().platform != "cpu":
            # PJRT allocator stats are unavailable through the axon
            # relay: use the measured ceiling (DROID_HBM_GB, set by the
            # scale tools from a start-of-run trial-allocation probe;
            # an idle chip fits >= 13.8 GB) and an analytic resident
            # estimate.  Do NOT trial-allocate here: a probe mid-run
            # poisons the allocator for the next allocations even after
            # a settle loop (runs/r4/backend_1000{e,f,g}.log — tiny
            # allocs RESOURCE_EXHAUST seconds after a settled probe).
            import os

            from ..utils.mem import pytree_nbytes
            # measured ceiling: 15 GB usable on the tunneled v5e (round-4
            # barriered probe — 15x1 GB buffers fit, the 16th OOMs;
            # PERF.md round 4 / runs/r4).  Default keeps 1 GB headroom
            # for allocator fragmentation over a long run; scale tools
            # may override from their own start-of-run probe.
            lim = float(os.environ.get("DROID_HBM_GB", "14")) * 1e9
            # 1.5 GB: params, compiled programs, allocator slack
            use = pytree_nbytes(self.video.state) + 1.5e9
        if lim:
            ht, wd = self.video.fht, self.video.fwd
            per_edge = ht * wd * (128 * 2      # net_state f16
                                  + 2 * 4 * 2  # target + weight f32
                                  + 6 * 4      # coords1 + motn transients
                                  # BA linearization outputs, resident
                                  # through the whole Schur scan
                                  # (ops/dba._linearize: Eii+Eij f32
                                  # (E,6,HW) x2 + Cii+wi (E,HW) x2) —
                                  # omitting these put the 512-kf run
                                  # ~1.5 GB over budget (backend_512d)
                                  + (2 * 6 + 2) * 4)
            budget = 0.80 * (lim - (use or 0))
            cap = max(int(budget // per_edge), 512)
            if cap < max_factors:
                print(f"backend: HBM cap {cap} edges "
                      f"(policy 16t = {max_factors}; "
                      f"budget {budget / 1e9:.1f} GB, "
                      f"{per_edge / 1e6:.2f} MB/edge) — the distributed "
                      f"backend lifts this by sharding edge state",
                      flush=True)
                max_factors = cap
        # edge_cap is 128-aligned, NOT power-of-two bucketed: _grow stops
        # at self.E, and a pow2 bucket would round a 6-7k HBM cap back up
        # to 8192 allocated slots, defeating the cap.  A backend session
        # compiles its programs once either way.
        graph = self.graph_cls(
            self.video, self.net, self.params, corr_impl="alt",
            max_factors=max_factors,
            edge_cap=int(np.ceil(max_factors / 128) * 128),
            inac_cap=8,
            pose_cap=pose_cap, depth_cap=pose_cap,
            degree_cap=64,
            upsample=cfg.upsample,
            # edge arrays grow lazily to the edges proximity actually
            # selects; f16 GRU state halves the dominant store while
            # keeping 3 more mantissa bits than bf16 — the hidden state
            # round-trips through this store after EVERY update sweep,
            # and bf16 measurably perturbs the GRU (see state.py nets
            # comment); matches the reference's fp16 autocast state
            # (factor_graph.py:84)
            state_dtype=jnp.float16,
        )

        import jax
        if self.distributed and len(jax.devices()) > 1:
            graph.ba_fn = self._distributed_hook(pose_cap)

        log_mem("backend: graph built")
        graph.add_proximity_factors(
            rad=cfg.backend_radius, nms=cfg.backend_nms,
            thresh=cfg.backend_thresh, beta=cfg.beta,
        )
        log_mem(f"backend: proximity selected {graph.n} edges")
        graph.update_lowmem(steps=steps)
        log_mem("backend: sweeps done")
        graph.clear_edges()

    # ------------------------------------------------------------------

    def _distributed_hook(self, pose_cap):
        """Route update_lowmem's BA through the edge-sharded distributed
        solver over all local devices."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh

        from ..parallel import dba as pdba

        cfg = self.cfg
        video = self.video
        devices = np.array(jax.devices())
        n_shards = len(devices)
        mesh = Mesh(devices, ("ba",))

        def hook(target, weight, eta, ii, jj, mask, t0, t1):
            em = np.asarray(mask, bool)
            n_e = int(em.sum())
            if n_e == 0:
                return
            ii_n = np.asarray(ii)
            jj_n = np.asarray(jj)
            # exact per-shard requirements for the contiguous partition
            # (a concentrated edge distribution can need far more than
            # the balanced 2·n_e/n_shards estimate), bucketed so jit
            # compiles once per bucket
            need_e, need_k, need_d = pdba.plan_shard_caps(
                ii_n, em, t0, t1, n_shards
            )
            E_shard = _bucket(need_e, lo=16)
            K_shard = _bucket(need_k, lo=8)
            D = _bucket(need_d, lo=8)

            shards = pdba.shard_edges_by_frame(
                ii_n, jj_n, np.asarray(target), np.asarray(weight), em,
                n_shards, E_shard, K_shard, D, t0, t1,
            )
            # compact per-shard Schur when the graph is local enough
            # (ops/dba.py compact path; falls back to dense otherwise)
            CK = 16
            tabs = None
            if pose_cap >= 256:
                tabs = pdba.build_shard_compact_tables(
                    shards[0], shards[1], shards[4], shards[5],
                    shards[6], t0, t1, CK, pose_cap,
                )
                if tabs is not None and tabs[2] >= pose_cap // 2:
                    tabs = None      # not local enough to pay off
            # pose_cap is baked into the compiled solver (P_cap) and
            # changes with the keyframe-count bucket — it must be part
            # of the cache key or a later, larger session could reuse a
            # solver that never optimizes poses beyond the old cap;
            # same for the compact-table shape
            tab_shape = None if tabs is None else tabs[0].shape
            key = (E_shard, K_shard, D, pose_cap, tab_shape)
            if key not in self._dist_fns:
                self._dist_fns[key] = pdba.make_distributed_ba(
                    mesh, iters=cfg.ba_iters,
                    lm=cfg.backend_lm, ep=cfg.backend_ep, P_cap=pose_cap,
                    compact=tabs is not None,
                    schur_chunk=CK if tabs is not None else None,
                )
            st = video.state
            extra = () if tabs is None else (
                jnp.asarray(tabs[0]), jnp.asarray(tabs[1]),
            )
            poses, disps = self._dist_fns[key](
                st.poses, st.disps, st.disps_sens, st.intrinsics, eta,
                *[jnp.asarray(s) for s in shards], *extra,
                jnp.asarray(t0, jnp.int32), jnp.asarray(t1, jnp.int32),
            )
            video.state = st.replace(poses=poses, disps=disps)

        return hook
