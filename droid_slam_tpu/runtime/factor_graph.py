"""Dynamic covisibility factor graph over the keyframe map.

Re-design of /root/reference/droid_slam/factor_graph.py for TPU execution:

  * Control plane (edge bookkeeping, dedup, LRU eviction, proximity/NMS
    selection) runs on the host in numpy — it is tiny, sequential, and
    data-dependent.
  * Data plane (per-edge GRU state, correlation pyramids, targets/weights,
    the update operator, and BA) lives in fixed-capacity device arrays with
    validity masks so each jitted function compiles once per capacity.
  * Edge insertion/removal are jit-compiled gathers/scatters over the slot
    axis (the reference reindexes python-dynamic tensors instead).

Two correlation implementations, as in the reference:
  * "volume": per-edge precomputed correlation pyramid (frontend;
    factor_graph.py:109-115).
  * "alt": on-the-fly correlation against pooled feature pyramids
    (backend's update_lowmem; factor_graph.py:246-290).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..geom import projective
from ..ops import corr as corr_ops
from ..utils.timers import GLOBAL_TIMERS as _T

DAMPING_EPS = 1e-7    # EP in factor_graph.update (factor_graph.py:196)


class FactorGraph:
    def __init__(self, video, net, params, corr_impl="volume",
                 max_factors=48, edge_cap=None, inac_cap=None,
                 pose_cap=None, depth_cap=None, degree_cap=None,
                 upsample=False):
        self.video = video
        self.net = net
        self.params = params
        self.cfg = video.cfg
        self.corr_impl = corr_impl
        self.max_factors = max_factors
        self.upsample = upsample

        self.ht, self.wd = video.fht, video.fwd
        ht, wd = self.ht, self.wd

        self.E = edge_cap or max(self.cfg.frontend_edge_cap, max_factors + 16)
        self.I = inac_cap if inac_cap is not None else self.E
        self.P = pose_cap or self.cfg.frontend_pose_cap
        self.K = depth_cap or self.cfg.frontend_depth_cap
        self.D = degree_cap or self.cfg.schur_degree_cap

        # host-side edge lists (ordered to match device slots [0, n))
        self.ii = np.zeros(0, np.int64)
        self.jj = np.zeros(0, np.int64)
        self.age = np.zeros(0, np.int64)
        self.ii_inac = np.zeros(0, np.int64)
        self.jj_inac = np.zeros(0, np.int64)
        self.ii_bad = np.zeros(0, np.int64)
        self.jj_bad = np.zeros(0, np.int64)

        # device edge state
        self.net_state = jnp.zeros((self.E, ht, wd, 128), jnp.float32)
        self.target = jnp.zeros((self.E, ht, wd, 2), jnp.float32)
        self.weight = jnp.zeros((self.E, ht, wd, 2), jnp.float32)
        self.target_inac = jnp.zeros((self.I, ht, wd, 2), jnp.float32)
        self.weight_inac = jnp.zeros((self.I, ht, wd, 2), jnp.float32)

        if corr_impl == "volume":
            self.pyramid = [
                jnp.zeros(
                    (self.E, ht, wd, ht // (2 ** l), wd // (2 ** l)),
                    jnp.bfloat16,
                )
                for l in range(corr_ops.NUM_LEVELS)
            ]
        else:
            self.pyramid = None
        self._fmap_pyr = None   # alt-corr frame pyramids (built lazily)

        self._jit_cache = {}

    # ------------------------------------------------------------------
    # host bookkeeping helpers
    # ------------------------------------------------------------------

    @property
    def n(self):
        return len(self.ii)

    def _edge_arrays(self):
        """Padded (E,) device index arrays + mask for the active set."""
        ii = np.zeros(self.E, np.int32)
        jj = np.zeros(self.E, np.int32)
        mask = np.zeros(self.E, bool)
        ii[: self.n] = self.ii
        jj[: self.n] = self.jj
        mask[: self.n] = True
        return ii, jj, mask

    def _dedup(self, ii, jj):
        """Drop pairs already present (active or inactive)
        (factor_graph.py:43-54)."""
        existing = set(zip(self.ii.tolist(), self.jj.tolist())) | set(
            zip(self.ii_inac.tolist(), self.jj_inac.tolist())
        )
        keep = [
            k for k, (i, j) in enumerate(zip(ii, jj))
            if (int(i), int(j)) not in existing
        ]
        return np.asarray(ii)[keep], np.asarray(jj)[keep]

    # ------------------------------------------------------------------
    # jitted data-plane pieces
    # ------------------------------------------------------------------

    def _get_jit(self, key, builder):
        if key not in self._jit_cache:
            self._jit_cache[key] = builder()
        return self._jit_cache[key]

    def _build_corr_fn(self, chunk):
        """Correlation pyramid for `chunk` new edges (volume impl)."""

        @jax.jit
        def fn(fmaps, ii, cam1, jj, cam2):
            f1 = fmaps[ii, cam1].astype(jnp.float32)      # (chunk,h,w,128)
            f2 = fmaps[jj, cam2].astype(jnp.float32)
            vol = corr_ops.corr_volume(f1[None], f2[None])[0]
            pyr = corr_ops.build_pyramid(vol[None])
            return [p[0].astype(jnp.bfloat16) for p in pyr]

        return fn

    def _build_insert_fn(self, chunk):
        """Insert `chunk` edges' state at slot offsets."""

        @jax.jit
        def fn(net_state, target, weight, pyramid, new_net, new_target,
               new_pyr, slots, valid):
            vm = valid[:, None, None, None].astype(net_state.dtype)
            sl = jnp.clip(slots, 0, net_state.shape[0] - 1)
            net_state = net_state.at[sl].set(
                jnp.where(vm > 0, new_net, net_state[sl])
            )
            target = target.at[sl].set(
                jnp.where(vm > 0, new_target, target[sl])
            )
            weight = weight.at[sl].set(
                jnp.where(vm > 0, jnp.zeros_like(target[sl]), weight[sl])
            )
            if pyramid is not None:
                pyramid = [
                    p.at[sl].set(
                        jnp.where(
                            valid[:, None, None, None, None] > 0, np_, p[sl]
                        )
                    )
                    for p, np_ in zip(pyramid, new_pyr)
                ]
            return net_state, target, weight, pyramid

        return fn

    def _build_permute_fn(self):
        @jax.jit
        def fn(net_state, target, weight, pyramid, perm):
            out = (net_state[perm], target[perm], weight[perm])
            if pyramid is not None:
                pyramid = [p[perm] for p in pyramid]
            return out + (pyramid,)

        return fn

    def _build_inac_store_fn(self, chunk):
        @jax.jit
        def fn(t_inac, w_inac, target, weight, src_slots, dst_slots, valid):
            src = jnp.clip(src_slots, 0, target.shape[0] - 1)
            dst = jnp.clip(dst_slots, 0, t_inac.shape[0] - 1)
            vm = valid[:, None, None, None].astype(t_inac.dtype)
            t_inac = t_inac.at[dst].set(
                jnp.where(vm > 0, target[src], t_inac[dst])
            )
            w_inac = w_inac.at[dst].set(
                jnp.where(vm > 0, weight[src], w_inac[dst])
            )
            return t_inac, w_inac

        return fn

    # ------------------------------------------------------------------
    # graph edits
    # ------------------------------------------------------------------

    def add_factors(self, ii, jj, remove=False):
        """Add edges (factor_graph.py:85-133): dedup, LRU-evict over the
        factor budget, build correlation state, seed targets by reprojection."""
        ii = np.asarray(ii, np.int64).reshape(-1)
        jj = np.asarray(jj, np.int64).reshape(-1)
        ii, jj = self._dedup(ii, jj)
        if len(ii) == 0:
            return

        # respect the factor budget
        room = self.max_factors - self.n if self.max_factors > 0 else len(ii)
        if self.max_factors > 0 and len(ii) > room and self.n > 0 and remove:
            # evict oldest to make room (factor_graph.py:102-106)
            n_evict = min(self.n, len(ii) - max(room, 0))
            order = np.argsort(-self.age)          # oldest (max age) first
            evict_mask = np.zeros(self.n, bool)
            evict_mask[order[:n_evict]] = True
            self.rm_factors(evict_mask, store=True)
        if self.n + len(ii) > self.E:
            keep = self.E - self.n
            ii, jj = ii[:keep], jj[:keep]
        if len(ii) == 0:
            return

        _T.counts["add_factors.n_edges"] += len(ii)
        chunk = 8 * ((len(ii) + 7) // 8)  # pad to bucket of 8
        ii_p = np.zeros(chunk, np.int32)
        jj_p = np.zeros(chunk, np.int32)
        val = np.zeros(chunk, bool)
        ii_p[: len(ii)], jj_p[: len(ii)], val[: len(ii)] = ii, jj, True
        slots = np.arange(chunk, dtype=np.int32) + self.n

        state = self.video.state
        new_net = state.nets[jnp.asarray(ii_p)]

        if self.corr_impl == "volume":
            cam1 = np.zeros(chunk, np.int32)
            cam2 = (ii_p == jj_p).astype(np.int32) * (
                1 if self.cfg.stereo else 0
            )
            corr_fn = self._get_jit(("corr", chunk),
                                    lambda: self._build_corr_fn(chunk))
            new_pyr = corr_fn(
                state.fmaps, jnp.asarray(ii_p), jnp.asarray(cam1),
                jnp.asarray(jj_p), jnp.asarray(cam2),
            )
        else:
            new_pyr = None

        new_target, _ = self.video.reproject(ii_p, jj_p)

        ins = self._get_jit(("insert", chunk),
                            lambda: self._build_insert_fn(chunk))
        self.net_state, self.target, self.weight, self.pyramid = ins(
            self.net_state, self.target, self.weight, self.pyramid,
            new_net, new_target, new_pyr,
            jnp.asarray(slots), jnp.asarray(val),
        )

        self.ii = np.concatenate([self.ii, ii])
        self.jj = np.concatenate([self.jj, jj])
        self.age = np.concatenate([self.age, np.zeros(len(ii), np.int64)])

    def rm_factors(self, mask, store=False):
        """Remove masked edges, optionally archiving their targets/weights
        (factor_graph.py:136-160)."""
        mask = np.asarray(mask, bool)
        if mask.sum() == 0:
            return
        drop = np.nonzero(mask)[0]
        keep = np.nonzero(~mask)[0]

        if store:
            k = len(drop)
            chunk = 8 * ((k + 7) // 8)
            src = np.zeros(chunk, np.int32)
            dst = np.zeros(chunk, np.int32)
            val = np.zeros(chunk, bool)
            n_inac = len(self.ii_inac)
            take = min(k, self.I - n_inac)
            src[:take] = drop[:take]
            dst[:take] = np.arange(take) + n_inac
            val[:take] = True
            fn = self._get_jit(("inac", chunk),
                               lambda: self._build_inac_store_fn(chunk))
            self.target_inac, self.weight_inac = fn(
                self.target_inac, self.weight_inac, self.target, self.weight,
                jnp.asarray(src), jnp.asarray(dst), jnp.asarray(val),
            )
            self.ii_inac = np.concatenate([self.ii_inac, self.ii[drop[:take]]])
            self.jj_inac = np.concatenate([self.jj_inac, self.jj[drop[:take]]])

        # compact device slots: kept edges first
        perm = np.zeros(self.E, np.int32)
        perm[: len(keep)] = keep
        perm[len(keep):] = self.E - 1   # park padding on the last slot
        pfn = self._get_jit("permute", self._build_permute_fn)
        self.net_state, self.target, self.weight, self.pyramid = pfn(
            self.net_state, self.target, self.weight, self.pyramid,
            jnp.asarray(perm),
        )
        self.ii = self.ii[keep]
        self.jj = self.jj[keep]
        self.age = self.age[keep]

    def rm_keyframe(self, ix):
        """Drop keyframe ix: shift ix+1 into its slot and reindex edges
        (factor_graph.py:164-193; only ever called with ix = t1-2)."""
        self.video.copy_slot(ix, ix + 1)

        m = (self.ii_inac == ix) | (self.jj_inac == ix)
        self.ii_inac = np.where(self.ii_inac >= ix, self.ii_inac - 1,
                                self.ii_inac)
        self.jj_inac = np.where(self.jj_inac >= ix, self.jj_inac - 1,
                                self.jj_inac)
        if m.any():
            keep = ~m
            # compact the inactive store on device
            n_inac = len(self.ii_inac)
            perm = np.zeros(self.I, np.int32)
            kept_idx = np.nonzero(keep)[0]
            perm[: len(kept_idx)] = kept_idx
            perm[len(kept_idx):] = self.I - 1
            self.target_inac = self.target_inac[jnp.asarray(perm)]
            self.weight_inac = self.weight_inac[jnp.asarray(perm)]
            self.ii_inac = self.ii_inac[keep]
            self.jj_inac = self.jj_inac[keep]

        m = (self.ii == ix) | (self.jj == ix)
        self.ii = np.where(self.ii >= ix, self.ii - 1, self.ii)
        self.jj = np.where(self.jj >= ix, self.jj - 1, self.jj)
        self.rm_factors(m, store=False)

    def clear_edges(self):
        self.rm_factors(np.ones(self.n, bool), store=False)
        self.net_state = jnp.zeros_like(self.net_state)

    def filter_edges(self):
        """Drop long-range edges with near-zero confidence
        (factor_graph.py:72-81)."""
        if self.n == 0:
            return
        conf = np.asarray(
            jnp.mean(self.weight[: self.n], axis=(1, 2, 3))
        )
        mask = (np.abs(self.ii - self.jj) > 2) & (conf < 0.001)
        self.ii_bad = np.concatenate([self.ii_bad, self.ii[mask]])
        self.jj_bad = np.concatenate([self.jj_bad, self.jj[mask]])
        self.rm_factors(mask, store=False)

    # ------------------------------------------------------------------
    # update operator + BA
    # ------------------------------------------------------------------

    def update(self, t0=None, t1=None, itrs=2, use_inactive=False,
               motion_only=False):
        """One update-operator + BA round (factor_graph.py:196-242)."""
        if self.n == 0:
            return
        ii, jj, mask = self._edge_arrays()
        state = self.video.state

        fn = self._get_jit("update_core", self._build_update_core_full)
        with _T.phase("graph.update_core"):
            (self.net_state, coords1, delta, weight, eta, has_edge) = fn(
                self.params, state.poses, state.disps, state.intrinsics,
                state.nets, state.inps,
                self.net_state, self.target, tuple(self.pyramid),
                jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(mask),
            )

        self.target = coords1 + delta
        self.weight = weight

        # per-frame damping update (only frames that appear as ii)
        damping = jnp.where(
            has_edge[:, None, None], eta, state.damping
        )
        self.video.state = state.replace(damping=damping)

        if t0 is None:
            t0 = max(1, int(self.ii.min()) + 1)

        with _T.phase("graph.ba"):
            self._ba(t0, t1, itrs, use_inactive, motion_only)
        self.age += 1

    def _build_update_core_full(self):
        net_mod = self.net
        ht, wd = self.ht, self.wd
        buf = self.cfg.buffer

        def apply_update(mod, net_state, inp, corr, motn, ix, nseg):
            return mod.update(net_state, inp, corr, motn, ix=ix, nseg=nseg)

        @jax.jit
        def fn(params, poses, disps, intrinsics, nets_frames, inps_frames,
               net_state, target, pyramid, ii, jj, mask):
            coords1, _ = projective.projective_transform(
                poses[None], disps[None], intrinsics[None], ii, jj
            )
            coords1 = coords1[0]
            coords0 = projective.coords_grid(ht, wd)
            motn = jnp.clip(
                jnp.concatenate(
                    [coords1 - coords0, target - coords1], axis=-1
                ),
                -64.0, 64.0,
            )
            corr = corr_ops.lookup_pyramid(
                [p[None] for p in pyramid], coords1[None]
            )[0]

            inp = inps_frames[ii]
            seg = jnp.where(mask, ii, buf)
            net_new, delta, weight, eta_seg, upmask = net_mod.apply(
                params, net_state, inp, corr, motn,
                method=apply_update, ix=seg, nseg=buf,
            )
            mask_f = mask[:, None, None, None].astype(net_new.dtype)
            net_new = net_new * mask_f + net_state * (1 - mask_f)
            delta = delta * mask_f
            weight = weight * mask_f

            cnt = jax.ops.segment_sum(
                jnp.ones_like(seg, jnp.float32), seg, num_segments=buf + 1
            )[:-1]
            has_edge = cnt > 0
            return net_new, coords1, delta, weight, eta_seg, has_edge

        return fn

    def _ba(self, t0, t1, itrs, use_inactive, motion_only):
        """Assemble (active ∪ filtered-inactive) edges and run dense BA."""
        ii, jj, mask = self._edge_arrays()

        if use_inactive and len(self.ii_inac) > 0:
            m = (self.ii_inac >= t0 - 3) & (self.jj_inac >= t0 - 3)
        else:
            m = np.zeros(len(self.ii_inac), bool)
        ii_i = np.zeros(self.I, np.int32)
        jj_i = np.zeros(self.I, np.int32)
        mask_i = np.zeros(self.I, bool)
        sel = np.nonzero(m)[0]
        ii_i[: len(sel)] = self.ii_inac[sel]
        jj_i[: len(sel)] = self.jj_inac[sel]
        mask_i[: len(sel)] = True

        # inactive store slots are compact: gather selected rows on device
        perm = np.zeros(self.I, np.int32)
        perm[: len(sel)] = sel
        t_inac = self.target_inac[jnp.asarray(perm)]
        w_inac = self.weight_inac[jnp.asarray(perm)]

        ii_all = np.concatenate([ii_i, ii])
        jj_all = np.concatenate([jj_i, jj])
        mask_all = np.concatenate([mask_i, mask])
        target_all = jnp.concatenate([t_inac, self.target], axis=0)
        weight_all = jnp.concatenate([w_inac, self.weight], axis=0)

        if t1 is None:
            t1 = int(max(self.ii.max(), self.jj.max())) + 1

        eta = 0.2 * self.video.state.damping + DAMPING_EPS
        self.video.ba(
            target_all, weight_all, eta, ii_all, jj_all, mask_all,
            int(t0), int(t1), itrs=itrs,
            lm=self.cfg.frontend_lm, ep=self.cfg.frontend_ep,
            motion_only=motion_only,
            pose_cap=self.P, depth_cap=self.K, degree_cap=self.D,
        )

    # ------------------------------------------------------------------
    # low-memory global update (backend path)
    # ------------------------------------------------------------------

    def _build_lowmem_chunk_fn(self, chunk):
        """Update-operator pass over `chunk` edges with on-the-fly corr."""
        net_mod = self.net
        ht, wd = self.ht, self.wd
        buf = self.cfg.buffer
        rig = 2 if self.cfg.stereo else 1

        @jax.jit
        def fn(params, fmap_pyr, inps_frames, net_chunk, coords1, target,
               ii_c, jj_c, mask_c):
            # alt-corr: level-0 source features vs pooled target features
            f1 = fmap_pyr[0][rig * ii_c]
            cam2 = rig * jj_c + (ii_c == jj_c).astype(jnp.int32) * (rig - 1)
            f2_levels = [p[cam2] for p in fmap_pyr]
            corr = corr_ops.alt_lookup_pyramid(f1, f2_levels, coords1)

            coords0 = projective.coords_grid(ht, wd)
            motn = jnp.clip(
                jnp.concatenate(
                    [coords1 - coords0, target - coords1], axis=-1
                ),
                -64.0, 64.0,
            )

            inp = inps_frames[ii_c]
            seg = jnp.where(mask_c, ii_c, buf)
            net_new, delta, weight, eta_seg, _ = net_mod.apply(
                params, net_chunk, inp, corr, motn,
                method=lambda m, n, i, c, f, ix, nseg: m.update(
                    n, i, c, f, ix=ix, nseg=nseg
                ),
                ix=seg, nseg=buf,
            )
            mask_f = mask_c[:, None, None, None].astype(net_new.dtype)
            net_new = net_new * mask_f + net_chunk * (1 - mask_f)
            target_new = coords1 + delta * mask_f
            weight_new = weight * mask_f
            cnt = jax.ops.segment_sum(
                jnp.ones_like(seg, jnp.float32), seg, num_segments=buf + 1
            )[:-1]
            return net_new, target_new, weight_new, eta_seg, cnt > 0

        return fn

    def update_lowmem(self, steps=8, chunk=64):
        """Global BA sweep with on-the-fly correlation
        (factor_graph.py:246-290): per step, refresh every edge's
        target/weight in chunks, then one dense BA over all edges."""
        if self.n == 0:
            return
        t = self.video.counter
        state = self.video.state
        rig = 2 if self.cfg.stereo else 1

        # pooled feature pyramids over all frames (built once per call)
        fmaps = state.fmaps.astype(jnp.float32).reshape(
            (-1,) + state.fmaps.shape[2:]
        )   # (BUF*rig, h, w, 128)
        fmap_pyr = tuple(corr_ops.fmap_pyramid(fmaps))

        fn = self._get_jit(("lowmem", chunk),
                           lambda: self._build_lowmem_chunk_fn(chunk))

        ii, jj, mask = self._edge_arrays()
        nchunks = (self.E + chunk - 1) // chunk

        for step in range(steps):
            state = self.video.state
            coords_all, _ = self.video.reproject(ii, jj)

            for c in range(nchunks):
                sl = slice(c * chunk, min((c + 1) * chunk, self.E))
                pad = chunk - (sl.stop - sl.start)

                def padc(x, fill=0):
                    if pad == 0:
                        return x
                    return np.concatenate(
                        [x, np.full((pad,) + x.shape[1:], fill, x.dtype)]
                    )

                ii_c = jnp.asarray(padc(ii[sl]))
                jj_c = jnp.asarray(padc(jj[sl]))
                mask_c = jnp.asarray(padc(mask[sl]))
                coords_c = coords_all[sl.start:sl.stop]
                net_c = self.net_state[sl.start:sl.stop]
                tgt_c = self.target[sl.start:sl.stop]
                if pad:
                    coords_c = jnp.concatenate(
                        [coords_c, jnp.zeros((pad,) + coords_c.shape[1:])]
                    )
                    net_c = jnp.concatenate(
                        [net_c, jnp.zeros((pad,) + net_c.shape[1:])]
                    )
                    tgt_c = jnp.concatenate(
                        [tgt_c, jnp.zeros((pad,) + tgt_c.shape[1:])]
                    )

                net_new, tgt_new, wgt_new, eta_seg, has_edge = fn(
                    self.params, fmap_pyr, state.inps, net_c, coords_c,
                    tgt_c, ii_c, jj_c, mask_c,
                )
                n_real = sl.stop - sl.start
                self.net_state = self.net_state.at[sl.start:sl.stop].set(
                    net_new[:n_real]
                )
                self.target = self.target.at[sl.start:sl.stop].set(
                    tgt_new[:n_real]
                )
                self.weight = self.weight.at[sl.start:sl.stop].set(
                    wgt_new[:n_real]
                )
                damping = jnp.where(
                    has_edge[:, None, None], eta_seg, state.damping
                )
                self.video.state = state.replace(damping=damping)
                state = self.video.state

            eta = 0.2 * state.damping + DAMPING_EPS
            self.video.ba(
                self.target, self.weight, eta, ii, jj, mask, 1, t,
                itrs=self.cfg.ba_iters,
                lm=self.cfg.backend_lm, ep=self.cfg.backend_ep,
                motion_only=False,
                pose_cap=self.P, depth_cap=self.K, degree_cap=self.D,
            )

    # ------------------------------------------------------------------
    # graph construction policies
    # ------------------------------------------------------------------

    def add_neighborhood_factors(self, t0, t1, r=3):
        """All pairs within temporal radius r (factor_graph.py:292-302)."""
        ii, jj = np.meshgrid(np.arange(t0, t1), np.arange(t0, t1),
                             indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)
        c = 1 if self.cfg.stereo else 0
        keep = (np.abs(ii - jj) > c) & (np.abs(ii - jj) <= r)
        self.add_factors(ii[keep], jj[keep])

    def add_proximity_factors(self, t0=0, t1=0, rad=2, nms=2, beta=0.25,
                              thresh=16.0, remove=False):
        """Distance-sorted greedy edge selection with Manhattan NMS
        (factor_graph.py:305-369)."""
        t = self.video.counter
        ix = np.arange(t0, t)
        jx = np.arange(t1, t)
        if len(ix) == 0 or len(jx) == 0:
            return

        ii_g, jj_g = np.meshgrid(ix, jx, indexing="ij")
        # np.array (copy): asarray of a jax array is a read-only view
        with _T.phase("proximity.distance"):
            d = np.array(
                self.video.distance(ii_g.reshape(-1), jj_g.reshape(-1),
                                    beta=beta, bidirectional=False)
            ).reshape(len(ix), len(jx))

        # native C++ selection (same semantics, no Python loops)
        from .. import native
        max_f = self.max_factors if self.max_factors > 0 else 1 << 40
        res = native.select_proximity_edges(
            d, t0, t1, t,
            np.concatenate([self.ii, self.ii_bad, self.ii_inac]),
            np.concatenate([self.jj, self.jj_bad, self.jj_inac]),
            rad, nms, thresh, max_f, self.cfg.stereo,
        )
        if res is not None:
            ii_sel, jj_sel = res
            if len(ii_sel):
                with _T.phase("proximity.add_factors"):
                    self.add_factors(ii_sel, jj_sel, remove)
            return

        d[ii_g - rad < jj_g] = np.inf
        d[d > 100] = np.inf

        def suppress(i, j):
            r = max(min(abs(int(i) - int(j)) - 2, nms), 0)
            for di in range(-nms, nms + 1):
                for dj in range(-nms, nms + 1):
                    if abs(di) + abs(dj) <= r:
                        i1, j1 = int(i) + di, int(j) + dj
                        if t0 <= i1 < t and t1 <= j1 < t:
                            d[i1 - t0, j1 - t1] = np.inf

        for i, j in zip(
            np.concatenate([self.ii, self.ii_bad, self.ii_inac]),
            np.concatenate([self.jj, self.jj_bad, self.jj_inac]),
        ):
            suppress(i, j)

        es = []
        for i in range(t0, t):
            if self.cfg.stereo:
                es.append((i, i))
                if t1 <= i < t:
                    d[i - t0, i - t1] = np.inf
            for j in range(max(i - rad - 1, 0), i):
                es.append((i, j))
                es.append((j, i))
                if t1 <= j < t:
                    d[i - t0, j - t1] = np.inf

        order = np.argsort(d, axis=None)
        n_cols = d.shape[1]
        for k in order:
            di, dj = int(k) // n_cols, int(k) % n_cols
            if d[di, dj] > thresh:
                continue
            if len(es) > self.max_factors:
                break
            i, j = int(ix[di]), int(jx[dj])
            es.append((i, j))
            es.append((j, i))
            suppress(i, j)

        if es:
            es = np.asarray(es, np.int64)
            self.add_factors(es[:, 0], es[:, 1], remove)
