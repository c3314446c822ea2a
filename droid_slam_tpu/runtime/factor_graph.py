"""Dynamic covisibility factor graph over the keyframe map.

Re-design of /root/reference/droid_slam/factor_graph.py for TPU execution:

  * Control plane (edge bookkeeping, slot allocation, dedup, LRU eviction,
    proximity/NMS selection) runs on the host in numpy — tiny, sequential,
    data-dependent.
  * Data plane (per-edge GRU state, targets/weights, the update operator,
    and BA) lives in fixed-capacity device arrays indexed by *slot* with
    validity masks: removing an edge only frees its slot on the host — no
    device gather/scatter at all.  Each jitted function compiles once per
    capacity.
  * Correlation is computed on the fly every update: the per-edge volume
    is one MXU einsum over stored frame features (~2 ms for a frontend
    window) and the windowed lookup is the gather-free one-hot matmul
    (ops/corr.py).  The reference instead precomputes per-edge volume
    pyramids (factor_graph.py:109-115) and keeps a separate
    low-memory "altcorr" path for global BA (:246-290); on TPU the
    recompute is cheaper than maintaining per-edge volume state, so ONE
    path serves both the frontend and the backend (chunked over edge
    slots for large graphs).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..geom import projective
from ..ops import corr as corr_ops
from ..ops.gathers import take_rows
from ..utils.timers import GLOBAL_TIMERS as _T

DAMPING_EPS = 1e-7    # EP in factor_graph.update (factor_graph.py:196)


def corr_pixel_chunk(cfg, edge_chunk, hw):
    """Low-memory pixel blocking for the on-the-fly correlation: explicit
    cfg.corr_pixel_chunk, or auto when the level-0 volume transient
    (edge_chunk · hw² bf16) would exceed ~0.6 GB (the 1000-keyframe
    384×512 global-BA regime the reference's altcorr kernel serves,
    src/altcorr_kernel.cu:28-149)."""
    if cfg.corr_pixel_chunk > 0:
        return cfg.corr_pixel_chunk
    if edge_chunk * hw * hw * 2 > 600_000_000:
        return 512
    return 0


class FactorGraph:
    def __init__(self, video, net, params, corr_impl="alt",
                 max_factors=48, edge_cap=None, inac_cap=None,
                 pose_cap=None, depth_cap=None, degree_cap=None,
                 upsample=False, update_chunk=None, state_dtype=None):
        self.video = video
        self.net = net
        self.params = params
        self.cfg = video.cfg
        self.max_factors = max_factors
        self.upsample = upsample

        self.ht, self.wd = video.fht, video.fwd
        # optional BA override: fn(target, weight, eta, ii, jj, mask,
        # t0, t1) — the Backend routes global BA through the distributed
        # edge-sharded solver (parallel/dba.py) with this hook
        self.ba_fn = None

        self.E = edge_cap or max(self.cfg.frontend_edge_cap, max_factors + 16)
        self.I = inac_cap if inac_cap is not None else min(self.E, 256)
        self.P = pose_cap or self.cfg.frontend_pose_cap
        self.K = depth_cap or self.cfg.frontend_depth_cap
        self.D = degree_cap or self.cfg.schur_degree_cap
        # edges processed per update-operator jit call (memory bound: the
        # on-the-fly level-0 volume is chunk·HW² bf16)
        self.chunk = update_chunk or min(self.E, 64)
        # GRU-state store dtype: bf16 for large backends (the reference
        # keeps its net state in fp16 via autocast, factor_graph.py:84)
        self.state_dtype = state_dtype or jnp.float32

        # host-side edge lists; `slots` maps each edge to its device slot
        self.ii = np.zeros(0, np.int64)
        self.jj = np.zeros(0, np.int64)
        self.age = np.zeros(0, np.int64)
        self.slots = np.zeros(0, np.int64)
        self.ii_inac = np.zeros(0, np.int64)
        self.jj_inac = np.zeros(0, np.int64)
        self.ii_bad = np.zeros(0, np.int64)
        self.jj_bad = np.zeros(0, np.int64)

        # device edge state is allocated LAZILY in power-of-two buckets up
        # to self.E: a 1024-keyframe backend's worst-case cap (16·t edges
        # × h·w×128 state = tens of GB) must not be materialized when the
        # proximity policy actually selects ~4 edges/keyframe.  Each growth
        # doubles capacity => O(log E) reallocations/compiles per session.
        self.E_alloc = 0
        self.free = []
        self._jit_cache = {}
        ht, wd = self.ht, self.wd
        self.net_state = jnp.zeros((0, ht, wd, 128), self.state_dtype)
        self.target = jnp.zeros((0, ht, wd, 2), jnp.float32)
        self.weight = jnp.zeros((0, ht, wd, 2), jnp.float32)
        self._grow(min(self.E, max(self.chunk, 64)))
        self.target_inac = jnp.zeros((self.I, ht, wd, 2), jnp.float32)
        self.weight_inac = jnp.zeros((self.I, ht, wd, 2), jnp.float32)


    def _grow(self, need):
        """Grow the slot-indexed device edge arrays to hold `need` edges
        (next power-of-two bucket, capped at self.E)."""
        if need <= self.E_alloc:
            return
        new = max(self.E_alloc, 1)
        while new < need:
            new *= 2
        new = min(new, self.E)
        if new <= self.E_alloc:
            return
        # grow each array in ONE jitted program (zeros(new).at[:n].set(old)):
        # peak HBM = old + new.  The previous concatenate([old, zeros(pad)])
        # materialized BOTH the pad operand and the result — a ~2x(new)
        # transient (12.9 GB at 8192 f16 GRU slots) that OOM'd the 512-kf
        # backend on a quiet 12-GB chip (runs/r4/backend_512.log)
        self.net_state = self._grow_array(self.net_state, new)
        self.target = self._grow_array(self.target, new)
        self.weight = self._grow_array(self.weight, new)
        self.free.extend(range(self.E_alloc, new))
        self.E_alloc = new
        import os
        if os.environ.get("DROID_MEM_LOG"):
            ht, wd = self.ht, self.wd
            per = ht * wd * (128 * self.net_state.dtype.itemsize + 16)
            print(f"[mem] graph._grow: need {need} -> {new} slots "
                  f"({new * per / 1e9:.2f} GB edge state)", flush=True)

    def _grow_array(self, arr, new_rows):
        """zeros((new_rows, ...)) with arr written into the head, as one
        XLA program — no concatenate operand transient."""
        import jax

        shape = (new_rows,) + arr.shape[1:]
        key = ("grow", shape, str(arr.dtype), arr.shape[0])
        fn = self._get_jit(key, lambda: jax.jit(
            lambda old: jnp.zeros(shape, arr.dtype).at[:old.shape[0]]
            .set(old)
        ))
        return fn(arr)

    # ------------------------------------------------------------------
    # host bookkeeping helpers
    # ------------------------------------------------------------------

    @property
    def n(self):
        return len(self.ii)

    def _edge_arrays(self):
        """(E_alloc,) slot-indexed ii/jj arrays + validity mask."""
        ii = np.zeros(self.E_alloc, np.int32)
        jj = np.zeros(self.E_alloc, np.int32)
        mask = np.zeros(self.E_alloc, bool)
        ii[self.slots] = self.ii
        jj[self.slots] = self.jj
        mask[self.slots] = True
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

    def _get_jit(self, key, builder):
        if key not in self._jit_cache:
            self._jit_cache[key] = builder()
        return self._jit_cache[key]

    # ------------------------------------------------------------------
    # jitted data-plane pieces
    # ------------------------------------------------------------------

    def _build_insert(self, chunk):
        """Write `chunk` new edges' state into their slots (contiguous
        dynamic-update-slices per slot, no scatter).  GRU state is seeded
        from the source frame's context features (factor_graph.py:108).

        The seed row is fetched per-iteration with a scalar dynamic
        slice, NOT a batched take_rows: the loop is already serial per
        edge, and materializing all `chunk` seeded rows up front costs
        chunk·786 KB — at the backend's 8192-edge insert that was a
        6.4 GB f16 temp plus a 6.4 GB layout copy, the second OOM of
        runs/r4/backend_512b.log.  The big edge stores are donated so
        the update happens in place (input+output would otherwise
        double the 6.85 GB store)."""
        from functools import partial

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def fn(net_state, target, weight, nets_frames, new_target,
               ii_c, slots, valid):
            def body(k, carry):
                ns, tg, wg = carry
                s = slots[k]

                def write(x, new_row):
                    row = jnp.where(valid[k], new_row, x[s])
                    return jax.lax.dynamic_update_slice_in_dim(
                        x, row[None], s, axis=0
                    )

                seed = jax.lax.dynamic_index_in_dim(
                    nets_frames, ii_c[k], 0, keepdims=False
                ).astype(ns.dtype)
                ns = write(ns, seed)
                tg = write(tg, new_target[k])
                wg = write(wg, jnp.zeros_like(new_target[k]))
                return ns, tg, wg

            return jax.lax.fori_loop(
                0, chunk, body, (net_state, target, weight)
            )

        return fn

    def _build_inac_store(self, chunk):
        from functools import partial

        @partial(jax.jit, donate_argnums=(0, 1))
        def fn(t_inac, w_inac, target, weight, src_slots, dst_slots, valid):
            def body(k, carry):
                ti, wi = carry
                s = src_slots[k]
                d = dst_slots[k]

                def write(x, row):
                    row = jnp.where(valid[k], row, x[d])
                    return jax.lax.dynamic_update_slice_in_dim(
                        x, row[None], d, axis=0
                    )

                ti = write(ti, target[s])
                wi = write(wi, weight[s])
                return ti, wi

            return jax.lax.fori_loop(0, chunk, body, (t_inac, w_inac))

        return fn

    def _build_update_core(self):
        """Update-operator pass over one chunk of edge slots with
        on-the-fly correlation (serves frontend update AND backend
        update_lowmem — factor_graph.py:196-242, 246-290)."""
        net_mod = self.net
        ht, wd = self.ht, self.wd
        buf = self.cfg.buffer
        rig = 2 if self.cfg.stereo else 1
        want_upmask = self.upsample
        pixel_chunk = corr_pixel_chunk(self.cfg, self.chunk, ht * wd)

        @jax.jit
        def fn(params, poses, disps, intrinsics, fmap_pyr, inps_frames,
               net_chunk, target_chunk, ii_c, jj_c, mask_c):
            coords1, _ = projective.projective_transform(
                poses[None], disps[None], intrinsics[None], ii_c, jj_c
            )
            coords1 = coords1[0]
            coords0 = projective.coords_grid(ht, wd)
            motn = jnp.clip(
                jnp.concatenate(
                    [coords1 - coords0, target_chunk - coords1], axis=-1
                ),
                -64.0, 64.0,
            )

            # on-the-fly correlation (stereo: right camera for ii==jj)
            f1 = take_rows(fmap_pyr[0], rig * ii_c).astype(jnp.float32) / 4.0
            cam2 = rig * jj_c + (ii_c == jj_c).astype(jnp.int32) * (rig - 1)
            f2_levels = [
                take_rows(p, cam2).astype(jnp.float32) / 4.0
                for p in fmap_pyr
            ]
            corr = corr_ops.alt_lookup_pyramid(
                f1, f2_levels, coords1, pixel_chunk=pixel_chunk
            )

            inp = take_rows(inps_frames, ii_c)
            Ec = ii_c.shape[0]
            # GraphAgg over LOCAL chunk segments: all edges of a frame
            # share a segment, so aggregating by first-occurrence edge
            # index is exactly the per-frame mean — but with Ec+1
            # segments instead of buf+1.  With nseg=buf every chunk
            # convolved (buf+1)-batch tensors: ~1.6 GB of temps and
            # ~700 GFLOP of conv per 64-edge chunk at the 1000-keyframe
            # backend (the OOM of runs/r4/backend_1000c.log).
            first = jnp.argmax(
                (ii_c[None, :] == ii_c[:, None]) & mask_c[None, :], axis=1
            ).astype(jnp.int32)
            loc = jnp.where(mask_c, first, Ec)
            net_new, delta, weight, eta_loc, upmask_loc = net_mod.apply(
                params, net_chunk, inp, corr, motn,
                method=lambda m, n, i, c, f, ix, nseg: m.update(
                    n, i, c, f, ix=ix, nseg=nseg
                ),
                ix=loc, nseg=Ec,
            )
            mask_f = mask_c[:, None, None, None].astype(net_new.dtype)
            net_new = net_new * mask_f + net_chunk * (1 - mask_f)
            target_new = coords1 + delta * mask_f
            weight_new = weight * mask_f
            # scatter the per-segment eta back to frame rows (mean over a
            # frame's edges of identical values == the value)
            seg = jnp.where(mask_c, ii_c, buf)
            ones = jnp.ones_like(seg, jnp.float32)
            cnt = jax.ops.segment_sum(
                ones, seg, num_segments=buf + 1
            )[:-1]
            eta_edge = take_rows(eta_loc.astype(jnp.float32), loc)
            eta_seg = jax.ops.segment_sum(
                eta_edge * mask_c[:, None, None].astype(jnp.float32),
                seg, num_segments=buf + 1,
            )[:-1] / jnp.maximum(cnt, 1.0)[:, None, None]
            if want_upmask:
                up_edge = take_rows(upmask_loc.astype(jnp.float32), loc)
                upmask = jax.ops.segment_sum(
                    up_edge * mask_c[:, None, None, None].astype(
                        jnp.float32),
                    seg, num_segments=buf + 1,
                )[:-1] / jnp.maximum(cnt, 1.0)[:, None, None, None]
            else:
                # don't materialize the (buf, h, w, 576) mask when unused
                upmask = jnp.zeros((), jnp.float32)
            return net_new, target_new, weight_new, eta_seg, cnt > 0, upmask

        return fn

    def _build_writeback(self, n_real):
        """Write one update-op chunk's results back into the (donated)
        edge stores in place."""
        from functools import partial

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def fn(net_state, target, weight, net_new, tgt_new, wgt_new, lo):
            net_state = jax.lax.dynamic_update_slice_in_dim(
                net_state, net_new[:n_real].astype(net_state.dtype),
                lo, axis=0,
            )
            target = jax.lax.dynamic_update_slice_in_dim(
                target, tgt_new[:n_real], lo, axis=0
            )
            weight = jax.lax.dynamic_update_slice_in_dim(
                weight, wgt_new[:n_real], lo, axis=0
            )
            return net_state, target, weight

        return fn

    def _run_update_op(self):
        """Run the update operator over all edge slots (chunked)."""
        state = self.video.state
        ii, jj, mask = self._edge_arrays()
        fmap_pyr = self.video.fmap_pyramids()
        fn = self._get_jit("update_core", self._build_update_core)

        nchunks = (self.E_alloc + self.chunk - 1) // self.chunk
        for c in range(nchunks):
            lo, hi = c * self.chunk, min((c + 1) * self.chunk, self.E_alloc)
            pad = self.chunk - (hi - lo)

            def padc(x, fill=0):
                return np.concatenate(
                    [x[lo:hi], np.full((pad,), fill, x.dtype)]
                ) if pad else x[lo:hi]

            if not mask[lo:hi].any():
                continue

            net_c = jax.lax.dynamic_slice_in_dim(
                self.net_state, lo, self.chunk, axis=0
            ) if pad == 0 else jnp.concatenate(
                [self.net_state[lo:hi],
                 jnp.zeros((pad,) + self.net_state.shape[1:],
                           self.net_state.dtype)]
            )
            tgt_c = self.target[lo:hi] if pad == 0 else jnp.concatenate(
                [self.target[lo:hi],
                 jnp.zeros((pad,) + self.target.shape[1:])]
            )

            net_new, tgt_new, wgt_new, eta_seg, has_edge, upmask = fn(
                self.params, state.poses, state.disps, state.intrinsics,
                fmap_pyr, state.inps, net_c, tgt_c,
                jnp.asarray(padc(ii)), jnp.asarray(padc(jj)),
                jnp.asarray(padc(mask)),
            )
            n_real = hi - lo
            # jitted in-place writeback (donated stores): each of these
            # updates run eagerly would allocate a fresh copy of the
            # whole edge store — old + new = 2 x 6.85 GB at the 8192-slot
            # backend, the third OOM of runs/r4/backend_512c.log
            wb = self._get_jit(("writeback", n_real),
                               lambda: self._build_writeback(n_real))
            self.net_state, self.target, self.weight = wb(
                self.net_state, self.target, self.weight,
                net_new, tgt_new, wgt_new, jnp.asarray(lo, jnp.int32),
            )
            damping = jnp.where(
                has_edge[:, None, None], eta_seg, state.damping
            )
            state = state.replace(damping=damping)
            # large backends: bound async pipelining inside the sweep —
            # the relay enqueues all ~100 chunk programs at once and
            # their output buffers accumulate ahead of execution
            if self.E_alloc >= 2048 and (c + 1) % 16 == 0:
                _ = float(np.asarray(has_edge[0]))
                from ..utils.mem import log_mem
                log_mem(f"update chunk {c + 1}/{nchunks}")
            if self.upsample:
                # convex-upsample the disparities of this chunk's updated
                # source frames into disps_up (reference
                # factor_graph.py:235-236, depth_video.py:123-127)
                from ..models.update import upsample_disp

                up = upsample_disp(state.disps, upmask)
                disps_up = jnp.where(
                    has_edge[:, None, None], up, state.disps_up
                )
                state = state.replace(disps_up=disps_up)
            self.video.state = state

    # ------------------------------------------------------------------
    # graph edits
    # ------------------------------------------------------------------

    def add_factors(self, ii, jj, remove=False):
        """Add edges (factor_graph.py:85-133): dedup, LRU-evict over the
        factor budget, seed targets by reprojection."""
        ii = np.asarray(ii, np.int64).reshape(-1)
        jj = np.asarray(jj, np.int64).reshape(-1)
        ii, jj = self._dedup(ii, jj)
        if len(ii) == 0:
            return

        room = self.max_factors - self.n if self.max_factors > 0 else len(ii)
        if self.max_factors > 0 and len(ii) > room and self.n > 0 and remove:
            n_evict = min(self.n, len(ii) - max(room, 0))
            order = np.argsort(-self.age)
            evict_mask = np.zeros(self.n, bool)
            evict_mask[order[:n_evict]] = True
            self.rm_factors(evict_mask, store=True)
        if self.n + len(ii) > self.E:
            keep = self.E - self.n
            ii, jj = ii[:keep], jj[:keep]
        if len(ii) == 0:
            return

        self._grow(self.n + len(ii))
        slots = np.asarray([self.free.pop() for _ in ii], np.int64)

        chunk = 8 * ((len(ii) + 7) // 8)
        ii_p = np.zeros(chunk, np.int32)
        jj_p = np.zeros(chunk, np.int32)
        sl_p = np.zeros(chunk, np.int32)
        val = np.zeros(chunk, bool)
        ii_p[: len(ii)], jj_p[: len(ii)] = ii, jj
        sl_p[: len(ii)], val[: len(ii)] = slots, True

        new_target, _ = self.video.reproject(ii_p, jj_p)

        ins = self._get_jit(("insert", chunk),
                            lambda: self._build_insert(chunk))
        self.net_state, self.target, self.weight = ins(
            self.net_state, self.target, self.weight,
            self.video.state.nets, new_target,
            jnp.asarray(ii_p), jnp.asarray(sl_p), jnp.asarray(val),
        )

        self.ii = np.concatenate([self.ii, ii])
        self.jj = np.concatenate([self.jj, jj])
        self.age = np.concatenate([self.age, np.zeros(len(ii), np.int64)])
        self.slots = np.concatenate([self.slots, slots])

    def rm_factors(self, mask, store=False):
        """Remove masked edges (factor_graph.py:136-160).  Device cost is
        zero except archiving removed targets/weights when store=True."""
        mask = np.asarray(mask, bool)
        if mask.sum() == 0:
            return
        drop = np.nonzero(mask)[0]
        keep = ~mask

        if store:
            k = len(drop)
            n_inac = len(self.ii_inac)
            take = min(k, self.I - n_inac)
            if take > 0:
                chunk = 8 * ((take + 7) // 8)
                src = np.zeros(chunk, np.int32)
                dst = np.zeros(chunk, np.int32)
                val = np.zeros(chunk, bool)
                src[:take] = self.slots[drop[:take]]
                dst[:take] = np.arange(take) + n_inac
                val[:take] = True
                fn = self._get_jit(("inac", chunk),
                                   lambda: self._build_inac_store(chunk))
                self.target_inac, self.weight_inac = fn(
                    self.target_inac, self.weight_inac,
                    self.target, self.weight,
                    jnp.asarray(src), jnp.asarray(dst), jnp.asarray(val),
                )
                self.ii_inac = np.concatenate(
                    [self.ii_inac, self.ii[drop[:take]]]
                )
                self.jj_inac = np.concatenate(
                    [self.jj_inac, self.jj[drop[:take]]]
                )

        self.free.extend(int(s) for s in self.slots[drop])
        self.ii = self.ii[keep]
        self.jj = self.jj[keep]
        self.age = self.age[keep]
        self.slots = self.slots[keep]

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
            # compact the (small) inactive store on device
            keep = ~m
            kept_idx = np.nonzero(keep)[0]
            perm = np.zeros(self.I, np.int32)
            perm[: len(kept_idx)] = kept_idx
            self.target_inac = take_rows(self.target_inac,
                                         jnp.asarray(perm))
            self.weight_inac = take_rows(self.weight_inac,
                                         jnp.asarray(perm))
            self.ii_inac = self.ii_inac[keep]
            self.jj_inac = self.jj_inac[keep]

        m = (self.ii == ix) | (self.jj == ix)
        self.ii = np.where(self.ii >= ix, self.ii - 1, self.ii)
        self.jj = np.where(self.jj >= ix, self.jj - 1, self.jj)
        self.rm_factors(m, store=False)

    def clear_edges(self):
        self.rm_factors(np.ones(self.n, bool), store=False)
        # donated zero-fill: eager zeros_like would hold old + new
        # (2 x 6.44 GB at the 8192-slot backend) until the rebind
        zf = self._get_jit(
            ("zero_fill", self.net_state.shape, str(self.net_state.dtype)),
            lambda: jax.jit(jnp.zeros_like, donate_argnums=0),
        )
        self.net_state = zf(self.net_state)

    def filter_edges(self):
        """Drop long-range edges with near-zero confidence
        (factor_graph.py:72-81)."""
        if self.n == 0:
            return
        conf = np.asarray(
            jnp.mean(take_rows(self.weight, jnp.asarray(self.slots)),
                     axis=(1, 2, 3))
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
        with _T.phase("graph.update_core"):
            self._run_update_op()

        if t0 is None:
            t0 = max(1, int(self.ii.min()) + 1)

        with _T.phase("graph.ba"):
            self._ba(t0, t1, itrs, use_inactive, motion_only)
        self.age += 1

    def update_lowmem(self, steps=8, chunk=None):
        """Global BA sweeps (factor_graph.py:246-290).  The chunked
        on-the-fly-correlation update core IS the low-memory path; this
        just runs `steps` rounds with the backend damping profile."""
        t = self.video.counter
        from ..utils.mem import log_mem
        for step in range(steps):
            if self.n == 0:
                return
            with _T.phase("graph.update_core"):
                self._run_update_op()
            if step == 0:
                log_mem("update_lowmem: first update sweep")
            eta = 0.2 * self.video.state.damping + DAMPING_EPS
            ii, jj, mask = self._edge_arrays()
            with _T.phase("graph.ba"):
                if self.ba_fn is not None:
                    self.ba_fn(self.target, self.weight, eta,
                               ii, jj, mask, 1, t)
                else:
                    self.video.ba(
                        self.target, self.weight, eta, ii, jj, mask, 1, t,
                        itrs=self.cfg.ba_iters,
                        lm=self.cfg.backend_lm, ep=self.cfg.backend_ep,
                        motion_only=False,
                        pose_cap=self.P, depth_cap=self.K,
                        degree_cap=self.D,
                    )
            # one blocking readback per sweep: fully-async sweeps let the
            # next sweep's update/BA transients overlap this one's (the
            # allocator then needs ~2 sweeps of transients at once — the
            # final straw of the 512-kf OOM, runs/r4/backend_512d.log).
            # Costs one relay round-trip (~0.3 s) per sweep.
            _ = float(np.asarray(self.video.state.poses[0, 0]))

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
        # keep the newest I inactive edges if more pass the recency
        # filter than the fixed-size arrays hold (long sessions)
        sel = np.nonzero(m)[0][-self.I:]
        ii_i[: len(sel)] = self.ii_inac[sel]
        jj_i[: len(sel)] = self.jj_inac[sel]
        mask_i[: len(sel)] = True

        perm = np.zeros(self.I, np.int32)
        perm[: len(sel)] = sel
        t_inac = take_rows(self.target_inac, jnp.asarray(perm))
        w_inac = take_rows(self.weight_inac, jnp.asarray(perm))

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

        # pure-python fallback (reference semantics)
        d[ii_g - rad < jj_g] = np.inf
        d[d > 100] = np.inf

        def suppress(i, j):
            r_ = max(min(abs(int(i) - int(j)) - 2, nms), 0)
            for di in range(-nms, nms + 1):
                for dj in range(-nms, nms + 1):
                    if abs(di) + abs(dj) <= r_:
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
