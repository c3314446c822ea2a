"""Distributed global bundle adjustment over a device mesh.

The reference is single-GPU; distributing its global BA is the north-star
scaling extension (BASELINE.json): partition the factor-graph *edges by
source frame* across devices so that each depth frame's Schur elimination
is entirely local to one device — the per-frame accumulators and the depth
updates never cross the interconnect.  Only the dense pose system (H, v
and the Schur complement S — P·6 × P·6 blocks) is all-reduced with
`jax.lax.psum` over the mesh axis, then every device runs the same small
replicated Cholesky solve.  This matches the communication-optimal shape
of the problem: O(P²·36) bytes per iteration on the wire, independent of
image resolution and edge count.

The per-shard math uses the same gather/scatter-free selector-matmul
formulation as ops/dba.py.

Host-side `shard_edges_by_frame` does the partitioning (control plane);
`distributed_ba` is the shard_map'ed data plane.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..lie import se3
from ..ops import dba as dba_ops
from ..ops.gathers import take_rows

# shared with the single-device solver so local and distributed global
# BA assemble the same system at the same matmul precision (ADVICE r2)
_HIGH = dba_ops.GN_PRECISION


def _partition_frames(ii, edge_mask, t0, t1, n_shards):
    """CONTIGUOUS balanced partition of depth frames by edge count.

    SLAM graphs are temporally local, so contiguous frame ranges keep
    each shard's pose-adjacency window small — the compact per-shard
    Schur path depends on it (a greedy heaviest-first packing balances
    load marginally better but scatters frames across the trajectory,
    and the local pose tables blow up toward the full window).

    Returns (shard_frames: list of frame lists, frame_edges: dict).
    """
    ii = np.asarray(ii)
    edge_mask = np.asarray(edge_mask)
    frames = np.unique(np.concatenate([np.arange(t0, t1), ii[edge_mask]]))
    frame_edges = {
        int(f): np.nonzero((ii == f) & edge_mask)[0] for f in frames
    }
    loads = np.array(
        [len(frame_edges[int(f)]) for f in frames], np.int64
    )
    cum = np.cumsum(loads)
    total = max(int(cum[-1]), 1)
    shard_frames = [[] for _ in range(n_shards)]
    for k, f in enumerate(frames):
        s = min(int(max(cum[k] - 1, 0) * n_shards // total), n_shards - 1)
        shard_frames[s].append(int(f))
    return shard_frames, frame_edges


def plan_shard_caps(ii, edge_mask, t0, t1, n_shards):
    """Exact per-shard capacity requirements for the contiguous partition
    (max edges per shard, max frames per shard, max frame degree) —
    callers bucket these before shard_edges_by_frame so a concentrated
    edge distribution can never overflow the static caps."""
    shard_frames, frame_edges = _partition_frames(
        ii, edge_mask, t0, t1, n_shards
    )
    need_e = max(
        (sum(len(frame_edges[f]) for f in fr) for fr in shard_frames),
        default=1,
    )
    need_k = max((len(fr) for fr in shard_frames), default=1)
    need_d = max(
        (len(e) for e in frame_edges.values()), default=1,
    )
    return max(need_e, 1), max(need_k, 1), max(need_d, 1)


def shard_edges_by_frame(ii, jj, target, weight, edge_mask, n_shards,
                         E_shard, K_shard, D, t0, t1):
    """Partition edges so all edges with the same source frame land on
    one shard (contiguous prefix-sum partition, _partition_frames).

    Returns per-shard stacked arrays:
      ii, jj (S, E_shard), target/weight (S, E_shard, h, w, 2),
      mask (S, E_shard), kx (S, K_shard), kmask, edge_table (S, K_shard, D).
    """
    ii = np.asarray(ii)
    jj = np.asarray(jj)
    edge_mask = np.asarray(edge_mask)
    target = np.asarray(target)
    weight = np.asarray(weight)
    hw = target.shape[1:]

    shard_frames, frame_edges = _partition_frames(
        ii, edge_mask, t0, t1, n_shards
    )

    out_ii = np.zeros((n_shards, E_shard), np.int32)
    out_jj = np.zeros((n_shards, E_shard), np.int32)
    out_tgt = np.zeros((n_shards, E_shard) + hw, np.float32)
    out_wgt = np.zeros((n_shards, E_shard) + hw, np.float32)
    out_msk = np.zeros((n_shards, E_shard), bool)
    out_kx = np.zeros((n_shards, K_shard), np.int32)
    out_km = np.zeros((n_shards, K_shard), bool)
    out_tbl = -np.ones((n_shards, K_shard, D), np.int32)

    for s in range(n_shards):
        pos = 0
        for k_slot, f in enumerate(sorted(shard_frames[s])):
            if k_slot >= K_shard:
                raise ValueError(
                    f"shard {s} needs {len(shard_frames[s])} depth frames "
                    f"> cap {K_shard}"
                )
            e = frame_edges[f]
            if pos + len(e) > E_shard:
                raise ValueError(
                    f"shard {s} needs more than {E_shard} edge slots"
                )
            if len(e) > D:
                raise ValueError(f"frame {f} degree {len(e)} > cap {D}")
            out_kx[s, k_slot] = f
            out_km[s, k_slot] = True
            n_e = len(e)
            out_ii[s, pos:pos + n_e] = ii[e]
            out_jj[s, pos:pos + n_e] = jj[e]
            out_tgt[s, pos:pos + n_e] = target[e]
            out_wgt[s, pos:pos + n_e] = weight[e]
            out_msk[s, pos:pos + n_e] = True
            out_tbl[s, k_slot, :n_e] = np.arange(pos, pos + n_e)
            pos += n_e

    return (out_ii, out_jj, out_tgt, out_wgt, out_msk, out_kx, out_km,
            out_tbl)


def build_shard_compact_tables(shard_ii, shard_jj, shard_mask, shard_kx,
                               shard_kmask, t0, t1, CK, P_cap):
    """Per-shard local pose tables (compact Schur) with a common Dp.

    Returns (loc (S, nch, Dp) int32, val (S, nch, Dp) bool, Dp) or None
    when a shard's connectivity overflows the pose window.  Profitability
    (Dp sufficiently below P_cap) is the caller's call.
    """
    S = shard_ii.shape[0]
    first = [
        dba_ops.build_compact_pose_tables(
            shard_ii[s], shard_jj[s], shard_mask[s], shard_kx[s],
            shard_kmask[s], t0, t1, CK, P_cap,
        )
        for s in range(S)
    ]
    if any(t is None for t in first):
        return None
    Dp = max(t[2] for t in first)
    # re-pad each shard's tables to the common Dp (cheaper than a
    # second table-building pass; the entries are identical)
    locs, vals = [], []
    for loc, val, dp in first:
        if dp < Dp:
            pad = ((0, 0), (0, Dp - dp))
            loc = np.pad(loc, pad)
            val = np.pad(val, pad)
        locs.append(loc)
        vals.append(val)
    return np.stack(locs), np.stack(vals), Dp


def make_distributed_ba(mesh, axis="ba", *, iters=2, lm=1e-5, ep=1e-2,
                        P_cap=128, schur_chunk=None, compact=False):
    """Build the shard_map'ed distributed BA step for `mesh`.

    Replicated inputs: poses/disps/disps_sens/intrinsics/eta (full buffer),
    t0, t1.  Sharded inputs (leading mesh-axis dim): per-shard edge arrays
    from shard_edges_by_frame.  Returns (poses, disps), replicated.

    With compact=True the call additionally takes per-shard local pose
    tables (build_shard_compact_tables) after `table`, and the per-shard
    Schur elimination runs against those Dp-entry tables instead of the
    full P_cap window (ops/dba.py compact path; ~P/Dp fewer FLOPs at
    512-1024-keyframe scale).  schur_chunk must then match the tables.
    """

    def ba_shard(poses, disps, disps_sens, intrinsics, eta,
                 ii, jj, target, weight, mask, kx, kmask, table,
                 *rest):
        if compact:
            loc_pose, loc_valid, t0, t1 = rest
        else:
            t0, t1 = rest
            loc_pose = loc_valid = None
        # strip the leading shard dim (size 1 per device under shard_map)
        (ii, jj, target, weight, mask, kx, kmask, table) = jax.tree.map(
            lambda x: x[0], (ii, jj, target, weight, mask, kx, kmask, table)
        )
        if compact:
            loc_pose = loc_pose[0]
            loc_valid = loc_valid[0]
        ht, wd = disps.shape[-2:]
        HW = ht * wd
        K = kx.shape[0]
        buf = poses.shape[0]

        CK = schur_chunk or max(1, min(32, 4096 // max(P_cap, 1)))
        nchunks = (K + CK - 1) // CK
        if compact:
            assert loc_pose.shape[0] == nchunks, (
                "compact tables require the schur_chunk they were built "
                "with (build_shard_compact_tables)"
            )
        Kpad = nchunks * CK
        kx_pad = jnp.concatenate([kx, jnp.zeros((Kpad - K,), kx.dtype)])
        km_pad = jnp.concatenate(
            [kmask, jnp.zeros((Kpad - K,), kmask.dtype)]
        )

        def iteration(carry, _):
            poses, disps = carry

            Hblk, v, Eii, Eij, Cii, wi = dba_ops._linearize(
                poses, disps, intrinsics, target, weight, ii, jj, mask
            )
            H, vd, Pj = dba_ops._pose_system(
                Hblk, v, ii, jj, t0, P_cap, mask
            )

            dsk = take_rows(disps_sens.reshape(buf, HW), kx)
            dk = take_rows(disps.reshape(buf, HW), kx)
            eta_k = take_rows(eta.reshape(buf, HW), kx)
            m_sens = (dsk > 0).astype(jnp.float32)

            def _depth_terms(M, kx_c, km_c, c):
                C_c = jnp.einsum("ec,eh->ch", M, Cii, precision=_HIGH)
                w_c = jnp.einsum("ec,eh->ch", M, wi, precision=_HIGH)
                sl = (jnp.arange(CK) + c * CK).clip(0, K - 1)
                ms = m_sens[sl]
                C_c = C_c + ms * dba_ops.ALPHA + (1.0 - ms) * eta_k[sl]
                w_c = w_c - ms * dba_ops.ALPHA * (dk[sl] - dsk[sl])
                Q_c = jnp.where(km_c[:, None], 1.0 / C_c, 0.0)
                return Q_c, w_c

            def chunk_E_dense(c):
                kx_c = jax.lax.dynamic_slice(kx_pad, (c * CK,), (CK,))
                km_c = jax.lax.dynamic_slice(km_pad, (c * CK,), (CK,))
                M = (
                    (ii[:, None] == kx_c[None, :])
                    & mask[:, None] & km_c[None, :]
                ).astype(jnp.float32)
                S2 = M[:, :, None] * Pj[:, None, :]
                E_edge = jnp.einsum("eah,ecp->cpah", Eij, S2,
                                    precision=_HIGH)
                E_self = jnp.einsum("ec,eah->cah", M, Eii, precision=_HIGH)
                pk = kx_c - t0
                Pk = dba_ops._onehot(
                    pk, P_cap, (pk >= 0) & (pk < P_cap) & km_c
                )
                E_dense = E_edge + jnp.einsum(
                    "cah,cp->cpah", E_self, Pk, precision=_HIGH
                )
                Q_c, w_c = _depth_terms(M, kx_c, km_c, c)
                # flat (CK, 6P, HW) — see ops/dba.py round-5 note
                return E_dense.reshape(CK, P_cap * 6, HW), Q_c, w_c

            def chunk_E_compact(c):
                """Per-shard compact coupling (ops/dba.py compact path)."""
                kx_c = jax.lax.dynamic_slice(kx_pad, (c * CK,), (CK,))
                km_c = jax.lax.dynamic_slice(km_pad, (c * CK,), (CK,))
                Dp = loc_pose.shape[1]
                Lc = jax.lax.dynamic_slice(loc_pose, (c, 0), (1, Dp))[0]
                Lv = jax.lax.dynamic_slice(loc_valid, (c, 0), (1, Dp))[0]
                M = (
                    (ii[:, None] == kx_c[None, :])
                    & mask[:, None] & km_c[None, :]
                ).astype(jnp.float32)
                pj = jj - t0
                Pj_loc = (
                    (pj[:, None] == Lc[None, :]) & Lv[None, :]
                    & ((pj >= 0) & (pj < P_cap))[:, None]
                ).astype(jnp.float32)
                S2 = M[:, :, None] * Pj_loc[:, None, :]
                E_loc = jnp.einsum("eah,ecd->cdah", Eij, S2,
                                   precision=_HIGH)
                E_self = jnp.einsum("ec,eah->cah", M, Eii, precision=_HIGH)
                pk = kx_c - t0
                Pk_loc = (
                    (pk[:, None] == Lc[None, :]) & Lv[None, :]
                    & ((pk >= 0) & (pk < P_cap))[:, None] & km_c[:, None]
                ).astype(jnp.float32)
                E_loc = E_loc + jnp.einsum(
                    "cah,cd->cdah", E_self, Pk_loc, precision=_HIGH
                )
                Q_c, w_c = _depth_terms(M, kx_c, km_c, c)
                G = dba_ops._onehot(Lc, P_cap, Lv)
                Dp_ = Lc.shape[0]
                G6 = (G[:, None, :, None]
                      * jnp.eye(6, dtype=G.dtype)[None, :, None, :]
                      ).reshape(Dp_ * 6, P_cap * 6)
                return E_loc.reshape(CK, Dp_ * 6, HW), Q_c, w_c, G6

            if compact:
                def schur_step(carry, c):
                    S, vs = carry
                    E_loc, Q_c, w_c, G6 = chunk_E_compact(c)
                    S_loc = jnp.einsum(
                        "cxh,cyh->xy", E_loc * Q_c[:, None, :], E_loc,
                        precision=_HIGH,
                    )
                    T1 = jnp.einsum("xy,yj->xj", S_loc, G6,
                                    precision=_HIGH)
                    S_c = jnp.einsum("xi,xj->ij", G6, T1,
                                     precision=_HIGH)
                    v_loc = jnp.einsum("cxh,ch->x", E_loc, Q_c * w_c,
                                       precision=_HIGH)
                    v_c = jnp.einsum("x,xi->i", v_loc, G6,
                                     precision=_HIGH)
                    return (S + S_c, vs + v_c), None
            else:
                def schur_step(carry, c):
                    S, vs = carry
                    E_dense, Q_c, w_c = chunk_E_dense(c)
                    S_c = jnp.einsum(
                        "cxh,cyh->xy", E_dense * Q_c[:, None, :],
                        E_dense, precision=_HIGH,
                    )
                    v_c = jnp.einsum("cxh,ch->x", E_dense, Q_c * w_c,
                                     precision=_HIGH)
                    return (S + S_c, vs + v_c), None

            (S, vs), _ = jax.lax.scan(
                schur_step,
                (jnp.zeros((P_cap * 6, P_cap * 6)),
                 jnp.zeros((P_cap * 6,))),
                jnp.arange(nchunks),
            )

            # === the ONLY cross-device communication: pose system ===
            # (flat (6P,6P) + (6P,): same bytes psum'd as the 4-D form)
            H = jax.lax.psum(H - S, axis)
            vd = jax.lax.psum(vd - vs, axis)

            # replicated dense solve (identical on every device)
            A = H
            eye = jnp.eye(P_cap * 6, dtype=A.dtype)
            A = A + (ep + lm * A) * eye
            L = jnp.linalg.cholesky(A)
            y = jax.scipy.linalg.solve_triangular(
                L, vd[:, None], lower=True
            )
            dx = jax.scipy.linalg.solve_triangular(L, y, lower=True, trans=1)
            dxf = jnp.where(jnp.all(jnp.isfinite(dx)), dx, 0.0).reshape(
                P_cap * 6
            )
            dx = dxf.reshape(P_cap, 6)

            fidx = jnp.arange(buf)
            sel = dba_ops._onehot(
                fidx - t0, P_cap, (fidx >= t0) & (fidx < t1)
            )
            dx_full = jnp.einsum("bp,pa->ba", sel, dx, precision=_HIGH)
            poses = se3.retr(poses, dx_full)

            # local depth update, then psum-merge the disjoint frame sets
            if compact:
                def dz_step(_, c):
                    E_loc, Q_c, w_c, G6 = chunk_E_compact(c)
                    dx_loc = jnp.einsum("xi,i->x", G6, dxf,
                                        precision=_HIGH)
                    Edx = jnp.einsum("cxh,x->ch", E_loc, dx_loc,
                                     precision=_HIGH)
                    return None, Q_c * (w_c - Edx)
            else:
                def dz_step(_, c):
                    E_dense, Q_c, w_c = chunk_E_dense(c)
                    Edx = jnp.einsum("cxh,x->ch", E_dense, dxf,
                                     precision=_HIGH)
                    return None, Q_c * (w_c - Edx)

            _, dz_chunks = jax.lax.scan(dz_step, None, jnp.arange(nchunks))
            dz = dz_chunks.reshape(Kpad, HW)[:K]
            dz = jnp.where(kmask[:, None], dz, 0.0)

            B2K = (
                jnp.arange(buf)[:, None] == kx[None, :]
            ) & kmask[None, :]
            dz_full = jnp.einsum(
                "bk,kh->bh", B2K.astype(jnp.float32), dz, precision=_HIGH
            )
            dz_full = jax.lax.psum(dz_full, axis)   # disjoint frames: merge
            disps = jnp.maximum(
                disps + dz_full.reshape(buf, ht, wd), 0.001
            )

            return (poses, disps), None

        (poses, disps), _ = jax.lax.scan(
            iteration, (poses, disps), jnp.arange(iters)
        )
        return poses, disps

    from jax import shard_map

    rep = P()
    shd = P(axis)
    n_shd = 10 if compact else 8
    fn = shard_map(
        ba_shard, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep) + (shd,) * n_shd + (rep, rep),
        out_specs=(rep, rep),
        check_vma=False,
    )
    return jax.jit(fn)
