"""Dense bundle adjustment for the SLAM runtime (inference path).

This is the TPU-native replacement for the reference's `ba_cuda` driver
(/root/reference/src/droid_kernels.cu:1314-1434): per-edge Gauss-Newton
linearization (projective_transform_kernel, :176-424), depth elimination by
Schur complement (schur_block/EEt6x6, :1001-1311), and a damped pose solve.
The reference assembles a sparse pose system on the **CPU** with Eigen every
iteration; here everything stays on device.

TPU formulation — NO gathers, NO scatters (both run at near-scalar element
rates through XLA on TPU; measured ~20M elem/s on v5e):
  * Per-edge blocks come from one batched einsum linearization.
  * All sparse index plumbing (edge→pose-slot, edge→depth-frame,
    depth-frame→buffer) is expressed as 0/1 selector matrices contracted
    on the MXU — the sparse structure costs a few GFLOP of dense matmul,
    which is ~free at ~190 TFLOP/s.
  * The Schur complement is computed over chunks of depth frames: each
    chunk materializes its dense coupling block E (CK, P, 6, HW) by
    selector matmuls, and S = E·Q·Eᵀ is one big MXU contraction.
  * The pose solve is a dense on-device Cholesky (fp32, HIGHEST).

Semantics matched to the reference kernel:
  * weights scaled by 0.001, zeroed where transformed depth < MIN_DEPTH
    (droid_kernels.cu:305-306);
  * stereo (ii==jj) edges contribute ONLY to the depth diagonal/RHS —
    pose and coupling terms are zeroed (droid_kernels.cu:320-341);
  * RGB-D prior: C += α·m, w -= α·m·(disp − disp_sens) with α=0.05
    (droid_kernels.cu:1396-1399);
  * damping `diag += ep + lm·diag` (droid_kernels.cu:1197);
  * poses outside [t0, t1) are fixed; depth updates apply to the provided
    depth-frame list kx; disparities clamped to ≥ 0.001
    (depth_video.py:193).

All shapes are static: E edges, P pose-window slots, K depth-frame slots —
padded entries are masked.  (The per-frame `edge_table` of the previous
formulation is retained in build_schur_tables for callers/tests but the
solver itself only needs kx/kmask.)
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..geom import projective
from ..lie import se3
from .gathers import take_rows

# Gauss-Newton assembly precision: HIGH (3-pass bf16) accumulates in f32
# and recovers ~f32-faithful products at roughly half the MXU cost of
# HIGHEST (6-pass) — the difference is far below the damping floor of the
# solve.  The Cholesky itself stays f32.  This constant is THE precision
# for GN assembly everywhere: parallel/dba.py imports it so single-device
# and distributed global BA solve bit-identical systems
# (tests/test_parallel.py checks the parity).
GN_PRECISION = jax.lax.Precision.HIGH
_HIGH = GN_PRECISION

ALPHA = 0.05          # RGB-D prior strength (droid_kernels.cu:1394)
W_SCALE = 0.001       # residual weight scale (droid_kernels.cu:305)


def build_schur_tables(ii, edge_mask, t0, t1, K, D):
    """Host-side (numpy) construction of the depth-frame tables.

    Mirrors the reference's kx = unique(cat(arange(t0,t1), ii)) bookkeeping
    (droid_kernels.cu:1337-1344): depth updates cover all window frames plus
    any edge source frame.

    Returns kx (K,) int32 (padded 0), kmask (K,) bool, edge_table (K, D)
    int32 (padded -1; used by tests/diagnostics — the dense-chunk solver
    needs only kx/kmask).
    """
    ii = np.asarray(ii)
    edge_mask = np.asarray(edge_mask)
    frames = np.unique(
        np.concatenate([np.arange(t0, t1), ii[edge_mask]])
    )
    if len(frames) > K:
        raise ValueError(
            f"depth-frame count {len(frames)} exceeds cap {K}: raise "
            f"SLAMConfig.frontend_depth_cap (or the Backend's automatic "
            f"bucket) for this window/graph size"
        )

    kx = np.zeros(K, np.int32)
    kmask = np.zeros(K, bool)
    kx[: len(frames)] = frames
    kmask[: len(frames)] = True

    table = -np.ones((K, D), np.int32)
    for s, f in enumerate(frames):
        e = np.nonzero((ii == f) & edge_mask)[0]
        if len(e) > D:
            raise ValueError(
                f"frame {f} has {len(e)} edges > degree cap {D}: raise "
                f"SLAMConfig.schur_degree_cap (graphs denser than this "
                f"per-frame edge count need a bigger Schur gather table)"
            )
        table[s, : len(e)] = e
    return kx, kmask, table


def build_compact_pose_tables(ii, jj, edge_mask, kx, kmask, t0, t1,
                              CK, P, Dp=None):
    """Host-side local pose tables for the compact Schur path.

    For each chunk of CK consecutive depth frames, list the pose slots
    the chunk's edges actually couple to (their jj targets plus the
    frames themselves, restricted to the optimized window [t0, t1)).
    SLAM covisibility graphs are temporally local, so this list is far
    smaller than the full pose window P at 512–1024-keyframe scale —
    the compact path contracts E·CK·Dp instead of E·CK·P.

    Returns (loc (nchunks, Dp) int32 pose-slot ids in [0, P), padded 0;
    loc_valid (nchunks, Dp) bool; Dp) — Dp is the bucketed max local
    pose count.
    """
    ii = np.asarray(ii)
    jj = np.asarray(jj)
    edge_mask = np.asarray(edge_mask)
    kx = np.asarray(kx)
    kmask = np.asarray(kmask)
    K = len(kx)
    nch = (K + CK - 1) // CK

    locs = []
    for c in range(nch):
        fr = kx[c * CK: (c + 1) * CK][kmask[c * CK: (c + 1) * CK]]
        e = edge_mask & np.isin(ii, fr)
        cand = np.concatenate([jj[e], fr])
        cand = cand[(cand >= t0) & (cand < t1)]
        locs.append(np.unique(cand) - t0)

    need = max((len(l) for l in locs), default=1)
    if Dp is None:
        Dp = int(np.ceil(max(need, 1) / 32) * 32)
        Dp = min(Dp, P)
    elif need > Dp:
        return None         # caller-forced width too small: fall back
    loc = np.zeros((nch, Dp), np.int32)
    val = np.zeros((nch, Dp), bool)
    for c, l in enumerate(locs):
        if len(l) > Dp:     # degenerate (global) connectivity: caller
            return None     # falls back to the dense-P path
        loc[c, : len(l)] = l
        val[c, : len(l)] = True
    return loc, val, Dp


def _onehot(idx, n, mask=None, dtype=jnp.float32):
    """(len(idx), n) 0/1 selector; masked / out-of-range rows are zero."""
    sel = (
        idx[:, None] == jax.lax.broadcasted_iota(idx.dtype, (1, n), 1)
    )
    if mask is not None:
        sel = sel & mask[:, None]
    return sel.astype(dtype)


def _linearize(poses, disps, intrinsics, target, weight, ii, jj, edge_mask):
    """Per-edge weighted GN blocks.

    Returns Hblk (E,2,6,2,6) for the [ξi; ξj] system, v (E,2,6),
    Eii/Eij (E,6,HW), Cii/wi (E,HW).
    """
    E = ii.shape[0]
    ht, wd = disps.shape[-2:]
    HW = ht * wd

    coords, valid, (Ji, Jj, Jz) = projective.projective_transform(
        poses[None], disps[None], intrinsics[None], ii, jj, jacobian=True
    )
    coords, valid = coords[0], valid[0]
    Ji, Jj, Jz = Ji[0], Jj[0], Jz[0]

    r = (target - coords).reshape(E, HW * 2)
    w = W_SCALE * (valid * weight).reshape(E, HW * 2)
    w = w * edge_mask[:, None].astype(w.dtype)

    # stereo/rig edges: depth-only (pose blocks zeroed)
    w_pose = w * (ii != jj)[:, None].astype(w.dtype)

    J = jnp.concatenate(
        [Ji.reshape(E, HW * 2, 6), Jj.reshape(E, HW * 2, 6)], axis=-1
    )                                                     # (E, HW2, 12)
    wJ = w_pose[..., None] * J
    Hblk = jnp.einsum("enk,enl->ekl", wJ, J, precision=_HIGH)
    v = jnp.einsum("enk,en->ek", wJ, r, precision=_HIGH)

    Jz = Jz.reshape(E, HW, 2)
    wp_px = w_pose.reshape(E, HW, 2)
    w_px = w.reshape(E, HW, 2)
    r_px = r.reshape(E, HW, 2)

    Ji_px = Ji.reshape(E, HW, 2, 6)
    Jj_px = Jj.reshape(E, HW, 2, 6)
    Eii = jnp.einsum("epc,epck->ekp", wp_px * Jz, Ji_px, precision=_HIGH)
    Eij = jnp.einsum("epc,epck->ekp", wp_px * Jz, Jj_px, precision=_HIGH)

    Cii = jnp.sum(w_px * Jz * Jz, axis=-1)                # (E, HW)
    wi = jnp.sum(w_px * r_px * Jz, axis=-1)

    Hblk = Hblk.reshape(E, 2, 6, 2, 6)
    v = v.reshape(E, 2, 6)
    return Hblk, v, Eii, Eij, Cii, wi


# edges per linearization dispatch in the chunked path: the (E, 2·HW, 12)
# Jacobian transients at a 1000-keyframe backend (E ≈ 4096, HW = 3072)
# would otherwise peak at ~4 GB; 512-edge chunks keep them ~0.5 GB
LIN_CHUNK = 512


def _linearize_chunked(poses, disps, intrinsics, target, weight, ii, jj,
                       edge_mask, chunk=None):
    """_linearize via lax.scan over edge chunks (same outputs).

    Used when E > chunk: per-edge OUTPUT blocks (Hblk, Eii/Eij, ...) are
    unavoidable, but the much larger weighted-Jacobian intermediates live
    only per chunk.  E is already a power-of-two bucket, so `chunk`
    divides it for every capacity this path sees; a remainder is padded.
    (`chunk` reads LIN_CHUNK at call time so tests can patch it.)
    """
    chunk = chunk or LIN_CHUNK
    E = ii.shape[0]
    nch = (E + chunk - 1) // chunk
    Ep = nch * chunk

    def pad(x, fill=0):
        if Ep == E:
            return x
        w = [(0, Ep - E)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, w, constant_values=fill)

    tgt = pad(target)
    wgt = pad(weight)
    ii_p = pad(ii)
    jj_p = pad(jj)
    m_p = pad(edge_mask)

    def body(_, c):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, c * chunk, chunk)
        out = _linearize(
            poses, disps, intrinsics, sl(tgt), sl(wgt),
            sl(ii_p), sl(jj_p), sl(m_p),
        )
        return None, out

    _, outs = jax.lax.scan(body, None, jnp.arange(nch))
    # (nch, chunk, ...) -> (E, ...)
    return tuple(
        o.reshape((Ep,) + o.shape[2:])[:E] for o in outs
    )


def _pose_system(Hblk, v, ii, jj, t0, P, edge_mask,
                 chunk_threshold=400_000_000):
    """Dense pose window via selector contraction (no scatter).

    Returns the system FLAT — H (6P, 6P), vd (6P,) — not (P,6,P,6):
    the round-5 device trace attributed 4 ms/keyframe to adds/bitcasts
    on the 4-D form, whose XLA layout ({2,0,3,1}, 8x128 tiles over the
    6-sized dims) runs at ~1 GB/s; the flat 2-D form tiles cleanly and
    every downstream op (Schur subtract, damping, Cholesky) wants it
    flat anyway (runs/r5/profile_chunk, PERF.md round 5).

    The 3-operand einsum's pairwise path materializes an
    (E, 2·6·6, P) f32 intermediate — 3.4 GB at the 1000-keyframe
    backend (E≈4.9k, P=1024), the OOM of runs/r4/backend_1000b.log —
    so past a ~0.4 GB intermediate the contraction runs as an edge-
    chunked scan (4-D accumulator, flattened once after the scan).
    """
    pi = ii - t0
    pj = jj - t0
    Pi = _onehot(pi, P, (pi >= 0) & (pi < P) & edge_mask)
    Pj = _onehot(pj, P, (pj >= 0) & (pj < P) & edge_mask)
    E = ii.shape[0]

    if E * 72 * P * 4 <= chunk_threshold:
        # block-expanded selector W[e, r*6+a, p*6+b] = U[e,r,p]·δ_ab —
        # the same bytes as the old einsum intermediate, but both
        # contractions become plain 2-D-output dots (clean layouts)
        U = jnp.stack([Pi, Pj], axis=1)                   # (E, 2, P)
        eye6 = jnp.eye(6, dtype=U.dtype)
        W = (U[:, :, None, :, None]
             * eye6[None, None, :, None, :]).reshape(E, 12, P * 6)
        Hf = Hblk.reshape(E, 12, 12)
        T = jnp.einsum("exy,eyj->exj", Hf, W, precision=_HIGH)
        H = jnp.einsum("exi,exj->ij", W, T, precision=_HIGH)
        vd = jnp.einsum("ex,exi->i", v.reshape(E, 12), W, precision=_HIGH)
        return H, vd, Pj

    chunk = LIN_CHUNK
    nch = (E + chunk - 1) // chunk
    Ep = nch * chunk

    def pad(x):
        if Ep == E:
            return x
        w = [(0, Ep - E)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, w)                # zero selector rows: no-op

    Hp, vp, Pip, Pjp = pad(Hblk), pad(v), pad(Pi), pad(Pj)

    def body(carry, c):
        H, vd = carry
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, c * chunk, chunk)
        U = jnp.stack([sl(Pip), sl(Pjp)], axis=1)
        H = H + jnp.einsum("erasb,erp,esq->paqb", sl(Hp), U, U,
                           precision=_HIGH)
        vd = vd + jnp.einsum("era,erp->pa", sl(vp), U, precision=_HIGH)
        return (H, vd), None

    (H, vd), _ = jax.lax.scan(
        body,
        (jnp.zeros((P, 6, P, 6)), jnp.zeros((P, 6))),
        jnp.arange(nch),
    )
    return H.reshape(P * 6, P * 6), vd.reshape(P * 6), Pj


@partial(jax.jit, static_argnames=("iters", "motion_only", "P",
                                   "schur_chunk"))
def ba(
    poses, disps, disps_sens, intrinsics, target, weight, eta,
    ii, jj, edge_mask, kx, kmask, edge_table, t0, t1,
    *, iters=2, lm=1e-4, ep=0.1, motion_only=False, P=64, schur_chunk=None,
    loc_pose=None, loc_valid=None,
):
    """Run `iters` damped Gauss-Newton iterations; returns (poses, disps).

    Args: see module docstring; all index plumbing is handled with
    selector matmuls.  edge_table is unused by the solver (kept for API
    stability).

    loc_pose/loc_valid ((nchunks, Dp), from build_compact_pose_tables):
    enables the compact Schur path — each depth-frame chunk couples to
    its Dp-entry LOCAL pose table instead of the full P-slot window, and
    the small (Dp·6)² system scatters into the global one afterwards.
    At 1000-keyframe backends this cuts the selector contraction from
    E·CK·P·6·HW to E·CK·Dp·6·HW (~P/Dp ≈ 8-16x) and the dominant
    E·Q·Eᵀ outer product similarly.
    """
    ht, wd = disps.shape[-2:]
    HW = ht * wd
    E = ii.shape[0]
    K = kx.shape[0]
    buf = poses.shape[0]

    compact = loc_pose is not None
    CK = schur_chunk or max(1, min(32, 4096 // max(P, 1)))
    nchunks = (K + CK - 1) // CK
    if compact:
        # chunk boundaries must match the host-built local tables
        assert schur_chunk is not None and loc_pose.shape[0] == nchunks, (
            "compact tables require the same schur_chunk they were "
            "built with (build_compact_pose_tables)"
        )
    Kpad = nchunks * CK

    kx_pad = jnp.concatenate(
        [kx, jnp.zeros((Kpad - K,), kx.dtype)]
    )
    kmask_pad = jnp.concatenate(
        [kmask, jnp.zeros((Kpad - K,), kmask.dtype)]
    )

    def iteration(carry, _):
        poses, disps = carry

        lin = _linearize if E <= LIN_CHUNK else _linearize_chunked
        Hblk, v, Eii, Eij, Cii, wi = lin(
            poses, disps, intrinsics, target, weight, ii, jj, edge_mask
        )
        H, vd, Pj = _pose_system(Hblk, v, ii, jj, t0, P, edge_mask)

        if not motion_only:
            # per-depth-frame data (K rows), gather-free
            dsk = take_rows(disps_sens.reshape(buf, HW), kx)
            dk = take_rows(disps.reshape(buf, HW), kx)
            eta_k = take_rows(eta.reshape(buf, HW), kx)
            m_sens = (dsk > 0).astype(jnp.float32)

            def chunk_E_dense(c):
                """Dense coupling block (CK, P, 6, HW) for chunk c."""
                kx_c = jax.lax.dynamic_slice(kx_pad, (c * CK,), (CK,))
                km_c = jax.lax.dynamic_slice(kmask_pad, (c * CK,), (CK,))
                # edge→local-frame selector (E, CK)
                M = (
                    (ii[:, None] == kx_c[None, :])
                    & edge_mask[:, None] & km_c[None, :]
                ).astype(jnp.float32)
                # edge contribution at pose jj: selector (E, CK, P)
                S2 = M[:, :, None] * Pj[:, None, :]
                E_edge = jnp.einsum(
                    "eah,ecp->cpah", Eij, S2, precision=_HIGH
                )
                # accumulated self term at pose kx_c
                E_self = jnp.einsum("ec,eah->cah", M, Eii, precision=_HIGH)
                pk = kx_c - t0
                Pk = _onehot(pk, P, (pk >= 0) & (pk < P) & km_c)
                E_dense = E_edge + jnp.einsum(
                    "cah,cp->cpah", E_self, Pk, precision=_HIGH
                )
                # depth diagonal / rhs for the chunk
                C_c = jnp.einsum("ec,eh->ch", M, Cii, precision=_HIGH)
                w_c = jnp.einsum("ec,eh->ch", M, wi, precision=_HIGH)
                sl = (jnp.arange(CK) + c * CK).clip(0, K - 1)
                ms = m_sens[sl]
                C_c = C_c + ms * ALPHA + (1.0 - ms) * eta_k[sl]
                w_c = w_c - ms * ALPHA * (dk[sl] - dsk[sl])
                Q_c = jnp.where(km_c[:, None], 1.0 / C_c, 0.0)
                # flat (CK, 6P, HW): (p,6) are adjacent dims, so this is
                # a free dim-merge; downstream contractions become 2-D-
                # output dots on layouts XLA tiles well (PERF.md round 5)
                return E_dense.reshape(CK, P * 6, HW), Q_c, w_c

            def chunk_E_compact(c):
                """Local coupling block (CK, Dp, 6, HW) + scatter map
                G (Dp, P) for chunk c — the compact-Schur data."""
                kx_c = jax.lax.dynamic_slice(kx_pad, (c * CK,), (CK,))
                km_c = jax.lax.dynamic_slice(kmask_pad, (c * CK,), (CK,))
                Dp = loc_pose.shape[1]
                Lc = jax.lax.dynamic_slice(loc_pose, (c, 0), (1, Dp))[0]
                Lv = jax.lax.dynamic_slice(loc_valid, (c, 0), (1, Dp))[0]
                M = (
                    (ii[:, None] == kx_c[None, :])
                    & edge_mask[:, None] & km_c[None, :]
                ).astype(jnp.float32)
                # edge target jj -> local pose slot (E, Dp)
                pj = jj - t0
                Pj_loc = (
                    (pj[:, None] == Lc[None, :]) & Lv[None, :]
                    & ((pj >= 0) & (pj < P))[:, None]
                ).astype(jnp.float32)
                S2 = M[:, :, None] * Pj_loc[:, None, :]     # (E, CK, Dp)
                E_loc = jnp.einsum(
                    "eah,ecd->cdah", Eij, S2, precision=_HIGH
                )
                E_self = jnp.einsum("ec,eah->cah", M, Eii, precision=_HIGH)
                pk = kx_c - t0
                Pk_loc = (
                    (pk[:, None] == Lc[None, :]) & Lv[None, :]
                    & ((pk >= 0) & (pk < P))[:, None] & km_c[:, None]
                ).astype(jnp.float32)
                E_loc = E_loc + jnp.einsum(
                    "cah,cd->cdah", E_self, Pk_loc, precision=_HIGH
                )
                C_c = jnp.einsum("ec,eh->ch", M, Cii, precision=_HIGH)
                w_c = jnp.einsum("ec,eh->ch", M, wi, precision=_HIGH)
                sl = (jnp.arange(CK) + c * CK).clip(0, K - 1)
                ms = m_sens[sl]
                C_c = C_c + ms * ALPHA + (1.0 - ms) * eta_k[sl]
                w_c = w_c - ms * ALPHA * (dk[sl] - dsk[sl])
                Q_c = jnp.where(km_c[:, None], 1.0 / C_c, 0.0)
                # local -> global pose scatter, block-expanded to the
                # flat (Dp·6, P·6) form (one-hot rows, shared by the
                # whole chunk)
                G = _onehot(Lc, P, Lv)
                Dp = Lc.shape[0]
                G6 = (G[:, None, :, None]
                      * jnp.eye(6, dtype=G.dtype)[None, :, None, :]
                      ).reshape(Dp * 6, P * 6)
                return E_loc.reshape(CK, Dp * 6, HW), Q_c, w_c, G6

            if compact:
                def schur_step(carry, c):
                    S, vs = carry
                    E_loc, Q_c, w_c, G6 = chunk_E_compact(c)
                    # (Dp·6)² local Schur block, summed over the chunk's
                    # frames (they share G6), then scattered into (P·6)²
                    S_loc = jnp.einsum(
                        "cxh,cyh->xy", E_loc * Q_c[:, None, :], E_loc,
                        precision=_HIGH,
                    )
                    T1 = jnp.einsum("xy,yj->xj", S_loc, G6,
                                    precision=_HIGH)
                    S_c = jnp.einsum("xi,xj->ij", G6, T1, precision=_HIGH)
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
                    v_c = jnp.einsum(
                        "cxh,ch->x", E_dense, Q_c * w_c, precision=_HIGH
                    )
                    return (S + S_c, vs + v_c), None

            (S, vs), _ = jax.lax.scan(
                schur_step,
                (jnp.zeros((P * 6, P * 6)), jnp.zeros((P * 6,))),
                jnp.arange(nchunks),
            )
            H = H - S
            vd = vd - vs

        # dense damped pose solve (H, vd already flat: (6P,6P), (6P,))
        A = H
        eye = jnp.eye(P * 6, dtype=A.dtype)
        A = A + (ep + lm * A) * eye
        L = jnp.linalg.cholesky(A)
        y = jax.scipy.linalg.solve_triangular(
            L, vd[:, None], lower=True
        )
        dx = jax.scipy.linalg.solve_triangular(L, y, lower=True, trans=1)
        ok = jnp.all(jnp.isfinite(dx))
        dxf = jnp.where(ok, dx, 0.0).reshape(P * 6)
        dx = dxf.reshape(P, 6)

        # retract poses in [t0, t1): selector matmul, no gather
        fidx = jnp.arange(buf)
        slot = fidx - t0
        sel = _onehot(slot, P, (fidx >= t0) & (fidx < t1))   # (buf, P)
        dx_full = jnp.einsum("bp,pa->ba", sel, dx, precision=_HIGH)
        poses = se3.retr(poses, dx_full)

        if not motion_only:
            # dz = Q (w − Eᵀ dx), recomputing chunks
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
                    Edx = jnp.einsum(
                        "cxh,x->ch", E_dense, dxf, precision=_HIGH
                    )
                    return None, Q_c * (w_c - Edx)

            _, dz_chunks = jax.lax.scan(dz_step, None, jnp.arange(nchunks))
            dz = dz_chunks.reshape(Kpad, HW)[:K]
            dz = jnp.where(kmask[:, None], dz, 0.0)

            # scatter K depth-frame rows back to the buffer (selector)
            B2K = (
                jnp.arange(buf)[:, None] == kx[None, :]
            ) & kmask[None, :]
            dz_full = jnp.einsum(
                "bk,kh->bh", B2K.astype(jnp.float32), dz, precision=_HIGH
            )
            disps = jnp.maximum(
                disps + dz_full.reshape(buf, ht, wd), 0.001
            )

        return (poses, disps), None

    (poses, disps), _ = jax.lax.scan(
        iteration, (poses, disps), jnp.arange(iters)
    )
    return poses, disps
