"""Dense bundle adjustment for the SLAM runtime (inference path).

This is the TPU-native replacement for the reference's `ba_cuda` driver
(/root/reference/src/droid_kernels.cu:1314-1434): per-edge Gauss-Newton
linearization (projective_transform_kernel, :176-424), depth elimination by
Schur complement (schur_block/EEt6x6, :1001-1311), and a damped pose solve.
The reference assembles a sparse pose system on the **CPU** with Eigen every
iteration; here everything stays on device:

  * Per-edge 6×6/6×HW blocks come from one batched einsum linearization.
  * The pose Hessian is scatter-added into a dense (P,6,P,6) window.
  * The Schur complement is computed per *depth frame*: gather the ≤D
    incident edges' coupling blocks, one MXU matmul (R·6, HW)·(HW, R·6),
    scatter the resulting block outer products — a
    gather→matmul→scatter pipeline scanned over chunks of depth frames so
    peak memory stays bounded at any graph size.
  * The pose solve is a dense on-device Cholesky (fp32, HIGHEST precision).

Semantics matched to the reference kernel:
  * weights scaled by 0.001, zeroed where transformed depth < MIN_DEPTH
    (droid_kernels.cu:305-306);
  * stereo (ii==jj) edges contribute ONLY to the depth diagonal/RHS —
    pose and coupling terms are zeroed (droid_kernels.cu:320-341);
  * RGB-D prior: C += α·m, w -= α·m·(disp − disp_sens) with α=0.05
    (droid_kernels.cu:1396-1399);
  * damping `diag += ep + lm·diag` (droid_kernels.cu:1197);
  * poses outside [t0, t1) are fixed; depth updates apply to the provided
    depth-frame list kx; disparities clamped to ≥ 0.001 by the caller
    (depth_video.py:193).

All shapes are static: E edges, P pose-window slots, K depth-frame slots,
D max incident edges per depth frame — padded entries are masked.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..geom import projective
from ..lie import se3

_HIGH = jax.lax.Precision.HIGHEST

ALPHA = 0.05          # RGB-D prior strength (droid_kernels.cu:1394)
W_SCALE = 0.001       # residual weight scale (droid_kernels.cu:305)
SCHUR_CHUNK = 32      # depth frames per Schur scan step


def build_schur_tables(ii, edge_mask, t0, t1, K, D):
    """Host-side (numpy) construction of the depth-frame tables.

    Mirrors the reference's kx = unique(cat(arange(t0,t1), ii)) bookkeeping
    (droid_kernels.cu:1337-1344): depth updates cover all window frames plus
    any edge source frame.  This is control-plane work — tiny, runs on host
    once per graph change.

    Returns kx (K,) int32 (padded 0), kmask (K,) bool, edge_table (K, D)
    int32 (padded -1).
    """
    ii = np.asarray(ii)
    edge_mask = np.asarray(edge_mask)
    frames = np.unique(
        np.concatenate([np.arange(t0, t1), ii[edge_mask]])
    )
    if len(frames) > K:
        raise ValueError(f"depth-frame count {len(frames)} exceeds cap {K}")

    kx = np.zeros(K, np.int32)
    kmask = np.zeros(K, bool)
    kx[: len(frames)] = frames
    kmask[: len(frames)] = True

    table = -np.ones((K, D), np.int32)
    for s, f in enumerate(frames):
        e = np.nonzero((ii == f) & edge_mask)[0]
        if len(e) > D:
            raise ValueError(f"frame {f} has {len(e)} edges > degree cap {D}")
        table[s, : len(e)] = e
    return kx, kmask, table


def _linearize(poses, disps, intrinsics, target, weight, ii, jj, edge_mask):
    """Per-edge weighted GN blocks.

    Returns Hblk (E,12,12) for the stacked [ξi; ξj] system, v (E,12),
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

    return Hblk, v, Eii, Eij, Cii, wi


def _scatter_pose_system(Hblk, v, ii, jj, t0, P, edge_mask):
    """Scatter per-edge 12×12 blocks into the dense pose window."""
    pi = ii - t0
    pj = jj - t0
    oki = (pi >= 0) & (pi < P) & edge_mask
    okj = (pj >= 0) & (pj < P) & edge_mask

    def put(pa, oka, pb, okb, blk):
        idx = jnp.where(oka & okb, pa * P + pb, P * P)
        return jax.ops.segment_sum(blk, idx, num_segments=P * P + 1)[:-1]

    Hii = Hblk[:, :6, :6]
    Hij = Hblk[:, :6, 6:]
    Hji = Hblk[:, 6:, :6]
    Hjj = Hblk[:, 6:, 6:]

    H = (
        put(pi, oki, pi, oki, Hii) + put(pi, oki, pj, okj, Hij)
        + put(pj, okj, pi, oki, Hji) + put(pj, okj, pj, okj, Hjj)
    ).reshape(P, P, 6, 6)

    def putv(pa, oka, vb):
        idx = jnp.where(oka, pa, P)
        return jax.ops.segment_sum(vb, idx, num_segments=P + 1)[:-1]

    vd = putv(pi, oki, v[:, :6]) + putv(pj, okj, v[:, 6:])
    return H, vd


def _depth_accumulate(Cii, wi, Eii, ii, kx, kmask, edge_table):
    """Per-depth-frame accumulation over incident edges (accum_cuda analog).

    edge_table: (K, D) indices into edge arrays of edges with ii == kx[k],
    padded with -1.
    """
    K, D = edge_table.shape
    tmask = (edge_table >= 0) & kmask[:, None]
    tidx = jnp.maximum(edge_table, 0)

    def gsum(x):
        g = x[tidx] * tmask[(...,) + (None,) * (x.ndim - 1)].astype(x.dtype)
        return g.sum(axis=1)

    C = gsum(Cii)                       # (K, HW)
    w = gsum(wi)
    E_self = gsum(Eii)                  # (K, 6, HW)
    return C, w, E_self


def _schur_rows(E_self, Eij, jj, kx, kmask, edge_table, t0, P):
    """Row metadata for the per-depth-frame Schur gather.

    Row 0 of frame k couples pose kx[k] (accumulated Eii); rows 1..D couple
    pose jj[e] for each incident edge e.  Returns (row pose slots (K,R),
    row validity (K,R)) with R = D+1.
    """
    K, D = edge_table.shape
    tmask = (edge_table >= 0) & kmask[:, None]
    tidx = jnp.maximum(edge_table, 0)

    p_self = kx - t0
    ok_self = (p_self >= 0) & (p_self < P) & kmask
    p_edge = jj[tidx] - t0
    ok_edge = (p_edge >= 0) & (p_edge < P) & tmask

    rows_p = jnp.concatenate([p_self[:, None], p_edge], axis=1)
    rows_ok = jnp.concatenate([ok_self[:, None], ok_edge], axis=1)
    return rows_p, rows_ok


def _gather_E_rows(E_self, Eij, edge_table, k_slice):
    """(CK, R, 6, HW) coupling rows for a chunk of depth frames."""
    tbl = edge_table[k_slice]
    tidx = jnp.maximum(tbl, 0)
    tmask = (tbl >= 0)
    E_edges = Eij[tidx] * tmask[..., None, None].astype(Eij.dtype)
    return jnp.concatenate([E_self[k_slice][:, None], E_edges], axis=1)


@partial(jax.jit, static_argnames=("iters", "motion_only", "P"))
def ba(
    poses, disps, disps_sens, intrinsics, target, weight, eta,
    ii, jj, edge_mask, kx, kmask, edge_table, t0, t1,
    *, iters=2, lm=1e-4, ep=0.1, motion_only=False, P=64,
):
    """Run `iters` damped Gauss-Newton iterations; returns (poses, disps).

    Args:
      poses: (BUF, 7) w2c SE3.
      disps, disps_sens: (BUF, h, w) inverse depths (sens may be all-zero).
      intrinsics: (BUF, 4) at feature resolution.
      target, weight: (E, h, w, 2) per-edge flow targets / confidences.
      eta: (BUF, h, w) per-pixel depth damping (already 0.2·η + 1e-7).
      ii, jj: (E,) int32 edge endpoints (padded edges masked).
      edge_mask: (E,) bool.
      kx: (K,) int32 depth-frame list; kmask: (K,) bool.
      edge_table: (K, D) int32 incident-edge table (pad -1).
      t0, t1: dynamic window bounds; P: static pose-window capacity.
    """
    ht, wd = disps.shape[-2:]
    HW = ht * wd
    E = ii.shape[0]
    K, D = edge_table.shape
    R = D + 1

    def iteration(carry, _):
        poses, disps = carry

        Hblk, v, Eii, Eij, Cii, wi = _linearize(
            poses, disps, intrinsics, target, weight, ii, jj, edge_mask
        )
        H, vd = _scatter_pose_system(Hblk, v, ii, jj, t0, P, edge_mask)

        if not motion_only:
            C, w_acc, E_self = _depth_accumulate(
                Cii, wi, Eii, ii, kx, kmask, edge_table
            )
            # RGB-D prior (α) where sensor depth exists, else damping eta
            dsk = disps_sens[kx].reshape(K, HW)
            dk = disps[kx].reshape(K, HW)
            m = (dsk > 0).astype(C.dtype)
            C = C + m * ALPHA + (1.0 - m) * eta[kx].reshape(K, HW)
            w_acc = w_acc - m * ALPHA * (dk - dsk)
            Q = jnp.where(kmask[:, None], 1.0 / C, 0.0)

            rows_p, rows_ok = _schur_rows(
                E_self, Eij, jj, kx, kmask, edge_table, t0, P
            )

            # scan over depth-frame chunks: S -= E Q Eᵀ ; v -= E Q w
            nchunks = K // SCHUR_CHUNK + (1 if K % SCHUR_CHUNK else 0)
            Kpad = nchunks * SCHUR_CHUNK

            def schur_step(carry, c):
                S, vs = carry
                sl = jnp.arange(SCHUR_CHUNK) + c * SCHUR_CHUNK
                sl = jnp.minimum(sl, K - 1)
                Er = _gather_E_rows(E_self, Eij, edge_table, sl)  # (CK,R,6,HW)
                okr = rows_ok[sl] & (sl < K)[:, None]
                Er = Er * okr[:, :, None, None].astype(Er.dtype)
                Qc = Q[sl]
                EQ = Er * Qc[:, None, None, :]
                Sk = jnp.einsum(
                    "krah,ksbh->krsab", EQ, Er, precision=_HIGH
                )
                Evk = jnp.einsum(
                    "krah,kh->kra", Er, Qc * w_acc[sl], precision=_HIGH
                )
                pr = jnp.where(okr, rows_p[sl], P)
                # scatter block outer products
                flat_idx = (pr[:, :, None] * (P + 1) + pr[:, None, :]).reshape(-1)
                Sc = jax.ops.segment_sum(
                    Sk.reshape(-1, 6, 6), flat_idx,
                    num_segments=(P + 1) * (P + 1),
                ).reshape(P + 1, P + 1, 6, 6)[:P, :P]
                vc = jax.ops.segment_sum(
                    Evk.reshape(-1, 6), pr.reshape(-1), num_segments=P + 1
                )[:P]
                return (S + Sc, vs + vc), None

            (S, vs), _ = jax.lax.scan(
                schur_step,
                (jnp.zeros((P, P, 6, 6)), jnp.zeros((P, 6))),
                jnp.arange(nchunks),
            )
            H = H - S
            vd = vd - vs

        # dense damped pose solve
        A = jnp.transpose(H, (0, 2, 1, 3)).reshape(P * 6, P * 6)
        eye = jnp.eye(P * 6, dtype=A.dtype)
        A = A + (ep + lm * A) * eye
        L = jnp.linalg.cholesky(A)
        y = jax.scipy.linalg.solve_triangular(L, vd.reshape(P * 6, 1), lower=True)
        dx = jax.scipy.linalg.solve_triangular(L, y, lower=True, trans=1)
        ok = jnp.all(jnp.isfinite(dx))
        dx = jnp.where(ok, dx, 0.0).reshape(P, 6)

        # retract poses in [t0, t1)
        buf = poses.shape[0]
        fidx = jnp.arange(buf)
        sel = (fidx >= t0) & (fidx < t1)
        slot = jnp.clip(fidx - t0, 0, P - 1)
        dx_full = jnp.where(sel[:, None], dx[slot], 0.0)
        poses = se3.retr(poses, dx_full)

        if not motion_only:
            # dz = Q (w − Eᵀ dx), recomputing E rows chunk-wise
            def dz_step(_, c):
                sl = jnp.arange(SCHUR_CHUNK) + c * SCHUR_CHUNK
                sl = jnp.minimum(sl, K - 1)
                Er = _gather_E_rows(E_self, Eij, edge_table, sl)
                okr = rows_ok[sl] & (sl < K)[:, None]
                Er = Er * okr[:, :, None, None].astype(Er.dtype)
                dxr = dx[jnp.clip(rows_p[sl], 0, P - 1)]
                dxr = dxr * okr[..., None].astype(dxr.dtype)
                Edx = jnp.einsum("krah,kra->kh", Er, dxr, precision=_HIGH)
                return None, Edx

            _, Edx_all = jax.lax.scan(dz_step, None, jnp.arange(nchunks))
            Edx_all = Edx_all.reshape(Kpad, HW)[:K]
            dz = Q * (w_acc - Edx_all)
            dz = jnp.where(kmask[:, None], dz, 0.0)

            kidx = jnp.where(kmask, kx, buf)
            dz_full = jax.ops.segment_sum(
                dz, kidx, num_segments=buf + 1
            )[:-1].reshape(buf, ht, wd)
            disps = jnp.maximum(disps + dz_full, 0.001)

        return (poses, disps), None

    (poses, disps), _ = jax.lax.scan(
        iteration, (poses, disps), jnp.arange(iters)
    )
    return poses, disps
