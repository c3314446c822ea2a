"""Trajectory alignment and error metrics (numpy).

Replaces the reference's external evaluation dependencies: the `evo`
package (Umeyama/Sim3-aligned APE used by test_tum.py:117-122 etc.) and
the TartanAir evaluator
(/root/reference/thirdparty/tartanair_tools/evaluation/
 tartanair_evaluator.py:40-70, ATE/RPE with optional scale correction).

All functions take trajectories as (N, 3) positions or (N, 7) pose
vectors [t, q] and run on the host in float64.
"""

import numpy as np


def _positions(traj):
    traj = np.asarray(traj, np.float64)
    if traj.ndim == 2 and traj.shape[1] >= 3:
        return traj[:, :3]
    raise ValueError(f"expected (N,>=3) trajectory, got {traj.shape}")


def umeyama(src, dst, with_scale=True):
    """Least-squares similarity transform: dst ≈ s·R·src + t.

    Returns (s, R, t).  Classic Umeyama (1991) closed form — the same
    alignment evo and the TartanAir evaluator perform.
    """
    src = _positions(src)
    dst = _positions(dst)
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    xs = src - mu_s
    xd = dst - mu_d

    cov = xd.T @ xs / len(src)
    U, S, Vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, 1.0, d])
    R = U @ D @ Vt

    if with_scale:
        var_s = (xs ** 2).sum() / len(src)
        s = float(np.trace(np.diag(S) @ D) / var_s)
    else:
        s = 1.0

    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(gt, est, correct_scale=True):
    """Absolute trajectory error RMSE after Umeyama alignment.

    Mirrors evo's APE with `align=True, correct_scale=` (test_tum.py:118)
    and tartanair_evaluator.transform_trajs.
    """
    gt_p = _positions(gt)
    est_p = _positions(est)
    assert len(gt_p) == len(est_p), (len(gt_p), len(est_p))
    if not np.isfinite(est_p).all():
        # a diverged run is a (bad) result, not a crash: report inf
        # rather than letting the alignment SVD blow up mid-benchmark
        return float("inf")
    s, R, t = umeyama(est_p, gt_p, with_scale=correct_scale)
    est_aligned = (s * (R @ est_p.T)).T + t
    err = np.linalg.norm(est_aligned - gt_p, axis=1)
    return float(np.sqrt((err ** 2).mean()))


def rpe(gt, est, delta=1):
    """Relative pose error over position deltas (translation part only).

    Returns (rmse_trans,) over frame pairs (i, i+delta).
    """
    gt_p = _positions(gt)
    est_p = _positions(est)
    dg = gt_p[delta:] - gt_p[:-delta]
    de = est_p[delta:] - est_p[:-delta]
    err = np.linalg.norm(dg - de, axis=1)
    return float(np.sqrt((err ** 2).mean()))


def associate(stamps_a, stamps_b, max_dt=0.02):
    """Greedy nearest-timestamp association (TUM rgbd tools semantics,
    reference data_readers/rgbd_utils.py:16-45).

    Returns list of (idx_a, idx_b) matches.
    """
    stamps_a = np.asarray(stamps_a, np.float64)
    stamps_b = np.asarray(stamps_b, np.float64)
    pairs = [
        (abs(a - b), i, j)
        for i, a in enumerate(stamps_a)
        for j, b in enumerate(stamps_b)
        if abs(a - b) < max_dt
    ]
    pairs.sort()
    used_a, used_b, out = set(), set(), []
    for _, i, j in pairs:
        if i not in used_a and j not in used_b:
            used_a.add(i)
            used_b.add(j)
            out.append((i, j))
    out.sort()
    return out
