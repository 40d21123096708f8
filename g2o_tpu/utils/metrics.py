"""Trajectory evaluation metrics (ATE / RPE) — the BASELINE.md parity
metrics ("trajectory ATE parity ... manhattanOlson3500, sphere2500").

ATE: align the estimated trajectory to ground truth with the closed-form
Umeyama similarity (or rigid) transform, then RMS the translational
residuals.  RPE: RMS error of relative transforms over a fixed step.
"""

from __future__ import annotations

import numpy as np


def umeyama_alignment(src: np.ndarray, dst: np.ndarray,
                      with_scale: bool = False):
    """Least-squares similarity transform mapping src -> dst, both (N, d).
    Returns (R, t, s)."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    xs, xd = src - mu_s, dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(cov.shape[0])
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[-1, -1] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs ** 2).sum() / len(src)
        s = np.trace(np.diag(D) @ S) / var_s
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return R, t, s


def _positions(traj):
    traj = np.asarray(traj)
    if traj.shape[1] == 3 and traj.ndim == 2:   # SE2 (x, y, theta)
        return traj[:, :2]
    return traj[:, :3]                           # SE3 (t, q) or points


def ate(estimated, ground_truth, *, align: bool = True,
        with_scale: bool = False) -> float:
    """Absolute trajectory error (RMSE of aligned positions)."""
    p_est = _positions(estimated)
    p_gt = _positions(ground_truth)
    if align:
        R, t, s = umeyama_alignment(p_est, p_gt, with_scale=with_scale)
        p_est = (s * (R @ p_est.T)).T + t
    d = p_est - p_gt
    return float(np.sqrt((d ** 2).sum(axis=1).mean()))


def rpe(estimated, ground_truth, *, delta: int = 1) -> float:
    """Relative pose error: RMSE of the translational drift over ``delta``
    steps."""
    p_est = _positions(estimated)
    p_gt = _positions(ground_truth)
    de = p_est[delta:] - p_est[:-delta]
    dg = p_gt[delta:] - p_gt[:-delta]
    d = np.linalg.norm(de, axis=1) - np.linalg.norm(dg, axis=1)
    return float(np.sqrt((d ** 2).mean()))
