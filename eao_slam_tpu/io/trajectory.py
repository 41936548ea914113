"""Trajectory export and ATE evaluation.

Export follows System::SaveKeyFrameTrajectoryTUM (src/System.cc:387-421):
rows of "timestamp tx ty tz qx qy qz qw" for the camera-in-world pose of
each keyframe. Evaluation implements the standard TUM ATE RMSE with
similarity (Sim3/Umeyama) alignment — the external tool the reference
defers to (SURVEY.md §6).
"""

from __future__ import annotations

import numpy as np


def save_tum(path: str, timestamps, T_cw, valid=None) -> int:
    """Write keyframe trajectory in TUM format. T_cw: [N, 3, 4] camera-from-
    world; we export the inverse (camera pose in world) like the reference."""
    from eao_slam_tpu.geometry import se3, so3

    T_cw = np.asarray(T_cw, np.float64)
    timestamps = np.asarray(timestamps, np.float64)
    n = 0
    with open(path, "w") as f:
        for i in range(len(timestamps)):
            if valid is not None and not valid[i]:
                continue
            R = T_cw[i, :3, :3]
            t = T_cw[i, :3, 3]
            Rwc = R.T
            twc = -Rwc @ t
            q = np.asarray(so3.mat_to_quat(Rwc[None]))[0]  # wxyz
            f.write(
                f"{timestamps[i]:.6f} {twc[0]:.7f} {twc[1]:.7f} {twc[2]:.7f} "
                f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n"
            )
            n += 1
    return n


def save_kitti(path: str, T_cw, valid=None) -> int:
    """Write a trajectory in KITTI odometry format
    (System::SaveTrajectoryKITTI, src/System.cc:423-471): one row of the
    12 values of the 3x4 camera-in-world matrix per frame, all poses
    rebased so the first exported pose is the identity (the reference
    transforms by the first keyframe's inverse pose)."""
    T_cw = np.asarray(T_cw, np.float64)
    rows = []
    T0wc = None
    for i in range(len(T_cw)):
        if valid is not None and not valid[i]:
            continue
        R = T_cw[i, :3, :3]
        t = T_cw[i, :3, 3]
        Twc = np.eye(4)
        Twc[:3, :3] = R.T
        Twc[:3, 3] = -R.T @ t
        if T0wc is None:
            T0wc = np.linalg.inv(Twc)
        Twc = T0wc @ Twc
        rows.append(" ".join(f"{v:.9e}" for v in Twc[:3].reshape(-1)))
    with open(path, "w") as f:
        f.write("\n".join(rows) + ("\n" if rows else ""))
    return len(rows)


def load_kitti_poses(path: str) -> np.ndarray:
    """Read a KITTI-format trajectory back as [N, 3, 4] camera-in-world."""
    rows = []
    with open(path) as f:
        for line in f:
            vals = [float(v) for v in line.split()]
            if len(vals) == 12:
                rows.append(np.asarray(vals).reshape(3, 4))
    return np.stack(rows) if rows else np.zeros((0, 3, 4))


def umeyama_alignment(x: np.ndarray, y: np.ndarray, with_scale: bool = True):
    """Least-squares similarity aligning x -> y. x, y: [N, 3].
    Returns (s, R, t) with y ≈ s * R @ x + t."""
    mx, my = x.mean(0), y.mean(0)
    xc, yc = x - mx, y - my
    cov = yc.T @ xc / len(x)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    var_x = (xc ** 2).sum() / len(x)
    s = float(np.trace(np.diag(D) @ S) / var_x) if with_scale else 1.0
    t = my - s * R @ mx
    return s, R, t


def ate_rmse(
    est_t: np.ndarray,
    gt_t: np.ndarray,
    with_scale: bool = True,
) -> float:
    """ATE RMSE after similarity alignment (mono scale is unobservable, so
    scale-aligned comparison matches the standard TUM mono protocol)."""
    s, R, t = umeyama_alignment(est_t, gt_t, with_scale)
    aligned = (s * (R @ est_t.T)).T + t
    err = aligned - gt_t
    return float(np.sqrt((err ** 2).sum(axis=1).mean()))


def associate_by_time(ts_a: np.ndarray, ts_b: np.ndarray, tol: float = 0.05):
    """Greedy nearest-timestamp association; returns index pairs [M, 2]."""
    pairs = []
    j = 0
    for i, ta in enumerate(ts_a):
        j = int(np.argmin(np.abs(ts_b - ta)))
        if abs(ts_b[j] - ta) <= tol:
            pairs.append((i, j))
    return np.asarray(pairs, np.int64).reshape(-1, 2)
