"""RANSAC PnP for relocalization.

Role-parity with the reference's MLPnPsolver (/root/reference/include/
MLPnPsolver.h:59-72, 1,056 LoC — RANSAC around the ML-PnP algorithm).
This implementation uses EPnP (Lepetit et al.) minimal solves inside the
same RANSAC + inlier-refinement loop; the solver choice is an internal
detail — the contract (candidate pose for a lost frame from 2D-3D
matches, with inlier classification) is identical.
"""

from __future__ import annotations

import numpy as np

from orbslam3_tpu.utils.lie import SE3, project_to_so3


def _epnp(pw: np.ndarray, uv_n: np.ndarray) -> SE3 | None:
    """EPnP for n >= 4 points; uv_n are normalized image coords (x, y)."""
    n = len(pw)
    # control points: centroid + principal axes
    c0 = pw.mean(axis=0)
    a = pw - c0
    cov = a.T @ a / n
    w_, v_ = np.linalg.eigh(cov)
    ctrl = np.vstack([c0, c0 + v_.T * np.sqrt(np.maximum(w_, 1e-12))[:, None]])
    # barycentric coordinates
    m = np.vstack([ctrl.T, np.ones(4)])  # (4, 4)
    try:
        alphas = np.linalg.solve(m, np.vstack([pw.T, np.ones(n)])).T  # (n, 4)
    except np.linalg.LinAlgError:
        return None
    # build M (2n x 12)
    mm = np.zeros((2 * n, 12))
    for j in range(4):
        mm[0::2, 3 * j] = alphas[:, j]
        mm[0::2, 3 * j + 2] = -alphas[:, j] * uv_n[:, 0]
        mm[1::2, 3 * j + 1] = alphas[:, j]
        mm[1::2, 3 * j + 2] = -alphas[:, j] * uv_n[:, 1]
    _, _, vt = np.linalg.svd(mm, full_matrices=False)
    cc = vt[-1].reshape(4, 3)  # control points in camera frame (up to scale)
    # fix scale/sign via distances between control points
    d_w = np.linalg.norm(ctrl[1:] - ctrl[0], axis=1)
    d_c = np.linalg.norm(cc[1:] - cc[0], axis=1)
    if d_c.sum() < 1e-12:
        return None
    s = d_w.sum() / d_c.sum()
    cc = cc * s
    pc = alphas @ cc
    if np.median(pc[:, 2]) < 0:
        pc = -pc
    # Procrustes: world -> camera rigid transform
    mu_w, mu_c = pw.mean(0), pc.mean(0)
    h = (pw - mu_w).T @ (pc - mu_c)
    u, _, vt2 = np.linalg.svd(h)
    r = vt2.T @ np.diag([1, 1, np.sign(np.linalg.det(vt2.T @ u.T))]) @ u.T
    t = mu_c - r @ mu_w
    return SE3(project_to_so3(r), t)


def pnp_ransac(
    pw: np.ndarray,
    uv: np.ndarray,
    camera,
    inv_sigma2: np.ndarray | None = None,
    iterations: int = 200,
    chi2_th: float = 5.991,
    min_inliers: int = 10,
    seed: int = 0,
):
    """Returns (SE3 | None, inlier mask).  pw (N,3) world, uv (N,2) pixels."""
    n = len(pw)
    if n < 6:
        return None, np.zeros(n, bool)
    if inv_sigma2 is None:
        inv_sigma2 = np.ones(n)
    rays = camera.unproject(uv)
    uv_n = rays[:, :2] / rays[:, 2:3]
    rng = np.random.default_rng(seed)
    best_inl = None
    best_n = 0
    for _ in range(iterations):
        idx = rng.choice(n, 6, replace=False)
        T = _epnp(pw[idx], uv_n[idx])
        if T is None:
            continue
        pc = T.apply(pw)
        ok_z = pc[:, 2] > 0.05
        proj = camera.project(np.where(ok_z[:, None], pc, [0, 0, 1.0]))
        e2 = ((proj - uv) ** 2).sum(axis=1) * inv_sigma2
        inl = ok_z & (e2 < chi2_th)
        if inl.sum() > best_n:
            best_n = int(inl.sum())
            best_inl = inl
            if best_n > 0.8 * n:
                break
    if best_inl is None or best_n < min_inliers:
        return None, np.zeros(n, bool)
    # refine on inliers
    T = _epnp(pw[best_inl], uv_n[best_inl])
    if T is None:
        return None, np.zeros(n, bool)
    pc = T.apply(pw)
    ok_z = pc[:, 2] > 0.05
    proj = camera.project(np.where(ok_z[:, None], pc, [0, 0, 1.0]))
    e2 = ((proj - uv) ** 2).sum(axis=1) * inv_sigma2
    inl = ok_z & (e2 < chi2_th)
    if inl.sum() < min_inliers:
        return None, np.zeros(n, bool)
    return T, inl
