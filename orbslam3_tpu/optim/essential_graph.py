"""Essential-graph (Sim3 pose-graph) optimization for loop closing.

Role-parity with Optimizer::OptimizeEssentialGraph (/root/reference/src/
Optimizer3.cc:48): vertices are per-keyframe Sim3 world->cam poses (scale
fixed to 1 for stereo), edges are loop closures, spanning-tree links, and
strong-covisibility links (weight >= 100), with residual
r = log_sim3(S_meas^-1 * S_j * S_i^-1).  After convergence, keyframe SE3
poses are recovered (t / s) and map points transported by their reference
keyframe's correction — same as the reference's post-pass.

Implementation: Gauss-Newton with per-edge numeric Jacobians (7x14 blocks,
central differences) scattered into a dense 7N system — essential graphs
here are a few hundred keyframes, well within dense-solve territory.
"""

from __future__ import annotations

import numpy as np

from orbslam3_tpu.utils.lie import SE3, Sim3


def _edge_residual(s_i: Sim3, s_j: Sim3, s_meas: Sim3) -> np.ndarray:
    return (s_meas.inverse() * (s_j * s_i.inverse())).log()


def _apply(s: Sim3, dx: np.ndarray) -> Sim3:
    return (Sim3.exp(dx) * s).normalized()


def optimize_essential_graph(
    kfs: list,
    edges: list,
    fixed: set,
    n_iters: int = 20,
    fix_scale: bool = True,
):
    """kfs: list of KeyFrames with .Tcw (+ optional .corrected_sim3 to seed);
    edges: (kf_i, kf_j, Sim3 measurement S_ji = S_j * S_i^-1, weight);
    fixed: set of KFs held constant.  Updates kf poses in place and returns
    the per-kf corrected Sim3 (for transporting map points)."""
    slot = {kf: i for i, kf in enumerate(kfs)}
    n = len(kfs)
    sims = []
    for kf in kfs:
        seed = getattr(kf, "corrected_sim3", None)
        sims.append(seed.normalized() if seed is not None else Sim3.from_se3(kf.Tcw))
    eps = 1e-6
    dof = 6 if fix_scale else 7

    for _ in range(n_iters):
        h = np.zeros((7 * n, 7 * n))
        b = np.zeros(7 * n)
        cost = 0.0
        for kf_i, kf_j, s_meas, w in edges:
            i, j = slot[kf_i], slot[kf_j]
            r0 = _edge_residual(sims[i], sims[j], s_meas)
            cost += w * (r0 @ r0)
            ji = np.zeros((7, 7))
            jj = np.zeros((7, 7))
            for k in range(dof):
                d = np.zeros(7)
                d[k] = eps
                ji[:, k] = (
                    _edge_residual(_apply(sims[i], d), sims[j], s_meas)
                    - _edge_residual(_apply(sims[i], -d), sims[j], s_meas)
                ) / (2 * eps)
                jj[:, k] = (
                    _edge_residual(sims[i], _apply(sims[j], d), s_meas)
                    - _edge_residual(sims[i], _apply(sims[j], -d), s_meas)
                ) / (2 * eps)
            si, sj = slice(7 * i, 7 * i + 7), slice(7 * j, 7 * j + 7)
            h[si, si] += w * ji.T @ ji
            h[sj, sj] += w * jj.T @ jj
            h[si, sj] += w * ji.T @ jj
            h[sj, si] += w * jj.T @ ji
            b[si] += w * ji.T @ r0
            b[sj] += w * jj.T @ r0
        # gauge + scale fixing
        for kf in fixed:
            s = slice(7 * slot[kf], 7 * slot[kf] + 7)
            h[s, :] = 0.0
            h[:, s] = 0.0
            h[s, s] = np.eye(7)
            b[s] = 0.0
        if fix_scale:
            for i in range(n):
                k = 7 * i + 6
                h[k, :] = 0.0
                h[:, k] = 0.0
                h[k, k] = 1.0
                b[k] = 0.0
        h += 1e-9 * np.eye(7 * n)
        try:
            dx = np.linalg.solve(h, -b)
        except np.linalg.LinAlgError:
            break
        for i in range(n):
            sims[i] = _apply(sims[i], dx[7 * i : 7 * i + 7])
        if np.linalg.norm(dx) < 1e-10:
            break

    corrected = {}
    for kf, s in zip(kfs, sims):
        corrected[kf] = s
        kf.set_pose(s.to_se3())
    return corrected


# ---------------------------------------------------------------------------
# 4-DoF variant for gravity-aligned (inertial) maps
# ---------------------------------------------------------------------------

def _apply_4dof(s: Sim3, dx: np.ndarray) -> Sim3:
    """World-side 4-DoF increment: S_cw' = S_cw * W(dx)^-1 with
    W = (R_z(dyaw), dt_world).  Keeps roll/pitch (gravity) and scale exact —
    the constraint OptimizeEssentialGraph4DoF's VertexPose4DoF encodes
    (/root/reference/src/Optimizer6.cc:849, include/G2oTypes.h:817)."""
    from orbslam3_tpu.utils.lie import so3_exp

    w = Sim3(1.0, so3_exp(np.array([0.0, 0.0, dx[3]])), dx[:3])
    return (s * w.inverse()).normalized()


def optimize_essential_graph_4dof(
    kfs: list,
    edges: list,
    fixed: set,
    n_iters: int = 20,
):
    """4-DoF pose graph: same edge set/residual as the Sim3 graph, but each
    keyframe moves only by world yaw + translation, so the gravity direction
    established by VI initialization survives the correction."""
    slot = {kf: i for i, kf in enumerate(kfs)}
    n = len(kfs)
    sims = []
    for kf in kfs:
        seed = getattr(kf, "corrected_sim3", None)
        sims.append(seed.normalized() if seed is not None else Sim3.from_se3(kf.Tcw))
    eps = 1e-6

    for _ in range(n_iters):
        h = np.zeros((4 * n, 4 * n))
        b = np.zeros(4 * n)
        for kf_i, kf_j, s_meas, w in edges:
            i, j = slot[kf_i], slot[kf_j]
            r0 = _edge_residual(sims[i], sims[j], s_meas)
            ji = np.zeros((7, 4))
            jj = np.zeros((7, 4))
            for k in range(4):
                d = np.zeros(4)
                d[k] = eps
                ji[:, k] = (
                    _edge_residual(_apply_4dof(sims[i], d), sims[j], s_meas)
                    - _edge_residual(_apply_4dof(sims[i], -d), sims[j], s_meas)
                ) / (2 * eps)
                jj[:, k] = (
                    _edge_residual(sims[i], _apply_4dof(sims[j], d), s_meas)
                    - _edge_residual(sims[i], _apply_4dof(sims[j], -d), s_meas)
                ) / (2 * eps)
            si, sj = slice(4 * i, 4 * i + 4), slice(4 * j, 4 * j + 4)
            h[si, si] += w * ji.T @ ji
            h[sj, sj] += w * jj.T @ jj
            h[si, sj] += w * ji.T @ jj
            h[sj, si] += w * jj.T @ ji
            b[si] += w * ji.T @ r0
            b[sj] += w * jj.T @ r0
        for kf in fixed:
            s = slice(4 * slot[kf], 4 * slot[kf] + 4)
            h[s, :] = 0.0
            h[:, s] = 0.0
            h[s, s] = np.eye(4)
            b[s] = 0.0
        h += 1e-9 * np.eye(4 * n)
        try:
            dx = np.linalg.solve(h, -b)
        except np.linalg.LinAlgError:
            break
        for i in range(n):
            sims[i] = _apply_4dof(sims[i], dx[4 * i : 4 * i + 4])
        if np.linalg.norm(dx) < 1e-10:
            break

    corrected = {}
    for kf, s in zip(kfs, sims):
        corrected[kf] = s
        kf.set_pose(s.to_se3())
    return corrected
