"""Essential-graph (Sim3 pose-graph) optimization for loop closing.

Role-parity with Optimizer::OptimizeEssentialGraph (/root/reference/src/
Optimizer3.cc:48): vertices are per-keyframe Sim3 world->cam poses (scale
fixed to 1 for stereo), edges are loop closures, spanning-tree links, and
strong-covisibility links (weight >= 100), with residual
r = log_sim3(S_meas^-1 * S_j * S_i^-1).  After convergence, keyframe SE3
poses are recovered (t / s) and map points transported by their reference
keyframe's correction — same as the reference's post-pass.

Implementation: Gauss-Newton with ANALYTIC first-order Sim3 edge Jacobians
(J_i = -Jr^{-1}(r), J_j = Jl^{-1}(r) Adj(S_meas^{-1}); BCH to second
order) assembled into a scipy block-sparse system — O(edges) assembly and
a sparse Cholesky-class solve instead of the round-1 dense
O((7N)^3) + numeric central differences.  Multi-thousand-KF multi-session
graphs solve in seconds (tests assert >10x at 500 KFs).
"""

from __future__ import annotations

import numpy as np

from orbslam3_tpu.utils.lie import SE3, Sim3


# ---------------------------------------------------------------------------
# sim(3) algebra helpers (tangent order [rho(3), phi(3), sigma(1)])
# ---------------------------------------------------------------------------

def _hat3(v: np.ndarray) -> np.ndarray:
    return np.array(
        [[0.0, -v[2], v[1]], [v[2], 0.0, -v[0]], [-v[1], v[0], 0.0]]
    )


def sim3_adjoint(s: Sim3) -> np.ndarray:
    """Adjoint of a Sim3 group element on the [rho, phi, sigma] tangent:
    Adj = [[s R, t^ R, -t], [0, R, 0], [0, 0, 1]]."""
    a = np.zeros((7, 7))
    a[:3, :3] = s.s * s.R
    a[:3, 3:6] = _hat3(s.t) @ s.R
    a[:3, 6] = -s.t
    a[3:6, 3:6] = s.R
    a[6, 6] = 1.0
    return a


def _sim3_ad(x: np.ndarray) -> np.ndarray:
    """Lie-algebra adjoint ad_x on sim(3): [x, y] with
    [x, y].rho = phi_x x rho_y + sigma_x rho_y - phi_y x rho_x - sigma_y rho_x."""
    rho, phi, sigma = x[:3], x[3:6], float(x[6])
    ad = np.zeros((7, 7))
    ad[:3, :3] = _hat3(phi) + sigma * np.eye(3)
    ad[:3, 3:6] = _hat3(rho)
    ad[:3, 6] = -rho
    ad[3:6, 3:6] = _hat3(phi)
    return ad


def _jl_inv(r: np.ndarray) -> np.ndarray:
    """Inverse left Jacobian of sim(3), BCH second order:
    Jl^{-1}(r) ~ I - ad/2 + ad^2/12 (residuals are small post-RANSAC)."""
    ad = _sim3_ad(r)
    return np.eye(7) - 0.5 * ad + (ad @ ad) / 12.0


def _jr_inv(r: np.ndarray) -> np.ndarray:
    """Inverse right Jacobian: Jr^{-1}(r) = Jl^{-1}(-r)."""
    ad = _sim3_ad(r)
    return np.eye(7) + 0.5 * ad + (ad @ ad) / 12.0


# ---------------------------------------------------------------------------
# batched (per-edge vectorized) sim3 math — the per-iteration hot path
# ---------------------------------------------------------------------------

def _bhat(v: np.ndarray) -> np.ndarray:
    """(N, 3) -> (N, 3, 3) skew matrices."""
    n = len(v)
    m = np.zeros((n, 3, 3))
    m[:, 0, 1] = -v[:, 2]
    m[:, 0, 2] = v[:, 1]
    m[:, 1, 0] = v[:, 2]
    m[:, 1, 2] = -v[:, 0]
    m[:, 2, 0] = -v[:, 1]
    m[:, 2, 1] = v[:, 0]
    return m


def _bso3_log(R: np.ndarray) -> np.ndarray:
    """Batched SO3 log for SMALL-to-moderate angles (pose-graph residuals)."""
    tr = np.clip((R[:, 0, 0] + R[:, 1, 1] + R[:, 2, 2] - 1) / 2, -1.0, 1.0)
    theta = np.arccos(tr)
    w = np.stack(
        [R[:, 2, 1] - R[:, 1, 2], R[:, 0, 2] - R[:, 2, 0], R[:, 1, 0] - R[:, 0, 1]],
        axis=-1,
    )
    s = np.sin(theta)
    f = np.where(theta < 1e-7, 0.5 + theta * theta / 12,
                 theta / np.maximum(2 * s, 1e-12))
    return f[:, None] * w


def _bso3_jl(phi: np.ndarray) -> np.ndarray:
    """Batched SO3 left Jacobian."""
    th2 = (phi * phi).sum(-1)
    th = np.sqrt(th2)
    k = _bhat(phi)
    small = th < 1e-6
    a = np.where(small, 0.5 - th2 / 24, (1 - np.cos(th)) / np.maximum(th2, 1e-18))
    b = np.where(small, 1 / 6 - th2 / 120, (th - np.sin(th)) / np.maximum(th * th2, 1e-24))
    return np.eye(3) + a[:, None, None] * k + b[:, None, None] * (k @ k)


def _bsim3_log(s: np.ndarray, R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Batched Sim3.log with the same W approximation as utils.lie.Sim3."""
    sigma = np.log(s)
    phi = _bso3_log(R)
    jl = _bso3_jl(phi)
    a = np.where(np.abs(sigma) < 1e-7, 1.0 + sigma / 2.0,
                 (s - 1.0) / np.where(np.abs(sigma) < 1e-7, 1.0, sigma))
    rho = np.linalg.solve(a[:, None, None] * jl, t[..., None])[..., 0]
    return np.concatenate([rho, phi, sigma[:, None]], axis=-1)


def _bsim3_ad(x: np.ndarray) -> np.ndarray:
    """Batched lie-algebra adjoint ad_x (N, 7, 7)."""
    n = len(x)
    rho, phi, sigma = x[:, :3], x[:, 3:6], x[:, 6]
    ad = np.zeros((n, 7, 7))
    ad[:, :3, :3] = _bhat(phi) + sigma[:, None, None] * np.eye(3)
    ad[:, :3, 3:6] = _bhat(rho)
    ad[:, :3, 6] = -rho
    ad[:, 3:6, 3:6] = _bhat(phi)
    return ad


def _bjl_inv(r: np.ndarray) -> np.ndarray:
    ad = _bsim3_ad(r)
    return np.eye(7) - 0.5 * ad + (ad @ ad) / 12.0


def _bjr_inv(r: np.ndarray) -> np.ndarray:
    ad = _bsim3_ad(r)
    return np.eye(7) + 0.5 * ad + (ad @ ad) / 12.0


def _edge_residuals_batched(sims, edge_ij, minv_s, minv_R, minv_t):
    """r_e = log(M_e^-1 * S_j * S_i^-1) for all edges at once."""
    s_arr = np.asarray([x.s for x in sims])
    r_arr = np.stack([x.R for x in sims])
    t_arr = np.stack([x.t for x in sims])
    i, j = edge_ij[:, 0], edge_ij[:, 1]
    # S_i^-1
    si_inv_s = 1.0 / s_arr[i]
    si_inv_R = r_arr[i].transpose(0, 2, 1)
    si_inv_t = -si_inv_s[:, None] * np.einsum("nij,nj->ni", si_inv_R, t_arr[i])
    # S_j * S_i^-1
    a_s = s_arr[j] * si_inv_s
    a_R = r_arr[j] @ si_inv_R
    a_t = s_arr[j][:, None] * np.einsum("nij,nj->ni", r_arr[j], si_inv_t) + t_arr[j]
    # M^-1 * A
    b_s = minv_s * a_s
    b_R = minv_R @ a_R
    b_t = minv_s[:, None] * np.einsum("nij,nj->ni", minv_R, a_t) + minv_t
    return _bsim3_log(b_s, b_R, b_t)


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
    fixed_idx = np.asarray(sorted(slot[kf] for kf in fixed), np.int64)

    from scipy.sparse import coo_matrix
    from scipy.sparse.linalg import spsolve

    # precompute per-edge constants (constant across iterations)
    edge_ij = np.asarray([[slot[a], slot[b]] for a, b, _, _ in edges], np.int64)
    edge_w = np.asarray([w for _, _, _, w in edges], np.float64)
    adj_minv = np.stack([sim3_adjoint(m.inverse()) for _, _, m, _ in edges])
    minv = [m.inverse() for _, _, m, _ in edges]
    minv_s = np.asarray([m.s for m in minv])
    minv_R = np.stack([m.R for m in minv])
    minv_t = np.stack([m.t for m in minv])

    blk = np.arange(7)
    row_ii = np.repeat(blk, 7)  # block-local row pattern
    col_ii = np.tile(blk, 7)

    for _ in range(n_iters):
        n_e = len(edges)
        r_all = _edge_residuals_batched(sims, edge_ij, minv_s, minv_R, minv_t)
        # analytic first-order Jacobians:
        #   r(d_i) = log(A exp(-d_i))            -> J_i = -Jr^{-1}(r)
        #   r(d_j) = log(exp(Adj(M^-1) d_j) A)   -> J_j =  Jl^{-1}(r) Adj(M^-1)
        ji = -_bjr_inv(r_all)
        jj = _bjl_inv(r_all) @ adj_minv
        wji = edge_w[:, None, None] * ji
        hii = np.einsum("eki,ekj->eij", ji, wji)
        hjj = np.einsum("eki,ekj->eij", jj, edge_w[:, None, None] * jj)
        hij = np.einsum("eki,ekj->eij", ji, edge_w[:, None, None] * jj)
        bi = np.einsum("eki,ek->ei", wji, r_all)
        bj = np.einsum("eki,ek->ei", edge_w[:, None, None] * jj, r_all)

        # sparse assembly (COO with duplicate summation)
        i7 = 7 * edge_ij[:, 0]
        j7 = 7 * edge_ij[:, 1]
        rows = np.concatenate(
            [
                (i7[:, None] + row_ii[None, :]).ravel(),
                (j7[:, None] + row_ii[None, :]).ravel(),
                (i7[:, None] + row_ii[None, :]).ravel(),
                (j7[:, None] + row_ii[None, :]).ravel(),
            ]
        )
        cols = np.concatenate(
            [
                (i7[:, None] + col_ii[None, :]).ravel(),
                (j7[:, None] + col_ii[None, :]).ravel(),
                (j7[:, None] + col_ii[None, :]).ravel(),
                (i7[:, None] + col_ii[None, :]).ravel(),
            ]
        )
        vals = np.concatenate(
            [
                hii.reshape(n_e, -1).ravel(),
                hjj.reshape(n_e, -1).ravel(),
                hij.reshape(n_e, -1).ravel(),
                hij.transpose(0, 2, 1).reshape(n_e, -1).ravel(),
            ]
        )
        b = np.zeros(7 * n)
        np.add.at(b, (i7[:, None] + blk[None, :]).ravel(), bi.ravel())
        np.add.at(b, (j7[:, None] + blk[None, :]).ravel(), bj.ravel())

        # gauge fixing (fixed vertices) + scale gauge: zero those rows/cols
        # via a post-assembly mask on the dense index set
        kill = np.zeros(7 * n, bool)
        for fi in fixed_idx:
            kill[7 * fi : 7 * fi + 7] = True
        if fix_scale:
            kill[6::7] = True
        keepm = ~(kill[rows] | kill[cols])
        rows, cols, vals = rows[keepm], cols[keepm], vals[keepm]
        # unit diagonal on killed dofs + damping
        diag_idx = np.arange(7 * n)
        rows = np.concatenate([rows, diag_idx])
        cols = np.concatenate([cols, diag_idx])
        vals = np.concatenate([vals, np.where(kill, 1.0, 1e-9)])
        b[kill] = 0.0

        h = coo_matrix((vals, (rows, cols)), shape=(7 * n, 7 * n)).tocsr()
        try:
            dx = spsolve(h, -b)
        except Exception:
            break
        if not np.all(np.isfinite(dx)):
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
    fixed_idx = np.asarray(sorted(slot[kf] for kf in fixed), np.int64)

    from scipy.sparse import coo_matrix
    from scipy.sparse.linalg import spsolve

    # 4-dof increment basis in the sim3 tangent: [dt(3); yaw e_z; no scale]
    basis = np.zeros((7, 4))
    basis[0, 0] = basis[1, 1] = basis[2, 2] = 1.0
    basis[5, 3] = 1.0

    edge_ij = np.asarray([[slot[a], slot[b]] for a, b, _, _ in edges], np.int64)
    edge_w = np.asarray([w for _, _, _, w in edges], np.float64)
    adj_minv = np.stack([sim3_adjoint(m.inverse()) for _, _, m, _ in edges])
    minv = [m.inverse() for _, _, m, _ in edges]
    minv_s = np.asarray([m.s for m in minv])
    minv_R = np.stack([m.R for m in minv])
    minv_t = np.stack([m.t for m in minv])
    blk = np.arange(4)
    row_ii = np.repeat(blk, 4)
    col_ii = np.tile(blk, 4)

    for _ in range(n_iters):
        n_e = len(edges)
        # chain rule through the world-side 4-dof chart:
        # S' = S * W(d)^-1 = exp(delta) S with delta = -Adj(S) basis d,
        # so J4 = J7(left-increment) @ (-Adj(S) basis)
        chart = np.stack([-sim3_adjoint(s) @ basis for s in sims])
        r_all = _edge_residuals_batched(sims, edge_ij, minv_s, minv_R, minv_t)
        ji = (-_bjr_inv(r_all)) @ chart[edge_ij[:, 0]]
        jj = (_bjl_inv(r_all) @ adj_minv) @ chart[edge_ij[:, 1]]
        wji = edge_w[:, None, None] * ji
        wjj = edge_w[:, None, None] * jj
        hii = np.einsum("eki,ekj->eij", ji, wji)
        hjj = np.einsum("eki,ekj->eij", jj, wjj)
        hij = np.einsum("eki,ekj->eij", ji, wjj)
        bi = np.einsum("eki,ek->ei", wji, r_all)
        bj = np.einsum("eki,ek->ei", wjj, r_all)

        i4 = 4 * edge_ij[:, 0]
        j4 = 4 * edge_ij[:, 1]
        rows = np.concatenate(
            [
                (i4[:, None] + row_ii[None, :]).ravel(),
                (j4[:, None] + row_ii[None, :]).ravel(),
                (i4[:, None] + row_ii[None, :]).ravel(),
                (j4[:, None] + row_ii[None, :]).ravel(),
            ]
        )
        cols = np.concatenate(
            [
                (i4[:, None] + col_ii[None, :]).ravel(),
                (j4[:, None] + col_ii[None, :]).ravel(),
                (j4[:, None] + col_ii[None, :]).ravel(),
                (i4[:, None] + col_ii[None, :]).ravel(),
            ]
        )
        vals = np.concatenate(
            [
                hii.reshape(n_e, -1).ravel(),
                hjj.reshape(n_e, -1).ravel(),
                hij.reshape(n_e, -1).ravel(),
                hij.transpose(0, 2, 1).reshape(n_e, -1).ravel(),
            ]
        )
        b = np.zeros(4 * n)
        np.add.at(b, (i4[:, None] + blk[None, :]).ravel(), bi.ravel())
        np.add.at(b, (j4[:, None] + blk[None, :]).ravel(), bj.ravel())

        kill = np.zeros(4 * n, bool)
        for fi in fixed_idx:
            kill[4 * fi : 4 * fi + 4] = True
        keepm = ~(kill[rows] | kill[cols])
        rows, cols, vals = rows[keepm], cols[keepm], vals[keepm]
        diag_idx = np.arange(4 * n)
        rows = np.concatenate([rows, diag_idx])
        cols = np.concatenate([cols, diag_idx])
        vals = np.concatenate([vals, np.where(kill, 1.0, 1e-9)])
        b[kill] = 0.0

        h = coo_matrix((vals, (rows, cols)), shape=(4 * n, 4 * n)).tocsr()
        try:
            dx = spsolve(h, -b)
        except Exception:
            break
        if not np.all(np.isfinite(dx)):
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
