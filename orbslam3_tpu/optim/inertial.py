"""Visual-inertial pose optimization for inertial tracking.

Role-parity with Optimizer::PoseInertialOptimizationLastFrame /
LastKeyFrame (/root/reference/src/Optimizer6.cc:48,432) and the EdgeInertial
factor (include/G2oTypes.h:495): optimize the current frame's 15-dof state
[body pose (6), velocity (3), gyro bias (3), acc bias (3)] against

 - monocular/stereo reprojection residuals of its matched map points,
 - the IMU preintegration residual to the previous (fixed) state
   (Forster rotation/velocity/position residuals, weighted by the
   propagated preintegration covariance),
 - bias random-walk residuals.

Gauss-Newton with numeric Jacobians over the 15-dof left-increment — at
per-frame problem sizes (a few hundred residual rows) the finite-difference
evaluation is microseconds and removes a whole class of hand-derivation
bugs (this repo once lost days to an analytically-plausible sign).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from orbslam3_tpu.imu.preintegration import GRAVITY, Bias, Preintegrated
from orbslam3_tpu.utils.lie import SE3, so3_exp, so3_log


@dataclass
class VIState:
    Twb: SE3          # body-in-world pose
    v: np.ndarray     # world-frame velocity
    bias: Bias

    def copy(self):
        return VIState(self.Twb.copy(), self.v.copy(), self.bias.copy())


def _apply_inc(s: VIState, dx: np.ndarray) -> VIState:
    return VIState(
        (SE3.exp(dx[:6]) * s.Twb.inverse()).inverse().normalized(),
        s.v + dx[6:9],
        Bias(s.bias.ba + dx[12:15], s.bias.bg + dx[9:12]),
    )


def _residuals(
    s: VIState,
    prev: VIState,
    pre: Preintegrated,
    obs_pw: np.ndarray,
    obs_uv: np.ndarray,
    obs_ur: np.ndarray,
    inv_sigma2: np.ndarray,
    camera,
    mbf: float,
    Tcb: SE3,
    w_inertial: np.ndarray,
    w_bias: np.ndarray,
) -> np.ndarray:
    """Stacked weighted residual vector."""
    out = []
    # --- visual (camera = Tcb * body^-1 in world) -------------------------
    Tcw = Tcb * s.Twb.inverse()
    pc = obs_pw @ Tcw.R.T + Tcw.t
    z = np.maximum(pc[:, 2], 1e-9)
    uv = camera.project(pc)
    w = np.sqrt(inv_sigma2)
    r_uv = (obs_uv - uv) * w[:, None]
    # huber on the visual rows (delta ~ sqrt(5.991))
    e = np.linalg.norm(r_uv, axis=1)
    hub = np.sqrt(np.maximum(2.447 * (2 * e - 2.447), 0.0))
    scale = np.where(e > 2.447, hub / np.maximum(e, 1e-12), 1.0)
    out.append((r_uv * scale[:, None]).ravel())
    stereo = obs_ur >= 0
    if stereo.any():
        ur_pred = uv[:, 0] - mbf / z
        r_ur = (obs_ur - ur_pred) * w
        out.append(np.where(stereo, r_ur, 0.0))
    # --- inertial ----------------------------------------------------------
    dt = pre.dT
    r1, p1, v1 = prev.Twb.R, prev.Twb.t, prev.v
    r2, p2, v2 = s.Twb.R, s.Twb.t, s.v
    dr = pre.get_delta_rotation(s.bias)
    res_r = so3_log(dr.T @ r1.T @ r2)
    res_v = r1.T @ (v2 - v1 - GRAVITY * dt) - pre.get_delta_velocity(s.bias)
    res_p = (
        r1.T @ (p2 - p1 - v1 * dt - 0.5 * GRAVITY * dt * dt)
        - pre.get_delta_position(s.bias)
    )
    r9 = np.concatenate([res_r, res_v, res_p])
    # w_inertial: (9,9) whitener (full off-diagonal information) or (9,)
    # per-row weights (legacy/diagonal form)
    out.append(w_inertial @ r9 if w_inertial.ndim == 2 else w_inertial * r9)
    # --- bias random walk ---------------------------------------------------
    out.append(w_bias * np.concatenate([s.bias.bg - prev.bias.bg,
                                        s.bias.ba - prev.bias.ba]))
    return np.concatenate(out)


def pose_inertial_optimization(
    cur: VIState,
    prev: VIState,
    pre: Preintegrated,
    obs_pw: np.ndarray,
    obs_uv: np.ndarray,
    obs_ur: np.ndarray,
    inv_sigma2: np.ndarray,
    camera,
    mbf: float = 0.0,
    Tcb: SE3 | None = None,
    n_iters: int = 10,
    prior_sigma: tuple = (2e-3, 0.03, 3e-3),
) -> VIState:
    """GN over the current state; previous state and map points fixed.

    prior_sigma = (rot rad, vel m/s, pos m) floors added to the
    preintegration stddevs.  The previous state is held FIXED here but is
    itself an estimate; without this floor a low-noise IMU makes the
    inertial residual arbitrarily stiff and the optimization dead-reckons
    from the previous state's noise instead of listening to vision.  (The
    reference solves the same problem with a marginalized prior on the
    previous state — EdgePriorPoseImu, include/G2oTypes.h:732.)
    """
    Tcb = Tcb or SE3()
    # full 9x9 whitener from the propagated preintegration covariance
    # (EdgeInertial uses the full information matrix too), with the
    # prior-sigma floor added on the diagonal
    floor = np.repeat(np.asarray(prior_sigma) ** 2, 3)
    cov = 0.5 * (pre.C[:9, :9] + pre.C[:9, :9].T) + np.diag(floor + 1e-12)
    try:
        w_inertial = np.linalg.cholesky(np.linalg.inv(cov)).T
    except np.linalg.LinAlgError:
        w_inertial = 1.0 / np.sqrt(np.maximum(np.diagonal(cov), 1e-12))
    walk_var = np.maximum(np.diagonal(pre.C[9:15, 9:15]), 1e-14)
    w_bias = 1.0 / np.sqrt(walk_var + 1e-8)

    def res(s):
        return _residuals(
            s, prev, pre, obs_pw, obs_uv, obs_ur, inv_sigma2, camera, mbf,
            Tcb, w_inertial, w_bias,
        )

    s = cur.copy()
    lam = 1e-4
    r0 = res(s)
    cost = float(r0 @ r0)
    eps = 1e-6
    for _ in range(n_iters):
        r0 = res(s)
        jac = np.empty((len(r0), 15))
        for k in range(15):
            d = np.zeros(15)
            d[k] = eps
            jac[:, k] = (res(_apply_inc(s, d)) - res(_apply_inc(s, -d))) / (2 * eps)
        h = jac.T @ jac
        g = jac.T @ r0
        stepped = False
        for _ in range(6):
            try:
                dx = np.linalg.solve(h + lam * np.diag(np.maximum(np.diag(h), 1e-9)), -g)
            except np.linalg.LinAlgError:
                lam *= 10
                continue
            s_new = _apply_inc(s, dx)
            r_new = res(s_new)
            c_new = float(r_new @ r_new)
            if c_new < cost:
                s, cost = s_new, c_new
                lam = max(lam / 3, 1e-9)
                stepped = True
                break
            lam *= 10
        if not stepped:
            break
    return s
