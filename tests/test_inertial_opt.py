"""Visual-inertial pose optimization: recovers state from perturbed init."""

import numpy as np

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.imu.preintegration import GRAVITY, Bias, Calib, Preintegrated
from orbslam3_tpu.optim.inertial import VIState, pose_inertial_optimization
from orbslam3_tpu.utils.lie import SE3, so3_exp

RNG = np.random.default_rng(8)


def _simulate_step(prev: VIState, n_imu=40, dt=0.005):
    """True motion + exact IMU samples for one inter-frame window."""
    pre = Preintegrated(prev.bias, Calib(SE3()))
    r, p, v = prev.Twb.R.copy(), prev.Twb.t.copy(), prev.v.copy()
    for s in range(n_imu):
        w_body = np.array([0.3, -0.15, 0.25])
        a_world = np.array([0.4, -0.1, 0.2])
        f_body = r.T @ (a_world - GRAVITY)
        pre.integrate(f_body + prev.bias.ba, w_body + prev.bias.bg, dt)
        a_w = r @ f_body + GRAVITY
        p = p + v * dt + 0.5 * a_w * dt * dt
        v = v + a_w * dt
        r = r @ so3_exp(w_body * dt)
    return VIState(SE3(r, p), v, prev.bias.copy()), pre


def test_pose_inertial_optimization_recovers_state():
    cam = Pinhole([400.0, 400.0, 320.0, 240.0])
    bias = Bias(np.array([0.02, -0.01, 0.015]), np.array([0.003, 0.002, -0.004]))
    prev = VIState(SE3(so3_exp(RNG.normal(0, 0.1, 3)), RNG.normal(0, 0.2, 3)),
                   np.array([0.2, -0.1, 0.15]), bias)
    cur_true, pre = _simulate_step(prev)
    # IMU was integrated believing the TRUE bias; optimizer must keep it
    pw = RNG.normal(0, 2.0, (150, 3)) + cur_true.Twb.t + cur_true.Twb.R @ [0, 0, 5.0]
    Tcw = cur_true.Twb.inverse()
    pc = Tcw.apply(pw)
    keep = pc[:, 2] > 0.5
    pw = pw[keep]
    uv = cam.project(Tcw.apply(pw)) + RNG.normal(0, 0.4, (keep.sum(), 2))
    ur = np.full(len(pw), -1.0)
    inv_s2 = np.ones(len(pw))

    # perturbed init (as the tracker would have from prediction noise)
    cur0 = VIState(
        SE3.exp(RNG.normal(0, 0.01, 6)) * cur_true.Twb,
        cur_true.v + RNG.normal(0, 0.05, 3),
        Bias(bias.ba + 0.002, bias.bg + 0.001),
    )
    sol = pose_inertial_optimization(cur0, prev, pre, pw, uv, ur, inv_s2, cam)
    e_pose = (sol.Twb * cur_true.Twb.inverse()).log()
    assert np.linalg.norm(e_pose[:3]) < 0.01, e_pose
    assert np.linalg.norm(e_pose[3:]) < 0.005, e_pose
    assert np.linalg.norm(sol.v - cur_true.v) < 0.03
    assert np.linalg.norm(sol.bias.bg - bias.bg) < 0.002


def test_inertial_residual_zero_at_truth():
    from orbslam3_tpu.optim.inertial import _residuals
    cam = Pinhole([400.0, 400.0, 320.0, 240.0])
    prev = VIState(SE3(), np.array([0.1, 0.0, 0.2]), Bias())
    cur_true, pre = _simulate_step(prev)
    r = _residuals(
        cur_true, prev, pre,
        np.zeros((0, 3)), np.zeros((0, 2)), np.zeros(0), np.zeros(0),
        cam, 0.0, SE3(),
        np.ones(9), np.ones(6),
    )
    assert np.abs(r).max() < 1e-6, np.abs(r).max()
