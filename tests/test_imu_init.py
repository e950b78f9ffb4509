"""VI initialization on a simulated trajectory."""
import numpy as np
from orbslam3_tpu.imu.preintegration import GRAVITY, Bias, Calib, Preintegrated
from orbslam3_tpu.imu.initialization import (
    align_visual_inertial, estimate_gyro_bias, gravity_alignment_rotation)
from orbslam3_tpu.utils.lie import SE3, so3_exp

def simulate_kfs(n_kf=8, steps=40, dt=0.005, bg=None):
    rng = np.random.default_rng(4)
    bg = np.zeros(3) if bg is None else bg
    r = so3_exp(rng.normal(0, 0.2, 3)); v = np.array([0.3, -0.1, 0.2]); p = np.zeros(3)
    kf_T, kf_v, preints = [SE3(r.copy(), p.copy()).inverse()], [v.copy()], []
    # NOTE: store Twb = SE3(R_wb, p)
    kf_T = [SE3(r, p)]
    for k in range(n_kf - 1):
        pre = Preintegrated(Bias(), Calib(SE3()))
        for s in range(steps):
            w_body = np.array([0.4*np.sin(0.01*(k*steps+s)), 0.2, -0.3])
            a_world = np.array([0.5*np.cos(0.02*(k*steps+s)), 0.2, 0.1])
            f_body = r.T @ (a_world - GRAVITY)
            pre.integrate(f_body, w_body + bg, dt)
            a_w = r @ f_body + GRAVITY
            p = p + v*dt + 0.5*a_w*dt*dt
            v = v + a_w*dt
            r = r @ so3_exp(w_body*dt)
        kf_T.append(SE3(r.copy(), p.copy()))
        kf_v.append(v.copy())
        preints.append(pre)
    return kf_T, kf_v, preints

def test_gyro_bias():
    bg_true = np.array([0.01, -0.02, 0.015])
    kf_T, kf_v, preints = simulate_kfs(bg=bg_true)
    # preintegrated with zero bias belief but measurements include bg_true:
    bg = estimate_gyro_bias([T.R for T in kf_T], preints)
    np.testing.assert_allclose(bg, bg_true, atol=2e-4)

def test_alignment_scale_and_gravity():
    kf_T, kf_v, preints = simulate_kfs()
    scale_true = 2.5
    scaled = [SE3(T.R, T.t / scale_true) for T in kf_T]  # visual under-scale
    s, g, vels = align_visual_inertial(scaled, preints)
    assert abs(s - scale_true) / scale_true < 0.02, s
    np.testing.assert_allclose(g, GRAVITY, atol=0.15)
    np.testing.assert_allclose(vels[0], kf_v[0], atol=0.05)
    r_align = gravity_alignment_rotation(g)
    np.testing.assert_allclose(r_align @ (g/np.linalg.norm(g)), [0,0,-1], atol=0.02)

def test_alignment_fixed_scale():
    kf_T, kf_v, preints = simulate_kfs()
    s, g, vels = align_visual_inertial(kf_T, preints, fix_scale=True)
    assert s == 1.0
    np.testing.assert_allclose(g, GRAVITY, atol=0.1)
    np.testing.assert_allclose(vels[-1], kf_v[-1], atol=0.05)

