"""Local inertial BA: analytic Jacobians + window state recovery."""

import numpy as np

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.imu.preintegration import GRAVITY, Bias, Calib, Preintegrated
from orbslam3_tpu.optim.local_inertial_ba import (
    NavState,
    _inertial_block,
    _retract,
    _visual_block,
    optimize_inertial_window,
)
from orbslam3_tpu.utils.lie import SE3, so3_exp


def _rng_state(rng):
    return NavState(
        so3_exp(rng.normal(0, 0.3, 3)),
        rng.normal(0, 1.0, 3),
        rng.normal(0, 0.5, 3),
        rng.normal(0, 0.01, 3),
        rng.normal(0, 0.05, 3),
    )


def _make_preint(rng, dt_total=0.25, n=50, bias=None):
    pre = Preintegrated(bias or Bias(), Calib(SE3()))
    for _ in range(n):
        acc = rng.normal(0, 2.0, 3) + np.array([0, 0, 9.81])
        gyro = rng.normal(0, 0.5, 3)
        pre.integrate(acc, gyro, dt_total / n)
    return pre


def test_inertial_jacobians_match_numeric():
    rng = np.random.default_rng(0)
    s1, s2 = _rng_state(rng), _rng_state(rng)
    pre = _make_preint(rng)
    r0, J1, J2 = _inertial_block(s1, s2, pre)
    eps = 1e-6
    for which, J in ((0, J1), (1, J2)):
        for k in range(15):
            d = np.zeros(15)
            d[k] = eps
            sp = [s1.copy(), s2.copy()]
            sm = [s1.copy(), s2.copy()]
            sp[which] = _retract(sp[which], d)
            sm[which] = _retract(sm[which], -d)
            rp, _, _ = _inertial_block(sp[0], sp[1], pre)
            rm, _, _ = _inertial_block(sm[0], sm[1], pre)
            num = (rp - rm) / (2 * eps)
            # bias columns of the rotation rows are first-order (reference
            # uses the same approximation) — allow looser tolerance there
            tol = 2e-3 if (which == 0 and 9 <= k < 12) else 1e-5
            assert np.allclose(J[:, k], num, atol=tol), (which, k, J[:, k], num)


def test_visual_jacobians_match_numeric():
    rng = np.random.default_rng(1)
    cam = Pinhole([300.0, 300.0, 320.0, 240.0])
    Tcb = SE3.exp(np.array([0.1, -0.05, 0.2, 0.01, 0.02, -0.03]))
    st = [_rng_state(rng)]
    # points in front of the camera
    Twb = SE3(st[0].R, st[0].p)
    Twc = Twb * Tcb.inverse()
    pc = rng.uniform([-2, -2, 4], [2, 2, 12], (20, 3))
    pw = pc @ Twc.R.T + Twc.t
    uv = cam.project((pw - Twc.t) @ Twc.R) + rng.normal(0, 0.5, (20, 2))
    ur = np.where(rng.uniform(size=20) < 0.5, uv[:, 0] - 40.0 / pc[:, 2], -1.0)
    obs = dict(
        kf_idx=np.zeros(20, int), pw=pw, uv=uv, ur=ur,
        inv_sigma2=np.ones(20), camera=cam, mbf=40.0,
    )
    res0, jac, jac_s, stereo, _ = _visual_block(st, Tcb, obs)
    eps = 1e-6
    for k in range(6):
        d = np.zeros(15)
        d[k] = eps
        rp, _, _, _, _ = _visual_block([_retract(st[0], d)], Tcb, obs)
        rm, _, _, _, _ = _visual_block([_retract(st[0], -d)], Tcb, obs)
        num = (rp - rm) / (2 * eps)
        assert np.allclose(jac[:, :, k], num, atol=1e-4), k
    # global log-scale column vs numeric
    rp, _, _, _, _ = _visual_block(st, Tcb, obs, log_scale=eps)
    rm, _, _, _, _ = _visual_block(st, Tcb, obs, log_scale=-eps)
    num = (rp - rm) / (2 * eps)
    assert np.allclose(jac_s, num, atol=1e-4)


def test_opt_scale_recovers_mono_scale():
    """Landmarks + initial states at a WRONG global scale; the joint
    chain pass with opt_scale must find the correction (mono case)."""
    rng = np.random.default_rng(4)
    cam = Pinhole([300.0, 300.0, 320.0, 240.0])
    Tcb = SE3()
    n = 6
    dt = 0.25

    def pos(t):
        return np.array([0.7 * t, 0.3 * np.sin(2 * t), 0.1 * t])

    def vel(t):
        return np.array([0.7, 0.6 * np.cos(2 * t), 0.1])

    def acc(t):
        return np.array([0.0, -1.2 * np.sin(2 * t), 0.0])

    gt, preints = [], []
    for i in range(n):
        t = i * dt
        gt.append(NavState(np.eye(3), pos(t), vel(t), np.zeros(3), np.zeros(3)))
    for i in range(n - 1):
        pre = Preintegrated(Bias(), Calib(SE3()))
        m = 200
        h = dt / m
        for j in range(m):
            t = i * dt + (j + 0.5) * h
            pre.integrate(acc(t) - GRAVITY, np.zeros(3), h)
        preints.append(pre)
    pw = rng.uniform([-3, -3, 6], [6, 3, 14], (150, 3))
    kf_idx, pws, uvs, urs = [], [], [], []
    wrong = 0.6  # map stored at 0.6x metric
    for i, s in enumerate(gt):
        Twc = SE3(s.R, s.p)
        pc = (pw - Twc.t) @ Twc.R
        vis = pc[:, 2] > 0.5
        uv = cam.project(pc[vis])
        inb = (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) & (uv[:, 1] < 480)
        idx = np.nonzero(vis)[0][inb]
        kf_idx += [i] * len(idx)
        pws += list(pw[idx] * wrong)
        uvs += list(uv[inb] + rng.normal(0, 0.3, (inb.sum(), 2)))
        urs += [-1.0] * len(idx)
    obs = dict(
        kf_idx=np.asarray(kf_idx), pw=np.asarray(pws), uv=np.asarray(uvs),
        ur=np.asarray(urs), inv_sigma2=np.ones(len(kf_idx)), camera=cam, mbf=0.0,
    )
    # initial states at the wrong scale too (visually consistent)
    init = [
        NavState(s.R, s.p * wrong, s.v * wrong, s.bg.copy(), s.ba.copy())
        for s in gt
    ]
    fixed = np.zeros(n, bool)
    fixed[0] = True
    out, _, s_corr, _c = optimize_inertial_window(
        init, preints, obs, Tcb, fixed, n_iters=15, opt_scale=True
    )
    assert abs(s_corr * wrong - 1.0) < 0.03, s_corr
    # positions land at (metric) ground truth for the free states
    for s, g in zip(out[1:], gt[1:]):
        assert np.linalg.norm(s.p - g.p * wrong * s_corr) < 0.05


def test_window_recovers_perturbed_states():
    """Ground-truth chain + exact IMU + landmarks; perturb mid states."""
    rng = np.random.default_rng(2)
    cam = Pinhole([300.0, 300.0, 320.0, 240.0])
    Tcb = SE3.exp(np.array([0.0, 0.1, 0.0, 0.02, -0.01, 0.05]))
    n = 6
    dt = 0.25

    # analytic body trajectory: p(t) with closed-form acceleration
    def pos(t):
        return np.array([0.8 * t, 0.3 * np.sin(t), 0.1 * t * t])

    def vel(t):
        return np.array([0.8, 0.3 * np.cos(t), 0.2 * t])

    def acc(t):
        return np.array([0.0, -0.3 * np.sin(t), 0.2])

    def rot(t):
        return so3_exp(np.array([0.05 * t, 0.3 * t, 0.02 * np.sin(t)]))

    gt, preints = [], []
    for i in range(n):
        t = i * dt
        gt.append(NavState(rot(t), pos(t), vel(t), np.zeros(3), np.zeros(3)))
    for i in range(n - 1):
        pre = Preintegrated(Bias(), Calib(SE3()))
        m = 200
        h = dt / m
        for j in range(m):
            t = i * dt + (j + 0.5) * h
            # body rates from rotation derivative (central difference)
            e = 1e-5
            w = SE3(rot(t), np.zeros(3)).R.T @ (rot(t + e) - rot(t - e)) / (2 * e)
            gyro = np.array([w[2, 1], w[0, 2], w[1, 0]])
            f_body = rot(t).T @ (acc(t) - GRAVITY)
            pre.integrate(f_body, gyro, h)
        preints.append(pre)

    # landmarks: a cloud ahead of the rig, observed by every state
    pw = rng.uniform([-3, -3, 6], [6, 3, 14], (120, 3))
    kf_idx, pws, uvs, urs = [], [], [], []
    for i, s in enumerate(gt):
        Twc = SE3(s.R, s.p) * Tcb.inverse()
        pc = (pw - Twc.t) @ Twc.R
        vis = pc[:, 2] > 0.5
        uv = cam.project(pc[vis])
        inb = (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) & (uv[:, 1] < 480)
        idx = np.nonzero(vis)[0][inb]
        kf_idx += [i] * len(idx)
        pws += list(pw[idx])
        uvs += list(uv[inb] + rng.normal(0, 0.3, (inb.sum(), 2)))
        urs += [-1.0] * len(idx)
    obs = dict(
        kf_idx=np.asarray(kf_idx), pw=np.asarray(pws), uv=np.asarray(uvs),
        ur=np.asarray(urs), inv_sigma2=np.ones(len(kf_idx)), camera=cam, mbf=0.0,
    )
    assert len(kf_idx) > 300

    # perturb all but the anchor
    init = [gt[0].copy()]
    for s in gt[1:]:
        init.append(
            NavState(
                s.R @ so3_exp(rng.normal(0, 0.02, 3)),
                s.p + rng.normal(0, 0.05, 3),
                s.v + rng.normal(0, 0.1, 3),
                s.bg + rng.normal(0, 0.005, 3),
                s.ba + rng.normal(0, 0.02, 3),
            )
        )
    fixed = np.zeros(n, bool)
    fixed[0] = True
    out, _ = optimize_inertial_window(init, preints, obs, Tcb, fixed, n_iters=12)

    def err_p(states):
        return max(np.linalg.norm(s.p - g.p) for s, g in zip(states, gt))

    def err_v(states):
        return max(np.linalg.norm(s.v - g.v) for s, g in zip(states, gt))

    assert err_p(out) < 0.2 * err_p(init), (err_p(init), err_p(out))
    assert err_v(out) < 0.3 * err_v(init), (err_v(init), err_v(out))
    # biases pulled toward zero (truth) from the perturbation
    bmax = max(np.linalg.norm(s.bg) for s in out[1:])
    assert bmax < 0.004, bmax
