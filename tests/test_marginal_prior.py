"""Marginalized VI prior: ConstraintPoseImu + Marginalize + the
frame-to-frame prior chain (PoseInertialOptimizationLastKeyFrame/LastFrame
role, /root/reference/src/Optimizer6.cc:48,432 + Marginalize
Optimizer4.cc:625)."""

import numpy as np

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.imu.preintegration import GRAVITY, Bias, Calib, Preintegrated
from orbslam3_tpu.optim.inertial import (
    ConstraintPoseImu,
    VIState,
    marginalize,
    pose_inertial_optimization_prior,
)
from orbslam3_tpu.utils.lie import SE3, so3_exp

CAM = Pinhole([400.0, 400.0, 320.0, 240.0])


def test_marginalize_matches_dense_conditioning():
    """Schur complement equals the information of the kept block after
    optimally eliminating the dropped one (Gaussian identity)."""
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, (40, 30))
    h = a.T @ a + 1e-6 * np.eye(30)
    h_marg = marginalize(h, keep=slice(15, 30), drop=slice(0, 15))
    # ground truth: covariance of the kept block is the corresponding
    # sub-block of the full inverse; information = its inverse
    cov_keep = np.linalg.inv(h)[15:, 15:]
    np.testing.assert_allclose(h_marg, np.linalg.inv(cov_keep), rtol=1e-6, atol=1e-6)


def _simulate_chain(n_frames=8, dt=0.05, accel=np.array([0.4, 0.0, 0.0]),
                    seed=0, dropout=()):
    """Constant-acceleration trajectory with exact IMU; sparse visual
    observations of a fixed point cloud, missing on dropout frames."""
    rng = np.random.default_rng(seed)
    calib = Calib(SE3())
    pts = rng.uniform(-1, 1, (120, 3)) * [3, 2, 1] + [0, 0, 6]
    states_gt, preints, visuals = [], [], []
    v0 = np.zeros(3)
    p0 = np.zeros(3)
    for k in range(n_frames):
        t = k * dt
        p = p0 + v0 * t + 0.5 * accel * t * t
        v = v0 + accel * t
        Twb = SE3(np.eye(3), p)
        states_gt.append(VIState(Twb, v.copy(), Bias()))
        if k > 0:
            pre = Preintegrated(Bias(), calib)
            n_sub = 10
            for _ in range(n_sub):
                # specific force in body frame (R = I): a - g
                pre.integrate(accel - GRAVITY, np.zeros(3), dt / n_sub)
            preints.append(pre)
        if k in dropout:
            visuals.append(None)
        else:
            pc = np.stack([Twb.inverse() * q for q in pts])
            uv = CAM.project(pc) + rng.normal(0, 0.3, (len(pts), 2))
            visuals.append((pts, uv))
    return states_gt, preints, visuals


def _run_chain(states_gt, preints, visuals, use_prior: bool):
    """Track the chain frame to frame starting from the true first state;
    each frame starts from an IMU-predicted initial guess."""
    est = [states_gt[0].copy()]
    prior = None
    errs = []
    for k in range(1, len(states_gt)):
        pre = preints[k - 1]
        prev = est[-1]
        T_pred, v_pred = pre.predict_state(prev.Twb, prev.v, prev.bias)
        cur0 = VIState(T_pred.normalized(), v_pred.copy(), prev.bias.copy())
        vis = visuals[k]
        if vis is None:
            pw = np.zeros((0, 3))
            uv = np.zeros((0, 2))
        else:
            pw, uv = vis
        out, _, next_prior = pose_inertial_optimization_prior(
            cur0, prev, pre,
            obs_pw=pw, obs_uv=uv, obs_ur=np.full(len(pw), -1.0),
            inv_sigma2=np.ones(len(pw)), camera=CAM,
            prior=prior if use_prior else None,
            prev_fixed=(k == 1) or not use_prior,
        )
        prior = next_prior
        est.append(out)
        errs.append(np.linalg.norm(out.Twb.t - states_gt[k].Twb.t))
    return est, np.asarray(errs)


def test_prior_chain_tracks_through_dropout():
    """With visual dropout mid-chain the prior-chained estimator stays
    close to ground truth and recovers."""
    gt, preints, visuals = _simulate_chain(n_frames=10, dropout=(4, 5, 6))
    est, errs = _run_chain(gt, preints, visuals, use_prior=True)
    # after the dropout window, visual frames pull the error back down
    assert errs[-1] < 0.02, errs
    assert errs.max() < 0.05, errs


def test_prior_carries_history_information():
    """The marginalized prior after visual frames is much stiffer than
    after dropout frames (uncertainty grows without vision)."""
    gt, preints, visuals = _simulate_chain(n_frames=8, dropout=(5, 6, 7))
    prior = None
    h_with_vision = h_after_dropout = None
    est = gt[0].copy()
    for k in range(1, 8):
        pre = preints[k - 1]
        vis = visuals[k]
        pw, uv = (np.zeros((0, 3)), np.zeros((0, 2))) if vis is None else vis
        out, _, prior = pose_inertial_optimization_prior(
            est, est, pre,
            obs_pw=pw, obs_uv=uv, obs_ur=np.full(len(pw), -1.0),
            inv_sigma2=np.ones(len(pw)), camera=CAM,
            prior=prior, prev_fixed=(k == 1),
        )
        est = out
        if k == 4:
            h_with_vision = prior.H.copy()
        if k == 7:
            h_after_dropout = prior.H.copy()
    # position information (pose translation block) decays without vision
    info_vis = np.trace(h_with_vision[3:6, 3:6])
    info_drop = np.trace(h_after_dropout[3:6, 3:6])
    assert info_drop < 0.5 * info_vis, (info_vis, info_drop)


def test_constraint_residual_zero_at_linearization():
    s = VIState(SE3(so3_exp([0.1, 0.2, -0.1]), np.array([1.0, 2.0, 3.0])),
                np.array([0.3, -0.2, 0.1]), Bias(np.array([0.01] * 3), np.array([0.002] * 3)))
    c = ConstraintPoseImu(s.copy(), np.eye(15))
    np.testing.assert_allclose(c.residual(s), np.zeros(15), atol=1e-12)
    s2 = VIState(s.Twb * SE3(np.eye(3), np.array([0.05, 0, 0])), s.v + [0, 0.1, 0], s.bias)
    r = c.residual(s2)
    assert np.linalg.norm(r) > 0.05
