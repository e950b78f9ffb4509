"""Sim3 solver, essential-graph optimization, loop-closing e2e smoke."""

import numpy as np
import pytest

from orbslam3_tpu.optim.sim3_solver import horn_sim3, sim3_ransac
from orbslam3_tpu.optim.essential_graph import optimize_essential_graph
from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.utils.lie import SE3, Sim3, so3_exp

RNG = np.random.default_rng(5)


def test_horn_sim3_exact():
    s_true = Sim3(1.7, so3_exp(RNG.normal(0, 0.4, 3)), RNG.normal(0, 1, 3))
    p2 = RNG.normal(0, 2, (40, 3))
    p1 = s_true.apply(p2)
    s = horn_sim3(p1, p2)
    np.testing.assert_allclose(s.s, s_true.s, rtol=1e-9)
    np.testing.assert_allclose(s.R, s_true.R, atol=1e-9)
    np.testing.assert_allclose(s.t, s_true.t, atol=1e-9)
    s_fix = horn_sim3(s_true.apply(p2) / s_true.s, p2, fix_scale=True)
    assert s_fix.s == 1.0


def test_sim3_ransac_with_outliers():
    cam = Pinhole([400.0, 400.0, 320.0, 240.0])
    s_true = Sim3(1.0, so3_exp(RNG.normal(0, 0.2, 3)), RNG.normal(0, 0.3, 3))
    p2 = RNG.normal(0, 1.5, (80, 3)) + [0, 0, 6.0]
    p1 = s_true.apply(p2)
    out = RNG.choice(80, 16, replace=False)
    p1[out] += RNG.uniform(0.5, 2.0, (16, 3))
    s, inl = sim3_ransac(
        p1, p2, cam, cam, np.ones(80), np.ones(80), fix_scale=True, seed=2
    )
    assert s is not None
    np.testing.assert_allclose(s.R, s_true.R, atol=1e-3)
    np.testing.assert_allclose(s.t, s_true.t, atol=1e-2)
    assert (~inl[out]).mean() > 0.85


class _FakeKF:
    _next = 0

    def __init__(self, Tcw):
        self.id = _FakeKF._next
        _FakeKF._next += 1
        self.Tcw = Tcw
        self.bad = False

    def set_pose(self, T):
        self.Tcw = T.normalized()


def test_essential_graph_closes_drifted_circle():
    """Classic pose-graph test: a circle of keyframes with odometry drift;
    one loop edge snaps it closed."""
    n = 24
    radius = 3.0
    gt_poses = []
    for i in range(n):
        a = 2 * np.pi * i / n
        Twc = SE3(so3_exp([0, a, 0]), [radius * np.sin(a), 0, radius * (1 - np.cos(a))])
        gt_poses.append(Twc.inverse())
    # odometry with bias -> drift accumulates
    est = [gt_poses[0]]
    rng = np.random.default_rng(0)
    for i in range(1, n):
        rel = gt_poses[i] * gt_poses[i - 1].inverse()
        noise = SE3.exp(np.concatenate([rng.normal(0, 0.01, 3) + [0.015, 0, 0],
                                        rng.normal(0, 0.002, 3)]))
        est.append((noise * rel) * est[-1])
    kfs = [_FakeKF(T) for T in est]
    drift_before = np.linalg.norm(est[-1].inverse().t - gt_poses[-1].inverse().t)
    assert drift_before > 0.15

    edges = []
    for i in range(1, n):
        meas = Sim3.from_se3(est[i] * est[i - 1].inverse())  # odometry (drifted)
        edges.append((kfs[i - 1], kfs[i], meas, 1.0))
    # loop edge with the TRUE relative pose between last and first
    meas_loop = Sim3.from_se3(gt_poses[-1] * gt_poses[0].inverse())
    edges.append((kfs[0], kfs[-1], meas_loop, 100.0))

    optimize_essential_graph(kfs, edges, fixed={kfs[0]}, n_iters=30)
    drift_after = np.linalg.norm(kfs[-1].Tcw.inverse().t - gt_poses[-1].inverse().t)
    assert drift_after < 0.02, (drift_before, drift_after)
    # middle keyframes also pulled toward truth
    mid = np.linalg.norm(kfs[n // 2].Tcw.inverse().t - gt_poses[n // 2].inverse().t)
    assert mid < 0.15  # residual odometry bias distributes over the middle


def test_essential_graph_scales_to_500_kfs():
    """Analytic-Jacobian sparse assembly + sparse solve: a 500-KF drifted
    ring with ~1000 edges converges in seconds (the round-1 dense numeric
    version took minutes at this size)."""
    import time

    import scipy.sparse.linalg  # noqa: F401  (pay the one-time import outside the timer)

    n = 500
    radius = 20.0
    gt_poses = []
    for i in range(n):
        a = 2 * np.pi * i / n
        Twc = SE3(so3_exp([0, a, 0]),
                  [radius * np.sin(a), 0, radius * (1 - np.cos(a))])
        gt_poses.append(Twc.inverse())
    est = [gt_poses[0]]
    rng = np.random.default_rng(7)
    for i in range(1, n):
        rel = gt_poses[i] * gt_poses[i - 1].inverse()
        noise = SE3.exp(np.concatenate([rng.normal(0, 0.002, 3) + [0.003, 0, 0],
                                        rng.normal(0, 0.0005, 3)]))
        est.append((noise * rel) * est[-1])
    kfs = [_FakeKF(T) for T in est]
    drift_before = np.linalg.norm(est[-1].inverse().t - gt_poses[-1].inverse().t)
    assert drift_before > 0.3

    edges = []
    for i in range(1, n):
        edges.append((kfs[i - 1], kfs[i],
                      Sim3.from_se3(est[i] * est[i - 1].inverse()), 1.0))
    for i in range(2, n, 2):  # covisibility-style skip links
        edges.append((kfs[i - 2], kfs[i],
                      Sim3.from_se3(est[i] * est[i - 2].inverse()), 1.0))
    edges.append((kfs[0], kfs[-1],
                  Sim3.from_se3(gt_poses[-1] * gt_poses[0].inverse()), 100.0))

    t0 = time.perf_counter()
    optimize_essential_graph(kfs, edges, fixed={kfs[0]}, n_iters=25)
    wall = time.perf_counter() - t0
    drift_after = np.linalg.norm(kfs[-1].Tcw.inverse().t - gt_poses[-1].inverse().t)
    assert drift_after < 0.05, (drift_before, drift_after)
    # round-1 dense numeric-Jacobian version: >>100 s at this size
    assert wall < 10.0, f"essential graph too slow: {wall:.1f}s"
