"""Lie groups, camera models, triangulation, pose optimization."""

import numpy as np
import pytest

from orbslam3_tpu.utils.lie import SE3, Sim3, so3_exp, so3_log
from orbslam3_tpu.cameras.models import Pinhole, KannalaBrandt8
from orbslam3_tpu.optim.triangulate import triangulate_linear
from orbslam3_tpu.optim.pose_optimization import (
    PoseObservations,
    pose_optimization,
)

RNG = np.random.default_rng(42)


def random_se3(scale_t=1.0):
    w = RNG.normal(0, 0.5, 3)
    t = RNG.normal(0, scale_t, 3)
    return SE3(so3_exp(w), t)


def test_so3_exp_log_roundtrip():
    for _ in range(20):
        w = RNG.normal(0, 1.0, 3)
        np.testing.assert_allclose(so3_log(so3_exp(w)), w, atol=1e-9)
    # small angles
    np.testing.assert_allclose(so3_log(so3_exp(np.array([1e-9, 0, 0]))), [1e-9, 0, 0], atol=1e-12)


def test_se3_exp_log_and_group_ops():
    for _ in range(10):
        xi = RNG.normal(0, 0.8, 6)
        T = SE3.exp(xi)
        np.testing.assert_allclose(T.log(), xi, atol=1e-9)
        Tinv = T.inverse()
        np.testing.assert_allclose((T * Tinv).matrix(), np.eye(4), atol=1e-12)
    a, b = random_se3(), random_se3()
    p = RNG.normal(0, 2, (7, 3))
    np.testing.assert_allclose((a * b).apply(p), a.apply(b.apply(p)), atol=1e-12)


def test_sim3_ops():
    s = Sim3(2.0, so3_exp(RNG.normal(0, 0.4, 3)), RNG.normal(0, 1, 3))
    p = RNG.normal(0, 1, (5, 3))
    np.testing.assert_allclose(s.inverse().apply(s.apply(p)), p, atol=1e-10)


def test_pinhole_project_unproject():
    cam = Pinhole([450.0, 455.0, 370.0, 240.0])
    p3d = np.abs(RNG.normal(0, 1, (50, 3))) + [0, 0, 2.0]
    uv = cam.project(p3d)
    rays = cam.unproject(uv)
    np.testing.assert_allclose(rays * p3d[:, 2:3], p3d, atol=1e-9)
    # jacobian vs numeric
    j = cam.project_jac(p3d)
    eps = 1e-6
    for k in range(3):
        d = np.zeros(3)
        d[k] = eps
        num = (cam.project(p3d + d) - cam.project(p3d - d)) / (2 * eps)
        np.testing.assert_allclose(j[:, :, k], num, atol=1e-4)


def test_pinhole_undistort_roundtrip():
    cam = Pinhole([450.0, 455.0, 370.0, 240.0], dist=[-0.28, 0.07, 1e-4, -2e-5])
    xy = RNG.uniform(-0.4, 0.4, (40, 2))
    distorted = cam.distort_normalized(xy)
    px = np.stack([cam.fx * distorted[:, 0] + cam.cx, cam.fy * distorted[:, 1] + cam.cy], 1)
    und = cam.undistort_points(px)
    want = np.stack([cam.fx * xy[:, 0] + cam.cx, cam.fy * xy[:, 1] + cam.cy], 1)
    np.testing.assert_allclose(und, want, atol=1e-3)


def test_kb8_project_unproject():
    # TUM-VI-like fisheye calibration
    cam = KannalaBrandt8([190.97, 190.97, 254.93, 256.89, 0.0034, 0.00077, -0.0034, 0.00055])
    p3d = RNG.normal(0, 1, (100, 3))
    p3d[:, 2] = np.abs(p3d[:, 2]) + 0.5
    uv = cam.project(p3d)
    rays = cam.unproject(uv)
    np.testing.assert_allclose(rays * p3d[:, 2:3], p3d, atol=1e-5)
    j = cam.project_jac(p3d)
    eps = 1e-6
    for k in range(3):
        d = np.zeros(3)
        d[k] = eps
        num = (cam.project(p3d + d) - cam.project(p3d - d)) / (2 * eps)
        np.testing.assert_allclose(j[:, :, k], num, atol=1e-3)


def test_triangulation_exact():
    T1 = SE3()
    T2 = random_se3(0.3)
    pw = RNG.normal(0, 1, (30, 3)) + [0, 0, 5.0]
    b1 = T1.apply(pw)
    b2 = T2.apply(pw)
    got = triangulate_linear(b1, b2, T1, T2)
    np.testing.assert_allclose(got, pw, atol=1e-8)


def _make_pose_problem(n=200, stereo_frac=0.6, noise=0.5, outlier_frac=0.1):
    cam = Pinhole([450.0, 455.0, 370.0, 240.0])
    mbf = 45.0
    T_true = random_se3(0.5)
    pw = RNG.normal(0, 3, (n, 3)) + [0, 0, 8.0]
    pc = T_true.apply(pw)
    keep = pc[:, 2] > 0.5
    pw, pc = pw[keep], pc[keep]
    n = len(pw)
    uv = cam.project(pc) + RNG.normal(0, noise, (n, 2))
    ur = uv[:, 0] - mbf / pc[:, 2] + RNG.normal(0, noise, n)
    is_stereo = RNG.uniform(size=n) < stereo_frac
    ur = np.where(is_stereo, ur, -1.0)
    n_out = int(outlier_frac * n)
    out_idx = RNG.choice(n, n_out, replace=False)
    uv[out_idx] += RNG.uniform(20, 80, (n_out, 2)) * RNG.choice([-1, 1], (n_out, 2))
    obs = PoseObservations(
        p3d_w=pw, obs_uv=uv, obs_ur=ur,
        inv_sigma2=np.ones(n), camera=cam, mbf=mbf,
    )
    return T_true, obs, out_idx


def test_pose_optimization_recovers_pose_with_outliers():
    T_true, obs, out_idx = _make_pose_problem()
    T0 = SE3.exp(RNG.normal(0, 0.05, 6)) * T_true  # perturbed init
    T, inlier, n_in = pose_optimization(T0, obs)
    err = (T * T_true.inverse()).log()
    assert np.linalg.norm(err[:3]) < 0.05, err
    assert np.linalg.norm(err[3:]) < 0.01, err
    # most injected outliers classified out
    assert (~inlier[out_idx]).mean() > 0.8
    assert n_in > 0.7 * len(obs.p3d_w)


def test_pose_optimization_no_noise_exact():
    T_true, obs, _ = _make_pose_problem(noise=0.0, outlier_frac=0.0)
    T0 = SE3.exp(RNG.normal(0, 0.03, 6)) * T_true
    T, inlier, n_in = pose_optimization(T0, obs)
    err = (T * T_true.inverse()).log()
    assert np.linalg.norm(err) < 1e-6
    assert n_in == len(obs.p3d_w)


def test_se3_long_chain_stays_orthonormal():
    """Regression: re-anchoring chains (pose' = (pose*ref^-1)*ref) must not
    corrupt R — SE3.inverse uses the transpose, so non-orthonormal error
    AMPLIFIES exponentially through inverse/multiply cycles unless persistent
    poses are re-normalized (found as cm-level GN bias after ~20 frames)."""
    rng = np.random.default_rng(3)
    pose = random_se3()
    ref = random_se3()
    for _ in range(200):
        tcr = pose * ref.inverse()
        pose = (tcr * ref).normalized()
        pose = SE3.exp(rng.normal(0, 1e-3, 6)) * pose
    err = np.abs(pose.R.T @ pose.R - np.eye(3)).max()
    assert err < 1e-12, err


def test_native_pose_optimization_matches_numpy():
    """The C++ pose_optimize port agrees with the NumPy spec (same LM
    schedule/annealing) to numerical tolerance, on mono + stereo mixes
    with outliers, and is much faster."""
    import time

    import numpy as np

    from orbslam3_tpu import native
    from orbslam3_tpu.cameras.models import Pinhole
    from orbslam3_tpu.optim import pose_optimization as po
    from orbslam3_tpu.utils.lie import SE3, so3_exp

    assert native.available()
    rng = np.random.default_rng(3)
    cam = Pinhole([400.0, 400.0, 320.0, 240.0])
    T_true = SE3(so3_exp([0.05, -0.1, 0.02]), np.array([0.2, -0.1, 0.3]))
    n = 600
    pw = rng.uniform(-1, 1, (n, 3)) * [3, 2, 1.5] + [0, 0, 6]
    pc = T_true.apply(pw)
    uv = cam.project(pc) + rng.normal(0, 0.4, (n, 2))
    mbf = 40.0
    ur = np.where(rng.random(n) < 0.6, uv[:, 0] - mbf / pc[:, 2]
                  + rng.normal(0, 0.3, n), -1.0)
    bad = rng.choice(n, 60, replace=False)
    uv[bad] += rng.uniform(10, 30, (60, 2))
    obs = po.PoseObservations(pw, uv, ur, np.ones(n), cam, mbf)
    T0 = SE3(so3_exp([0.02, -0.06, 0.0]), np.array([0.1, 0.0, 0.2]))

    t0 = time.perf_counter()
    T_nat, in_nat, n_nat = po.pose_optimization(T0, obs)
    t_nat = time.perf_counter() - t0

    # force the NumPy path
    lib_save, avail_save = native._lib, native.available
    try:
        native._lib = None
        native.available = lambda: False
        t0 = time.perf_counter()
        T_py, in_py, n_py = po.pose_optimization(T0, obs)
        t_py = time.perf_counter() - t0
    finally:
        native._lib, native.available = lib_save, avail_save

    # both recover the true pose and reject the injected outliers
    for T in (T_nat, T_py):
        err = (T * T_true.inverse()).log()
        assert np.linalg.norm(err[:3]) < 5e-3
        assert np.linalg.norm(err[3:]) < 2e-3
    assert abs(n_nat - n_py) <= 0.02 * n, (n_nat, n_py)
    assert (in_nat == in_py).mean() > 0.98
    assert (~in_nat[bad]).mean() > 0.9
    assert t_nat < t_py / 5, (t_nat, t_py)
