"""Two-view reconstruction: F path (general scene) and H path (plane)."""

import numpy as np
import pytest

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.optim.two_view import TwoViewReconstruction
from orbslam3_tpu.utils.lie import SE3, so3_exp

RNG = np.random.default_rng(3)
CAM = Pinhole([420.0, 420.0, 320.0, 240.0])


def _project_pair(pw, T21, noise=0.4):
    p1 = CAM.project(pw)
    p2 = CAM.project(T21.apply(pw))
    ok = (pw[:, 2] > 0.3) & (T21.apply(pw)[:, 2] > 0.3)
    p1 += RNG.normal(0, noise, p1.shape)
    p2 += RNG.normal(0, noise, p2.shape)
    return p1[ok], p2[ok], pw[ok]


def _angle_between(a, b):
    c = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    return np.degrees(np.arccos(np.clip(abs(c), -1, 1)))


def test_reconstruct_general_scene_fundamental():
    pw = RNG.normal(0, 1.5, (200, 3)) * [1, 1, 0.8] + [0, 0, 4.0]
    T21 = SE3(so3_exp([0.02, -0.15, 0.01]), np.array([0.4, 0.02, 0.05]))
    p1, p2, pw_ok = _project_pair(pw, T21)
    tvr = TwoViewReconstruction(CAM, seed=1)
    ok, T, pts, good = tvr.reconstruct(p1, p2)
    assert ok
    # rotation exact-ish; translation up to scale
    err_r = np.linalg.norm((SE3(T.R, np.zeros(3)) * SE3(T21.R, np.zeros(3)).inverse()).log()[3:])
    assert err_r < 0.01, err_r
    assert _angle_between(T.t, T21.t) < 5.0
    assert good.sum() > 100
    # triangulated structure matches GT up to the global scale
    s = np.median(pw_ok[good][:, 2] / pts[good][:, 2])
    rel = np.abs(pts[good] * s - pw_ok[good]) / np.abs(pw_ok[good]).clip(0.5)
    assert np.median(rel) < 0.05


def test_reconstruct_planar_scene_homography():
    # points on a plane -> F is degenerate, H path must fire
    uv = RNG.uniform(-2, 2, (150, 2))
    pw = np.column_stack([uv[:, 0], uv[:, 1], 3.0 + 0.3 * uv[:, 0]])
    T21 = SE3(so3_exp([0.01, -0.1, 0.0]), np.array([0.35, 0.0, 0.02]))
    p1, p2, pw_ok = _project_pair(pw, T21)
    tvr = TwoViewReconstruction(CAM, seed=2)
    ok, T, pts, good = tvr.reconstruct(p1, p2)
    assert ok
    err_r = np.linalg.norm((SE3(T.R, np.zeros(3)) * SE3(T21.R, np.zeros(3)).inverse()).log()[3:])
    assert err_r < 0.02, err_r
    assert _angle_between(T.t, T21.t) < 5.0
    assert good.sum() > 60


def test_reconstruct_rejects_pure_rotation():
    pw = RNG.normal(0, 1.5, (150, 3)) + [0, 0, 4.0]
    T21 = SE3(so3_exp([0.0, -0.2, 0.0]), np.zeros(3))  # no baseline
    p1, p2, _ = _project_pair(pw, T21)
    tvr = TwoViewReconstruction(CAM, seed=3)
    ok, T, pts, good = tvr.reconstruct(p1, p2)
    assert not ok  # no parallax -> must refuse to initialize
