"""Schur-complement BA: synthetic multi-view convergence."""

import numpy as np

from orbslam3_tpu.utils.lie import SE3, so3_exp
from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.optim.bundle_adjustment import BAProblem, bundle_adjust

RNG = np.random.default_rng(7)


def _synthetic_ba(n_cams=6, n_pts=120, noise=0.3, stereo_frac=0.5):
    cam = Pinhole([450.0, 455.0, 370.0, 240.0])
    mbf = 45.0
    poses_true = []
    for i in range(n_cams):
        w = RNG.normal(0, 0.05, 3)
        t = np.array([0.4 * i, 0.02 * i, 0.01 * i]) + RNG.normal(0, 0.02, 3)
        poses_true.append(SE3(so3_exp(w), t))
    pts_true = RNG.normal(0, 2.5, (n_pts, 3)) + [1.0, 0, 10.0]

    cam_idx, pt_idx, uv, ur, inv_s2 = [], [], [], [], []
    for ci, T in enumerate(poses_true):
        pc = T.apply(pts_true)
        proj = cam.project(pc)
        vis = (pc[:, 2] > 1) & (proj[:, 0] > 0) & (proj[:, 0] < 750) & (proj[:, 1] > 0) & (proj[:, 1] < 480)
        for pi in np.nonzero(vis)[0]:
            cam_idx.append(ci)
            pt_idx.append(pi)
            uv.append(proj[pi] + RNG.normal(0, noise, 2))
            if RNG.uniform() < stereo_frac:
                ur.append(proj[pi, 0] - mbf / pc[pi, 2] + RNG.normal(0, noise))
            else:
                ur.append(-1.0)
            inv_s2.append(1.0)
    fixed = np.zeros(n_cams, bool)
    fixed[0] = True
    # perturb
    poses0 = [poses_true[0].copy()] + [
        SE3.exp(RNG.normal(0, 0.02, 6)) * p for p in poses_true[1:]
    ]
    pts0 = pts_true + RNG.normal(0, 0.05, pts_true.shape)
    pr = BAProblem(
        poses=poses0,
        points=pts0,
        cam_idx=np.array(cam_idx),
        pt_idx=np.array(pt_idx),
        obs_uv=np.array(uv),
        obs_ur=np.array(ur),
        inv_sigma2=np.array(inv_s2),
        fixed_cams=fixed,
        camera=cam,
        mbf=mbf,
    )
    return pr, poses_true, pts_true


def test_ba_converges_with_noise():
    pr, poses_true, pts_true = _synthetic_ba()
    poses, pts, chi2 = bundle_adjust(pr, n_iters=15)
    # fixed pose untouched
    np.testing.assert_allclose(poses[0].matrix(), poses_true[0].matrix(), atol=1e-12)
    for p, pt in zip(poses[1:], poses_true[1:]):
        err = (p * pt.inverse()).log()
        assert np.linalg.norm(err[:3]) < 0.02, err
        assert np.linalg.norm(err[3:]) < 0.005, err
    assert np.median(np.abs(pts - pts_true)) < 0.05
    assert np.median(chi2) < 3.0


def test_ba_exact_no_noise():
    pr, poses_true, pts_true = _synthetic_ba(noise=0.0)
    poses, pts, chi2 = bundle_adjust(pr, n_iters=20, use_huber=False)
    for p, pt in zip(poses[1:], poses_true[1:]):
        assert np.linalg.norm((p * pt.inverse()).log()) < 1e-5
    assert chi2.max() < 1e-6


def test_ba_native_matches_numpy_spec():
    """ba_schur (C++) vs the NumPy bundle_adjust on the same problem.

    The native port mirrors the spec's LM schedule exactly, so results agree
    to solver-noise level, not just to convergence tolerance."""
    from orbslam3_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")
    pr, _, _ = _synthetic_ba()

    pr_np = BAProblem(**{**pr.__dict__})
    pr_np.camera = Pinhole(
        [pr.camera.fx, pr.camera.fy, pr.camera.cx, pr.camera.cy]
    )
    pr_np.camera.no_native = True  # explicit opt-out -> NumPy spec path
    poses_n, pts_n, chi2_n = bundle_adjust(pr, n_iters=15)
    poses_p, pts_p, chi2_p = bundle_adjust(pr_np, n_iters=15)
    for a, b in zip(poses_n, poses_p):
        assert np.linalg.norm(a.t - b.t) < 1e-7
        assert np.abs(a.R - b.R).max() < 1e-7
    assert np.abs(pts_n - pts_p).max() < 1e-6
    assert np.abs(chi2_n - chi2_p).max() < 1e-6
