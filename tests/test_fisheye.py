"""KannalaBrandt8 fisheye stereo: triangulated matching vs ground truth."""

import numpy as np
import pytest

from orbslam3_tpu.cameras.models import KannalaBrandt8
from orbslam3_tpu.frontend.fisheye import (
    compute_stereo_fisheye_matches,
    extract_fisheye_pair,
)
from orbslam3_tpu.oracle.orb_cpu import PyramidParams
from orbslam3_tpu.utils.lie import SE3
from orbslam3_tpu.utils.synth import PlaneWorld, make_texture

H, W = 384, 512
BASELINE = 0.1


@pytest.fixture(scope="module")
def fisheye_scene():
    cam = KannalaBrandt8([220.0, 220.0, W / 2, H / 2, 0.0035, 0.0008, -0.0034, 0.0006])
    world = PlaneWorld(
        make_texture(2048, 3),
        p0=[-4.0, -3.0, 2.5],
        ex=[1.0, 0.0, -0.15],
        ey=[0.0, 1.0, 0.08],
        scale=0.004,
    )
    T_wl = SE3()  # left camera at origin
    T_wr = SE3(np.eye(3), np.array([BASELINE, 0.0, 0.0]))
    img_l = world.render(cam, T_wl.inverse(), H, W)
    img_r = world.render(cam, T_wr.inverse(), H, W)
    return cam, world, img_l, img_r


@pytest.mark.slow
def test_fisheye_stereo_depth_vs_gt(fisheye_scene):
    cam, world, img_l, img_r = fisheye_scene
    params = PyramidParams(n_features=700)
    lap = (0.0, float(W))  # full overlap
    feat_l, feat_r = extract_fisheye_pair(img_l, img_r, params, lap, lap)
    assert feat_l["mono_index"] == 0  # everything is in the lapping area

    T_lr = SE3(np.eye(3), np.array([BASELINE, 0.0, 0.0]))  # right -> left coords
    depth, l2r, r2l, p3d_l = compute_stereo_fisheye_matches(
        feat_l, feat_r, cam, cam, T_lr,
        PyramidParams().level_sigma2,
    )
    assert (l2r >= 0).sum() > 80, (l2r >= 0).sum()
    # match index books are mutually consistent and the stereo point's z is
    # the recorded depth
    for i in np.nonzero(l2r >= 0)[0][:50]:
        assert r2l[l2r[i]] == i
        assert abs(p3d_l[i][2] - depth[i]) < 1e-9

    # ground-truth depth: intersect left-cam rays with the plane
    m = depth > 0
    kp = feat_l["kps"][m]
    rays = cam.unproject(kp)
    denom = rays @ world.n
    t_pl = (world.p0 @ world.n) / denom
    z_gt = rays[:, 2] * t_pl
    err = depth[m] - z_gt
    # expected depth noise: z^2 sigma_d / (fx b) ~ 0.18 m at 1 px corner noise
    assert np.median(np.abs(err)) < 0.2, np.median(np.abs(err))
    assert np.mean(np.abs(err) < 0.5) > 0.9


def test_kb8_triangulate_exact_correspondences():
    cam = KannalaBrandt8([220.0, 220.0, 256.0, 192.0, 0.0035, 0.0008, -0.0034, 0.0006])
    rng = np.random.default_rng(0)
    p_l = rng.normal(0, 0.8, (50, 3)) + [0, 0, 2.5]
    T_lr = SE3(np.eye(3), np.array([BASELINE, 0.0, 0.0]))
    p_r = T_lr.inverse().apply(p_l)
    kp_l = cam.project(p_l)
    kp_r = cam.project(p_r)
    s2 = np.ones(50)
    p3d, z = cam.triangulate_matches(cam, kp_l, kp_r, s2, s2, T_lr)
    ok = z > 0
    assert ok.sum() > 40
    np.testing.assert_allclose(z[ok], p_l[ok, 2], atol=1e-6)
    np.testing.assert_allclose(p3d[ok], p_l[ok], atol=1e-6)


@pytest.mark.slow
def test_fisheye_lapping_split(fisheye_scene):
    cam, world, img_l, img_r = fisheye_scene
    params = PyramidParams(n_features=500)
    lap = (200.0, 400.0)
    feat_l, feat_r = extract_fisheye_pair(img_l, img_r, params, lap, lap)
    mi = feat_l["mono_index"]
    assert 0 < mi < len(feat_l["kps"])
    in_lap = (feat_l["kps"][:, 0] >= 200) & (feat_l["kps"][:, 0] <= 400)
    assert not in_lap[:mi].any()
    assert in_lap[mi:].all()
