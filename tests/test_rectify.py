"""Stereo rectification parity vs cv2 + end-to-end on a distorted rig.

Covers the reference's Settings::precomputeRectificationMaps +
System::TrackStereo remap (/root/reference/src/System.cc:253-263)."""

import numpy as np
import pytest

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.frontend.rectify import (
    StereoRectifier,
    init_undistort_rectify_map,
    remap_bilinear,
    stereo_rectify,
)
from orbslam3_tpu.utils.lie import SE3, so3_exp

cv2 = pytest.importorskip("cv2")

# EuRoC-like unrectified stereo calibration (cam0/cam1 of MH01, rounded)
K1 = np.array([[458.654, 0, 367.215], [0, 457.296, 248.375], [0, 0, 1.0]])
D1 = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05])
K2 = np.array([[457.587, 0, 379.999], [0, 456.134, 255.238], [0, 0, 1.0]])
D2 = np.array([-0.28368365, 0.07451284, -0.00010473, -3.55590700e-05])
SIZE = (752, 480)
# cam1 -> cam2 (x2 = R x1 + t): small rotation + ~11 cm baseline
R_12 = so3_exp(np.array([0.002, -0.003, 0.001]))
T_12 = np.array([-0.1100738081, 0.0003991215, -0.0008537003])


def test_stereo_rectify_matches_cv2():
    R1, R2, P1, P2 = stereo_rectify(K1, D1, K2, D2, SIZE, R_12, T_12)
    cR1, cR2, cP1, cP2, _, _, _ = cv2.stereoRectify(
        K1, D1, K2, D2, SIZE, R_12, T_12.reshape(3, 1),
        flags=cv2.CALIB_ZERO_DISPARITY, alpha=-1,
    )
    np.testing.assert_allclose(R1, cR1, atol=1e-8)
    np.testing.assert_allclose(R2, cR2, atol=1e-8)
    # cc differs ~0.01 px: cv2 undistorts the corner points in float32 with
    # 5 fixed-point iterations, we use float64 with 10 — immaterial
    np.testing.assert_allclose(P1, cP1, rtol=1e-6, atol=0.02)
    np.testing.assert_allclose(P2, cP2, rtol=1e-6, atol=0.02)


def test_rectify_map_matches_cv2():
    R1, R2, P1, P2 = stereo_rectify(K1, D1, K2, D2, SIZE, R_12, T_12)
    mx, my = init_undistort_rectify_map(K1, D1, R1, P1, SIZE)
    cmx, cmy = cv2.initUndistortRectifyMap(K1, D1, R1, P1, SIZE, cv2.CV_32FC1)
    np.testing.assert_allclose(mx, cmx, atol=2e-3)
    np.testing.assert_allclose(my, cmy, atol=2e-3)


def test_remap_bilinear_matches_cv2(small_image):
    h, w = small_image.shape
    rng = np.random.default_rng(5)
    mapx = (
        np.tile(np.arange(w, dtype=np.float32), (h, 1))
        + rng.normal(0, 2, (h, w)).astype(np.float32)
    )
    mapy = (
        np.tile(np.arange(h, dtype=np.float32)[:, None], (1, w))
        + rng.normal(0, 2, (h, w)).astype(np.float32)
    )
    ours = remap_bilinear(small_image, mapx, mapy)
    ref = cv2.remap(small_image, mapx, mapy, cv2.INTER_LINEAR)
    # cv2 uses 5-bit fixed-point interpolation weights -> allow 1 level slack
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 4
    assert np.mean(np.abs(ours.astype(int) - ref.astype(int)) > 1) < 0.01


def test_rectifier_rows_aligned():
    """A world point projects to the SAME row in both rectified images."""
    cam1 = Pinhole([K1[0, 0], K1[1, 1], K1[0, 2], K1[1, 2]], D1)
    cam2 = Pinhole([K2[0, 0], K2[1, 1], K2[0, 2], K2[1, 2]], D2)
    # Tlr = T_c1_c2 = inverse of (R_12, T_12)
    Tlr = SE3(R_12, T_12).inverse()
    rect = StereoRectifier(cam1, cam2, Tlr, SIZE)
    assert rect.bf > 0
    rng = np.random.default_rng(11)
    pts_w = np.stack(
        [rng.uniform(-1, 1, 60), rng.uniform(-0.7, 0.7, 60), rng.uniform(2, 8, 60)],
        axis=1,
    )
    # project through the RECTIFIED cameras: u_l - u_r = bf/z, v_l == v_r.
    # P1/P2 both take points in the rectified cam1 frame (cv convention);
    # the equivalent view-2 projection is the plain rectified pinhole on the
    # cam2-frame point — assert both give the same pixel.
    p1 = pts_w @ rect.R1.T
    p2 = (pts_w @ R_12.T + T_12) @ rect.R2.T
    uv1 = rect.camera.project(p1)
    uv2 = np.stack(
        [
            rect.P2[0, 0] * p1[:, 0] / p1[:, 2] + rect.P2[0, 2] + rect.P2[0, 3] / p1[:, 2],
            rect.P2[1, 1] * p1[:, 1] / p1[:, 2] + rect.P2[1, 2],
        ],
        axis=1,
    )
    uv2_direct = rect.camera.project(p2)
    np.testing.assert_allclose(uv2, uv2_direct, atol=1e-6)
    np.testing.assert_allclose(uv1[:, 1], uv2[:, 1], atol=1e-6)
    disparity = uv1[:, 0] - uv2[:, 0]
    np.testing.assert_allclose(disparity, rect.bf / p1[:, 2], rtol=1e-6)


def test_rectifier_image_content():
    """Remapped distorted renders equal direct rectified-camera renders."""
    cam1 = Pinhole([K1[0, 0], K1[1, 1], K1[0, 2], K1[1, 2]], D1)
    cam2 = Pinhole([K2[0, 0], K2[1, 1], K2[0, 2], K2[1, 2]], D2)
    Tlr = SE3(R_12, T_12).inverse()
    rect = StereoRectifier(cam1, cam2, Tlr, SIZE)
    # smooth synthetic world texture rendered through the DISTORTED left
    # camera, then rectified; compare against rendering directly through the
    # rectified camera (smooth texture -> interpolation error is tiny)
    w, h = SIZE
    u, v = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))

    def tex(x, y):  # plane z=4 world texture
        return 128 + 60 * np.sin(1.5 * x) * np.cos(1.9 * y)

    # distorted render: pixel -> undistorted ray -> plane
    rays = cam1.unproject(cam1.undistort_points(np.stack([u, v], -1).reshape(-1, 2)))
    img_dist = tex(rays[:, 0] * 4, rays[:, 1] * 4).reshape(h, w)
    rec, _ = rect.rectify(img_dist.astype(np.float32), img_dist.astype(np.float32))
    # direct render through rectified camera
    x = (u - rect.camera.cx) / rect.camera.fx
    y = (v - rect.camera.cy) / rect.camera.fy
    rays_r = np.stack([x, y, np.ones_like(x)], -1).reshape(-1, 3) @ rect.R1
    rays_r = rays_r[:, :2] / rays_r[:, 2:3]
    img_direct = tex(rays_r[:, 0] * 4, rays_r[:, 1] * 4).reshape(h, w)
    # compare on the interior where the remap found source pixels
    inner = (rec > 0) & (np.abs(u - w / 2) < w * 0.35) & (np.abs(v - h / 2) < h * 0.35)
    err = np.abs(rec - img_direct)[inner]
    assert np.median(err) < 0.5
    assert np.percentile(err, 99) < 2.0
