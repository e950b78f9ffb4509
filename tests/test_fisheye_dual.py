"""Fisheye dual-camera observation model: Nleft/Nright frame layout,
right-camera observations as first-class constraints, and the body-frame
(Trl) reprojection residual in pose optimization and BA (the reference's
EdgeSE3ProjectXYZ(OnlyPose)ToBody, include/OptimizableTypes.h:59,117;
Frame machinery include/Frame.h:329-334)."""

import numpy as np

from orbslam3_tpu.cameras.models import KannalaBrandt8
from orbslam3_tpu.optim.bundle_adjustment import BAProblem, bundle_adjust
from orbslam3_tpu.optim.pose_optimization import (
    PoseObservations,
    pose_optimization,
)
from orbslam3_tpu.slam.frame import Frame
from orbslam3_tpu.slam.keyframe import KeyFrame
from orbslam3_tpu.utils.lie import SE3, so3_exp

BASELINE = 0.1
KB8 = [220.0, 220.0, 256.0, 192.0, 0.0035, 0.0008, -0.0034, 0.0006]


def _cam():
    return KannalaBrandt8(KB8)


def _tlr():
    # pose of the right camera in the left frame (right cam at +x baseline)
    return SE3(np.eye(3), np.array([BASELINE, 0.0, 0.0]))


def _make_fisheye_frame(n_left=8, n_right=6, n_matched=4, seed=0):
    """Synthetic dual-camera frame: world points at z~2.5, first n_matched
    left keypoints stereo-matched to the first n_matched right keypoints."""
    rng = np.random.default_rng(seed)
    cam = _cam()
    tlr = _tlr()
    p_l = rng.normal(0, 0.6, (n_left, 3)) + [0, 0, 2.5]  # left-cam frame
    kps_l = cam.project(p_l)
    # right keypoints: matched ones are projections of the shared points
    p_r_all = rng.normal(0, 0.6, (n_right, 3)) + [0, 0, 2.5]
    p_r_all[:n_matched] = tlr.inverse().apply(p_l[:n_matched])
    kps_r = cam.project(p_r_all)
    l2r = np.full(n_left, -1, np.int64)
    r2l = np.full(n_right, -1, np.int64)
    l2r[:n_matched] = np.arange(n_matched)
    r2l[:n_matched] = np.arange(n_matched)
    depth = np.full(n_left + n_right, -1.0)
    depth[:n_matched] = p_l[:n_matched, 2]
    p3d = np.zeros((n_left, 3))
    p3d[:n_matched] = p_l[:n_matched]
    n = n_left + n_right
    f = Frame(
        kps=np.concatenate([kps_l, kps_r]),
        octave=np.zeros(n, np.int32),
        angle=np.zeros(n, np.float32),
        response=np.ones(n, np.float32),
        desc=rng.integers(0, 256, (n, 32)).astype(np.uint8),
        camera=cam,
        scale_factors=1.2 ** np.arange(8),
        u_right=np.full(n, -1.0),
        depth=depth,
        mbf=cam.fx * BASELINE,
        n_left=n_left,
        camera2=cam,
        Tlr=tlr,
        left_to_right=l2r,
        right_to_left=r2l,
        stereo_p3d=p3d,
    )
    f.set_image_bounds(0, 0, 512, 384)
    f.set_pose(SE3())
    return f, p_l


def test_frame_dual_layout_and_grids():
    f, p_l = _make_fisheye_frame()
    assert f.is_fisheye and f.n_left == 8 and f.n_right == 6 and f.n == 14
    # right grid returns GLOBAL indices >= n_left at right-image coords
    for j in range(f.n_right):
        gi = f.n_left + j
        x, y = f.kps_un[gi]
        idx = f.features_in_area(x, y, 3.0, right=True)
        assert gi in idx
        assert (idx >= f.n_left).all()
    # left grid never returns right indices
    for i in range(f.n_left):
        x, y = f.kps_un[i]
        idx = f.features_in_area(x, y, 3.0)
        assert (idx < f.n_left).all()


def test_unproject_uses_triangulated_point():
    f, p_l = _make_fisheye_frame()
    f.set_pose(SE3(so3_exp(np.array([0.01, -0.02, 0.005])), np.array([0.1, 0.2, -0.1])))
    for i in range(4):
        pw = f.unproject_stereo(i)
        np.testing.assert_allclose(pw, f.Twc * p_l[i], atol=1e-12)
    np.testing.assert_allclose(
        f.unproject_stereo_batch(np.arange(4)),
        np.stack([f.Twc * p_l[i] for i in range(4)]),
        atol=1e-12,
    )


def test_right_view_adapter_writes_parent_slots():
    f, _ = _make_fisheye_frame()
    v = f.right_view()
    assert v.n == f.n_right
    assert v.camera is f.camera2
    np.testing.assert_allclose(v.Tcw.t, (f.Trl * f.Tcw).t, atol=1e-12)
    # local grid query
    x, y = v.kps_un[2]
    assert 2 in v.features_in_area(x, y, 3.0)
    # writes through the view land in the parent's global slot
    sentinel = object()
    v.map_points[2] = sentinel
    assert f.map_points[f.n_left + 2] is sentinel


def test_keyframe_dual_observation_counts():
    f, _ = _make_fisheye_frame()
    kf = KeyFrame(f, None)
    assert kf.n_left == f.n_left and kf.n_right == f.n_right
    from orbslam3_tpu.slam.map_point import MapPoint

    mp = MapPoint(np.array([0.0, 0.0, 2.5]), kf, None)
    mp.add_observation(kf, 0)
    assert mp.n_obs == 1
    mp.add_observation(kf, kf.n_left + 0)  # the matched right keypoint
    assert mp.n_obs == 2  # fisheye: +1 per camera index
    assert mp.observations[kf] == (0, kf.n_left + 0)
    kf.map_points[0] = mp
    kf.map_points[kf.n_left + 0] = mp
    kf.erase_map_point_match(mp)
    assert kf.map_points[0] is None and kf.map_points[kf.n_left + 0] is None
    mp.erase_observation(kf)
    assert mp.n_obs == 0


def _dual_pose_obs(n=60, seed=1, right_only=False):
    rng = np.random.default_rng(seed)
    cam = _cam()
    tlr = _tlr()
    trl = tlr.inverse()
    T_gt = SE3(so3_exp(np.array([0.02, -0.03, 0.01])), np.array([0.2, -0.1, 0.05]))
    pw = rng.normal(0, 0.8, (n, 3)) + [0, 0, 3.0]
    pc = T_gt.apply(pw)
    uv_l = cam.project(pc)
    uv_r = cam.project(trl.apply(pc))
    if right_only:
        p3d = pw
        uv = uv_r
        is_right = np.ones(n, bool)
    else:
        p3d = np.concatenate([pw, pw])
        uv = np.concatenate([uv_l, uv_r])
        is_right = np.r_[np.zeros(n, bool), np.ones(n, bool)]
    m = len(p3d)
    return T_gt, PoseObservations(
        p3d_w=p3d,
        obs_uv=uv,
        obs_ur=np.full(m, -1.0),
        inv_sigma2=np.ones(m),
        camera=cam,
        mbf=0.0,
        is_right=is_right,
        camera2=cam,
        Trl=trl,
    )


def test_pose_optimization_with_body_edges():
    """Dual left+right observations recover a perturbed pose; every right
    edge is an inlier at the optimum (the ToBody residual is consistent)."""
    T_gt, obs = _dual_pose_obs()
    T0 = SE3.exp(np.array([0.01, -0.02, 0.015, 0.03, 0.02, -0.04])) * T_gt
    T, inlier, n_in = pose_optimization(T0, obs)
    assert n_in == len(obs.p3d_w)  # all edges (left AND right) inliers
    np.testing.assert_allclose(T.R, T_gt.R, atol=1e-6)
    np.testing.assert_allclose(T.t, T_gt.t, atol=1e-6)


def test_pose_optimization_right_edges_alone_constrain():
    """Right-camera edges alone pin the pose — proof the body-frame residual
    really feeds the normal equations (not silently dropped)."""
    T_gt, obs = _dual_pose_obs(right_only=True)
    T0 = SE3.exp(np.array([0.008, -0.01, 0.012, 0.02, -0.015, 0.025])) * T_gt
    T, inlier, n_in = pose_optimization(T0, obs)
    assert n_in == len(obs.p3d_w)
    np.testing.assert_allclose(T.t, T_gt.t, atol=1e-5)


def test_bundle_adjust_with_body_edges():
    """Two-pose BA with dual observations: perturbed free pose + points
    converge back; right-edge chi2 ~ 0 at the optimum."""
    rng = np.random.default_rng(3)
    cam = _cam()
    trl = _tlr().inverse()
    pw = rng.normal(0, 0.7, (40, 3)) + [0, 0, 3.0]
    poses_gt = [SE3(), SE3(so3_exp(np.array([0.0, -0.05, 0.0])), np.array([0.3, 0.0, 0.0]))]
    cam_idx, pt_idx, uv, is_right = [], [], [], []
    for ci, T in enumerate(poses_gt):
        pc = T.apply(pw)
        uvl = cam.project(pc)
        uvr = cam.project(trl.apply(pc))
        for j in range(len(pw)):
            cam_idx += [ci, ci]
            pt_idx += [j, j]
            uv += [uvl[j], uvr[j]]
            is_right += [False, True]
    o = len(cam_idx)
    pr = BAProblem(
        poses=[poses_gt[0], SE3.exp(np.array([0.004, -0.006, 0.005, 0.02, 0.015, -0.02])) * poses_gt[1]],
        points=pw + rng.normal(0, 0.01, pw.shape),
        cam_idx=np.asarray(cam_idx),
        pt_idx=np.asarray(pt_idx),
        obs_uv=np.asarray(uv),
        obs_ur=np.full(o, -1.0),
        inv_sigma2=np.ones(o),
        fixed_cams=np.array([True, False]),
        camera=cam,
        mbf=0.0,
        is_right=np.asarray(is_right),
        camera2=cam,
        Trl=trl,
    )
    poses, points, chi2 = bundle_adjust(pr, n_iters=15)
    assert chi2.max() < 1e-6, chi2.max()
    np.testing.assert_allclose(poses[1].t, poses_gt[1].t, atol=1e-5)
    np.testing.assert_allclose(points, pw, atol=1e-5)
