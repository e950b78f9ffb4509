"""End-to-end RGB-D SLAM on a synthetic sequence with exact ground truth.

Covers System::TrackRGBD (/root/reference/include/System.h:115) +
Frame::ComputeStereoFromRGBD: per-keypoint depth from a depth image feeding
the same stereo-depth map-point machinery as the stereo configuration.
"""

import numpy as np
import pytest

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.oracle.orb_cpu import PyramidParams
from orbslam3_tpu.slam.system import System
from orbslam3_tpu.slam.tracking import TrackingState
from orbslam3_tpu.utils.synth import ate_rmse, rgbd_sequence

pytestmark = pytest.mark.slow  # full-sequence e2e: nightly tier


FX = 350.0
H, W = 384, 512
VIRTUAL_BF = FX * 0.08  # synthetic baseline*f for u_right encoding


@pytest.fixture(scope="module")
def rgbd_run():
    camera = Pinhole([FX, FX, W / 2, H / 2])
    frames = rgbd_sequence(25, camera, H, W, seed=2, depth_noise=0.002)
    sysm = System(
        camera,
        VIRTUAL_BF,
        PyramidParams(n_features=900),
        sensor=System.RGBD,
        sequential=True,
        max_frames=8,
    )
    est, gt, states = [], [], []
    for k, (img, depth, tcw_gt) in enumerate(frames):
        pose = sysm.track_rgbd(img, depth, timestamp=k / 20.0)
        states.append(sysm.get_tracking_state())
        if pose is not None:
            est.append(pose)
            gt.append(tcw_gt)
    return sysm, est, gt, states


def test_rgbd_tracks_every_frame(rgbd_run):
    sysm, est, gt, states = rgbd_run
    assert len(est) == 25
    assert all(s == TrackingState.OK for s in states)


def test_rgbd_ate_sub_centimeter(rgbd_run):
    sysm, est, gt, states = rgbd_run
    rmse = ate_rmse(est, gt)
    assert rmse < 0.01, f"ATE RMSE {rmse*100:.2f} cm"


def test_rgbd_map_grows(rgbd_run):
    sysm, est, gt, states = rgbd_run
    stats = sysm.map_stats()
    assert stats["n_keyframes"] >= 3
    assert stats["n_map_points"] > 300


def test_depth_map_factor_scaling():
    """uint16 TUM-style depth (5000 units/m) matches float meters."""
    camera = Pinhole([FX, FX, W / 2, H / 2])
    frames = rgbd_sequence(1, camera, H, W, seed=2)
    img, depth_m, _ = frames[0]
    depth_u16 = np.clip(depth_m * 5000.0, 0, 65535).astype(np.uint16)

    s1 = System(camera, VIRTUAL_BF, PyramidParams(n_features=500),
                sensor=System.RGBD, sequential=True)
    s2 = System(camera, VIRTUAL_BF, PyramidParams(n_features=500),
                sensor=System.RGBD, sequential=True)
    s2.depth_map_factor = 5000.0
    s1.track_rgbd(img, depth_m, 0.0)
    s2.track_rgbd(img, depth_u16, 0.0)
    f1, f2 = s1.tracker.current, s2.tracker.current
    assert f1.n == f2.n
    good = (f1.depth > 0) & (f2.depth > 0)
    assert good.sum() > 200
    np.testing.assert_allclose(f1.depth[good], f2.depth[good], atol=2e-4)


def test_rgbd_inertial_auto_init():
    """IMU_RGBD configuration: depth-image frames + IMU samples through the
    same auto-VI-initialization path as stereo-inertial
    (System.h:87-94 IMU_RGBD; GrabImageRGBD + PreintegrateIMU)."""
    from orbslam3_tpu.imu.preintegration import Calib
    from orbslam3_tpu.utils.lie import SE3
    from orbslam3_tpu.utils.synth import imu_samples_between

    FPS = 20.0
    camera = Pinhole([FX, FX, W / 2, H / 2])
    frames = rgbd_sequence(40, camera, H, W, seed=1)
    calib = Calib(Tbc=SE3(), noise_gyro=1e-4, noise_acc=1e-3,
                  walk_gyro=1e-6, walk_acc=1e-5)
    sysm = System(camera, VIRTUAL_BF, PyramidParams(n_features=900),
                  sensor=System.IMU_RGBD, sequential=True, max_frames=5,
                  imu_calib=calib)
    est, gt = [], []
    for k, (img, depth, tg) in enumerate(frames):
        imu = imu_samples_between(k - 1, k, FPS) if k > 0 else None
        pose = sysm.track_rgbd(img, depth, k / FPS, imu=imu)
        assert pose is not None, f"lost at frame {k}"
        est.append(pose)
        gt.append(tg)
    m = sysm.atlas.get_current_map()
    assert m.imu_initialized, "IMU never initialized on the RGB-D map"
    from orbslam3_tpu.utils.synth import ate_rmse

    ate = ate_rmse(est, gt)
    assert ate < 0.01, f"ATE {ate}"
    assert sysm.tracker.current.velocity is not None
