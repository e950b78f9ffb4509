"""Automatic visual-inertial initialization inside LocalMapping + inertial
tracking afterwards (InitializeIMU / UpdateFrameIMU / LocalInertialBA /
PoseInertialOptimization wired end-to-end), incl. Tbc extrinsics."""

import pytest

import numpy as np

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.imu.preintegration import Calib
from orbslam3_tpu.oracle.orb_cpu import PyramidParams
from orbslam3_tpu.slam.system import System
from orbslam3_tpu.slam.tracking import TrackingState
from orbslam3_tpu.utils.lie import SE3, so3_exp
from orbslam3_tpu.utils.synth import (
    ate_rmse,
    imu_samples_between,
    stereo_sequence,
    trajectory_pose,
)

pytestmark = pytest.mark.slow  # full-sequence e2e: nightly tier

FX = 350.0
H, W = 384, 512
FPS = 20.0


def _gt_velocity(k: float, step=0.05, fps=FPS) -> np.ndarray:
    e = 1e-3
    return (trajectory_pose(k + e, step).t - trajectory_pose(k - e, step).t) / (
        2 * e / fps
    )


def _run(n_frames: int, Tbc: SE3, seed: int = 1):
    camera = Pinhole([FX, FX, W / 2, H / 2])
    mbf = FX * 0.12
    frames = stereo_sequence(n_frames, camera, 0.12, H, W, seed=seed)
    calib = Calib(Tbc=Tbc, noise_gyro=1e-4, noise_acc=1e-3,
                  walk_gyro=1e-6, walk_acc=1e-5)
    sysm = System(camera, mbf, PyramidParams(n_features=900),
                  sequential=True, max_frames=5, imu_calib=calib)
    est, gt = [], []
    for k, (il, ir, tg) in enumerate(frames):
        imu = (
            imu_samples_between(k - 1, k, FPS, Tbc=Tbc) if k > 0 else None
        )
        pose = sysm.track_stereo(il, ir, k / FPS, imu=imu)
        assert pose is not None, f"lost at frame {k}"
        assert sysm.get_tracking_state() == TrackingState.OK
        est.append(pose)
        gt.append(tg)
    return sysm, est, gt


def test_stereo_inertial_auto_init_and_tracking():
    sysm, est, gt = _run(40, SE3())
    m = sysm.atlas.get_current_map()
    assert m.imu_initialized, "IMU never initialized"
    assert m.is_inertial
    # the synthetic world is already gravity-aligned (R(0)=I), so the
    # re-leveling must be near-identity and tracking unaffected
    ate = ate_rmse(est, gt)
    assert ate < 0.01, f"ATE {ate}"
    # keyframe velocities close to ground truth
    kfs = [k for k in m.get_all_keyframes() if k.velocity is not None]
    assert len(kfs) >= 6
    v_err = [
        np.linalg.norm(k.velocity - _gt_velocity(k.timestamp * FPS))
        for k in kfs
    ]
    assert np.median(v_err) < 0.05, v_err
    # gyro bias estimate near zero (unbiased synthetic IMU)
    assert np.linalg.norm(kfs[-1].imu_bias.bg) < 0.01
    # the tracker fuses IMU per frame after init: frames carry VI state
    assert sysm.tracker.current.velocity is not None
    assert sysm.tracker.current.imu_bias is not None


def test_stereo_inertial_with_tbc_extrinsics():
    # camera mounted rotated and offset from the IMU/body
    Tbc = SE3(so3_exp(np.array([0.0, 0.0, np.pi / 2])), np.array([0.05, -0.02, 0.01]))
    sysm, est, gt = _run(40, Tbc, seed=3)
    m = sysm.atlas.get_current_map()
    assert m.imu_initialized
    ate = ate_rmse(est, gt)
    assert ate < 0.01, f"ATE {ate}"
    kfs = [k for k in m.get_all_keyframes() if k.velocity is not None]
    # body velocity differs from camera-origin velocity by the lever arm's
    # omega x r term (small here); compare loosely
    v_err = [
        np.linalg.norm(k.velocity - _gt_velocity(k.timestamp * FPS)) for k in kfs
    ]
    assert np.median(v_err) < 0.08, v_err
