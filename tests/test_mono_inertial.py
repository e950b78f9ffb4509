"""Mono-inertial e2e: automatic VI init recovers METRIC scale for a
monocular map (the reference's mono-inertial EuRoC configuration;
fix_scale=False path of the VI alignment + Map::ApplyScaledRotation)."""

import pytest

import numpy as np

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.imu.preintegration import Calib
from orbslam3_tpu.oracle.orb_cpu import PyramidParams
from orbslam3_tpu.slam.system import System
from orbslam3_tpu.slam.tracking import TrackingState
from orbslam3_tpu.utils.lie import SE3
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


def _excited_pose(k: float) -> SE3:
    """Base sweep + ~1.4 m/s^2 low-frequency excitation: mono-inertial scale
    is
    only observable with non-gravitational acceleration (the reference's
    EuRoC mono-inertial runs rely on the dataset's deliberate shaking;
    gentle motion leaves scale unobservable for ANY estimator)."""
    t = k / FPS
    base = trajectory_pose(k)
    dyn = np.array([0.13 * np.sin(3.3 * t), 0.11 * np.sin(2.7 * t + 1.0), 0.0])
    return SE3(base.R, base.t + dyn)


def test_mono_inertial_metric_scale():
    camera = Pinhole([FX, FX, W / 2, H / 2])
    frames = stereo_sequence(64, camera, 0.12, H, W, seed=1,
                             pose_fn=_excited_pose)
    calib = Calib(Tbc=SE3(), noise_gyro=1e-4, noise_acc=1e-3,
                  walk_gyro=1e-6, walk_acc=1e-5)
    sysm = System(camera, mbf=0.0, orb_params=PyramidParams(n_features=900),
                  sensor="mono-inertial", sequential=True, max_frames=3,
                  imu_calib=calib)
    est, gt = [], []
    prev_k = None
    # every-other-frame drive (two-view init needs parallax, as test_mono);
    # IMU samples span the full inter-frame gap
    m = sysm.atlas.get_current_map()
    for k, (il, _ir, tg) in enumerate(frames):
        if k % 2:
            continue
        imu = (
            imu_samples_between(prev_k, k, FPS, pose_fn=_excited_pose)
            if prev_k is not None
            else None
        )
        pose = sysm.track_monocular(il, k / FPS, imu=imu)
        prev_k = k
        # live poses BEFORE VI init are in the arbitrary visual scale; the
        # metric claim applies to frames tracked after initialization (the
        # reference likewise retro-scales only its relative-pose LOG in
        # UpdateFrameIMU, Tracking5.cc:415 — its live stream mixes scales
        # the same way)
        if m.imu_initialized:
            est.append(pose)
            gt.append(tg)
    assert sysm.get_tracking_state() == TrackingState.OK
    assert m.imu_initialized, "mono-inertial VI init never fired"

    # metric scale: SE3 (scale-free) alignment of the post-init tail —
    # monocular alone can only do this up to an arbitrary scale.  Bounds are
    # honest for this setting: visual KF-pose noise vs ~1.4 m/s^2 excitation
    # gives ~10%-level scale observability over a 3 s window (the reference
    # needs 15+ s of vigorous motion on EuRoC for ~2% scale)
    tail = [(e, g) for e, g in zip(est[-20:], gt[-20:]) if e is not None]
    assert len(tail) >= 8
    ate_se3 = ate_rmse([e for e, _ in tail], [g for _, g in tail],
                       with_scale=False)
    assert ate_se3 < 0.08, f"metric ATE {ate_se3}"

    # and the recovered inter-frame travel distance matches ground truth
    d_est = np.linalg.norm(tail[-1][0].inverse().t - tail[0][0].inverse().t)
    d_gt = np.linalg.norm(tail[-1][1].inverse().t - tail[0][1].inverse().t)
    assert abs(d_est / max(d_gt, 1e-9) - 1.0) < 0.15, (d_est, d_gt)
