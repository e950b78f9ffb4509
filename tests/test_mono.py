"""Monocular SLAM e2e: two-view init + tracking, Sim3-aligned ATE."""

import numpy as np
import pytest

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.oracle.orb_cpu import PyramidParams
from orbslam3_tpu.slam.system import System
from orbslam3_tpu.slam.tracking import TrackingState
from orbslam3_tpu.utils.synth import stereo_sequence, ate_rmse

pytestmark = pytest.mark.slow  # full-sequence e2e: nightly tier


FX = 350.0
H, W = 384, 512


def test_monocular_slam_e2e():
    camera = Pinhole([FX, FX, W / 2, H / 2])
    frames = stereo_sequence(32, camera, 0.12, H, W, seed=1)
    sysm = System(
        camera, mbf=0.0, orb_params=PyramidParams(n_features=900),
        sensor=System.MONOCULAR, sequential=True, max_frames=8,
    )
    est, gt = [], []
    for k, (il, _, tcw_gt) in enumerate(frames):
        # skip frames to give the two-view init parallax
        if k % 2:
            continue
        pose = sysm.track_monocular(il, timestamp=k / 20.0)
        if pose is not None:
            est.append(pose)
            gt.append(tcw_gt)
    assert sysm.get_tracking_state() == TrackingState.OK
    assert len(est) >= 6, len(est)
    rmse = ate_rmse(est, gt, with_scale=True)
    assert rmse < 0.05, f"mono ATE {rmse*100:.2f} cm"
    stats = sysm.map_stats()
    assert stats["n_map_points"] > 80
