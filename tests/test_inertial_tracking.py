"""IMU dead-reckoning through a visual blackout, with re-acquisition."""

import pytest

import numpy as np

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.oracle.orb_cpu import PyramidParams
from orbslam3_tpu.slam.system import System
from orbslam3_tpu.slam.tracking import TrackingState
from orbslam3_tpu.utils.synth import imu_samples_between, stereo_sequence

pytestmark = pytest.mark.slow  # full-sequence e2e: nightly tier


FX = 350.0
H, W = 384, 512
FPS = 20.0


def test_imu_dead_reckoning_through_blackout():
    camera = Pinhole([FX, FX, W / 2, H / 2])
    mbf = FX * 0.12
    frames = stereo_sequence(30, camera, 0.12, H, W, seed=1)
    blank = np.full((H, W), 127, np.uint8)
    sysm = System(camera, mbf, PyramidParams(n_features=900),
                  sequential=True, max_frames=8)
    tg0 = frames[0][2]
    blackout = range(15, 19)
    dr_errs, post_errs = [], []
    for k, (il, ir, tg) in enumerate(frames):
        imu = imu_samples_between(k - 1, k, FPS) if k > 0 else None
        if k in blackout:
            il = ir = blank  # vision fails completely
        pose = sysm.track_stereo(il, ir, k / FPS, imu=imu)
        tg_s = tg * tg0.inverse()
        if k in blackout:
            # tracker reports lost, but the frame carries the dead-reckoned
            # pose (the reference outputs IMU-predicted poses too)
            assert sysm.get_tracking_state() == TrackingState.RECENTLY_LOST
            f = sysm.tracker.current
            assert f.Tcw is not None
            e = np.linalg.norm((f.Tcw * tg_s.inverse()).log()[:3])
            dr_errs.append(e)
        elif k > max(blackout):
            assert pose is not None, f"failed to re-acquire at frame {k}"
            assert sysm.get_tracking_state() == TrackingState.OK
            post_errs.append(np.linalg.norm((pose * tg_s.inverse()).log()[:3]))
    # dead-reckoned poses stay metrically sane through the blackout
    assert max(dr_errs) < 0.05, dr_errs
    # and visual tracking recovers cleanly afterwards
    assert np.median(post_errs) < 0.02, post_errs
