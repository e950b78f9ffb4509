"""Full SLAM loop at the REFERENCE threshold values (VERDICT r2 item 3).

The repo's defaults deliberately deviate from the reference on four knobs
(tuned on the synthetic world; slam/matchers.py:21-36, slam/tracking.py:74-75):
MATCH_TH=50 vs TH_HIGH=100 (/root/reference/include/ORBmatcher.h:92),
same-octave-first candidate search, mono-init 60 vs 100
(/root/reference/src/Tracking3.cc mono init), and VO points excluded from
the final inlier vote (/root/reference/src/Tracking4.cc TrackLocalMap).
The knobs are overridable (set_tuning / Settings Tuning.*) so real-data
runs can restore reference behavior — these tests prove the restore path
actually WORKS end-to-end: tracking holds and ATE stays sub-2 cm with the
reference's own values, so when a real EuRoC sequence lands only the data
is new.
"""

import contextlib

import numpy as np
import pytest

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.oracle.orb_cpu import PyramidParams
from orbslam3_tpu.slam import matchers
from orbslam3_tpu.slam.system import System
from orbslam3_tpu.slam.tracking import TrackingState
from orbslam3_tpu.utils.synth import ate_rmse, stereo_sequence


@contextlib.contextmanager
def reference_tuning(*trackers):
    """Apply the reference's threshold values; restore on exit."""
    old_th, old_oct = matchers.MATCH_TH, matchers.SAME_OCTAVE_FIRST
    matchers.set_tuning(match_th=100, same_octave_first=False)
    for t in trackers:
        t.mono_init_min_matches = 100  # reference: 100 matches to init mono
        t.vo_points_in_final_vote = True  # reference counts VO points
    try:
        yield
    finally:
        matchers.set_tuning(match_th=old_th, same_octave_first=old_oct)


def test_fabricated_long_run_at_reference_thresholds():
    """200-frame fabricated-feature run, reference knobs: tracks + sub-2 cm."""
    from test_fabricated_e2e import CAM, MBF, N_FRAMES, W, H, _feats_at, _pose, _world

    pts, descs, rng = _world()
    sysm = System(CAM, MBF, PyramidParams(n_features=800),
                  sequential=True, max_frames=6)
    with reference_tuning(sysm.tracker):
        est, gt, states = [], [], []
        for k in range(N_FRAMES):
            Tgt = _pose(k)
            feats = _feats_at(pts, descs, rng, Tgt)
            pose = sysm.track_stereo_features(feats, k / 20.0, (0, 0, W, H))
            states.append(sysm.get_tracking_state())
            if pose is not None:
                est.append(pose)
                gt.append(Tgt)
    assert len(est) == N_FRAMES
    assert all(s == TrackingState.OK for s in states)
    rmse = ate_rmse(est, gt)
    assert rmse < 0.02, f"ATE RMSE {rmse*100:.2f} cm at reference thresholds"


FX = 350.0
H_IMG, W_IMG = 384, 512
BASELINE = 0.12


@pytest.mark.slow
def test_image_e2e_at_reference_thresholds():
    """Real device extraction pipeline, reference knobs: tracks + sub-2 cm.

    Same geometry as test_slam_e2e (shares its cached XLA program); only the
    host-side matching thresholds change.
    """
    camera = Pinhole([FX, FX, W_IMG / 2, H_IMG / 2])
    mbf = FX * BASELINE
    frames = stereo_sequence(30, camera, BASELINE, H_IMG, W_IMG, seed=1)
    sysm = System(camera, mbf, PyramidParams(n_features=900),
                  sequential=True, max_frames=8)
    with reference_tuning(sysm.tracker):
        est, gt, states = [], [], []
        for k, (img_l, img_r, tcw_gt) in enumerate(frames):
            pose = sysm.track_stereo(img_l, img_r, timestamp=k / 20.0)
            states.append(sysm.get_tracking_state())
            if pose is not None:
                est.append(pose)
                gt.append(tcw_gt)
    assert len(est) == 30
    assert all(s == TrackingState.OK for s in states)
    rmse = ate_rmse(est, gt)
    assert rmse < 0.02, f"ATE RMSE {rmse*100:.2f} cm at reference thresholds"


@pytest.mark.slow
def test_mono_init_at_reference_min_matches():
    """Monocular two-view init with the reference's 100-match requirement."""
    camera = Pinhole([FX, FX, W_IMG / 2, H_IMG / 2])
    frames = stereo_sequence(32, camera, BASELINE, H_IMG, W_IMG, seed=1)
    sysm = System(camera, mbf=0.0, orb_params=PyramidParams(n_features=900),
                  sensor=System.MONOCULAR, sequential=True, max_frames=8)
    with reference_tuning(sysm.tracker):
        est, gt = [], []
        for k, (il, _, tcw_gt) in enumerate(frames):
            if k % 2:  # parallax for two-view init
                continue
            pose = sysm.track_monocular(il, timestamp=k / 20.0)
            if pose is not None:
                est.append(pose)
                gt.append(tcw_gt)
        assert sysm.get_tracking_state() == TrackingState.OK
    assert len(est) >= 6, f"mono init failed at reference min-matches: {len(est)}"
    rmse = ate_rmse(est, gt, with_scale=True)
    assert rmse < 0.05, f"mono ATE {rmse*100:.2f} cm at reference thresholds"
