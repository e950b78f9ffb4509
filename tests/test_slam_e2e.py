"""End-to-end stereo SLAM on a synthetic sequence with exact ground truth.

The analog of the reference's dataset-level regression (SURVEY §4.4) —
run a full sequence, measure ATE RMSE against ground truth.
"""

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
BASELINE = 0.12


@pytest.fixture(scope="module")
def slam_run():
    camera = Pinhole([FX, FX, W / 2, H / 2])
    mbf = FX * BASELINE
    frames = stereo_sequence(30, camera, BASELINE, H, W, seed=1)
    sysm = System(
        camera, mbf, PyramidParams(n_features=900), sequential=True, max_frames=8
    )
    est, gt = [], []
    states = []
    for k, (img_l, img_r, tcw_gt) in enumerate(frames):
        pose = sysm.track_stereo(img_l, img_r, timestamp=k / 20.0)
        states.append(sysm.get_tracking_state())
        if pose is not None:
            est.append(pose)
            gt.append(tcw_gt)
    return sysm, est, gt, states


def test_tracks_every_frame(slam_run):
    sysm, est, gt, states = slam_run
    assert len(est) == 30
    assert all(s == TrackingState.OK for s in states)


def test_ate_rmse_sub_centimeter(slam_run):
    sysm, est, gt, states = slam_run
    rmse = ate_rmse(est, gt)
    assert rmse < 0.01, f"ATE RMSE {rmse*100:.2f} cm"


def test_map_grows_and_stays_consistent(slam_run):
    sysm, est, gt, states = slam_run
    stats = sysm.map_stats()
    assert stats["n_keyframes"] >= 3
    assert stats["n_map_points"] > 300
    # every surviving map point has consistent observations
    m = sysm.atlas.get_current_map()
    for mp in m.get_all_map_points():
        assert not mp.bad
        for kf, (left, right) in mp.observations.items():
            idx = left if left >= 0 else right
            assert kf.map_points[idx] is mp


def test_relative_pose_accuracy(slam_run):
    """Frame-to-frame relative motion matches ground truth to ~mm."""
    sysm, est, gt, states = slam_run
    errs = []
    for k in range(1, len(est)):
        rel_est = est[k] * est[k - 1].inverse()
        rel_gt = gt[k] * gt[k - 1].inverse()
        errs.append(np.linalg.norm((rel_est * rel_gt.inverse()).log()[:3]))
    assert np.median(errs) < 0.002


def test_trajectory_io_roundtrip(tmp_path, slam_run):
    sysm, est, gt, states = slam_run
    from orbslam3_tpu.utils.trajectory import load_tum

    p = tmp_path / "traj.txt"
    sysm.save_trajectory_tum(str(p))
    loaded = load_tum(str(p))
    assert len(loaded) == 30
    # poses roundtrip through the quaternion text format
    orig = sysm.frame_trajectory()
    for (ts0, t0), (ts1, t1) in zip(orig[:5], loaded[:5]):
        assert abs(ts0 - ts1) < 1e-5
        np.testing.assert_allclose(t0.t, t1.t, atol=1e-5)
        np.testing.assert_allclose(t0.R, t1.R, atol=1e-5)
