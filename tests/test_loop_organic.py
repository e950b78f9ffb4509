"""Organic long-sweep revisit: place recognition + map reuse end-to-end.

A wide out-and-back sweep (x +-2 m, yaw +-0.8 rad over 68 frames) where the
middle of the trajectory shares little frustum with the start.  In this
synthetic world SLAM accumulates millimeters of drift, so on return the
tracker organically RE-ATTACHES to the original map (covisibility bridges
the revisit) and no loop correction is *needed* — the reference behaves the
same when drift stays under the matching gates.  What must hold
organically:

 - tracking survives the whole sweep with small ATE,
 - the revisit reconnects the covisibility graph to the early segment,
 - the keyframe database surfaces distant-past candidates for late KFs
   (the place-recognition layer that would drive CorrectLoop under drift —
   the correction path itself is exercised by
   tests/test_loop_correction_live.py with injected drift, and cross-map by
   tests/test_map_merge.py)."""

import pytest

import numpy as np

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.oracle.orb_cpu import PyramidParams
from orbslam3_tpu.slam.system import System
from orbslam3_tpu.slam.tracking import TrackingState
from orbslam3_tpu.utils.lie import SE3, so3_exp
from orbslam3_tpu.utils.synth import ate_rmse, stereo_sequence
from orbslam3_tpu.vocab.vocabulary import BinaryVocabulary

pytestmark = pytest.mark.slow  # full-sequence e2e: nightly tier


FX = 350.0
H, W = 384, 512
N = 64


def _loop_pose(k: float) -> SE3:
    s = 2.0 * np.pi * k / N
    t = np.array([2.0 * np.sin(s), 0.05 * np.sin(0.4 * k), 0.30 * (1 - np.cos(s))])
    yaw = -0.8 * np.sin(s)
    return SE3(so3_exp(np.array([0.0, yaw, 0.0])), t)


def test_long_sweep_revisit_reconnects():
    camera = Pinhole([FX, FX, W / 2, H / 2])
    mbf = FX * 0.12
    frames = stereo_sequence(N + 4, camera, 0.12, H, W, seed=4, pose_fn=_loop_pose)

    sys0 = System(camera, mbf, PyramidParams(n_features=700), sequential=True)
    descs = [
        sys0._extract_stereo(frames[k][0], frames[k][1])["desc"]
        for k in (0, 16, 32, 48)
    ]
    voc = BinaryVocabulary.train(np.concatenate(descs), k=8, depth=3, seed=0)

    sysm = System(camera, mbf, PyramidParams(n_features=900), sequential=True,
                  max_frames=3, vocabulary=voc)
    sysm.tracker.relocalizer = None
    sysm.loop_closer.run_gba = False

    est, gt = [], []
    for k, (il, ir, tg) in enumerate(frames):
        pose = sysm.track_stereo(il, ir, k / 20.0)
        assert pose is not None, f"lost at frame {k}"
        est.append(pose)
        gt.append(tg)

    assert sysm.get_tracking_state() == TrackingState.OK
    ate = ate_rmse(est, gt)
    assert ate < 0.02, f"ATE {ate}"
    assert sysm.atlas.count_maps() == 1

    m = sysm.atlas.get_current_map()
    kfs = m.get_all_keyframes()
    assert len(kfs) >= 20
    early = set(kfs[:5])
    # the revisit reconnected the covisibility graph to the start segment
    late_links = [
        len(set(kf.get_connected_keyframes()) & early) for kf in kfs[-4:]
    ]
    assert max(late_links) >= 2, late_links
    # place recognition surfaces a distant-past candidate for a late KF
    found_old = False
    for kf in kfs[-6:]:
        for cand in sysm.kf_database.detect_n_best_candidates(kf, 5):
            if kf.id - cand.id >= 30:
                found_old = True
    assert found_old, "no distant-past candidate ever surfaced"
