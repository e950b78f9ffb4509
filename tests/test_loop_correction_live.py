"""CorrectLoop on a live SLAM map with injected drift.

Builds a real map by running SLAM, injects a rigid drift into the current
covisible group (simulating accumulated odometry error at loop closure
time), then drives LoopClosing.correct_loop with the ground-truth relative
Sim3 and checks the group snaps back.
"""

import numpy as np
import pytest

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.oracle.orb_cpu import PyramidParams
from orbslam3_tpu.slam.loop_closing import LoopClosing
from orbslam3_tpu.slam.system import System
from orbslam3_tpu.utils.lie import SE3, Sim3, so3_exp
from orbslam3_tpu.utils.synth import stereo_sequence
from orbslam3_tpu.vocab.vocabulary import BinaryVocabulary

pytestmark = pytest.mark.slow  # full-sequence e2e: nightly tier


FX = 350.0
H, W = 384, 512


def test_correct_loop_fixes_injected_drift():
    camera = Pinhole([FX, FX, W / 2, H / 2])
    mbf = FX * 0.12
    frames = stereo_sequence(26, camera, 0.12, H, W, seed=1)
    sys0 = System(camera, mbf, PyramidParams(n_features=700), sequential=True)
    descs = [sys0._extract_stereo(frames[k][0], frames[k][1])["desc"] for k in (0, 12)]
    voc = BinaryVocabulary.train(np.concatenate(descs), k=8, depth=3, seed=0)
    sysm = System(camera, mbf, PyramidParams(n_features=900), sequential=True,
                  max_frames=6, vocabulary=voc)
    sysm.loop_closer.run_gba = False  # isolate the pose-graph correction
    for k, (il, ir, tg) in enumerate(frames):
        sysm.track_stereo(il, ir, k / 20.0)
    m = sysm.atlas.get_current_map()
    kfs = m.get_all_keyframes()
    assert len(kfs) >= 5

    cur = kfs[-1]
    loop_kf = kfs[0]
    # ground-truth relative Sim3 BEFORE drift injection
    s_cur_cand_true = Sim3.from_se3(cur.Tcw) * Sim3.from_se3(loop_kf.Tcw).inverse()

    # inject a rigid drift into the current covisible group (as if the
    # odometry had drifted on the way back to the loop-closure site)
    drift = SE3(so3_exp([0.0, 0.02, 0.0]), np.array([0.06, -0.03, 0.04]))
    group = [cur] + cur.get_best_covisibility_keyframes(3)
    group = [k for k in group if k is not loop_kf][:3]
    moved_pts = set()
    poses_true = {k: k.Tcw.copy() for k in kfs}
    for k in group:
        for _, mp in k.get_map_point_indices():
            if mp.id not in moved_pts:
                moved_pts.add(mp.id)
                mp.position = drift.inverse() * mp.position
        k.set_pose(k.Tcw * drift)

    err_before = np.linalg.norm((cur.Tcw * poses_true[cur].inverse()).log()[:3])
    assert err_before > 0.05

    # drive the correction with BoW matches between cur and the loop KF
    from orbslam3_tpu.slam import matchers

    matches, nm = matchers.search_by_bow(loop_kf, cur, ratio=0.8)
    assert nm >= 10, nm
    sysm.loop_closer.correct_loop(cur, loop_kf, s_cur_cand_true, matches)

    err_after = np.linalg.norm((cur.Tcw * poses_true[cur].inverse()).log()[:3])
    assert err_after < 0.02, (err_before, err_after)
    # untouched old keyframes stay put
    e0 = np.linalg.norm((loop_kf.Tcw * poses_true[loop_kf].inverse()).log()[:3])
    assert e0 < 1e-6


def test_correct_loop_with_transient_gba_thread():
    """Same injected-drift scenario, threaded mode: correct_loop spawns the
    transient GBA thread (RunGlobalBundleAdjustment role); tracking keeps
    going while it solves; shutdown joins and the map stays consistent."""
    camera = Pinhole([FX, FX, W / 2, H / 2])
    mbf = FX * 0.12
    frames = stereo_sequence(30, camera, 0.12, H, W, seed=1)
    sys0 = System(camera, mbf, PyramidParams(n_features=700), sequential=True)
    descs = [sys0._extract_stereo(frames[k][0], frames[k][1])["desc"] for k in (0, 12)]
    voc = BinaryVocabulary.train(np.concatenate(descs), k=8, depth=3, seed=0)
    sysm = System(camera, mbf, PyramidParams(n_features=900), sequential=True,
                  max_frames=6, vocabulary=voc)
    lc = sysm.loop_closer
    lc.sequential = False  # GBA goes to the transient thread
    for k in range(26):
        il, ir, _ = frames[k]
        sysm.track_stereo(il, ir, k / 20.0)
    m = sysm.atlas.get_current_map()
    kfs = m.get_all_keyframes()
    cur, loop_kf = kfs[-1], kfs[0]
    s_true = Sim3.from_se3(cur.Tcw) * Sim3.from_se3(loop_kf.Tcw).inverse()
    drift = SE3(so3_exp([0.0, 0.02, 0.0]), np.array([0.06, -0.03, 0.04]))
    group = [cur] + cur.get_best_covisibility_keyframes(3)
    group = [k for k in group if k is not loop_kf][:3]
    moved = set()
    for k in group:
        for _, mp in k.get_map_point_indices():
            if mp.id not in moved:
                moved.add(mp.id)
                mp.position = drift.inverse() * mp.position
        k.set_pose(k.Tcw * drift)
    poses_true = {k.id: k.Tcw.copy() for k in kfs if k not in group}

    from orbslam3_tpu.slam import matchers

    matches, nm = matchers.search_by_bow(loop_kf, cur, ratio=0.8)
    assert nm >= 10
    lc.correct_loop(cur, loop_kf, s_true, matches)
    assert getattr(lc, "_gba_thread", None) is not None

    # keep tracking while the GBA thread may still be solving
    for k in range(26, 30):
        il, ir, _ = frames[k]
        assert sysm.track_stereo(il, ir, k / 20.0) is not None
    lc.request_finish()  # joins the transient thread
    assert not lc._gba_thread.is_alive()

    # corrected map: observation graph consistent, poses near pre-drift GT
    for mp in m.get_all_map_points():
        for kf2, (left, right) in mp.observations.items():
            idx = left if left >= 0 else right
            assert kf2.map_points[idx] is mp
    e = np.linalg.norm((loop_kf.Tcw * poses_true[loop_kf.id].inverse()).log()[:3])
    assert e < 0.02, e
