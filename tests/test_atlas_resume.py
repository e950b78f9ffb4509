"""Multi-session resume: LoadAtlas-then-CONTINUE-SLAM
(VERDICT r3 missing #3; reference System.cc:157 contract — load a prior
session's atlas at startup, then localize into / extend the loaded maps).

Two resume paths, both end-to-end through a FRESH System:
 1. relocalize into the loaded map and keep mapping there (new KFs/MPs
    land in the loaded map, covisibility-connected to the old session);
 2. relocalization unavailable -> the lost ladder forks a new map, SLAM
    continues there, and LoopClosing merges it back into the loaded map —
    the reference's CreateNewMap-after-load + MergeLocal choreography.
"""

import numpy as np
import pytest

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.oracle.orb_cpu import PyramidParams
from orbslam3_tpu.slam.system import System
from orbslam3_tpu.slam.tracking import TrackingState
from orbslam3_tpu.utils.synth import stereo_sequence
from orbslam3_tpu.vocab.vocabulary import BinaryVocabulary

pytestmark = pytest.mark.slow  # full-sequence e2e: nightly tier

FX = 350.0
H, W = 384, 512
BASELINE = 0.12
MBF = FX * BASELINE


@pytest.fixture(scope="module")
def session1(tmp_path_factory):
    """Run session 1, save its atlas, hand the artifacts to both tests."""
    camera = Pinhole([FX, FX, W / 2, H / 2])
    frames = stereo_sequence(40, camera, BASELINE, H, W, seed=1)
    sys0 = System(camera, MBF, PyramidParams(n_features=600), sequential=True)
    descs = [
        sys0._extract_stereo(frames[k][0], frames[k][1])["desc"]
        for k in (0, 10, 20)
    ]
    voc = BinaryVocabulary.train(np.concatenate(descs), k=8, depth=3, seed=0)

    sysm = System(camera, MBF, PyramidParams(n_features=900), sequential=True,
                  max_frames=3, vocabulary=voc)
    for k, (il, ir, _) in enumerate(frames[:26]):
        pose = sysm.track_stereo(il, ir, k / 20.0)
        assert pose is not None, f"session 1 lost at {k}"
    m = sysm.atlas.get_current_map()
    n_kf0 = m.n_keyframes()
    assert n_kf0 > 10  # enough for the lost ladder to fork, not reset
    path = str(tmp_path_factory.mktemp("resume") / "session1.pkl")
    sysm.save_atlas(path)
    sysm.shutdown()
    return {
        "camera": camera,
        "frames": frames,
        "voc": voc,
        "path": path,
        "n_kf0": n_kf0,
        "map_id": m.id,
        "max_kf_id": max(kf.id for kf in m.get_all_keyframes()),
        "max_mp_id": max(p.id for p in m.get_all_map_points()),
    }


def test_resume_relocalize_and_extend(session1):
    """Load -> relocalize into the loaded map -> keep tracking: new KFs and
    MPs land in the LOADED map, connected to the old session's graph."""
    s = session1
    sys2 = System(s["camera"], MBF, PyramidParams(n_features=900),
                  sequential=True, max_frames=3, vocabulary=s["voc"])
    sys2.load_atlas(s["path"])
    # armed to continue, not to initialize over the loaded map
    assert sys2.get_tracking_state() == TrackingState.RECENTLY_LOST
    m2 = sys2.atlas.get_current_map()
    assert m2.id == s["map_id"]
    assert m2.n_keyframes() == s["n_kf0"]

    # kidnapped start: present the view from frame 8 of the old session at
    # a fresh (much later) timestamp
    tg0 = s["frames"][0][2]
    il, ir, tcw_gt = s["frames"][8]
    pose = sys2.track_stereo(il, ir, 100.0)
    assert sys2.get_tracking_state() == TrackingState.OK, "did not relocalize"
    assert pose is not None
    tg_s = tcw_gt * tg0.inverse()
    err = (pose * tg_s.inverse()).log()
    assert np.linalg.norm(err[:3]) < 0.03, err

    # continue the sweep: frames 9..25 at fresh timestamps
    for j, (il, ir, tcw_gt) in enumerate(s["frames"][9:26]):
        pose = sys2.track_stereo(il, ir, 100.05 + j / 20.0)
        assert pose is not None, f"resumed session lost at +{j}"
        assert sys2.get_tracking_state() == TrackingState.OK
    tg_s = s["frames"][25][2] * tg0.inverse()
    err = np.linalg.norm((pose * tg_s.inverse()).log()[:3])
    assert err < 0.05, err

    # the SAME loaded map got extended: new keyframes + new map points...
    assert sys2.atlas.get_current_map() is m2
    new_kfs = [kf for kf in m2.get_all_keyframes() if kf.id > s["max_kf_id"]]
    assert len(new_kfs) >= 2, "no new keyframes inserted into the loaded map"
    assert any(p.id > s["max_mp_id"] for p in m2.get_all_map_points()), (
        "no new map points created in the loaded map"
    )
    # ...and the new session is covisibility-connected to the old one
    assert any(
        nb.id <= s["max_kf_id"]
        for kf in new_kfs
        for nb in kf.get_best_covisibility_keyframes(10)
    ), "resumed keyframes are not connected to the loaded session's graph"


def test_resume_unseen_forks_then_merges(session1):
    """Load -> relocalization unavailable -> fork a fresh map -> SLAM there
    -> LoopClosing merges it back into the loaded map (CreateNewMap +
    MergeLocal role)."""
    s = session1
    sys2 = System(s["camera"], MBF, PyramidParams(n_features=900),
                  sequential=True, max_frames=2, vocabulary=s["voc"])
    sys2.load_atlas(s["path"])
    sys2.tracker.relocalizer = None  # force the fork+merge path
    sys2.loop_closer.run_gba = False
    assert sys2.get_tracking_state() == TrackingState.RECENTLY_LOST
    n_maps0 = sys2.atlas.count_maps()

    # feed the old sweep; with no relocalizer the lost ladder must fork a
    # NEW map (preserving the loaded one) and restart SLAM in it
    for j, (il, ir, _) in enumerate(s["frames"][6:40]):
        sys2.track_stereo(il, ir, 100.0 + j / 20.0)
    lc = sys2.loop_closer
    assert getattr(lc, "n_merges", 0) >= 1, (
        f"maps={sys2.atlas.count_maps()} merges={getattr(lc, 'n_merges', 0)}"
    )
    # merged back into ONE map containing both sessions
    assert sys2.atlas.count_maps() == 1
    assert sys2.get_tracking_state() == TrackingState.OK
    m = sys2.atlas.get_current_map()
    old_kfs = [kf for kf in m.get_all_keyframes() if kf.id <= s["max_kf_id"]]
    new_kfs = [kf for kf in m.get_all_keyframes() if kf.id > s["max_kf_id"]]
    assert len(old_kfs) >= 5, "loaded session's keyframes lost in the merge"
    assert len(new_kfs) >= 5, "resumed session's keyframes lost in the merge"
