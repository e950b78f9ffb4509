"""Cross-map merge: lose tracking, start a fresh map, weld it back."""

import pytest

import numpy as np

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.oracle.orb_cpu import PyramidParams
from orbslam3_tpu.slam.system import System
from orbslam3_tpu.slam.tracking import TrackingState
from orbslam3_tpu.utils.synth import stereo_sequence
from orbslam3_tpu.vocab.vocabulary import BinaryVocabulary

pytestmark = pytest.mark.slow  # full-sequence e2e: nightly tier


FX = 350.0
H, W = 384, 512


def test_lost_fork_then_merge():
    camera = Pinhole([FX, FX, W / 2, H / 2])
    mbf = FX * 0.12
    frames = stereo_sequence(40, camera, 0.12, H, W, seed=1)
    sys0 = System(camera, mbf, PyramidParams(n_features=700), sequential=True)
    descs = [sys0._extract_stereo(frames[k][0], frames[k][1])["desc"] for k in (0, 10, 20)]
    voc = BinaryVocabulary.train(np.concatenate(descs), k=8, depth=3, seed=0)

    sysm = System(camera, mbf, PyramidParams(n_features=900), sequential=True,
                  max_frames=2, vocabulary=voc)
    sysm.tracker.relocalizer = None  # force the fork+merge path, not reloc
    # collapse the (time-based, reference 3.0 s) RECENTLY_LOST patience so
    # the 6-frame blackout at 20 fps timestamps forks promptly
    sysm.tracker.time_recently_lost_visual = 0.1
    sysm.loop_closer.run_gba = False
    blank = np.full((H, W), 127, np.uint8)
    blackout = range(20, 26)
    tg0 = frames[0][2]

    for k, (il, ir, tg) in enumerate(frames):
        if k in blackout:
            il = ir = blank
        pose = sysm.track_stereo(il, ir, k / 20.0)

    # the blackout must have forked a second map...
    lc = sysm.loop_closer
    assert getattr(lc, "n_merges", 0) >= 1, (
        f"maps={sysm.atlas.count_maps()} merges={getattr(lc, 'n_merges', 0)}"
    )
    # ...and the merge welded everything back into ONE good map
    assert sysm.atlas.count_maps() == 1
    assert sysm.get_tracking_state() == TrackingState.OK
    m = sysm.atlas.get_current_map()
    assert m.n_keyframes() >= 12  # both segments' keyframes present

    # final pose is metrically consistent with the FIRST segment's frame
    tg_s = frames[-1][2] * tg0.inverse()
    err = np.linalg.norm((pose * tg_s.inverse()).log()[:3])
    assert err < 0.05, err
