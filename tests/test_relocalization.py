"""Relocalization after kidnapping, with a trained vocabulary."""

import numpy as np
import pytest

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.oracle.orb_cpu import PyramidParams
from orbslam3_tpu.slam.system import System
from orbslam3_tpu.slam.tracking import TrackingState
from orbslam3_tpu.utils.synth import stereo_sequence
from orbslam3_tpu.vocab.vocabulary import BinaryVocabulary

FX = 350.0
H, W = 384, 512
BASELINE = 0.12


def test_relocalization_after_kidnap():
    camera = Pinhole([FX, FX, W / 2, H / 2])
    mbf = FX * BASELINE
    frames = stereo_sequence(24, camera, BASELINE, H, W, seed=1)

    # train a vocabulary from the sequence's own descriptors (stand-in for
    # the reference's pre-trained ORBvoc)
    sys0 = System(camera, mbf, PyramidParams(n_features=600), sequential=True)
    descs = []
    for k in (0, 8, 16):
        feats = sys0._extract_stereo(frames[k][0], frames[k][1])
        descs.append(feats["desc"])
    voc = BinaryVocabulary.train(np.concatenate(descs), k=8, depth=3, seed=0)

    sysm = System(
        camera, mbf, PyramidParams(n_features=900), sequential=True,
        max_frames=8, vocabulary=voc,
    )
    gt = []
    for k, (il, ir, tcw_gt) in enumerate(frames[:20]):
        pose = sysm.track_stereo(il, ir, k / 20.0)
        gt.append(tcw_gt)
        assert pose is not None
    tg0 = frames[0][2]

    # kidnap: drop to RECENTLY_LOST and present the view from frame 4
    sysm.tracker.state = TrackingState.RECENTLY_LOST
    sysm.tracker.velocity = None
    il, ir, tcw_gt = frames[4]
    pose = sysm.track_stereo(il, ir, 99.0)
    assert sysm.get_tracking_state() == TrackingState.OK
    assert pose is not None
    tg_s = tcw_gt * tg0.inverse()
    err = (pose * tg_s.inverse()).log()
    assert np.linalg.norm(err[:3]) < 0.03, err
