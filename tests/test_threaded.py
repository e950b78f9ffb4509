"""Threaded mode: Tracking (caller) || LocalMapping || LoopClosing workers.

Role-parity with the reference's thread layout (System.cc:197,214): local
mapping and loop closing run on their own threads, decoupled by KF queues,
synchronized with the tracker through the per-map update lock."""

import pytest

import time

import numpy as np

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.oracle.orb_cpu import PyramidParams
from orbslam3_tpu.slam.system import System
from orbslam3_tpu.slam.tracking import TrackingState
from orbslam3_tpu.utils.synth import ate_rmse, stereo_sequence
from orbslam3_tpu.vocab.vocabulary import BinaryVocabulary

pytestmark = pytest.mark.slow  # full-sequence e2e: nightly tier


FX = 350.0
H, W = 384, 512


def test_threaded_stereo_tracking_matches_gt():
    camera = Pinhole([FX, FX, W / 2, H / 2])
    mbf = FX * 0.12
    frames = stereo_sequence(25, camera, 0.12, H, W, seed=2)

    sys0 = System(camera, mbf, PyramidParams(n_features=700), sequential=True)
    descs = [sys0._extract_stereo(frames[k][0], frames[k][1])["desc"] for k in (0, 12)]
    voc = BinaryVocabulary.train(np.concatenate(descs), k=8, depth=3, seed=0)

    sysm = System(camera, mbf, PyramidParams(n_features=900),
                  sequential=False, max_frames=5, vocabulary=voc)
    assert sysm._mapper_thread is not None and sysm._mapper_thread.is_alive()
    assert sysm._loop_thread is not None and sysm._loop_thread.is_alive()

    est, gt = [], []
    for k, (il, ir, tg) in enumerate(frames):
        pose = sysm.track_stereo(il, ir, k / 20.0)
        assert pose is not None, f"lost at frame {k}"
        est.append(pose)
        gt.append(tg)
    assert sysm.get_tracking_state() == TrackingState.OK

    # drain the worker queues before inspecting the map
    t0 = time.time()
    while (
        sysm.local_mapper.queue_size() > 0 or not sysm.loop_closer.kf_queue.empty()
    ) and time.time() - t0 < 30:
        time.sleep(0.1)
    time.sleep(0.3)

    ate = ate_rmse(est, gt)
    assert ate < 0.02, f"ATE {ate}"
    m = sysm.atlas.get_current_map()
    assert m.n_keyframes() >= 3
    assert m.n_map_points() > 200

    sysm.shutdown()
    assert not sysm._mapper_thread.is_alive()
    assert not sysm._loop_thread.is_alive()
