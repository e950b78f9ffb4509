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


@pytest.mark.slow
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


def test_mlpnp_direct():
    """MLPnP nullspace DLT + GN: exact pose from clean bearings, robust to
    noise (the reference's ML formulation, MLPnPsolver.h:59)."""
    import numpy as np

    from orbslam3_tpu.cameras.models import Pinhole
    from orbslam3_tpu.optim.pnp import _mlpnp
    from orbslam3_tpu.utils.lie import SE3, so3_exp

    rng = np.random.default_rng(4)
    cam = Pinhole([400.0, 400.0, 320.0, 240.0])
    T_true = SE3(so3_exp([0.1, -0.2, 0.05]), np.array([0.3, -0.1, 0.5]))
    pw = rng.uniform(-1, 1, (40, 3)) * [3, 2, 1.5] + [0, 0, 6]
    pc = T_true.apply(pw)
    bear = pc / np.linalg.norm(pc, axis=1, keepdims=True)
    T = _mlpnp(pw, bear)
    assert T is not None
    err = (T * T_true.inverse()).log()
    assert np.linalg.norm(err[:3]) < 1e-6
    assert np.linalg.norm(err[3:]) < 1e-6
    # with pixel noise: still sub-cm / sub-milliradian
    uv = cam.project(pc) + rng.normal(0, 0.5, (40, 2))
    rays = cam.unproject(uv)
    bear_n = rays / np.linalg.norm(rays, axis=1, keepdims=True)
    T2 = _mlpnp(pw, bear_n)
    err2 = (T2 * T_true.inverse()).log()
    assert np.linalg.norm(err2[:3]) < 0.02
    assert np.linalg.norm(err2[3:]) < 0.005


def test_pnp_ransac_planar_fallback():
    """Coplanar worlds route to the EPnP branch and still recover pose."""
    import numpy as np

    from orbslam3_tpu.cameras.models import Pinhole
    from orbslam3_tpu.optim.pnp import pnp_ransac
    from orbslam3_tpu.utils.lie import SE3, so3_exp

    rng = np.random.default_rng(5)
    cam = Pinhole([400.0, 400.0, 320.0, 240.0])
    T_true = SE3(so3_exp([0.05, 0.1, -0.02]), np.array([0.1, 0.2, 0.3]))
    pw = rng.uniform(-1, 1, (50, 3)) * [3, 2, 0.0] + [0, 0, 6]  # z = const
    uv = cam.project(T_true.apply(pw)) + rng.normal(0, 0.3, (50, 2))
    T, inl = pnp_ransac(pw, uv, cam, iterations=100, seed=1)
    assert T is not None and inl.sum() > 40
    err = (T * T_true.inverse()).log()
    assert np.linalg.norm(err[:3]) < 0.03
