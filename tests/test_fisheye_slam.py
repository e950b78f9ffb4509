"""Fisheye (KannalaBrandt8) stereo SLAM through the System facade
(TUM-VI-style configuration: two KB8 cameras + lapping areas; depth from
overlap kNN matching + KB8 triangulation)."""

import pytest

import numpy as np

from orbslam3_tpu.cameras.models import KannalaBrandt8
from orbslam3_tpu.oracle.orb_cpu import PyramidParams
from orbslam3_tpu.slam.system import System
from orbslam3_tpu.slam.tracking import TrackingState
from orbslam3_tpu.utils.lie import SE3, so3_exp
from orbslam3_tpu.utils.synth import PlaneWorld, ate_rmse, make_texture, render_world

pytestmark = pytest.mark.slow  # full-sequence e2e: nightly tier


H, W = 288, 384
BASELINE = 0.1


def _world():
    return [
        PlaneWorld(
            make_texture(2048, 3),
            p0=[-4.0, -3.0, 2.8], ex=[1.0, 0.0, -0.15], ey=[0.0, 1.0, 0.08],
            scale=0.004,
        ),
        PlaneWorld(
            make_texture(1024, 4),
            p0=[-2.5, -2.0, 1.6], ex=[1.0, 0.0, 0.3], ey=[0.0, 1.0, -0.1],
            scale=0.003,
        ),
    ]


def _pose(k):
    t = np.array([0.04 * k, 0.015 * np.sin(0.5 * k), 0.01 * k])
    return SE3(so3_exp(np.array([0.0, -0.01 * k, 0.0])), t)


def test_fisheye_stereo_slam_e2e():
    cam = KannalaBrandt8([160.0, 160.0, W / 2, H / 2, 0.0035, 0.0008, -0.0034, 0.0006])
    walls = _world()
    T_rl = SE3(np.eye(3), np.array([-BASELINE, 0.0, 0.0]))  # left coords -> right
    frames = []
    for k in range(20):
        Twc = _pose(k)
        Tcw = Twc.inverse()
        img_l = render_world(walls, cam, Tcw, H, W)
        img_r = render_world(walls, cam, T_rl * Tcw, H, W)
        frames.append((img_l, img_r, Tcw))

    sysm = System(
        cam,
        mbf=160.0 * BASELINE,
        orb_params=PyramidParams(n_features=700),
        sequential=True,
        max_frames=5,
        camera2=cam,
        Tlr=SE3(np.eye(3), np.array([BASELINE, 0.0, 0.0])),  # right -> left
        lapping1=(0.0, float(W)),
        lapping2=(0.0, float(W)),
    )
    est, gt = [], []
    for k, (il, ir, tg) in enumerate(frames):
        pose = sysm.track_stereo(il, ir, k / 20.0)
        assert pose is not None, f"lost at frame {k}"
        est.append(pose)
        gt.append(tg)
    assert sysm.get_tracking_state() == TrackingState.OK
    ate = ate_rmse(est, gt)
    assert ate < 0.05, f"fisheye ATE {ate}"
    st = sysm.map_stats()
    assert st["n_map_points"] > 150
    # dual-camera observation model: a healthy share of map points must be
    # observed in BOTH cameras of at least one keyframe (reference
    # Nleft/Nright bookkeeping), i.e. right-camera slots really feed the
    # optimizers (constraint count > observation-keyframe count)
    m = sysm.atlas.get_current_map()
    mps = m.get_all_map_points()
    n_dual = sum(
        1
        for mp in mps
        if any(
            left >= 0 and right >= 0 for left, right in mp.observations.values()
        )
    )
    n_constraints = sum(mp.n_obs for mp in mps)
    n_obs_kfs = sum(len(mp.observations) for mp in mps)
    assert n_dual > 50, f"only {n_dual} dual-observed points"
    assert n_constraints > n_obs_kfs, "right-camera constraints missing"
    # every keyframe carries live right-block associations
    kfs = m.get_all_keyframes()
    right_slots = sum(
        sum(1 for mp in kf.map_points[kf.n_left :] if mp is not None)
        for kf in kfs
    )
    assert right_slots > 50, right_slots
