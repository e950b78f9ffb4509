"""Atlas save/load preserves INERTIAL state (VI-specific serialization).

test_platform's roundtrip covers a visual-only map; the reference's
SaveAtlas serializes keyframe velocities, biases and preintegrations too
(System.cc:1348, KeyFrame serialization includes mVw/mImuBias/mpImuPreintegrated).
This pins that an atlas carrying IMU state — preintegration objects,
per-KF velocity/bias, map-level imu_initialized flags — pickles, reloads,
and stays usable (KFDB rebuilt; resume-and-continue tracking itself is
proven end-to-end by tests/test_atlas_resume.py).
"""

import numpy as np

from orbslam3_tpu.imu.preintegration import Bias, Preintegrated
from orbslam3_tpu.oracle.orb_cpu import PyramidParams
from orbslam3_tpu.slam.system import System


def _run_system(n_frames=40):
    from test_fabricated_e2e import CAM, MBF, W, H, _feats_at, _pose, _world

    from orbslam3_tpu.imu.preintegration import Calib
    from orbslam3_tpu.utils.lie import SE3

    pts, descs, rng = _world()
    sysm = System(CAM, MBF, PyramidParams(n_features=800),
                  sequential=True, max_frames=6, imu_calib=Calib(SE3()))
    gyro = np.array([0.0, 0.02, 0.0])
    acc = np.array([0.05, 0.0, 9.81])
    for k in range(n_frames):
        feats = _feats_at(pts, descs, rng, _pose(k))
        imu = None
        if k > 0:  # (acc (N,3), gyro (N,3), dts (N,)) — integrate_batch order
            imu = (np.tile(acc, (10, 1)), np.tile(gyro, (10, 1)),
                   np.full(10, 0.005))
        sysm.track_stereo_features(feats, k / 20.0, (0, 0, W, H), imu=imu)
    return sysm


def test_inertial_atlas_roundtrip(tmp_path):
    sysm = _run_system()
    m = sysm.atlas.get_current_map()
    kfs = m.get_all_keyframes()
    assert len(kfs) >= 3
    # decorate with inertial state as VI init would leave it
    rng = np.random.default_rng(3)
    for kf in kfs:
        kf.velocity = rng.normal(0, 0.5, 3)
        kf.imu_bias = Bias(rng.normal(0, 0.01, 3), rng.normal(0, 0.001, 3))
    m.imu_initialized = True
    has_preint = any(
        getattr(kf, "imu_preint", None) is not None for kf in kfs
    )
    assert has_preint, "IMU windows should have attached preintegrations"
    stats0 = sysm.map_stats()
    vel0 = {kf.id: kf.velocity.copy() for kf in kfs}
    bias0 = {kf.id: (kf.imu_bias.ba.copy(), kf.imu_bias.bg.copy())
             for kf in kfs}

    p = str(tmp_path / "atlas_vi.pkl")
    sysm.save_atlas(p)
    from test_fabricated_e2e import CAM, MBF

    sys2 = System(CAM, MBF, PyramidParams(n_features=800), sequential=True)
    sys2.load_atlas(p)
    m2 = sys2.atlas.get_current_map()
    assert sys2.map_stats() == stats0
    assert m2.imu_initialized
    kfs2 = m2.get_all_keyframes()
    for kf in kfs2:
        np.testing.assert_array_equal(kf.velocity, vel0[kf.id])
        a0, g0 = bias0[kf.id]
        np.testing.assert_array_equal(kf.imu_bias.ba, a0)
        np.testing.assert_array_equal(kf.imu_bias.bg, g0)
    # preintegration objects survive with their measurements
    pre = next(kf.imu_preint for kf in kfs2
               if getattr(kf, "imu_preint", None) is not None)
    assert isinstance(pre, Preintegrated) and pre.dT > 0
