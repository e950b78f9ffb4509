"""End-to-end stereo SLAM on a DISTORTED, UNRECTIFIED synthetic rig.

This is the coverage the raw-EuRoC configuration needs: the renderer
produces distorted images from two different cameras with a rotated
baseline; the System must rectify them (Settings::precomputeRectificationMaps
+ System::TrackStereo remap, /root/reference/src/System.cc:253-263) before
the row-constrained stereo matcher sees them.  Also covers a real
EuRoC-format settings file round-trip into a rectified System.
"""

import numpy as np
import pytest

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.frontend.rectify import StereoRectifier
from orbslam3_tpu.oracle.orb_cpu import PyramidParams
from orbslam3_tpu.slam.system import System
from orbslam3_tpu.slam.tracking import TrackingState
from orbslam3_tpu.utils.lie import SE3, so3_exp
from orbslam3_tpu.utils.synth import ate_rmse, stereo_sequence

H, W = 384, 512
BASELINE = 0.12
# two slightly different cameras with EuRoC-scale radial distortion
CAM_L = Pinhole([360.0, 358.0, W / 2 + 4, H / 2 - 3],
                [-0.28, 0.07, 1.9e-4, 1.8e-5])
CAM_R = Pinhole([357.0, 356.0, W / 2 - 5, H / 2 + 2],
                [-0.284, 0.074, -1.0e-4, -3.5e-5])
# right camera: rotated a few milliradians + x-baseline (x_r = T_RL x_l)
T_RL = SE3(so3_exp(np.array([0.004, -0.006, 0.002])),
           np.array([-BASELINE, 0.001, -0.0008]))


@pytest.fixture(scope="module")
def rect_run():
    Tlr = T_RL.inverse()  # reference Stereo.T_c1_c2 convention
    rect = StereoRectifier(CAM_L, CAM_R, Tlr, (W, H))
    frames = stereo_sequence(
        25, CAM_L, BASELINE, H, W, seed=3, camera_r=CAM_R, T_rl=T_RL
    )
    sysm = System(
        rect.camera,
        rect.bf,
        PyramidParams(n_features=900),
        sequential=True,
        max_frames=8,
        rectifier=rect,
    )
    est, gt, states = [], [], []
    for k, (img_l, img_r, tcw_gt) in enumerate(frames):
        pose = sysm.track_stereo(img_l, img_r, timestamp=k / 20.0)
        states.append(sysm.get_tracking_state())
        if pose is not None:
            # pose is in the RECTIFIED cam1 frame: Tcw_rect = R1 * Tcw_raw
            est.append(pose)
            gt.append(SE3(rect.R1, np.zeros(3)) * tcw_gt)
    return sysm, est, gt, states


@pytest.mark.slow
def test_tracks_unrectified_rig(rect_run):
    sysm, est, gt, states = rect_run
    assert len(est) == 25
    assert all(s == TrackingState.OK for s in states)


@pytest.mark.slow
def test_ate_rmse_unrectified_rig(rect_run):
    sysm, est, gt, states = rect_run
    rmse = ate_rmse(est, gt)
    assert rmse < 0.01, f"ATE RMSE {rmse*100:.2f} cm"


@pytest.mark.slow
def test_unrectified_input_fails_without_rectifier():
    """Negative control: the same raw distorted pair fed WITHOUT
    rectification must produce far fewer valid stereo depths (this is what
    made the round-1 EuRoC path silently wrong)."""
    frames = stereo_sequence(
        1, CAM_L, BASELINE, H, W, seed=3, camera_r=CAM_R, T_rl=T_RL
    )
    img_l, img_r, _ = frames[0]
    rect = StereoRectifier(CAM_L, CAM_R, T_RL.inverse(), (W, H))
    sys_raw = System(CAM_L, rect.bf, PyramidParams(n_features=900),
                     sequential=True)
    sys_rect = System(rect.camera, rect.bf, PyramidParams(n_features=900),
                      sequential=True, rectifier=rect)
    feats_raw = sys_raw._extract_stereo(img_l, img_r)
    rl, rr = rect.rectify(img_l, img_r)
    feats_rect = sys_rect._extract_stereo(rl, rr)
    n_raw = int((feats_raw["depth"] > 0).sum())
    n_rect = int((feats_rect["depth"] > 0).sum())
    assert n_rect > 300
    assert n_rect > 1.5 * n_raw


def test_euroc_yaml_roundtrip(tmp_path):
    """A real EuRoC-format settings file builds a rectified System whose
    camera/bf come from the precomputed rectification (Settings.cc:467+)."""
    yaml_text = """%YAML:1.0
---
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: 458.654
Camera1.fy: 457.296
Camera1.cx: 367.215
Camera1.cy: 248.375
Camera1.k1: -0.28340811
Camera1.k2: 0.07395907
Camera1.p1: 0.00019359
Camera1.p2: 1.76187114e-05
Camera2.fx: 457.587
Camera2.fy: 456.134
Camera2.cx: 379.999
Camera2.cy: 255.238
Camera2.k1: -0.28368365
Camera2.k2: 0.07451284
Camera2.p1: -0.00010473
Camera2.p2: -3.55590700e-05
Camera.width: 752
Camera.height: 480
Camera.fps: 20
Camera.RGB: 1
Stereo.ThDepth: 60.0
Stereo.T_c1_c2: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [0.999997256477797,0.002312067192432,0.000376008102320,0.110074137800478,
         -0.002317135723275,0.999898048507103,0.014089835846691,0.000399121547014,
         -0.000343393120620,-0.014090668452683,0.999900662638081,-0.000853702503358,
         0.0,0.0,0.0,1.0]
ORBextractor.nFeatures: 1200
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""
    p = tmp_path / "EuRoC.yaml"
    p.write_text(yaml_text)
    sysm = System.from_files(None, str(p), sensor="stereo")
    # rectified: distortion folded away, common focal ~ (457.296+456.134)/2
    assert sysm.rectifier is not None
    assert sysm.camera.dist is None
    assert abs(sysm.camera.fx - 456.715) < 0.01
    # bf = b * fc_new with b ~ 0.1101 m
    assert abs(sysm.mbf - 0.110078 * 456.715) < 0.5
    assert sysm.tracker.depth_th > 0
    # rectifying rotations are small and orthonormal
    for R in (sysm.rectifier.R1, sysm.rectifier.R2):
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        assert np.arccos((np.trace(R) - 1) / 2) < 0.1


def test_resize_only_path(tmp_path):
    """Camera.newWidth/newHeight without stereo distortion: images resized,
    calibration scaled (Settings.cc:346-375)."""
    yaml_text = """%YAML:1.0
---
Camera.type: "PinHole"
Camera1.fx: 400.0
Camera1.fy: 400.0
Camera1.cx: 256.0
Camera1.cy: 192.0
Camera.width: 512
Camera.height: 384
Camera.newWidth: 256
Camera.newHeight: 192
Camera.fps: 20
Camera.bf: 40.0
"""
    p = tmp_path / "resize.yaml"
    p.write_text(yaml_text)
    sysm = System.from_files(None, str(p), sensor="stereo")
    assert sysm.rectifier is None
    assert sysm.resize_to == (256, 192)
    assert abs(sysm.camera.fx - 200.0) < 1e-9
    assert abs(sysm.camera.cx - 128.0) < 1e-9
    assert abs(sysm.mbf - 20.0) < 1e-9
    img = np.zeros((384, 512), np.uint8)
    out_l, _ = sysm._preprocess_stereo(img, img)
    assert out_l.shape == (192, 256)


def test_tuning_knobs_from_yaml(tmp_path):
    """Tuning.* keys override the deliberate-deviation defaults."""
    from orbslam3_tpu.slam import matchers

    yaml_text = """%YAML:1.0
---
Camera.type: "PinHole"
Camera1.fx: 400.0
Camera1.fy: 400.0
Camera1.cx: 256.0
Camera1.cy: 192.0
Camera.width: 512
Camera.height: 384
Camera.fps: 20
Tuning.matchTh: 100
Tuning.sameOctaveFirst: 0
Tuning.monoInitMinMatches: 100
Tuning.voPointsInFinalVote: 1
"""
    p = tmp_path / "tuned.yaml"
    p.write_text(yaml_text)
    old_th, old_oct = matchers.MATCH_TH, matchers.SAME_OCTAVE_FIRST
    try:
        sysm = System.from_files(None, str(p), sensor="mono")
        assert matchers.MATCH_TH == 100
        assert matchers.SAME_OCTAVE_FIRST is False
        assert sysm.tracker.mono_init_min_matches == 100
        assert sysm.tracker.vo_points_in_final_vote is True
    finally:
        matchers.set_tuning(match_th=old_th, same_octave_first=old_oct)


def test_rectified_inertial_tbc_rotation(tmp_path):
    """IMU_STEREO + rectification: the camera frame rotates by R1, so Tbc
    must follow (Settings.cc:496-501, Tbc_ = Tbc_ * T_r1_u1.inverse())."""
    yaml_text = """%YAML:1.0
---
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: 458.654
Camera1.fy: 457.296
Camera1.cx: 367.215
Camera1.cy: 248.375
Camera1.k1: -0.28340811
Camera1.k2: 0.07395907
Camera1.p1: 0.00019359
Camera1.p2: 1.76187114e-05
Camera2.fx: 457.587
Camera2.fy: 456.134
Camera2.cx: 379.999
Camera2.cy: 255.238
Camera2.k1: -0.28368365
Camera2.k2: 0.07451284
Camera2.p1: -0.00010473
Camera2.p2: -3.55590700e-05
Camera.width: 752
Camera.height: 480
Camera.fps: 20
Stereo.ThDepth: 60.0
Stereo.T_c1_c2: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [0.999997256477797,0.002312067192432,0.000376008102320,0.110074137800478,
         -0.002317135723275,0.999898048507103,0.014089835846691,0.000399121547014,
         -0.000343393120620,-0.014090668452683,0.999900662638081,-0.000853702503358,
         0.0,0.0,0.0,1.0]
IMU.NoiseGyro: 1.7e-4
IMU.NoiseAcc: 2.0e-3
IMU.GyroWalk: 1.9e-5
IMU.AccWalk: 3.0e-3
IMU.Frequency: 200
IMU.T_b_c1: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975,
         0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768,
         -0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949,
         0.0, 0.0, 0.0, 1.0]
"""
    p = tmp_path / "EuRoC_VI.yaml"
    p.write_text(yaml_text)
    sysm = System.from_files(None, str(p), sensor="stereo_inertial")
    assert sysm.rectifier is not None
    # Tbc = Tbc_yaml * SE3(R1, 0)^-1
    from orbslam3_tpu.utils.lie import SE3 as _SE3
    from orbslam3_tpu.utils.settings import load_settings

    st = load_settings(str(p), "stereo_inertial")
    tbc_raw = _SE3.from_matrix(np.asarray(st.Tbc, np.float64))
    expected = tbc_raw * _SE3(sysm.rectifier.R1, np.zeros(3)).inverse()
    np.testing.assert_allclose(sysm.imu_calib.Tbc.R, expected.R, atol=1e-12)
    np.testing.assert_allclose(sysm.imu_calib.Tbc.t, expected.t, atol=1e-12)
    # still orthonormal, translation unchanged (pure rotation update)
    np.testing.assert_allclose(sysm.imu_calib.Tbc.t, tbc_raw.t, atol=1e-12)
