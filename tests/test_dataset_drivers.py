"""Drive examples/run_euroc.py on a fabricated EuRoC ASL directory.

Closes the "the EuRoC configuration was never actually driven end-to-end"
gap: a distorted, unrectified synthetic stereo rig is written to disk in
the exact mav0/ layout (cam0/data/*.png + data.csv), a matching
EuRoC-format YAML is generated from the rig calibration, and the real
dataset driver (file IO, timestamps, Settings-driven rectification,
trajectory artifacts) runs the full SLAM loop on it.
"""

import csv
import os
import sys

import numpy as np
import pytest

from orbslam3_tpu.utils.lie import SE3
from orbslam3_tpu.utils.synth import ate_rmse, stereo_sequence
from orbslam3_tpu.utils.trajectory import quat_to_rot

from test_rectified_slam import BASELINE, CAM_L, CAM_R, H, T_RL, W

N_FRAMES = 14


def _write_euroc_tree(root, frames):
    import cv2

    for cam in ("cam0", "cam1"):
        os.makedirs(os.path.join(root, cam, "data"))
    rows = []
    for k, (img_l, img_r, _) in enumerate(frames):
        ns = int((1403636579 + k / 20.0) * 1e9)
        name = f"{ns}.png"
        cv2.imwrite(os.path.join(root, "cam0", "data", name), img_l)
        cv2.imwrite(os.path.join(root, "cam1", "data", name), img_r)
        rows.append((ns, name))
    for cam in ("cam0", "cam1"):
        with open(os.path.join(root, cam, "data.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["#timestamp [ns]", "filename"])
            w.writerows(rows)


def _euroc_yaml(path):
    tlr = T_RL.inverse()  # Stereo.T_c1_c2 = T_c1_c2 (left <- right)
    m = np.eye(4)
    m[:3, :3] = tlr.R
    m[:3, 3] = tlr.t
    data = ",".join(f"{v:.12f}" for v in m.reshape(-1))
    k_l = CAM_L.dist.tolist() + [0.0] * (4 - len(CAM_L.dist))
    k_r = CAM_R.dist.tolist() + [0.0] * (4 - len(CAM_R.dist))
    text = f"""%YAML:1.0
---
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: {CAM_L.fx}
Camera1.fy: {CAM_L.fy}
Camera1.cx: {CAM_L.cx}
Camera1.cy: {CAM_L.cy}
Camera1.k1: {k_l[0]}
Camera1.k2: {k_l[1]}
Camera1.p1: {k_l[2]}
Camera1.p2: {k_l[3]}
Camera2.fx: {CAM_R.fx}
Camera2.fy: {CAM_R.fy}
Camera2.cx: {CAM_R.cx}
Camera2.cy: {CAM_R.cy}
Camera2.k1: {k_r[0]}
Camera2.k2: {k_r[1]}
Camera2.p1: {k_r[2]}
Camera2.p2: {k_r[3]}
Camera.width: {W}
Camera.height: {H}
Camera.fps: 20
Camera.RGB: 1
Stereo.ThDepth: 60.0
Stereo.T_c1_c2: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [{data}]
ORBextractor.nFeatures: 900
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""
    with open(path, "w") as f:
        f.write(text)


@pytest.mark.slow
@pytest.mark.parametrize("pipeline,batch", [(0, 0), (2, 0), (0, 4)])
def test_run_euroc_driver(tmp_path, monkeypatch, pipeline, batch):
    """pipeline=0: the reference stereo_euroc synchronous contract;
    pipeline=2: the prefetch-overlap path; batch=4: the scan-batched
    batched-throughput path — same outputs, same ATE gate for all."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import run_euroc

    frames = stereo_sequence(
        N_FRAMES, CAM_L, BASELINE, H, W, seed=3, camera_r=CAM_R, T_rl=T_RL
    )
    seq = str(tmp_path / "mav0")
    _write_euroc_tree(seq, frames)
    yaml_path = str(tmp_path / "EuRoC.yaml")
    _euroc_yaml(yaml_path)

    monkeypatch.chdir(tmp_path)
    slam = run_euroc.main(seq, yaml_path, None, "stereo",
                          pipeline=pipeline, batch=batch)

    traj = os.path.join(str(tmp_path), "CameraTrajectory.txt")
    kf_traj = os.path.join(str(tmp_path), "KeyFrameTrajectory.txt")
    assert os.path.exists(traj) and os.path.exists(kf_traj)
    lines = [l.split() for l in open(traj) if l.strip()]
    assert len(lines) == N_FRAMES
    assert len([l for l in open(kf_traj) if l.strip()]) >= 2

    # ATE of the written trajectory vs the rig's ground truth (poses are in
    # the rectified cam1 frame: Tcw_rect = R1 * Tcw_raw)
    r1 = SE3(slam.rectifier.R1, np.zeros(3))
    est, gt = [], []
    for row, (_, _, tcw_gt) in zip(lines, frames):
        t = np.array([float(v) for v in row[1:4]])
        q = np.array([float(v) for v in row[4:8]])  # qx qy qz qw
        twc = SE3(quat_to_rot(q), t)
        est.append(twc.inverse())
        gt.append(r1 * tcw_gt)
    rmse = ate_rmse(est, gt)
    assert rmse < 0.02, f"ATE RMSE {rmse*100:.2f} cm through the file driver"


_TBC = SE3(
    quat_to_rot(np.array([0.0071, -0.0041, 0.7071, 0.7071])),
    np.array([-0.0216, -0.0647, 0.0098]),
)  # EuRoC-like camera-in-body extrinsics (x_b = Tbc x_c)


@pytest.mark.slow
def test_run_euroc_stereo_inertial_driver(tmp_path, monkeypatch):
    """Stereo-inertial through the file driver: imu0/data.csv parsing, the
    per-frame (prev, t] sample windowing, and preintegration attachment."""
    from orbslam3_tpu.utils.synth import imu_samples_between

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import run_euroc

    frames = stereo_sequence(
        16, CAM_L, BASELINE, H, W, seed=3, camera_r=CAM_R, T_rl=T_RL
    )
    seq = str(tmp_path / "mav0")
    _write_euroc_tree(seq, frames)
    t0_ns = int(1403636579 * 1e9)
    os.makedirs(os.path.join(seq, "imu0"))
    with open(os.path.join(seq, "imu0", "data.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["#timestamp [ns]", "w_RS_S_x", "w_RS_S_y", "w_RS_S_z",
                    "a_RS_S_x", "a_RS_S_y", "a_RS_S_z"])
        for k in range(15):
            acc, gyro, dts = imu_samples_between(k, k + 1, Tbc=_TBC)
            t = t0_ns + int(k / 20.0 * 1e9)
            for a, g, dt in zip(acc, gyro, dts):
                t += int(dt * 1e9)
                w.writerow([t, *g, *a])

    yaml_path = str(tmp_path / "EuRoC_VI.yaml")
    _euroc_yaml(yaml_path)
    tbc = np.eye(4)
    tbc[:3, :3] = _TBC.R
    tbc[:3, 3] = _TBC.t
    tbc_data = ",".join(f"{v:.12f}" for v in tbc.reshape(-1))
    with open(yaml_path, "a") as f:
        f.write(f"""IMU.NoiseGyro: 1.7e-4
IMU.NoiseAcc: 2.0e-3
IMU.GyroWalk: 1.9e-5
IMU.AccWalk: 3.0e-3
IMU.Frequency: 200
IMU.T_b_c1: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [{tbc_data}]
""")
    monkeypatch.chdir(tmp_path)
    slam = run_euroc.main(seq, yaml_path, None, "stereo-inertial")
    lines = [l for l in open(tmp_path / "CameraTrajectory.txt") if l.strip()]
    assert len(lines) == 16
    # IMU flowed: the last keyframe carries a preintegration spanning > 0 s
    kf = slam.tracker.last_kf
    assert kf is not None and kf.imu_preint is not None
    assert kf.imu_preint.dT > 0.01


@pytest.mark.slow
def test_run_kitti_driver(tmp_path, monkeypatch):
    """KITTI layout: rectified stereo, image_0/image_1 + times.txt, KITTI
    trajectory format out."""
    import cv2

    from orbslam3_tpu.cameras.models import Pinhole

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import run_kitti

    cam = Pinhole([350.0, 350.0, W / 2, H / 2])
    frames = stereo_sequence(N_FRAMES, cam, BASELINE, H, W, seed=5)
    for sub in ("image_0", "image_1"):
        os.makedirs(tmp_path / "seq" / sub)
    for k, (il, ir, _) in enumerate(frames):
        cv2.imwrite(str(tmp_path / "seq" / "image_0" / f"{k:06d}.png"), il)
        cv2.imwrite(str(tmp_path / "seq" / "image_1" / f"{k:06d}.png"), ir)
    (tmp_path / "seq" / "times.txt").write_text(
        "".join(f"{k/10.0:.6f}\n" for k in range(N_FRAMES))
    )
    (tmp_path / "KITTI.yaml").write_text(f"""%YAML:1.0
---
File.version: "1.0"
Camera.type: "Rectified"
Camera1.fx: {cam.fx}
Camera1.fy: {cam.fy}
Camera1.cx: {cam.cx}
Camera1.cy: {cam.cy}
Camera.width: {W}
Camera.height: {H}
Camera.fps: 10
Camera.bf: {BASELINE * cam.fx}
Stereo.ThDepth: 40.0
ORBextractor.nFeatures: 900
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
""")
    monkeypatch.chdir(tmp_path)
    run_kitti.main(str(tmp_path / "seq"), str(tmp_path / "KITTI.yaml"))
    lines = [l.split() for l in open(tmp_path / "CameraTrajectory.txt") if l.strip()]
    assert len(lines) == N_FRAMES
    # KITTI format: 12 floats = 3x4 [R|t] of Twc; endpoints near GT
    est, gt = [], []
    for row, (_, _, tcw_gt) in zip(lines, frames):
        m = np.array([float(v) for v in row]).reshape(3, 4)
        est.append(SE3(m[:, :3], m[:, 3]).inverse())
        gt.append(tcw_gt)
    rmse = ate_rmse(est, gt)
    assert rmse < 0.02, f"KITTI-driver ATE RMSE {rmse*100:.2f} cm"


@pytest.mark.slow
def test_run_tum_rgbd_driver(tmp_path, monkeypatch):
    """TUM-RGBD layout: rgb/ + 16-bit depth/ (5000 units/m) + associations."""
    import cv2

    from orbslam3_tpu.cameras.models import Pinhole
    from orbslam3_tpu.utils.synth import rgbd_sequence

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import run_tum_rgbd

    cam = Pinhole([350.0, 350.0, W / 2, H / 2])
    frames = rgbd_sequence(N_FRAMES, cam, H, W, seed=7, depth_factor=5000.0)
    os.makedirs(tmp_path / "seq" / "rgb")
    os.makedirs(tmp_path / "seq" / "depth")
    assoc = []
    for k, (img, depth, _) in enumerate(frames):
        ts = 1305031100.0 + k / 20.0
        cv2.imwrite(str(tmp_path / "seq" / "rgb" / f"{ts:.6f}.png"), img)
        cv2.imwrite(
            str(tmp_path / "seq" / "depth" / f"{ts:.6f}.png"),
            np.clip(depth, 0, 65535).astype(np.uint16),
        )
        assoc.append(
            f"{ts:.6f} rgb/{ts:.6f}.png {ts:.6f} depth/{ts:.6f}.png"
        )
    (tmp_path / "seq" / "associations.txt").write_text("\n".join(assoc) + "\n")
    (tmp_path / "TUM.yaml").write_text(f"""%YAML:1.0
---
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: {cam.fx}
Camera1.fy: {cam.fy}
Camera1.cx: {cam.cx}
Camera1.cy: {cam.cy}
Camera.width: {W}
Camera.height: {H}
Camera.fps: 20
Camera.bf: {BASELINE * cam.fx}
Stereo.ThDepth: 40.0
RGBD.DepthMapFactor: 5000.0
ORBextractor.nFeatures: 900
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
""")
    monkeypatch.chdir(tmp_path)
    run_tum_rgbd.main(str(tmp_path / "seq"), str(tmp_path / "TUM.yaml"))
    lines = [l.split() for l in open(tmp_path / "CameraTrajectory.txt") if l.strip()]
    assert len(lines) == N_FRAMES
    est, gt = [], []
    for row, (_, _, tcw_gt) in zip(lines, frames):
        t = np.array([float(v) for v in row[1:4]])
        q = np.array([float(v) for v in row[4:8]])
        est.append(SE3(quat_to_rot(q), t).inverse())
        gt.append(tcw_gt)
    rmse = ate_rmse(est, gt)
    assert rmse < 0.02, f"TUM-RGBD-driver ATE RMSE {rmse*100:.2f} cm"


@pytest.mark.slow
def test_run_tumvi_driver(tmp_path, monkeypatch):
    """examples/run_tumvi.py: TUM-VI ASL layout + KB8 stereo-inertial yaml
    through the file driver — fisheye cameras, lapping areas, IMU csv
    windowing, and trajectory artifacts (reference stereo_inertial_tum_vi
    example role)."""
    from orbslam3_tpu.cameras.models import KannalaBrandt8
    from orbslam3_tpu.utils.synth import imu_samples_between
    from test_tumvi_inertial import (
        BASELINE as KB_BASELINE, H as KH, TBC, W as KW, _pose, _world,
    )
    from orbslam3_tpu.utils.synth import render_world

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import run_tumvi

    cam = KannalaBrandt8(
        [160.0, 160.0, KW / 2, KH / 2, 0.0035, 0.0008, -0.0034, 0.0006]
    )
    walls = _world()
    t_rl = SE3(np.eye(3), np.array([-KB_BASELINE, 0.0, 0.0]))
    n = 16
    frames = []
    for k in range(n):
        tcw = _pose(k).inverse()
        frames.append((
            render_world(walls, cam, tcw, KH, KW),
            render_world(walls, cam, t_rl * tcw, KH, KW),
            tcw,
        ))
    seq = str(tmp_path / "mav0")
    _write_euroc_tree(seq, frames)  # TUM-VI ships the same ASL layout
    t0_ns = int(1403636579 * 1e9)
    os.makedirs(os.path.join(seq, "imu0"))
    with open(os.path.join(seq, "imu0", "data.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["#timestamp [ns]", "w_x", "w_y", "w_z", "a_x", "a_y", "a_z"])
        for k in range(n - 1):
            acc, gyro, dts = imu_samples_between(k, k + 1, Tbc=TBC, pose_fn=_pose)
            t = t0_ns + int(k / 20.0 * 1e9)
            for a, g, dt in zip(acc, gyro, dts):
                t += int(dt * 1e9)
                w.writerow([t, *g, *a])

    tbc = np.eye(4)
    tbc[:3, :3] = TBC.R
    tbc[:3, 3] = TBC.t
    tbc_data = ",".join(f"{v:.12f}" for v in tbc.reshape(-1))
    (tmp_path / "TUMVI.yaml").write_text(f"""%YAML:1.0
---
File.version: "1.0"
Camera.type: "KannalaBrandt8"
Camera1.fx: 160.0
Camera1.fy: 160.0
Camera1.cx: {KW / 2}
Camera1.cy: {KH / 2}
Camera1.k1: 0.0035
Camera1.k2: 0.0008
Camera1.k3: -0.0034
Camera1.k4: 0.0006
Camera1.overlappingBegin: 0
Camera1.overlappingEnd: {KW}
Camera2.fx: 160.0
Camera2.fy: 160.0
Camera2.cx: {KW / 2}
Camera2.cy: {KH / 2}
Camera2.k1: 0.0035
Camera2.k2: 0.0008
Camera2.k3: -0.0034
Camera2.k4: 0.0006
Camera2.overlappingBegin: 0
Camera2.overlappingEnd: {KW}
Camera.width: {KW}
Camera.height: {KH}
Camera.fps: 20
Camera.RGB: 1
Stereo.ThDepth: 40.0
Stereo.T_c1_c2: !!opencv-matrix
   rows: 4
   cols: 4
   dt: f
   data: [1.0,0.0,0.0,{KB_BASELINE},0.0,1.0,0.0,0.0,0.0,0.0,1.0,0.0,0.0,0.0,0.0,1.0]
Stereo.b: {KB_BASELINE}
IMU.NoiseGyro: 1.0e-4
IMU.NoiseAcc: 1.0e-3
IMU.GyroWalk: 1.0e-6
IMU.AccWalk: 1.0e-5
IMU.Frequency: 200.0
IMU.T_b_c1: !!opencv-matrix
   rows: 4
   cols: 4
   dt: f
   data: [{tbc_data}]
ORBextractor.nFeatures: 700
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
""")
    monkeypatch.chdir(tmp_path)
    slam = run_tumvi.main(seq, str(tmp_path / "TUMVI.yaml"))
    assert isinstance(slam.camera, KannalaBrandt8)
    assert isinstance(slam.camera2, KannalaBrandt8)
    lines = [l.split() for l in open(tmp_path / "CameraTrajectory.txt") if l.strip()]
    assert len(lines) == n
    assert len([l for l in open(tmp_path / "KeyFrameTrajectory.txt") if l.strip()]) >= 2
    # IMU flowed through the csv windowing into preintegration
    kf = slam.tracker.last_kf
    assert kf is not None and kf.imu_preint is not None
    assert kf.imu_preint.dT > 0.01
    # trajectory sane vs ground truth
    est, gt = [], []
    for row, (_, _, tcw_gt) in zip(lines, frames):
        t = np.array([float(v) for v in row[1:4]])
        q = np.array([float(v) for v in row[4:8]])
        est.append(SE3(quat_to_rot(q), t).inverse())
        gt.append(tcw_gt)
    rmse = ate_rmse(est, gt)
    assert rmse < 0.02, f"TUM-VI-driver ATE RMSE {rmse*100:.2f} cm"
