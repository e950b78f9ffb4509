"""Run stereo or stereo-inertial SLAM on a EuRoC-format sequence directory.

Usage:
  python examples/run_euroc.py <mav0 dir> <settings.yaml> [voc] [sensor]

  sensor: stereo (default) | stereo-inertial

Expects EuRoC ASL layout: mav0/cam0/data/*.png, mav0/cam1/data/*.png,
mav0/cam0/data.csv for timestamps, mav0/imu0/data.csv for IMU
(timestamp[ns], wx, wy, wz, ax, ay, az).  Writes CameraTrajectory.txt (TUM)
and KeyFrameTrajectory.txt (the reference's output artifacts).

No dataset ships in this container — this is the integration entry point
for running on real data (the drive loop mirrors the reference's
stereo_euroc / stereo_inertial_euroc examples described in SURVEY.md §1 L7).
"""

import csv
import os
import sys
import time

import numpy as np


def load_timestamps(cam_dir: str):
    rows = []
    with open(os.path.join(cam_dir, "data.csv")) as f:
        for row in csv.reader(f):
            if row and not row[0].startswith("#"):
                rows.append((int(row[0]), row[1].strip()))
    return rows


def load_imu(imu_dir: str):
    """(t_ns (N,), gyro (N,3), acc (N,3)) from EuRoC imu0/data.csv."""
    ts, gyro, acc = [], [], []
    with open(os.path.join(imu_dir, "data.csv")) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            ts.append(int(row[0]))
            gyro.append([float(x) for x in row[1:4]])
            acc.append([float(x) for x in row[4:7]])
    return np.asarray(ts), np.asarray(gyro), np.asarray(acc)


def main(seq_dir: str, settings_path: str, voc_path: str | None = None,
         sensor: str = "stereo"):
    import cv2

    from orbslam3_tpu.slam.system import System

    cam0 = os.path.join(seq_dir, "cam0")
    cam1 = os.path.join(seq_dir, "cam1")
    stamps = load_timestamps(cam0)
    print(f"{len(stamps)} frames")

    inertial = "inertial" in sensor or "imu" in sensor
    imu_ts = imu_gyro = imu_acc = None
    if inertial:
        imu_ts, imu_gyro, imu_acc = load_imu(os.path.join(seq_dir, "imu0"))
        print(f"{len(imu_ts)} IMU samples")

    slam = System.from_files(voc_path, settings_path, sensor=sensor)
    t_start = time.time()
    prev_ns = None
    for k, (ns, fname) in enumerate(stamps):
        img_l = cv2.imread(os.path.join(cam0, "data", fname), cv2.IMREAD_GRAYSCALE)
        img_r = cv2.imread(os.path.join(cam1, "data", fname), cv2.IMREAD_GRAYSCALE)
        if img_l is None or img_r is None:
            continue
        imu = None
        if inertial and prev_ns is not None:
            sel = (imu_ts > prev_ns) & (imu_ts <= ns)
            if sel.any():
                tsel = imu_ts[sel]
                dts = np.diff(np.concatenate([[prev_ns], tsel])) * 1e-9
                imu = (imu_acc[sel], imu_gyro[sel], dts)
        slam.track_stereo(img_l, img_r, ns * 1e-9, imu=imu)
        prev_ns = ns
        if k % 50 == 0:
            st = slam.map_stats()
            m = slam.atlas.get_current_map()
            extra = " VI" if getattr(m, "imu_initialized", False) else ""
            print(
                f"frame {k}: {slam.get_tracking_state().name}{extra} "
                f"KFs={st['n_keyframes']} MPs={st['n_map_points']}"
            )
    dt = time.time() - t_start
    print(f"{len(stamps)} frames in {dt:.1f}s ({len(stamps)/dt:.1f} fps)")
    slam.save_trajectory_tum("CameraTrajectory.txt")
    slam.save_keyframe_trajectory_tum("KeyFrameTrajectory.txt")
    slam.shutdown()
    return slam


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(
            "usage: run_euroc.py <seq_dir> <settings.yaml> [--imu] [--max-frames N]\n"
            "  seq_dir: EuRoC sequence root (mav0/cam0/data, mav0/cam1/data,\n"
            "  mav0/imu0/data.csv).  Writes CameraTrajectory.txt and\n"
            "  KeyFrameTrajectory.txt (TUM format) — the reference's\n"
            "  stereo_euroc / stereo_inertial_euroc example contract."
        )
        sys.exit(2)
    main(*sys.argv[1:])
