"""Run stereo SLAM on a EuRoC-format sequence directory.

Usage:
  python examples/run_euroc.py <mav0 dir> <settings.yaml> [voc.npz|ORBvoc.txt]

Expects EuRoC ASL layout: mav0/cam0/data/*.png, mav0/cam1/data/*.png,
mav0/cam0/data.csv for timestamps.  Writes CameraTrajectory.txt (TUM) and
KeyFrameTrajectory.txt (the reference's output artifacts).

No dataset ships in this container — this is the integration entry point
for running on real data (the drive loop mirrors the reference's
stereo_euroc example described in SURVEY.md §1 L7).
"""

import csv
import os
import sys
import time


def load_timestamps(cam_dir: str):
    rows = []
    with open(os.path.join(cam_dir, "data.csv")) as f:
        for row in csv.reader(f):
            if row and not row[0].startswith("#"):
                rows.append((int(row[0]), row[1].strip()))
    return rows


def main(seq_dir: str, settings_path: str, voc_path: str | None = None):
    import cv2

    from orbslam3_tpu.slam.system import System

    cam0 = os.path.join(seq_dir, "cam0")
    cam1 = os.path.join(seq_dir, "cam1")
    stamps = load_timestamps(cam0)
    print(f"{len(stamps)} frames")

    slam = System.from_files(voc_path, settings_path, sensor="stereo")
    t_start = time.time()
    for k, (ns, fname) in enumerate(stamps):
        img_l = cv2.imread(os.path.join(cam0, "data", fname), cv2.IMREAD_GRAYSCALE)
        img_r = cv2.imread(os.path.join(cam1, "data", fname), cv2.IMREAD_GRAYSCALE)
        if img_l is None or img_r is None:
            continue
        slam.track_stereo(img_l, img_r, ns * 1e-9)
        if k % 50 == 0:
            st = slam.map_stats()
            print(
                f"frame {k}: {slam.get_tracking_state().name} "
                f"KFs={st['n_keyframes']} MPs={st['n_map_points']}"
            )
    dt = time.time() - t_start
    print(f"{len(stamps)} frames in {dt:.1f}s ({len(stamps)/dt:.1f} fps)")
    slam.save_trajectory_tum("CameraTrajectory.txt")
    slam.save_keyframe_trajectory_tum("KeyFrameTrajectory.txt")
    slam.shutdown()


if __name__ == "__main__":
    main(*sys.argv[1:])
