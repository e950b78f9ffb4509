"""Run stereo SLAM on a KITTI odometry sequence directory.

Usage:
  python examples/run_kitti.py <sequence dir> <settings.yaml> [voc]

Expects KITTI odometry layout: image_0/*.png (left), image_1/*.png (right),
times.txt.  Writes CameraTrajectory.txt in the KITTI format (the
reference's stereo_kitti example output — run.sh:5 drives
./Examples/Stereo/stereo_kitti with KITTI03.yaml).

KITTI images are already rectified, so the settings file typically uses
Camera.type "Rectified"/"PinHole" without a second camera; Camera.bf sets
the stereo baseline.
"""

import os
import sys
import time


def main(seq_dir: str, settings_path: str, voc_path: str | None = None):
    import cv2

    from orbslam3_tpu.slam.system import System

    left_dir = os.path.join(seq_dir, "image_0")
    right_dir = os.path.join(seq_dir, "image_1")
    with open(os.path.join(seq_dir, "times.txt")) as f:
        times = [float(t) for t in f.read().split()]
    names = sorted(os.listdir(left_dir))
    print(f"{len(names)} frames")

    slam = System.from_files(voc_path, settings_path, sensor="stereo")
    t_track = []
    for k, name in enumerate(names):
        il = cv2.imread(os.path.join(left_dir, name), cv2.IMREAD_GRAYSCALE)
        ir = cv2.imread(os.path.join(right_dir, name), cv2.IMREAD_GRAYSCALE)
        t0 = time.perf_counter()
        slam.track_stereo(il, ir, times[k])
        t_track.append(time.perf_counter() - t0)
        if k % 100 == 0:
            st = slam.map_stats()
            print(f"frame {k}: {st['n_keyframes']} KFs, "
                  f"{st['n_map_points']} MPs, {t_track[-1]*1e3:.1f} ms")
    slam.shutdown()
    slam.save_trajectory_kitti("CameraTrajectory.txt")
    import numpy as np

    print(f"median track {np.median(t_track)*1e3:.1f} ms; "
          f"wrote CameraTrajectory.txt")
    return slam


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(1)
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
