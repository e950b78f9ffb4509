"""Run RGB-D SLAM on a TUM-RGBD sequence directory.

Usage:
  python examples/run_tum_rgbd.py <sequence dir> <settings.yaml> [voc] [assoc]

Expects TUM layout: rgb/*.png, depth/*.png (16-bit, 5000 units/m unless
RGBD.DepthMapFactor says otherwise), and an associations file (default
associations.txt: `t_rgb rgb/... t_depth depth/...` per line; generate with
the TUM associate.py tool).  Writes CameraTrajectory.txt (TUM format) —
the reference's rgbd_tum example contract.
"""

import os
import sys
import time


def load_associations(path: str):
    pairs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            t_rgb, rgb, _t_d, depth = line.split()[:4]
            pairs.append((float(t_rgb), rgb, depth))
    return pairs


def main(seq_dir: str, settings_path: str, voc_path: str | None = None,
         assoc: str | None = None):
    import cv2

    from orbslam3_tpu.slam.system import System

    assoc = assoc or os.path.join(seq_dir, "associations.txt")
    pairs = load_associations(assoc)
    print(f"{len(pairs)} associated frames")

    slam = System.from_files(voc_path, settings_path, sensor=System.RGBD)
    t_track = []
    for k, (ts, rgb_rel, depth_rel) in enumerate(pairs):
        img = cv2.imread(os.path.join(seq_dir, rgb_rel), cv2.IMREAD_GRAYSCALE)
        depth = cv2.imread(os.path.join(seq_dir, depth_rel), cv2.IMREAD_UNCHANGED)
        t0 = time.perf_counter()
        slam.track_rgbd(img, depth, ts)
        t_track.append(time.perf_counter() - t0)
        if k % 100 == 0:
            st = slam.map_stats()
            print(f"frame {k}: {st['n_keyframes']} KFs, "
                  f"{st['n_map_points']} MPs, {t_track[-1]*1e3:.1f} ms")
    slam.shutdown()
    slam.save_trajectory_tum("CameraTrajectory.txt")
    import numpy as np

    print(f"median track {np.median(t_track)*1e3:.1f} ms; "
          f"wrote CameraTrajectory.txt")
    return slam


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(1)
    main(sys.argv[1], sys.argv[2],
         sys.argv[3] if len(sys.argv) > 3 else None,
         sys.argv[4] if len(sys.argv) > 4 else None)
