"""Run stereo-fisheye-inertial SLAM on a TUM-VI sequence.

Usage:
  python examples/run_tumvi.py <mav0 dir> <settings.yaml> [voc]
      [--sensor stereo-inertial|stereo] [--pipeline N]

TUM-VI distributes its sequences in the same EuRoC/ASL layout
(dataset-room1_512_16/mav0/{cam0,cam1}/data/*.png + data.csv,
mav0/imu0/data.csv), so the drive loop is shared with run_euroc.py; what
makes a run TUM-VI is the settings file: two KannalaBrandt8 cameras with
Camera.lappingBegin/End overlap areas and IMU.T_b_c1 extrinsics (see the
TUM-VI yaml exercised by
tests/test_platform.py::test_system_from_files_fisheye_inertial).  The
System wires those into the fisheye stereo front-end (overlap kNN matching
+ KB8 triangulation — reference src/Frame.cc:1089-1135) and the inertial
tracker (IMU_STEREO, reference include/System.h:92; the reference's
stereo_inertial_tum_vi example role).

Writes CameraTrajectory.txt and KeyFrameTrajectory.txt (TUM format).
"""

from run_euroc import main as _drive_loop  # same ASL-layout loop


def main(seq_dir: str, settings_path: str, voc_path: str | None = None,
         sensor: str = "stereo-inertial", pipeline: int = 0, batch: int = 0):
    return _drive_loop(seq_dir, settings_path, voc_path, sensor=sensor,
                       pipeline=pipeline, batch=batch)


if __name__ == "__main__":
    import argparse
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    ap = argparse.ArgumentParser(
        description=(
            "TUM-VI sequence driver (reference stereo_inertial_tum_vi "
            "contract): seq_dir holds mav0-style cam0/data, cam1/data, "
            "imu0/data.csv; settings is a KB8 stereo(-inertial) yaml with "
            "lapping areas.  Writes CameraTrajectory.txt and "
            "KeyFrameTrajectory.txt (TUM format)."
        )
    )
    ap.add_argument("seq_dir")
    ap.add_argument("settings")
    ap.add_argument("voc", nargs="?", default=None)
    ap.add_argument("--sensor", default="stereo-inertial",
                    help="stereo-inertial (default) | stereo")
    ap.add_argument("--pipeline", type=int, default=0,
                    help="prefetch depth (0 = synchronous)")
    ap.add_argument("--batch", type=int, default=0,
                    help="batched-throughput mode: B frames per scan-batched dispatch")
    a = ap.parse_args()
    main(a.seq_dir, a.settings, a.voc, sensor=a.sensor,
         pipeline=max(0, a.pipeline), batch=max(0, a.batch))
