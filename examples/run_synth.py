"""End-to-end SLAM on a synthetic stereo sequence with exact ground truth.

Usage: python examples/run_synth.py [n_frames] [h] [w]
Prints per-frame tracking state and final ATE RMSE.
"""

import sys
import time

import numpy as np

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.oracle.orb_cpu import PyramidParams
from orbslam3_tpu.slam.system import System
from orbslam3_tpu.slam.tracking import TrackingState
from orbslam3_tpu.utils.synth import stereo_sequence, ate_rmse


def main(n_frames=40, h=384, w=512):
    fx = 350.0
    camera = Pinhole([fx, fx, w / 2, h / 2])
    baseline = 0.12
    mbf = fx * baseline
    params = PyramidParams(n_features=900)

    print(f"rendering {n_frames} synthetic frames ({h}x{w})...")
    frames = stereo_sequence(n_frames, camera, baseline, h, w, seed=1)

    sysm = System(camera, mbf, params, sequential=True)
    est, gt = [], []
    t_start = time.time()
    for k, (img_l, img_r, tcw_gt) in enumerate(frames):
        t0 = time.time()
        pose = sysm.track_stereo(img_l, img_r, timestamp=k / 20.0)
        dt = (time.time() - t0) * 1e3
        st = sysm.get_tracking_state().name
        stats = sysm.map_stats()
        if pose is not None:
            est.append(pose)
            gt.append(tcw_gt)
        print(
            f"frame {k:3d}: {st:15s} pose={'ok' if pose is not None else '--'} "
            f"inliers={sysm.tracker.matches_inliers:4d} "
            f"KFs={stats['n_keyframes']:3d} MPs={stats['n_map_points']:5d} {dt:6.1f} ms"
        )
    sysm.shutdown()
    print(f"total {time.time()-t_start:.1f}s")
    if len(est) > 5:
        rmse = ate_rmse(est, gt)
        dist = np.linalg.norm(np.diff(np.stack([t.inverse().t for t in gt]), axis=0), axis=1).sum()
        print(f"ATE RMSE: {rmse*100:.2f} cm over {dist:.2f} m trajectory, {len(est)} poses")
    else:
        print("TRACKING FAILED")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
