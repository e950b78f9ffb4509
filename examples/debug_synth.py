"""Bisect SLAM pipeline stages on the synthetic sequence.

Env toggles: NOBA=1 disable local BA, NOFUSE=1 disable fuse,
NOCULL=1 disable culling, NOTRI=1 disable triangulation.
Prints per-frame pose error vs ground truth.
"""

import os
import sys

import numpy as np

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.oracle.orb_cpu import PyramidParams
from orbslam3_tpu.slam.system import System
from orbslam3_tpu.slam import local_mapping as lm_mod
from orbslam3_tpu.utils.synth import stereo_sequence, ate_rmse

if os.environ.get("NOBA"):
    lm_mod.local_bundle_adjustment = lambda kf, m, **kw: 0
if os.environ.get("NOFUSE"):
    lm_mod.LocalMapping._search_in_neighbors = lambda self, kf: None
if os.environ.get("NOCULL"):
    lm_mod.LocalMapping._cull_keyframes = lambda self, kf: None
    lm_mod.LocalMapping._cull_map_points = lambda self, kf: None
if os.environ.get("NOTRI"):
    lm_mod.LocalMapping._create_new_map_points = lambda self, kf: 0


def main(n_frames=45, h=384, w=512):
    fx = 350.0
    camera = Pinhole([fx, fx, w / 2, h / 2])
    baseline = 0.12
    mbf = fx * baseline
    params = PyramidParams(n_features=900)
    frames = stereo_sequence(n_frames, camera, baseline, h, w, seed=1)
    sysm = System(camera, mbf, params, sequential=True)
    est, gt = [], []
    for k, (img_l, img_r, tcw_gt) in enumerate(frames):
        pose = sysm.track_stereo(img_l, img_r, timestamp=k / 20.0)
        stats = sysm.map_stats()
        if pose is not None:
            err = (pose * tcw_gt.inverse()).log()
            est.append(pose)
            gt.append(tcw_gt)
            msg = f"terr={np.linalg.norm(err[:3])*100:6.2f}cm rerr={np.linalg.norm(err[3:]):.4f}"
        else:
            msg = "LOST"
        print(
            f"f{k:3d} {sysm.get_tracking_state().name:14s} "
            f"in={sysm.tracker.matches_inliers:4d} KF={stats['n_keyframes']:3d} "
            f"MP={stats['n_map_points']:5d} {msg}"
        )
    if len(est) > 5:
        print(f"ATE {ate_rmse(est, gt)*100:.2f} cm, {len(est)}/{n_frames} tracked")


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])

# appended: KFEVERY=n forces a keyframe every n frames (hypothesis test)
