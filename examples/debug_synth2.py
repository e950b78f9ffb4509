"""Deep instrumentation of the tracking collapse around KF creation."""

import numpy as np

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.oracle.orb_cpu import PyramidParams
from orbslam3_tpu.slam.system import System
from orbslam3_tpu.slam.tracking import Tracking
from orbslam3_tpu.utils.synth import stereo_sequence

fx = 350.0
h, w = 384, 512
camera = Pinhole([fx, fx, w / 2, h / 2])
baseline = 0.12
mbf = fx * baseline
params = PyramidParams(n_features=900)
frames = stereo_sequence(44, camera, baseline, h, w, seed=1)
sysm = System(camera, mbf, params, sequential=True)

gt_by_id = {}

orig_opt = Tracking._optimize_current_pose
def opt_wrap(self):
    n = orig_opt(self)
    f = self.current
    if f.id in gt_by_id and f.Tcw is not None:
        e = (f.Tcw * gt_by_id[f.id].inverse()).log()
        nmp = sum(1 for mp in f.map_points if mp is not None)
        print(f"   poseopt: in={n} assoc={nmp} terr={np.linalg.norm(e[:3])*100:.2f}cm")
    return n
Tracking._optimize_current_pose = opt_wrap

orig_kf = Tracking._create_new_keyframe
def kf_wrap(self):
    print(f"   >> new KF at frame {self.current.id}")
    return orig_kf(self)
Tracking._create_new_keyframe = kf_wrap

orig_mm = Tracking._track_with_motion_model
def mm_wrap(self):
    ok = orig_mm(self)
    print(f"   motion-model: {'ok' if ok else 'FAIL'}")
    return ok
Tracking._track_with_motion_model = mm_wrap

for k, (img_l, img_r, tcw_gt) in enumerate(frames):
    feats = sysm._extract_stereo(img_l, img_r)
    from orbslam3_tpu.slam.frame import Frame
    frame = Frame(
        kps=feats["kps"], octave=feats["octave"], angle=feats["angle"],
        response=feats["response"], desc=feats["desc"], camera=camera,
        scale_factors=sysm.scale_factors, timestamp=k / 20.0,
        u_right=feats["u_right"], depth=feats["depth"], mbf=mbf,
    )
    frame.set_image_bounds(0, 0, w, h)
    frame.feat_vec = None
    gt_by_id[frame.id] = tcw_gt
    if 28 <= k <= 40:
        print(f"frame {k} (id {frame.id}):")
    pose = sysm.tracker.track_frame(frame)
    if 28 <= k <= 40:
        st = sysm.get_tracking_state().name
        terr = np.linalg.norm((pose * tcw_gt.inverse()).log()[:3]) * 100 if pose is not None else -1
        # depth sanity of current frame's stereo
        d = frame.depth[frame.depth > 0]
        print(f"   => {st} in={sysm.tracker.matches_inliers} terr={terr:.2f}cm "
              f"depths median={np.median(d):.2f} n={len(d)}")
