"""Fisheye (KannalaBrandt8) stereo front-end.

Role-parity with the reference's fisheye stereo pipeline — the Frame
fisheye ctor (/root/reference/src/Frame.cc:1089-1135) and
ComputeStereoFishEyeMatches (:1156-1191): each camera extracts
independently with a lapping area (keypoints inside the overlap are packed
at the tail by the extractor, ORBextractor.cc:1261-1303 / our
split_lapping); overlap descriptors are brute-force kNN-matched (k=2,
ratio 0.7 — the reference uses cv::BFMatcher) and matches are triangulated
with KannalaBrandt8::TriangulateMatches, keeping pairs with positive depth
and bounded reprojection error.

The dual-camera observation model mirrors the reference Frame's
Nleft/Nright layout (/root/reference/include/Frame.h:329-334): the SLAM
frame carries BOTH cameras' keypoints concatenated (left block first),
`left_to_right`/`right_to_left` match indices, and the triangulated
left-camera-frame stereo points (mvStereo3Dpoints role) so right-camera
keypoints are first-class observations — a map point matched in the overlap
is observed at its left index AND at `n_left + right index`, and the right
observations reach pose optimization / BA through the body-frame (Trl)
reprojection residual (the reference's EdgeSE3ProjectXYZ(OnlyPose)ToBody,
include/OptimizableTypes.h:59,117).
"""

from __future__ import annotations

import numpy as np

from orbslam3_tpu import native
from orbslam3_tpu.utils.lie import SE3


def extract_fisheye_pair(img_l, img_r, params, lapping_l, lapping_r, system=None):
    """Device extraction for both fisheye cameras + lapping split.

    Returns (featL, featR) dicts with keys kps/octave/angle/response/desc
    plus `mono_index` — keypoints [mono_index:] lie inside the lapping area.
    """
    import jax

    from orbslam3_tpu.frontend import stereo_frame as sf
    from orbslam3_tpu.ops.extractor import split_lapping

    pair = np.stack([img_l, img_r])
    out = sf.extract_and_match_stereo(pair, params)  # reuse fused extraction
    out = jax.tree.map(np.asarray, out)

    feats = []
    for side, lap in ((out.left, lapping_l), (out.right, lapping_r)):
        d = {k: np.asarray(v) for k, v in side._asdict().items()}
        order, mono_idx = split_lapping(d, lap)
        feats.append(
            dict(
                kps=d["xy"][order],
                octave=d["octave"][order],
                angle=d["angle"][order],
                response=d["response"][order],
                desc=d["desc"][order],
                mono_index=mono_idx,
            )
        )
    return feats[0], feats[1]


def compute_stereo_fisheye_matches(
    feat_l: dict,
    feat_r: dict,
    cam_l,
    cam_r,
    T_lr: SE3,
    level_sigma2: np.ndarray,
    ratio: float = 0.7,
    depth_min: float = 1e-4,
):
    """kNN + ratio matching over the lapping-area descriptors, then KB8
    two-view triangulation (ComputeStereoFishEyeMatches,
    /root/reference/src/Frame.cc:1156-1191).  Returns
    (depth_l (Nl,), l2r (Nl,), r2l (Nr,), p3d_l (Nl, 3)): per-left-keypoint
    depth (<0 unmatched), left<->right match indices (-1 unmatched;
    mvLeftToRightMatch/mvRightToLeftMatch role), and the triangulated point
    in the LEFT camera frame for matched left keypoints (mvStereo3Dpoints
    role; rows for unmatched keypoints are zero)."""
    ml, mr = feat_l["mono_index"], feat_r["mono_index"]
    dl = feat_l["desc"][ml:]
    dr = feat_r["desc"][mr:]
    n_l = len(feat_l["kps"])
    n_r = len(feat_r["kps"])
    depth = np.full(n_l, -1.0)
    l2r = np.full(n_l, -1, np.int64)
    r2l = np.full(n_r, -1, np.int64)
    p3d_l = np.zeros((n_l, 3))
    if len(dl) == 0 or len(dr) == 0:
        return depth, l2r, r2l, p3d_l
    idx, dist = native.hamming_knn(dl, dr, k=2)
    ok = (dist[:, 0] >= 0) & (
        (dist[:, 1] < 0) | (dist[:, 0] < ratio * np.maximum(dist[:, 1], 1))
    )
    cand_l = np.nonzero(ok)[0]
    if len(cand_l) == 0:
        return depth, l2r, r2l, p3d_l
    cand_r = idx[cand_l, 0]
    kp_l = feat_l["kps"][ml:][cand_l]
    kp_r = feat_r["kps"][mr:][cand_r]
    s2_l = level_sigma2[feat_l["octave"][ml:][cand_l]]
    s2_r = level_sigma2[feat_r["octave"][mr:][cand_r]]
    p3d, z = cam_l.triangulate_matches(cam_r, kp_l, kp_r, s2_l, s2_r, T_lr)
    good = z > depth_min
    for k in np.nonzero(good)[0]:
        i_l = ml + int(cand_l[k])
        i_r = mr + int(cand_r[k])
        if r2l[i_r] >= 0:
            continue  # first-come claims the right keypoint
        depth[i_l] = z[k]
        l2r[i_l] = i_r
        r2l[i_r] = i_l
        p3d_l[i_l] = p3d[k]
    return depth, l2r, r2l, p3d_l
