"""Local bundle adjustment over the covisibility window.

Semantics of Optimizer::LocalBundleAdjustment (/root/reference/src/
Optimizer2.cc:350): local KFs = current + its covisibles; local points =
everything they observe; fixed KFs = all other observers of those points;
two-stage optimize with Huber, then erase chi2-outlier observations from
the map.  Built on the vectorized Schur LM in bundle_adjustment.py.
"""

from __future__ import annotations

import numpy as np

from orbslam3_tpu.optim.bundle_adjustment import (
    BAProblem,
    CHI2_MONO,
    CHI2_STEREO,
    bundle_adjust,
)


def local_bundle_adjustment(kf, map_, abort_flag=None, max_fixed: int = 200):
    local_kfs = [kf] + [k for k in kf.get_best_covisibility_keyframes(1000) if not k.bad]
    local_set = set(local_kfs)
    local_mps = []
    mp_seen = set()
    for k in local_kfs:
        for i, mp in k.get_map_point_indices():
            if mp.id not in mp_seen:
                mp_seen.add(mp.id)
                local_mps.append(mp)
    fixed = []
    fixed_set = set()
    for mp in local_mps:
        for k in mp.observations:
            if k not in local_set and k not in fixed_set and not k.bad:
                fixed_set.add(k)
                fixed.append(k)
                if len(fixed) >= max_fixed:
                    break
        if len(fixed) >= max_fixed:
            break
    # gauge: at least one fixed pose (or the oldest local)
    if not fixed and len(local_kfs) > 2:
        fixed = [min(local_kfs, key=lambda k: k.id)]
        fixed_set = set(fixed)
        local_kfs = [k for k in local_kfs if k not in fixed_set]
        local_set = set(local_kfs)

    all_kfs = local_kfs + fixed
    kf_slot = {k: i for i, k in enumerate(all_kfs)}
    mp_slot = {mp.id: j for j, mp in enumerate(local_mps)}

    cam_idx, pt_idx, uv, ur, inv_s2, obs_ref = [], [], [], [], [], []
    for j, mp in enumerate(local_mps):
        for k, (left, right) in mp.observations.items():
            if k.bad or k not in kf_slot:
                continue
            i = left if left >= 0 else right
            if i < 0:
                continue
            cam_idx.append(kf_slot[k])
            pt_idx.append(j)
            uv.append(k.kps_un[i])
            ur.append(k.u_right[i])
            inv_s2.append(k.inv_level_sigma2[k.octave[i]])
            obs_ref.append((k, i, mp))
    if len(cam_idx) < 10 or len(local_kfs) == 0:
        return 0
    fixed_mask = np.zeros(len(all_kfs), bool)
    fixed_mask[len(local_kfs):] = True
    if not fixed_mask.any():
        fixed_mask[0] = True  # gauge freedom

    pr = BAProblem(
        poses=[k.Tcw for k in all_kfs],
        points=np.stack([mp.position for mp in local_mps]),
        cam_idx=np.asarray(cam_idx),
        pt_idx=np.asarray(pt_idx),
        obs_uv=np.asarray(uv, np.float64),
        obs_ur=np.asarray(ur, np.float64),
        inv_sigma2=np.asarray(inv_s2, np.float64),
        fixed_cams=fixed_mask,
        camera=kf.camera,
        mbf=kf.mbf,
    )
    poses, points, chi2 = bundle_adjust(pr, n_iters=5)
    # second stage without outliers
    stereo = pr.obs_ur >= 0
    th = np.where(stereo, CHI2_STEREO, CHI2_MONO)
    active = chi2 <= th
    pr2 = BAProblem(**{**pr.__dict__, "poses": poses, "points": points})
    poses, points, chi2 = bundle_adjust(pr2, n_iters=10, active=active)

    # write back
    for k, p in zip(all_kfs, poses):
        if not pr.fixed_cams[kf_slot[k]]:
            k.set_pose(p)
    for mp, pos in zip(local_mps, points):
        mp.position = pos
    from orbslam3_tpu.slam.map_point import refresh_points

    refresh_points(local_mps, descriptors=False)
    # erase outlier observations
    bad = chi2 > th
    n_erased = 0
    for o in np.nonzero(bad)[0]:
        k, i, mp = obs_ref[o]
        if pr.fixed_cams[kf_slot[k]]:
            continue
        mp.erase_observation(k)
        k.erase_map_point_index(i)
        n_erased += 1
    map_.info_changed()
    return len(local_kfs)
