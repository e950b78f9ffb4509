"""Parity of the vectorized triangulation candidate ladder vs a scalar
oracle transcribing the reference's per-pair control flow
(/root/reference/src/LocalMapping.cc:461-584).

`triangulation_gates` replaced the per-pair Python loop in
LocalMapping._create_new_map_points; this pins its branch semantics
(DLT vs stereo-unproject source select, cheirality, per-view chi2 with
the stereo/mono threshold split, scale consistency) against keyframes
produced by a real fabricated tracking run — including pairs that FAIL
each gate.
"""

import numpy as np

from orbslam3_tpu.optim.triangulate import triangulate_linear
from orbslam3_tpu.slam import matchers
from orbslam3_tpu.slam.local_mapping import triangulation_gates


def _scalar_oracle(kf, kf2, pairs):
    """The pre-vectorization per-pair ladder, kept verbatim as oracle."""
    T1, T2 = kf.Tcw, kf2.Tcw
    ow1, ow2 = kf.camera_center(), kf2.camera_center()
    keep, pws = [], []
    for i1, i2 in pairs:
        b1 = kf.camera.unproject(kf.kps_un[i1 : i1 + 1])[0]
        b2 = kf2.camera.unproject(kf2.kps_un[i2 : i2 + 1])[0]
        r1 = T1.R.T @ b1
        r2 = T2.R.T @ b2
        cos_par = r1 @ r2 / (np.linalg.norm(r1) * np.linalg.norm(r2))
        cos_st1 = (
            np.cos(2 * np.arctan2(kf.mb / 2, kf.depth[i1]))
            if kf.depth[i1] > 0
            else 2.0
        )
        cos_st2 = (
            np.cos(2 * np.arctan2(kf2.mb / 2, kf2.depth[i2]))
            if kf2.depth[i2] > 0
            else 2.0
        )
        cos_st = min(cos_st1, cos_st2)
        if 0 < cos_par < 0.9998 and cos_par < cos_st:
            pw = triangulate_linear(b1[None], b2[None], T1, T2)[0]
        elif kf.depth[i1] > 0 and cos_st1 < cos_st2:
            pw = kf.unproject_stereo(i1)
        elif kf2.depth[i2] > 0 and cos_st2 < cos_st1:
            pw = kf2.unproject_stereo(i2)
        else:
            continue
        if pw is None:
            continue
        z1 = (T1 * pw)[2]
        z2 = (T2 * pw)[2]
        if z1 <= 0 or z2 <= 0:
            continue
        for kfx, ix, z in ((kf, i1, z1), (kf2, i2, z2)):
            uv = kfx.camera.project((kfx.Tcw * pw)[None])[0]
            e = uv - kfx.kps_un[ix]
            chi = (e @ e) * kfx.inv_level_sigma2[kfx.octave[ix]]
            if kfx.u_right[ix] >= 0:
                ur_p = uv[0] - kfx.mbf / z
                chi += (ur_p - kfx.u_right[ix]) ** 2 * kfx.inv_level_sigma2[
                    kfx.octave[ix]
                ]
                if chi > 7.8:
                    break
            elif chi > 5.991:
                break
        else:
            d1 = np.linalg.norm(pw - ow1)
            d2 = np.linalg.norm(pw - ow2)
            if d1 == 0 or d2 == 0:
                continue
            ratio = d2 / d1
            sf = kf.scale_factors[1] / kf.scale_factors[0]
            ratio_oct = (
                kf.scale_factors[kf.octave[i1]]
                / kf2.scale_factors[kf2.octave[i2]]
            )
            if ratio / ratio_oct > sf * 1.5 or ratio_oct / ratio > sf * 1.5:
                continue
            keep.append((i1, i2))
            pws.append(pw)
    return keep, pws


_RUN_CACHE: dict[int, list] = {}


def _tracked_keyframes(n_frames=80):
    if n_frames in _RUN_CACHE:
        return _RUN_CACHE[n_frames]
    from test_fabricated_e2e import CAM, MBF, W, H, _feats_at, _pose, _world
    from orbslam3_tpu.oracle.orb_cpu import PyramidParams
    from orbslam3_tpu.slam.system import System

    pts, descs, rng = _world()
    sysm = System(CAM, MBF, PyramidParams(n_features=800),
                  sequential=True, max_frames=6)
    for k in range(n_frames):
        feats = _feats_at(pts, descs, rng, _pose(k))
        sysm.track_stereo_features(feats, k / 20.0, (0, 0, W, H))
    kfs = sysm.atlas.get_current_map().get_all_keyframes()
    kfs = [k for k in kfs if not k.bad]
    # the fabricated tracker associates every feature; free half the slots
    # once at build time so search_for_triangulation has un-associated
    # keypoints to pair (and the cached state is mutation-stable)
    for k in kfs:
        for i in range(0, k.n, 2):
            k.map_points[i] = None
    _RUN_CACHE[n_frames] = kfs
    return kfs


def test_gates_match_scalar_oracle_on_real_keyframes():
    kfs = _tracked_keyframes()
    assert len(kfs) >= 3
    checked_pairs = 0
    for kf in kfs[-6:]:
        for kf2 in kf.get_best_covisibility_keyframes(10):
            if kf2.bad:
                continue
            pairs = matchers.search_for_triangulation(kf, kf2)
            if not pairs:
                continue
            ok, pw, i1s, i2s = triangulation_gates(kf, kf2, pairs)
            want_keep, want_pws = _scalar_oracle(kf, kf2, pairs)
            got_keep = [
                (int(i1s[j]), int(i2s[j])) for j in np.flatnonzero(ok)
            ]
            assert got_keep == want_keep
            got_pws = [pw[j] for j in np.flatnonzero(ok)]
            for g, w in zip(got_pws, want_pws):
                np.testing.assert_allclose(g, w, rtol=0, atol=1e-9)
            checked_pairs += len(pairs)
    assert checked_pairs > 200  # the run must actually exercise the ladder


def _scalar_search_for_triangulation(kf1, kf2, coarse=False,
                                     check_rotation=False):
    """Pre-vectorization walk of matchers.search_for_triangulation, kept
    verbatim as oracle (reference role: ORBmatcher2.cc:179)."""
    from orbslam3_tpu.slam.matchers import (
        TH_LOW, _rotation_consistency, desc_distances,
    )

    T1w, T2w = kf1.Tcw, kf2.Tcw
    T12 = T1w * T2w.inverse()
    R12, t12 = T12.R, T12.t
    c1_in2 = T2w * kf1.camera_center()
    if c1_in2[2] != 0:
        ep = kf2.camera.project(c1_in2[None])[0]
    else:
        ep = np.array([1e9, 1e9])
    free1 = [i for i in range(kf1.n) if kf1.map_points[i] is None]
    free2 = [i for i in range(kf2.n) if kf2.map_points[i] is None]
    if not free1 or not free2:
        return []
    d2 = kf2.desc[free2]
    pairs = []
    used2 = {}
    rot, rot_idx = [], []
    for a, i1 in enumerate(free1):
        stereo1 = kf1.u_right[i1] >= 0
        dists = desc_distances(kf1.desc[i1], d2)
        order = np.argsort(dists, kind="stable")
        best_j = -1
        for o in order:
            d = int(dists[o])
            if d > TH_LOW:
                break
            i2 = free2[int(o)]
            if i2 in used2:
                continue
            stereo2 = kf2.u_right[i2] >= 0
            if not stereo1 and not stereo2:
                dx = ep[0] - kf2.kps_un[i2][0]
                dy = ep[1] - kf2.kps_un[i2][1]
                if dx * dx + dy * dy < 100 * kf2.scale_factors[
                    kf2.octave[i2]
                ] ** 2:
                    continue
            ok = kf1.camera.epipolar_constrain(
                kf2.camera, kf1.kps_un[i1 : i1 + 1], kf2.kps_un[i2 : i2 + 1],
                R12, t12, kf2.level_sigma2[kf2.octave[i2]],
                unc=5.991 if not coarse else 50.0,
            )[0]
            if ok:
                best_j = i2
                break
        if best_j >= 0:
            pairs.append((i1, best_j))
            used2[best_j] = i1
            if check_rotation:
                dr = kf1.angle[i1] - kf2.angle[best_j]
                rot.append(dr + 360 if dr < 0 else dr)
                rot_idx.append(len(pairs) - 1)
    if check_rotation and pairs:
        keep = _rotation_consistency(rot, rot_idx)
        pairs = [p for k, p in enumerate(pairs) if k in keep]
    return pairs


def test_search_for_triangulation_matches_scalar_walk():
    kfs = _tracked_keyframes()
    checked = 0
    for kf in kfs[-4:]:
        for kf2 in kf.get_best_covisibility_keyframes(6):
            if kf2.bad:
                continue
            for kwargs in ({}, {"coarse": True}, {"check_rotation": True}):
                got = matchers.search_for_triangulation(kf, kf2, **kwargs)
                want = _scalar_search_for_triangulation(kf, kf2, **kwargs)
                assert got == want
                checked += len(want)
    assert checked > 100


def test_gates_exercise_failure_branches():
    """Corrupt depths/poses so stereo-select, cheirality and chi2 branches
    all flip, and re-check parity on the perturbed keyframes."""
    kfs = _tracked_keyframes(24)
    rng = np.random.default_rng(7)
    kf = kfs[-1]
    cands = [k for k in kf.get_best_covisibility_keyframes(10) if not k.bad]
    assert cands
    kf2 = cands[0]
    pairs = matchers.search_for_triangulation(kf, kf2)
    assert pairs
    # knock out half of kf's depths (forces mono/stereo mix), jitter kps
    kf.depth = kf.depth.copy()
    kf.depth[:: 2] = -1.0
    kf.u_right = kf.u_right.copy()
    kf.u_right[:: 2] = -1.0
    kf.kps_un = kf.kps_un + rng.normal(0, 3.0, kf.kps_un.shape)
    ok, pw, i1s, i2s = triangulation_gates(kf, kf2, pairs)
    want_keep, want_pws = _scalar_oracle(kf, kf2, pairs)
    got_keep = [(int(i1s[j]), int(i2s[j])) for j in np.flatnonzero(ok)]
    assert got_keep == want_keep
    for j, w in zip(np.flatnonzero(ok), want_pws):
        np.testing.assert_allclose(pw[j], w, rtol=0, atol=1e-9)
    # perturbation must have rejected something, else the test proves little
    assert len(want_keep) < len(pairs)
