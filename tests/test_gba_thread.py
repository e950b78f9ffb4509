"""Transient-GBA write-back reconciliation (RunGlobalBundleAdjustment role).

The reference's GBA thread solves on a snapshot while tracking/mapping
continue, then corrects keyframes and map points created meanwhile through
the spanning tree (/root/reference/src/LoopClosing3.cc:520+).  This tests
`apply_global_ba` with a hand-made solution so the reconciliation algebra
is pinned independently of the solver.
"""

import numpy as np

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.optim.global_ba import apply_global_ba
from orbslam3_tpu.slam.map import Map
from orbslam3_tpu.utils.lie import SE3, so3_exp

CAM = Pinhole([300.0, 300.0, 320.0, 240.0])


class KF:
    _n = 9000

    def __init__(self, Tcw):
        self.id = KF._n
        KF._n += 1
        self.Tcw = Tcw.normalized()
        self.bad = False
        self.camera = CAM
        self.mbf = 0.0
        self.map = None
        self.parent = None
        self.map_points = {}
        self.n = 1
        self.n_levels = 8
        self.octave = np.zeros(1, np.int32)
        self.scale_factors = 1.2 ** np.arange(8)

    @property
    def Twc(self):
        return self.Tcw.inverse()

    def camera_center(self):
        return self.Twc.t

    def set_pose(self, T):
        self.Tcw = T.normalized()

    def get_map_point_indices(self):
        return sorted(self.map_points.items())


class MP:
    _n = 0

    def __init__(self, pos, ref):
        self.id = 90000 + MP._n
        MP._n += 1
        self.position = np.asarray(pos, float)
        self.bad = False
        self.ref_kf = ref
        self.observations = {ref: (0, -1)}
        self.normal = np.zeros(3)
        self.min_distance = 0.0
        self.max_distance = 0.0


def test_transient_gba_thread_runs_joins_and_aborts():
    """Threaded-mode _global_ba: solve off-thread, write-back under the map
    lock, shutdown join, and mbStopGBA-style abort."""
    import sys as _sys
    import os as _os

    _sys.path.insert(0, _os.path.dirname(__file__))
    from test_fabricated_e2e import CAM as FCAM, MBF, W as FW, H as FH, \
        _feats_at, _pose, _world
    from orbslam3_tpu.oracle.orb_cpu import PyramidParams
    from orbslam3_tpu.slam.system import System

    pts, descs, rng = _world()
    sysm = System(FCAM, MBF, PyramidParams(n_features=800),
                  sequential=True, max_frames=6)
    for k in range(40):
        sysm.track_stereo_features(
            _feats_at(pts, descs, rng, _pose(k)), k / 20.0, (0, 0, FW, FH)
        )
    m = sysm.atlas.get_current_map()
    from orbslam3_tpu.slam.loop_closing import LoopClosing

    lc = LoopClosing(sysm.atlas, None)
    lc.local_mapper = sysm.local_mapper
    lc.sequential = False
    lc._global_ba(m, None)
    assert lc._gba_thread is not None
    lc.request_finish()   # flag only (shutdown joins the spin thread first)
    lc.join_gba()         # then lets the in-flight GBA write back
    assert not lc._gba_thread.is_alive()
    # the write-back kept the observation graph consistent
    for mp in m.get_all_map_points():
        for kf, (left, right) in mp.observations.items():
            idx = left if left >= 0 else right
            assert kf.map_points[idx] is mp
    # abort path: a newer correction joins the previous thread before it
    # can write (the abort flag is only raised if it was still in flight,
    # so assert only the join)
    lc.finished = False
    lc._global_ba(m, None)
    lc._abort_running_gba()
    assert not lc._gba_thread.is_alive()


def test_apply_global_ba_reconciles_new_kfs_and_points():
    m = Map()
    poses = [
        SE3(so3_exp(np.array([0.0, 0.05 * k, 0.0])), np.array([0.3 * k, 0, 0])).inverse()
        for k in range(3)
    ]
    kfs = [KF(p) for p in poses]
    for a, b in zip(kfs, kfs[1:]):
        b.parent = a
    mps = [MP([0.5 * j, 0.2, 3.0], kfs[min(j, 2)]) for j in range(3)]
    for k in kfs:
        m.add_keyframe(k)
    for mp in mps:
        m.add_map_point(mp)

    # GBA result: non-fixed snapshot poses/points move by a global correction
    t_corr = SE3(so3_exp(np.array([0.0, 0.0, 0.03])), np.array([0.1, -0.05, 0.02]))
    gba_poses = [kfs[0].Tcw.copy()] + [k.Tcw * t_corr.inverse() for k in kfs[1:]]
    gba_points = np.stack([t_corr * mp.position for mp in mps])
    solution = (list(kfs), gba_poses, list(mps), gba_points)

    # ...meanwhile a keyframe and two points were created during the solve
    t_rel = SE3(so3_exp(np.array([0.01, 0.0, 0.0])), np.array([0.25, 0.0, 0.01]))
    kf_new = KF(t_rel * kfs[2].Tcw)
    kf_new.parent = kfs[2]
    m.add_keyframe(kf_new)
    mp_a = MP([1.0, -0.2, 2.5], kfs[2])   # ref'd to a snapshot KF
    mp_b = MP([1.3, 0.1, 2.8], kf_new)    # ref'd to the new KF
    m.add_map_point(mp_a)
    m.add_map_point(mp_b)

    old2, old_new = kfs[2].Tcw.copy(), kf_new.Tcw.copy()
    apply_global_ba(m, solution)

    # snapshot keyframes take the GBA poses (fixed stays put)
    assert np.allclose(kfs[0].Tcw.matrix(), poses[0].matrix(), atol=1e-12)
    for k, g in zip(kfs[1:], gba_poses[1:]):
        assert np.allclose(k.Tcw.matrix(), g.matrix(), atol=1e-9)
    # new keyframe: Tcw_gba = (Tcw * Twc_parent_old) * Tcw_gba_parent
    expect_new = (old_new * old2.inverse()) * gba_poses[2]
    assert np.allclose(kf_new.Tcw.matrix(), expect_new.matrix(), atol=1e-9)
    # the relative pose to its parent is preserved through the correction
    rel_after = kf_new.Tcw * kfs[2].Twc
    assert np.allclose(rel_after.matrix(), (old_new * old2.inverse()).matrix(), atol=1e-9)

    # snapshot points take the GBA positions
    for mp, g in zip(mps, gba_points):
        assert np.allclose(mp.position, g, atol=1e-9)
    # new points move with their reference keyframe's correction
    expect_a = gba_poses[2].inverse() * (old2 * np.array([1.0, -0.2, 2.5]))
    assert np.allclose(mp_a.position, expect_a, atol=1e-9)
    expect_b = expect_new.inverse() * (old_new * np.array([1.3, 0.1, 2.8]))
    assert np.allclose(mp_b.position, expect_b, atol=1e-9)
