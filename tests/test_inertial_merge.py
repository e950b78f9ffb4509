"""Inertial map merge (MergeLocal2 role): 4-DoF gravity-consistent weld.

Unit-level: fabricates two gravity-leveled maps with known relative
yaw+translation, stubs the feature-level fuse/BA (covered elsewhere), and
checks the transform math — scale forced to 1, rotation projected to pure
yaw, keyframe velocities transported, inertial flags propagated."""

import numpy as np
import pytest

from orbslam3_tpu.slam.loop_closing import LoopClosing
from orbslam3_tpu.slam.map import Atlas
from orbslam3_tpu.utils.lie import SE3, Sim3, so3_exp


class FakeMP:
    _next = 0

    def __init__(self, pos, m):
        self.id = FakeMP._next
        FakeMP._next += 1
        self.position = np.asarray(pos, float)
        self.map = m
        self.bad = False

    def update_normal_and_depth(self):
        pass


class FakeKF:
    _next = 1000

    def __init__(self, Twb, m, vel=None):
        self.id = FakeKF._next
        FakeKF._next += 1
        self.map = m
        self.Tcw = Twb.inverse()
        self.velocity = vel
        self.bad = False
        self.parent = None
        self.children = set()
        self.merge_edges = set()
        self.loop_edges = set()
        self.imu_preint = None
        self.imu_bias = None
        self.mps = []

    @property
    def Twc(self):
        return self.Tcw.inverse()

    def set_pose(self, T):
        self.Tcw = T.normalized()

    def get_map_point_indices(self):
        return list(enumerate(self.mps))

    def get_best_covisibility_keyframes(self, n):
        return []

    def update_connections(self, parent_candidates=True):
        pass


def test_inertial_merge_is_4dof_and_transports_velocity(monkeypatch):
    from orbslam3_tpu.slam import matchers

    monkeypatch.setattr(matchers, "fuse", lambda *a, **k: 0)
    import orbslam3_tpu.optim.local_ba as lba

    monkeypatch.setattr(lba, "local_bundle_adjustment", lambda *a, **k: 0)

    atlas = Atlas()
    m_old = atlas.get_current_map()
    m_old.imu_initialized = True
    m_old.is_inertial = True
    m_young = atlas.create_new_map()
    m_young.imu_initialized = True

    # ground truth: young world = yaw+translation of old world
    yaw = 0.4
    t_gw = np.array([2.0, -1.0, 0.3])
    r_yaw = so3_exp(np.array([0.0, 0.0, yaw]))
    # alignment old<-young is corrupted by a small roll/pitch drift that the
    # 4-DoF projection must reject
    T_align_gt = SE3(r_yaw, t_gw)  # x_old = T * x_young

    kf_old = FakeKF(SE3(np.eye(3), np.array([1.0, 0.0, 0.0])), m_old,
                    vel=np.array([0.5, 0.0, 0.0]))
    m_old.add_keyframe(kf_old)
    kf_old.mps = [FakeMP(np.array([1.0, 2.0, 3.0]), m_old)]
    for mp in kf_old.mps:
        m_old.add_map_point(mp)

    v_young = np.array([0.1, 0.2, -0.05])
    Twb_young = SE3(so3_exp(np.array([0.0, 0.1, 0.2])), np.array([0.5, 0.5, 0.0]))
    kf_young = FakeKF(Twb_young, m_young, vel=v_young.copy())
    m_young.add_keyframe(kf_young)
    p_young = np.array([0.3, -0.2, 2.0])
    kf_young.mps = [FakeMP(p_young.copy(), m_young)]
    for mp in kf_young.mps:
        m_young.add_map_point(mp)
    mp_y = kf_young.mps[0]

    # verified relative Sim3 cur<-cand consistent with the GT alignment,
    # with a small roll/pitch + scale error as RANSAC would produce
    Twb_young_in_old = T_align_gt * Twb_young
    noise = Sim3(1.03, so3_exp(np.array([0.02, -0.015, 0.0])), np.zeros(3))
    s_cur_match = (
        noise
        * Sim3.from_se3(Twb_young_in_old.inverse())
        * Sim3.from_se3(kf_old.Tcw).inverse()
    )

    lc = LoopClosing(atlas, kf_database=None, fix_scale=True, run_gba=False)
    lc.merge_maps(kf_young, kf_old, s_cur_match)

    # one map left, inertial flags propagated
    assert atlas.count_maps() == 1
    assert atlas.get_current_map() is m_old
    assert m_old.imu_initialized and m_old.is_inertial

    # the young KF landed near its GT pose in the old world — up to the
    # injected roll/pitch/scale noise, which 4-DoF projection must not
    # amplify; crucially the new world stays gravity-leveled:
    Twb_new = kf_young.Twc
    # z-axis of the pose rotated only by yaw -> its world-z component
    # is preserved exactly under a yaw-only transport
    z_young = Twb_young.R[:, 2]
    z_new = Twb_new.R[:, 2]
    assert abs(z_new[2] - z_young[2]) < 1e-9, (z_new, z_young)

    # map-point transport is rigid (unit scale): distances to the KF body
    # are preserved exactly
    d_before = np.linalg.norm(p_young - Twb_young.t)
    d_after = np.linalg.norm(mp_y.position - kf_young.Twc.t)
    assert abs(d_after - d_before) < 1e-9

    # velocity transported by the same yaw rotation, unit scale
    v_new = kf_young.velocity
    assert abs(np.linalg.norm(v_new) - np.linalg.norm(v_young)) < 1e-9
    assert abs(v_new[2] - v_young[2]) < 1e-9  # yaw-only: z preserved


def test_visual_merge_keeps_full_sim3(monkeypatch):
    """Non-inertial maps: the merge may rotate/scale freely (control)."""
    from orbslam3_tpu.slam import matchers

    monkeypatch.setattr(matchers, "fuse", lambda *a, **k: 0)
    import orbslam3_tpu.optim.local_ba as lba

    monkeypatch.setattr(lba, "local_bundle_adjustment", lambda *a, **k: 0)

    atlas = Atlas()
    m_old = atlas.get_current_map()
    m_young = atlas.create_new_map()
    kf_old = FakeKF(SE3(), m_old)
    m_old.add_keyframe(kf_old)
    roll = Sim3(1.0, so3_exp(np.array([0.3, 0.0, 0.0])), np.array([1.0, 0, 0]))
    Twb_young = SE3(np.eye(3), np.array([0.5, 0.0, 0.0]))
    kf_young = FakeKF(Twb_young, m_young)
    m_young.add_keyframe(kf_young)
    Twb_young_in_old = roll.to_se3() * Twb_young
    s_cur_match = (
        Sim3.from_se3(Twb_young_in_old.inverse())
        * Sim3.from_se3(kf_old.Tcw).inverse()
    )
    lc = LoopClosing(atlas, kf_database=None, fix_scale=True, run_gba=False)
    lc.merge_maps(kf_young, kf_old, s_cur_match)
    # roll applied in full (no 4-DoF projection for visual maps)
    e = (kf_young.Twc * Twb_young_in_old.inverse()).log()
    assert np.linalg.norm(e) < 1e-6, e
