"""FullInertialBA + 4-DoF essential graph on fabricated inertial maps."""

import numpy as np

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.imu.preintegration import GRAVITY, Bias, Calib, Preintegrated
from orbslam3_tpu.optim.essential_graph import optimize_essential_graph_4dof
from orbslam3_tpu.optim.global_ba import full_inertial_ba
from orbslam3_tpu.slam.map import Map
from orbslam3_tpu.utils.lie import SE3, Sim3, so3_exp

CAM = Pinhole([300.0, 300.0, 320.0, 240.0])


class MP:
    _n = 0

    def __init__(self, pos):
        self.id = MP._n
        MP._n += 1
        self.position = np.asarray(pos, float)
        self.bad = False
        self.observations = {}

    def update_normal_and_depth(self):
        pass


class KF:
    _n = 5000

    def __init__(self, Twb, ts):
        self.id = KF._n
        KF._n += 1
        self.timestamp = ts
        self.Tcw = Twb.inverse()
        self.bad = False
        self.camera = CAM
        self.mbf = 0.0
        self.map = None
        self.velocity = None
        self.imu_bias = Bias()
        self.imu_preint = None
        self.prev_kf = None
        self.next_kf = None
        self.map_points = {}
        self.parent = None
        self.loop_edges = set()

    @property
    def Twc(self):
        return self.Tcw.inverse()

    def set_pose(self, T):
        self.Tcw = T.normalized()

    def get_map_point_indices(self):
        return sorted(self.map_points.items())


def _build_inertial_map(n=8, dt=0.25, seed=0):
    """GT chain + exact IMU + landmarks; returns (map, kfs, gt_Twb)."""
    rng = np.random.default_rng(seed)

    def pos(t):
        return np.array([0.6 * t, 0.25 * np.sin(t), 0.05 * t])

    def vel(t):
        return np.array([0.6, 0.25 * np.cos(t), 0.05])

    def acc(t):
        return np.array([0.0, -0.25 * np.sin(t), 0.0])

    def rot(t):
        return so3_exp(np.array([0.0, 0.25 * t, 0.0]))

    m = Map()
    m.imu_initialized = True
    m.is_inertial = True
    kfs = []
    gt = []
    for i in range(n):
        t = i * dt
        Twb = SE3(rot(t), pos(t))
        gt.append(Twb)
        kf = KF(Twb, t)
        kf.velocity = vel(t)
        kf.map = m
        kfs.append(kf)
        m.add_keyframe(kf)
    for i in range(1, n):
        pre = Preintegrated(Bias(), Calib(SE3()))
        steps = 100
        h = dt / steps
        for j in range(steps):
            t = (i - 1) * dt + (j + 0.5) * h
            e = 1e-5
            wmat = rot(t).T @ (rot(t + e) - rot(t - e)) / (2 * e)
            gyro = np.array([wmat[2, 1], wmat[0, 2], wmat[1, 0]])
            pre.integrate(rot(t).T @ (acc(t) - GRAVITY), gyro, h)
        kfs[i].imu_preint = pre
        kfs[i].prev_kf = kfs[i - 1]
        kfs[i - 1].next_kf = kfs[i]
    # landmark cloud + per-KF noisy projections
    pw = rng.uniform([-3, -3, 5], [5, 3, 12], (150, 3))
    for kf in kfs:
        uv = CAM.project(kf.Tcw.apply(pw))
        kf.kps_un = uv + rng.normal(0, 0.3, uv.shape)
        kf.u_right = np.full(len(pw), -1.0)
        kf.octave = np.zeros(len(pw), int)
        kf.inv_level_sigma2 = np.ones(1)
    return m, kfs, gt, pw


def _attach_landmarks(m, kfs, pw, rng):
    mps = [MP(p) for p in pw]
    for mp in mps:
        m.add_map_point(mp)
    for kf in kfs:
        pc = kf.Tcw.apply(pw)
        uv = CAM.project(pc)
        inb = (
            (pc[:, 2] > 0.5)
            & (uv[:, 0] > 0) & (uv[:, 0] < 640)
            & (uv[:, 1] > 0) & (uv[:, 1] < 480)
        )
        for j in np.nonzero(inb)[0]:
            kf.map_points[int(j)] = mps[j]
            mps[j].observations[kf] = (int(j), -1)
    return mps


def test_full_inertial_ba_recovers_perturbed_map():
    rng = np.random.default_rng(3)
    m, kfs, gt, pw = _build_inertial_map(seed=3)
    mps = _attach_landmarks(m, kfs, pw, rng)
    # perturb all but the first KF + the landmarks
    for kf, g in zip(kfs[1:], gt[1:]):
        Twb = SE3(
            g.R @ so3_exp(rng.normal(0, 0.01, 3)),
            g.t + rng.normal(0, 0.03, 3),
        )
        kf.set_pose(Twb.inverse())
        kf.velocity = kf.velocity + rng.normal(0, 0.05, 3)
    for mp in mps:
        mp.position = mp.position + rng.normal(0, 0.02, 3)

    def perr():
        return max(
            np.linalg.norm(kf.Twc.t - g.t) for kf, g in zip(kfs, gt)
        )

    e0 = perr()
    n = full_inertial_ba(m, Calib(SE3()))
    assert n == len(kfs)
    e1 = perr()
    assert e1 < 0.25 * e0, (e0, e1)
    # velocities re-estimated close to truth
    t_mid = 3 * 0.25
    v_gt = np.array([0.6, 0.25 * np.cos(t_mid), 0.05])
    assert np.linalg.norm(kfs[3].velocity - v_gt) < 0.05


def test_viba_stage_flags():
    """LocalMapping VIBA1/VIBA2 staged refinement triggers on chain length."""
    from orbslam3_tpu.slam.local_mapping import LocalMapping
    from orbslam3_tpu.slam.map import Atlas

    rng = np.random.default_rng(7)
    m, kfs, gt, pw = _build_inertial_map(n=16, seed=7)
    _attach_landmarks(m, kfs, pw, rng)
    for kf, g in zip(kfs[1:], gt[1:]):
        kf.set_pose(
            SE3(g.R @ so3_exp(rng.normal(0, 0.005, 3)), g.t + rng.normal(0, 0.02, 3)).inverse()
        )
    atlas = Atlas()
    lm = LocalMapping(atlas, imu_calib=Calib(SE3()))
    assert not m.iniertial_ba1
    lm._maybe_refine_inertial(kfs[-1])
    assert m.iniertial_ba1 and not m.iniertial_ba2
    e = max(np.linalg.norm(kf.Twc.t - g.t) for kf, g in zip(kfs, gt))
    assert e < 0.01, e
    lm._maybe_refine_inertial(kfs[-1], viba2_at=16)
    assert m.iniertial_ba2


def test_essential_graph_4dof_preserves_gravity():
    # chain of gravity-aligned poses with accumulated yaw+translation drift
    n = 10
    gt = [
        SE3(so3_exp(np.array([0.0, 0.0, 0.15 * i])), np.array([0.5 * i, 0.1 * i, 0.0]))
        for i in range(n)
    ]
    kfs = [KF(g, idx * 0.5) for idx, g in enumerate(gt)]
    rng = np.random.default_rng(1)
    # drifted poses: extra yaw+xy drift growing along the chain
    for i, (kf, g) in enumerate(zip(kfs, gt)):
        dyaw = 0.03 * i
        dt_ = np.array([0.04 * i, -0.02 * i, 0.0])
        Twb = SE3(g.R @ so3_exp(np.array([0, 0, dyaw])), g.t + dt_)
        kf.set_pose(Twb.inverse())
    edges = []
    for i in range(n - 1):
        s_meas = (
            Sim3.from_se3(gt[i + 1].inverse()) * Sim3.from_se3(gt[i].inverse()).inverse()
        )
        edges.append((kfs[i], kfs[i + 1], s_meas, 100.0))
    # loop edge last->first with the TRUE relative pose
    s_loop = Sim3.from_se3(gt[-1].inverse()) * Sim3.from_se3(gt[0].inverse()).inverse()
    edges.append((kfs[0], kfs[-1], s_loop, 100.0))
    optimize_essential_graph_4dof(kfs, edges, fixed={kfs[0]})
    # drift corrected
    errs = [np.linalg.norm((kf.Tcw * g).log()) for kf, g in zip(kfs, gt)]
    assert max(errs) < 1e-4, errs
    # gravity direction untouched: every pose rotation has zero roll/pitch
    for kf in kfs:
        R = kf.Twc.R
        assert abs(R[2, 2] - 1.0) < 1e-9
        assert abs(R[0, 2]) < 1e-9 and abs(R[1, 2]) < 1e-9
