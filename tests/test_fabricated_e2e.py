"""Long-horizon SLAM e2e on fabricated features (no device extraction).

200 frames of a synthetic point world fed through track_stereo_features —
exercises the FULL host pipeline (tracking state machine, keyframe policy,
local mapping, culling, native matchers/pose optimizer) at wall-clock
seconds, so it lives in the FAST tier.  Complements the image-based slow
e2e: here the features are exact, so any drift is the backend's own.
"""

import numpy as np
import pytest

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.oracle.orb_cpu import PyramidParams
from orbslam3_tpu.slam.system import System
from orbslam3_tpu.slam.tracking import TrackingState
from orbslam3_tpu.utils.lie import SE3, so3_exp
from orbslam3_tpu.utils.synth import ate_rmse

CAM = Pinhole([350.0, 350.0, 256.0, 192.0])
W, H = 512, 384
MBF = 42.0
N_FRAMES = 200


def _world(seed=0, n=6000):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n, 3)) * [8, 4, 4] + [0, 0, 8]
    descs = rng.integers(0, 256, (n, 32)).astype(np.uint8)
    return pts, descs, rng


# Fixed per-point detection priority: a real detector ranks by corner
# response, so consecutive frames see (mostly) the SAME subset of the
# visible points.  A fresh random subset per frame would give every frame
# low overlap with its reference KF, spamming keyframes and inflating the
# map until local BA dominates wall-clock.
_PRIORITY = np.random.default_rng(99).permutation(6000)


def _feats_at(pts, descs, rng, Tcw, n_max=800, noise=0.25):
    pc = pts @ Tcw.R.T + Tcw.t
    vis = pc[:, 2] > 0.5
    uv_all = CAM.project(np.where(vis[:, None], pc, [0, 0, 1.0]))
    ok = vis & (uv_all[:, 0] > 10) & (uv_all[:, 0] < W - 10) \
        & (uv_all[:, 1] > 10) & (uv_all[:, 1] < H - 10)
    sel = np.nonzero(ok)[0]
    if len(sel) > n_max:
        sel = sel[np.argsort(_PRIORITY[sel], kind="stable")[:n_max]]
        sel.sort()
    uv = uv_all[sel] + rng.normal(0, noise, (len(sel), 2))
    z = pc[sel, 2]
    return dict(
        kps=uv,
        octave=np.zeros(len(sel), np.int32),
        angle=np.zeros(len(sel), np.float32),
        response=np.ones(len(sel), np.float32),
        desc=descs[sel],
        u_right=uv[:, 0] - MBF / z + rng.normal(0, noise, len(sel)),
        depth=z,
    )


def _pose(k):
    """Smooth bounded sweep with revisits across 10 s."""
    s = k * 0.05
    t = np.array([
        2.0 * np.sin(0.25 * s * np.pi),
        0.1 * np.sin(0.4 * k / 4),
        0.8 * np.sin(0.15 * s * np.pi),
    ])
    w = np.array([0.02 * np.sin(0.1 * k), -0.9 * np.sin(0.2 * s * np.pi), 0.0])
    return SE3(so3_exp(w), t).inverse()


@pytest.fixture(scope="module")
def long_run():
    pts, descs, rng = _world()
    sysm = System(CAM, MBF, PyramidParams(n_features=800),
                  sequential=True, max_frames=6)
    est, gt, states = [], [], []
    for k in range(N_FRAMES):
        Tgt = _pose(k)
        feats = _feats_at(pts, descs, rng, Tgt)
        pose = sysm.track_stereo_features(feats, k / 20.0, (0, 0, W, H))
        states.append(sysm.get_tracking_state())
        if pose is not None:
            est.append(pose)
            gt.append(Tgt)
    return sysm, est, gt, states


def test_long_run_tracks_throughout(long_run):
    sysm, est, gt, states = long_run
    assert len(est) == N_FRAMES
    assert all(s == TrackingState.OK for s in states)


def test_long_run_ate(long_run):
    sysm, est, gt, states = long_run
    rmse = ate_rmse(est, gt)
    assert rmse < 0.02, f"ATE RMSE {rmse*100:.2f} cm over {N_FRAMES} frames"


def test_long_run_map_health(long_run):
    sysm, est, gt, states = long_run
    m = sysm.atlas.get_current_map()
    stats = sysm.map_stats()
    assert stats["n_keyframes"] >= 5
    assert stats["n_map_points"] > 500
    # observation graph consistent after all the churn (culling, fusion)
    for mp in m.get_all_map_points():
        assert not mp.bad
        for kf, (left, right) in mp.observations.items():
            idx = left if left >= 0 else right
            assert kf.map_points[idx] is mp
    # keyframe culling actually ran over a 200-frame sweep with revisits
    # (some KFs retired) OR the policy kept insertion sparse
    assert stats["n_keyframes"] < 80


def test_long_run_trajectory_replay(long_run):
    """frame_trajectory replays through (possibly culled) reference KFs."""
    sysm, est, gt, states = long_run
    traj = sysm.frame_trajectory()
    assert len(traj) == N_FRAMES
    p_est = np.stack([t.t for _, t in traj])
    p_gt = np.stack([T.inverse().t for T in gt])
    err = np.linalg.norm(p_est - p_gt, axis=1)
    assert np.median(err) < 0.02


def test_save_debug_data_vi_init_dump(tmp_path):
    """SaveDebugData parity (System.cc:1219): the init_* diagnostic file
    set carries scale, Rwg rows, cost and biases.  The stash itself is
    populated by _try_initialize_imu (asserted by the TUM-VI inertial
    e2e); here a 30-frame run + a representative stash pins the dump
    format end-to-end through the EuRoC saver."""
    from orbslam3_tpu.imu.preintegration import Calib
    from orbslam3_tpu.utils.lie import so3_exp as _exp

    pts, descs, rng = _world()
    sysm = System(CAM, MBF, PyramidParams(n_features=800),
                  sequential=True, max_frames=6, imu_calib=Calib(SE3()))
    acc = np.array([0.05, 0.0, 9.81])
    gyro = np.array([0.0, 0.02, 0.0])
    for k in range(30):
        feats = _feats_at(pts, descs, rng, _pose(k))
        imu = (np.tile(acc, (10, 1)), np.tile(gyro, (10, 1)),
               np.full(10, 0.005)) if k > 0 else None
        sysm.track_stereo_features(feats, k / 20.0, (0, 0, W, H), imu=imu)
    sysm.local_mapper.init_sect = 1
    sysm.local_mapper.init_debug = dict(
        scale=1.0, Rwg=_exp(np.array([0.02, -0.01, 0.0])),
        bg=np.array([1e-3, -2e-3, 5e-4]), ba=np.zeros(3), cost_time=0.12,
    )
    sysm.save_debug_data(0, str(tmp_path))
    sect = sysm.local_mapper.init_sect
    scale = float(open(tmp_path / f"init_Scale_{sect}.txt").read().strip())
    assert scale == 1.0
    rwg = np.array([
        [float(v) for v in l.split(",")]
        for l in open(tmp_path / f"init_GDir_{sect}.txt")
    ])
    assert rwg.shape == (3, 3)
    np.testing.assert_allclose(rwg @ rwg.T, np.eye(3), atol=1e-5)
    cost = float(open(tmp_path / f"init_CompCost_{sect}.txt").read().strip())
    assert cost > 0
    biases = [l for l in open(tmp_path / f"init_Biases_{sect}.txt")]
    assert len(biases) == 2
    traj = list(tmp_path.glob(f"init_FrameTrajectoy_{sect}_0.txt"))
    assert traj and len(open(traj[0]).readlines()) > 5


def test_euroc_saver_per_map_overloads(tmp_path):
    """Per-map saver overloads (System.h:158-159, System.cc:746): with a
    Map argument the EuRoC savers write only frames whose reference KF —
    and only keyframes that — live in that map."""
    pts, descs, rng = _world()
    sysm = System(CAM, MBF, PyramidParams(n_features=800),
                  sequential=True, max_frames=6)
    for k in range(25):
        feats = _feats_at(pts, descs, rng, _pose(k))
        sysm.track_stereo_features(feats, 10.0 + k / 20.0, (0, 0, W, H))
    maps0 = sysm.atlas.get_all_maps()
    assert len(maps0) == 1
    old_map = maps0[0]
    # backward timestamp jump forks a fresh map (Tracking3.cc:66-104)
    sysm.track_stereo_features(
        _feats_at(pts, descs, rng, _pose(0)), 1.0, (0, 0, W, H)
    )
    for k in range(25):
        feats = _feats_at(pts, descs, rng, _pose(k))
        sysm.track_stereo_features(feats, 1.0 + k / 20.0, (0, 0, W, H))
    new_map = sysm.atlas.get_current_map()
    assert new_map is not old_map

    def rows(p):
        return [l.split() for l in open(p) if l.strip()]

    p_old = str(tmp_path / "f_old.txt")
    p_new = str(tmp_path / "f_new.txt")
    sysm.save_trajectory_euroc(p_old, map_=old_map)
    sysm.save_trajectory_euroc(p_new, map_=new_map)
    r_old, r_new = rows(p_old), rows(p_new)
    assert len(r_old) > 5 and len(r_new) > 5
    # the two per-map files partition the tracked frames by timestamp era
    assert all(float(r[0]) >= 10.0e9 - 1e3 for r in r_old)
    assert all(float(r[0]) < 3.0e9 for r in r_new)
    # default (no map_) targets the biggest map (System.cc:644-655)
    big = sysm._biggest_map()
    p_cur = str(tmp_path / "f_cur.txt")
    sysm.save_trajectory_euroc(p_cur)
    assert rows(p_cur) == (r_old if big is old_map else r_new)

    k_old = str(tmp_path / "kf_old.txt")
    sysm.save_keyframe_trajectory_euroc(k_old, map_=old_map)
    kf_rows = rows(k_old)
    assert len(kf_rows) == len(
        [k for k in old_map.get_all_keyframes() if not k.bad]
    )
    assert all(float(r[0]) >= 10.0e9 - 1e3 for r in kf_rows)


def test_euroc_saver_inertial_body_frame(tmp_path):
    """SaveTrajectoryEuRoC parity (System.cc:634-745): inertial configs
    write IMU/body poses (Twb, first-KF body anchor) in the reference's
    artifact format — ns stamps, qx qy qz qw."""
    from orbslam3_tpu.imu.preintegration import Calib
    from orbslam3_tpu.utils.lie import SE3, so3_exp
    from orbslam3_tpu.utils.trajectory import quat_to_rot

    tbc = SE3(so3_exp(np.array([0.1, -0.2, 1.2])), np.array([0.05, -0.02, 0.01]))
    pts, descs, rng = _world()
    sysm = System(CAM, MBF, PyramidParams(n_features=800),
                  sequential=True, max_frames=6, imu_calib=Calib(tbc))
    acc = np.array([0.05, 0.0, 9.81])
    gyro = np.array([0.0, 0.02, 0.0])
    for k in range(30):
        feats = _feats_at(pts, descs, rng, _pose(k))
        imu = (np.tile(acc, (10, 1)), np.tile(gyro, (10, 1)),
               np.full(10, 0.005)) if k > 0 else None
        sysm.track_stereo_features(feats, k / 20.0, (0, 0, W, H), imu=imu)

    cam_traj = sysm.frame_trajectory()
    body_traj = sysm.frame_trajectory(body_frame=True)
    assert len(cam_traj) == len(body_traj) > 10
    # relative body motion == Tbc-conjugated relative camera motion
    for i, j in ((0, 5), (3, len(cam_traj) - 1)):
        (_, twc_i), (_, twc_j) = cam_traj[i], cam_traj[j]
        (_, twb_i), (_, twb_j) = body_traj[i], body_traj[j]
        rel_b = twb_i.inverse() * twb_j
        rel_c_conj = tbc * (twc_i.inverse() * twc_j) * tbc.inverse()
        np.testing.assert_allclose(rel_b.matrix(), rel_c_conj.matrix(), atol=1e-9)

    p = str(tmp_path / "euroc.txt")
    sysm.save_trajectory_euroc(p)
    rows = [l.split() for l in open(p) if l.strip()]
    assert len(rows) == len(body_traj)
    # ns timestamps; qx qy qz qw order recovers the body rotations
    for row, (ts, twb) in zip(rows[:5], body_traj[:5]):
        assert abs(float(row[0]) - ts * 1e9) < 1e3
        np.testing.assert_allclose(
            np.array([float(v) for v in row[1:4]]), twb.t, atol=1e-8
        )
        q = np.array([float(v) for v in row[4:8]])  # qx qy qz qw
        np.testing.assert_allclose(quat_to_rot(q), twb.R, atol=1e-7)
