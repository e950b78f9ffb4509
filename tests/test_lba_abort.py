"""Mid-LBA interrupt (LocalMapping::mbAbortBA / g2o setForceStopFlag).

The reference sets mbAbortBA on every keyframe insertion and LoopClosing
stop request, and LocalBundleAdjustment polls it between iterations so a
running local BA aborts when the tracker needs the mapper
(/root/reference/src/LocalMapping.cc:284-296, Optimizer2.cc:350; its own
run log shows 151 of 152 LBAs aborted, ExecMean.txt:18,29-30)."""

import threading
import time

import numpy as np

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.optim.bundle_adjustment import AbortFlag, BAProblem, bundle_adjust
from orbslam3_tpu.optim.local_ba import local_bundle_adjustment
from orbslam3_tpu.utils.lie import SE3, so3_exp


def _ba_problem(no_native: bool, n_pts: int = 60, seed: int = 0):
    rng = np.random.default_rng(seed)
    cam = Pinhole([300.0, 300.0, 320.0, 240.0])
    if no_native:
        cam.no_native = True
    pw = rng.normal(0, 0.8, (n_pts, 3)) + [0, 0, 4.0]
    poses_gt = [
        SE3(),
        SE3(so3_exp(np.array([0.0, -0.04, 0.0])), np.array([0.3, 0.0, 0.0])),
    ]
    cam_idx, pt_idx, uv = [], [], []
    for ci, T in enumerate(poses_gt):
        uvs = cam.project(T.apply(pw))
        for j in range(n_pts):
            cam_idx.append(ci)
            pt_idx.append(j)
            uv.append(uvs[j])
    o = len(cam_idx)
    perturbed = [
        poses_gt[0],
        SE3.exp(np.array([0.01, -0.008, 0.012, 0.05, 0.03, -0.04])) * poses_gt[1],
    ]
    return BAProblem(
        poses=perturbed,
        points=pw + rng.normal(0, 0.02, pw.shape),
        cam_idx=np.asarray(cam_idx),
        pt_idx=np.asarray(pt_idx),
        obs_uv=np.asarray(uv),
        obs_ur=np.full(o, -1.0),
        inv_sigma2=np.ones(o),
        fixed_cams=np.array([True, False]),
        camera=cam,
        mbf=0.0,
    ), poses_gt


def test_preset_abort_flag_freezes_numpy_ba():
    pr, _ = _ba_problem(no_native=True)
    flag = AbortFlag()
    flag.set()
    poses, points, _ = bundle_adjust(pr, n_iters=10, abort_flag=flag)
    # zero iterations ran: pose and points unchanged
    np.testing.assert_allclose(poses[1].t, pr.poses[1].t, atol=0)
    np.testing.assert_allclose(points, pr.points, atol=0)


def test_preset_abort_flag_freezes_native_ba():
    from orbslam3_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")
    pr, _ = _ba_problem(no_native=False)
    flag = AbortFlag()
    flag.set()
    poses, points, _ = bundle_adjust(pr, n_iters=10, abort_flag=flag)
    np.testing.assert_allclose(poses[1].t, pr.poses[1].t, atol=1e-15)
    np.testing.assert_allclose(points, pr.points, atol=1e-15)
    # and without the flag the same problem converges (the abort really is
    # what froze it)
    poses2, points2, chi2 = bundle_adjust(pr, n_iters=10)
    assert chi2.max() < 1e-8


class _CountdownFlag(AbortFlag):
    """Flips to set after N polls — deterministic mid-optimization abort."""

    __slots__ = ("left",)

    def __init__(self, n):
        super().__init__()
        self.left = n

    def __bool__(self):
        if self.left > 0:
            self.left -= 1
            return False
        self.buf[0] = 1
        return True


def test_mid_iteration_abort_returns_partial_result():
    pr, poses_gt = _ba_problem(no_native=True)
    # full run converges
    _, _, chi2_full = bundle_adjust(pr, n_iters=12)
    assert chi2_full.max() < 1e-12
    # chi2 at the unoptimized start (flag pre-set: zero iterations)
    pre = AbortFlag()
    pre.set()
    _, _, chi2_start = bundle_adjust(pr, n_iters=12, abort_flag=pre)
    # aborted after 2 LM iterations: better than the start, worse than full
    flag = _CountdownFlag(2)
    _, _, chi2_part = bundle_adjust(pr, n_iters=12, abort_flag=flag)
    assert flag.left == 0  # the countdown really was consumed mid-run
    assert chi2_part.max() < chi2_start.max()  # progress happened
    assert chi2_part.max() > chi2_full.max() * 10  # but it stopped early


def test_threaded_mapper_aborts_lba_on_insertion():
    """Integration (the reference's raison d'être for mbAbortBA): a threaded
    LocalMapping runs a slow local BA; the tracker inserts the next
    keyframe mid-solve; the running LBA aborts and the abort counter
    records it."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_fabricated_e2e import CAM, MBF, W, H, _feats_at, _pose, _world
    from orbslam3_tpu.oracle.orb_cpu import PyramidParams
    from orbslam3_tpu.slam.system import System

    import orbslam3_tpu.slam.tracking as tr

    pts, descs, rng = _world()
    CAM.no_native = True  # NumPy LBA: slow enough to straddle insertions
    # the fabricated world tracks too well to trip the organic inlier-decay
    # KF policy in 24 frames — force a keyframe per frame so insertions
    # reliably land while the previous keyframe's LBA is still solving
    # (the KF policy itself is covered by the e2e tests)
    orig_need = tr.Tracking._need_new_keyframe
    tr.Tracking._need_new_keyframe = lambda self: True
    try:
        sysm = System(CAM, MBF, PyramidParams(n_features=800),
                      sequential=False, max_frames=4)
        lm = sysm.local_mapper
        assert not lm.sequential
        last_exec = 0
        for k in range(24):
            sysm.track_stereo_features(
                _feats_at(pts, descs, rng, _pose(k)), k / 20.0, (0, 0, W, H)
            )
            # pace the tracker the way real frame cadence does: wait until
            # the mapper either ENTERS an LBA (exec counter bumps at solve
            # entry — the next insertion then lands mid-solve, exactly the
            # contention mbAbortBA exists for) or drains and goes idle
            # (our insertion was already pending, so the LBA was skipped —
            # the reference's CheckNewKeyFrames fast path)
            t0 = time.time()
            while time.time() - t0 < 30:
                if lm.n_lba_exec > last_exec:
                    last_exec = lm.n_lba_exec
                    break
                if lm.queue_size() == 0 and lm._idle:
                    break
                time.sleep(0.005)
        # let the worker drain, then shut down
        t0 = time.time()
        while lm.queue_size() > 0 and time.time() - t0 < 120:
            time.sleep(0.1)
        sysm.shutdown()
    finally:
        CAM.no_native = False
        tr.Tracking._need_new_keyframe = orig_need
    assert lm.n_lba_exec >= 1
    # the tracker kept producing keyframes while LBAs ran: at least one
    # was interrupted (the reference's own log: 151 of 152 aborted)
    assert lm.n_lba_abort >= 1, (lm.n_lba_exec, lm.n_lba_abort)
    # aborted BAs still left a consistent observation graph
    m = sysm.atlas.get_current_map()
    for mp in m.get_all_map_points():
        for kf, (left, right) in mp.observations.items():
            idx = left if left >= 0 else right
            assert kf.map_points[idx] is mp


def test_local_ba_returns_zero_when_preaborted():
    flag = AbortFlag()
    flag.set()

    class _KF:
        bad = True

    assert local_bundle_adjustment(_KF(), None, abort_flag=flag) == 0


def test_lba_solve_runs_outside_map_lock(monkeypatch):
    """Reference lock discipline (Optimizer2.cc:350 region): the LM solve
    must run with the map-update lock FREE — only graph collection and
    write-back hold it ("Get Map Mutex" comes after optimize in the
    reference), so a concurrent Track() is never blocked for the whole BA."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_fabricated_e2e import CAM, MBF, W, H, _feats_at, _pose, _world
    from orbslam3_tpu.oracle.orb_cpu import PyramidParams
    from orbslam3_tpu.slam.system import System
    import orbslam3_tpu.optim.local_ba as lba_mod

    import orbslam3_tpu.slam.tracking as tr

    pts, descs, rng = _world()
    # the fabricated world tracks too well to trip the organic KF policy
    # in 10 frames — force one per frame (policy covered by e2e tests)
    orig_need = tr.Tracking._need_new_keyframe
    tr.Tracking._need_new_keyframe = lambda self: True
    try:
        sysm = System(CAM, MBF, PyramidParams(n_features=800),
                      sequential=True, max_frames=2)
        for k in range(10):
            sysm.track_stereo_features(
                _feats_at(pts, descs, rng, _pose(k)), k / 20.0, (0, 0, W, H)
            )
    finally:
        tr.Tracking._need_new_keyframe = orig_need
    m = sysm.atlas.get_current_map()
    kf = sysm.tracker.ref_kf
    assert m.n_keyframes() > 2 and kf is not None

    in_solve = threading.Event()
    release = threading.Event()
    orig = lba_mod.bundle_adjust

    def instrumented(pr, **kw):
        in_solve.set()
        assert release.wait(30)
        return orig(pr, **kw)

    monkeypatch.setattr(lba_mod, "bundle_adjust", instrumented)
    t = threading.Thread(
        target=lambda: lba_mod.local_bundle_adjustment(
            kf, m, map_lock=m.update_lock
        )
    )
    t.start()
    assert in_solve.wait(30), "LBA never reached the solve"
    # while the solve is in flight the map-update lock must be acquirable
    # by another thread (i.e. the tracker)
    acquired = m.update_lock.acquire(timeout=5)
    assert acquired, "map-update lock held during the LM solve"
    m.update_lock.release()
    release.set()
    t.join(60)
    assert not t.is_alive()
    sysm.shutdown()
