"""Multi-robot sharing: one batched device dispatch feeding N Systems.

Drives examples/run_multi_robot.py's loop at a small geometry: each
step's fleet-wide front-end is ONE prefetch_stereo_batch dispatch whose
per-row handles are consumed by DIFFERENT System instances.  Pins that
the shared-dispatch path is equivalent to per-robot tracking (maps stay
independent, both robots track their own world).
"""

import os
import sys

import pytest

pytestmark = pytest.mark.slow  # real extraction path: nightly tier


def test_two_robots_share_one_dispatch():
    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "examples")
    )
    import run_multi_robot as mr

    from orbslam3_tpu.utils.synth import ate_rmse

    systems, est, gt = mr.main(
        n_robots=2, n_frames=12, n_features=600, h=240, w=352
    )
    for r in range(2):
        assert len(est[r]) >= 11, f"robot {r} lost tracking"
        assert ate_rmse(est[r], gt[r]) < 0.05
    # independent maps: no shared keyframes/points between the systems
    m0 = systems[0].atlas.get_current_map()
    m1 = systems[1].atlas.get_current_map()
    assert m0 is not m1
    ids0 = {id(kf) for kf in m0.get_all_keyframes()}
    ids1 = {id(kf) for kf in m1.get_all_keyframes()}
    assert not (ids0 & ids1)
    assert m0.n_map_points() > 100 and m1.n_map_points() > 100
