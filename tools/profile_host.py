"""cProfile of the host tracking loop on the fabricated-feature world."""

import cProfile
import pstats
import sys
import time

sys.path.insert(0, "tests")
import numpy as np

from test_fabricated_e2e import _world, _feats_at, _pose, CAM, MBF, W, H, N_FRAMES
from orbslam3_tpu.oracle.orb_cpu import PyramidParams
from orbslam3_tpu.slam.system import System


def run():
    pts, descs, rng = _world()
    sysm = System(CAM, MBF, PyramidParams(n_features=800),
                  sequential=True, max_frames=6)
    t0 = time.perf_counter()
    for k in range(N_FRAMES):
        feats = _feats_at(pts, descs, rng, _pose(k))
        sysm.track_stereo_features(feats, k / 20.0, (0, 0, W, H))
    dt = time.perf_counter() - t0
    print(f"{N_FRAMES} frames in {dt:.2f}s = {dt/N_FRAMES*1e3:.1f} ms/frame")


if __name__ == "__main__":
    if "--plain" in sys.argv:
        run()
    else:
        prof = cProfile.Profile()
        prof.enable()
        run()
        prof.disable()
        st = pstats.Stats(prof)
        st.sort_stats("cumulative").print_stats(28)
