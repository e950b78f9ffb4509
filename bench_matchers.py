"""Host vs device SearchByProjection at realistic candidate counts.

VERDICT round-1 item 7: measure both TrackLocalMap matcher paths at
500/2000/10000 map points and put the faster one in the loop.  Prints one
JSON line per configuration.  The tracking-loop threshold
(slam/matchers.DEVICE_MATCH_MIN) is set from these numbers.

Run on the TPU-attached environment: `python bench_matchers.py`.
Note the axon relay pins every device dispatch at ~45 ms; on a directly
attached chip the device column shrinks by that constant.
"""

import json
import time

import numpy as np

from orbslam3_tpu.cameras.models import Pinhole
from orbslam3_tpu.slam import matchers
from orbslam3_tpu.slam.frame import Frame
from orbslam3_tpu.slam.map_point import MapPoint
from orbslam3_tpu.utils.lie import SE3


def make_scene(n_mps: int, n_kps: int = 1000, seed: int = 0):
    rng = np.random.default_rng(seed)
    cam = Pinhole([400.0, 400.0, 320.0, 240.0])
    scales = 1.2 ** np.arange(8)
    pts = rng.uniform(-1, 1, (n_mps, 3)) * [4, 3, 2] + [0, 0, 8]
    # keypoints: projections of a subset + clutter
    vis = pts[: n_kps // 2]
    uv_vis = cam.project(vis) + rng.normal(0, 0.5, (len(vis), 2))
    uv_clutter = rng.uniform([0, 0], [640, 480], (n_kps - len(vis), 2))
    uv = np.concatenate([uv_vis, uv_clutter])
    descs = rng.integers(0, 256, (n_mps, 32)).astype(np.uint8)
    kp_desc = np.concatenate(
        [descs[: n_kps // 2], rng.integers(0, 256, (n_kps - n_kps // 2, 32)).astype(np.uint8)]
    )
    frame = Frame(
        kps=uv, octave=np.zeros(n_kps, np.int32), angle=np.zeros(n_kps, np.float32),
        response=np.ones(n_kps, np.float32), desc=kp_desc, camera=cam,
        scale_factors=scales, mbf=0.0,
    )
    frame.set_image_bounds(0, 0, 640, 480)
    frame.set_pose(SE3())
    mps = []
    for k in range(n_mps):
        mp = MapPoint(pts[k], None, None)
        mp.descriptor = descs[k]
        proj = cam.project(pts[k][None])[0]
        mp.track_in_view = bool(0 <= proj[0] < 640 and 0 <= proj[1] < 480)
        mp.track_proj = (proj[0], proj[1], -1.0, 0, 1.0)
        mps.append(mp)
    return frame, mps


def bench(fn, frame, reps=5):
    best = np.inf
    for _ in range(reps):
        frame.map_points[:] = None
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    for n in (500, 2000, 10000):
        frame, mps = make_scene(n)
        t_host = bench(
            lambda: matchers.search_by_projection_local_map(frame, mps, th=2.0),
            frame,
        )
        # warm the device jit cache (first call compiles)
        matchers.search_by_projection_local_map_device(frame, mps, th=2.0)
        t_dev = bench(
            lambda: matchers.search_by_projection_local_map_device(frame, mps, th=2.0),
            frame,
        )
        faster = "host" if t_host <= t_dev else "device"
        print(json.dumps({
            "metric": f"search_by_projection_{n}_mps_ms",
            "host_ms": round(t_host, 2),
            "device_ms": round(t_dev, 2),
            "faster": faster,
        }))


if __name__ == "__main__":
    main()
