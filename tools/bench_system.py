"""End-to-end SLAM system throughput on the real chip.

Unlike bench.py (device front-end only), this drives the WHOLE system —
device extraction+stereo-matching on the TPU, host tracking / local mapping /
BA — over a synthetic image sequence with the 1-frame prefetch pipeline
(System.prefetch_stereo / track_stereo_prefetched), so the relay's fixed
per-dispatch latency overlaps the previous frame's host work exactly as the
reference's GPU/CPU threads overlap (SURVEY §2d).

Prints one JSON line per mode.  Reference end-to-end stage means on EuRoC
MH01 stereo: extraction 38.5 ms + stereo match 7.7 ms + pose predict 434.7 ms
+ local-map track 588.0 ms per frame (/root/reference/ExecMean.txt:6-9; the
tracking stages are from the committed pathological run — the honest
comparison is against extraction+matching plus a sane tracking budget).

Usage: python tools/bench_system.py [n_frames] [h] [w]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(n_frames=120, h=480, w=752):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from orbslam3_tpu.cameras.models import Pinhole
    from orbslam3_tpu.oracle.orb_cpu import PyramidParams
    from orbslam3_tpu.slam.system import System
    from orbslam3_tpu.utils.synth import stereo_sequence, ate_rmse

    fx = 350.0
    camera = Pinhole([fx, fx, w / 2, h / 2])
    baseline = 0.12
    mbf = fx * baseline
    params = PyramidParams(n_features=1000)

    frames = stereo_sequence(n_frames, camera, baseline, h, w, seed=1)
    imgs = [(l, r) for (l, r, _) in frames]
    gt_poses = [t for (_, _, t) in frames]

    # threaded (reference-parity) configuration: LocalMapping runs on its
    # own worker thread, so KF-insertion work (triangulation, fuse, local
    # BA — the reference's 1155/4216 ms stages) overlaps tracking instead
    # of blocking the frame; the native hot loops release the GIL.
    sysm = System(camera, mbf, params, sequential=False)

    # warmup: first frames pay the one-off compile
    warm = min(10, n_frames // 4)
    est, gt = [], []
    times = []
    handle = sysm.prefetch_stereo(*imgs[0])
    t_all0 = time.perf_counter()
    for k in range(n_frames):
        t0 = time.perf_counter()
        if k + 1 < n_frames:
            next_handle = sysm.prefetch_stereo(*imgs[k + 1])
        pose = sysm.track_stereo_prefetched(handle, k / 20.0)
        if k + 1 < n_frames:
            handle = next_handle
        dt = (time.perf_counter() - t0) * 1e3
        if k >= warm:
            times.append(dt)
        if pose is not None:
            est.append(pose)
            gt.append(gt_poses[k])
    wall = time.perf_counter() - t_all0
    sysm.shutdown()

    times = np.array(times)
    rmse = ate_rmse(est, gt) if len(est) >= 2 else float("nan")
    tracked = len(est)
    print(json.dumps({
        "metric": "slam_system_ms_per_frame_pipelined",
        "value": round(float(np.median(times)), 2),
        "unit": "ms",
        "mean": round(float(times.mean()), 2),
        "p90": round(float(np.percentile(times, 90)), 2),
        "fps": round(1e3 / float(np.median(times)), 1),
        "frames": n_frames,
        "tracked": tracked,
        "ate_rmse_m": round(float(rmse), 4),
        "note": ("device front-end + full host tracking, 1-frame prefetch "
                 "pipeline; on the relay each dispatch carries a fixed "
                 "~25 ms tunnel latency that the pipeline hides behind "
                 "host work"),
    }), flush=True)
    print(json.dumps({
        "metric": "slam_system_wall_s",
        "value": round(wall, 2),
        "unit": "s",
    }), flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    main(*args)
