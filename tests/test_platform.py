"""Settings YAML, atlas persistence, benchmark lib, headless viewer."""

import os

import numpy as np
import pytest

EUROC_YAML = """%YAML:1.0
---
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: 458.654
Camera1.fy: 457.296
Camera1.cx: 367.215
Camera1.cy: 248.375
Camera1.k1: -0.28340811
Camera1.k2: 0.07395907
Camera1.p1: 0.00019359
Camera1.p2: 1.76187114e-05
Camera2.fx: 457.587
Camera2.fy: 456.134
Camera2.cx: 379.999
Camera2.cy: 255.238
Camera2.k1: -0.28368365
Camera2.k2: 0.07451284
Camera2.p1: -0.00010473
Camera2.p2: -3.55590700e-05
Camera.width: 752
Camera.height: 480
Camera.fps: 20
Camera.RGB: 1
Stereo.ThDepth: 35.0
Stereo.T_c1_c2: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [1.0, 0.0, 0.0, 0.110074, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0]
Stereo.b: 0.110074
IMU.NoiseGyro: 1.7e-04
IMU.NoiseAcc: 2.0e-03
IMU.GyroWalk: 1.9e-05
IMU.AccWalk: 3.0e-03
IMU.Frequency: 200.0
IMU.T_b_c1: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975,
         0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768,
         -0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949,
         0.0, 0.0, 0.0, 1.0]
ORBextractor.nFeatures: 1200
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
Viewer.KeyFrameSize: 0.05
"""


def test_settings_parse_euroc_style(tmp_path):
    from orbslam3_tpu.utils.settings import load_settings

    p = tmp_path / "euroc.yaml"
    p.write_text(EUROC_YAML)
    s = load_settings(str(p), sensor="stereo")
    assert s.camera_type == "PinHole"
    np.testing.assert_allclose(s.camera1[:2], [458.654, 457.296])
    assert s.dist1 is not None and abs(s.dist1[0] + 0.2834) < 1e-3
    assert s.camera2 is not None
    assert s.Tlr.shape == (4, 4) and abs(s.Tlr[0, 3] - 0.110074) < 1e-9
    assert abs(s.bf - 0.110074 * 458.654) < 1e-6
    assert s.imu_freq == 200.0
    assert abs(s.imu_noise_gyro - 1.7e-4 * np.sqrt(200)) < 1e-9
    assert s.Tbc.shape == (4, 4)
    assert s.n_features == 1200
    cam = s.make_camera(1)
    assert cam.fx == 458.654
    params = s.make_orb_params()
    assert params.n_features == 1200
    assert "Viewer.KeyFrameSize" in s.viewer


@pytest.mark.slow
def test_system_from_files_and_atlas_roundtrip(tmp_path):
    from orbslam3_tpu.slam.system import System
    from orbslam3_tpu.utils.synth import stereo_sequence
    from orbslam3_tpu.cameras.models import Pinhole
    from orbslam3_tpu.oracle.orb_cpu import PyramidParams

    camera = Pinhole([350.0, 350.0, 256.0, 192.0])
    mbf = 350.0 * 0.12
    frames = stereo_sequence(8, camera, 0.12, 384, 512, seed=1)
    sysm = System(camera, mbf, PyramidParams(n_features=700), sequential=True)
    for k, (il, ir, tg) in enumerate(frames):
        sysm.track_stereo(il, ir, k / 20.0)
    stats0 = sysm.map_stats()
    assert stats0["n_keyframes"] >= 1

    p = str(tmp_path / "atlas.pkl")
    sysm.save_atlas(p)
    sys2 = System(camera, mbf, PyramidParams(n_features=700), sequential=True)
    sys2.load_atlas(p)
    stats1 = sys2.map_stats()
    assert stats1 == stats0
    kfs0 = sysm.atlas.get_current_map().get_all_keyframes()
    kfs1 = sys2.atlas.get_current_map().get_all_keyframes()
    np.testing.assert_allclose(kfs0[-1].Tcw.matrix(), kfs1[-1].Tcw.matrix())
    # covisibility survives
    assert len(kfs1[0].get_connected_keyframes()) == len(kfs0[0].get_connected_keyframes())


def test_benchmark_lib(tmp_path):
    from orbslam3_tpu.utils.benchmark import Benchmark

    csv = str(tmp_path / "bench.csv")
    b = Benchmark(csv_path=csv, flush_interval=0.05)
    import time

    for _ in range(5):
        with b.measure("stage.a"):
            time.sleep(0.002)
    with b.measure("stage.b"):
        pass
    time.sleep(0.15)
    b.shutdown()
    summary = b.summary()
    assert summary["stage.a"][2] == 5
    assert summary["stage.a"][0] >= 1.5
    lines = open(csv).read().strip().splitlines()
    assert lines[0] == "tag,timestamp,duration_ms"
    assert sum("stage.a" in ln for ln in lines) == 5
    out = str(tmp_path / "ExecMean.txt")
    b.write_exec_mean(out)
    assert "stage.a" in open(out).read()


@pytest.mark.slow
def test_headless_viewer(tmp_path):
    from orbslam3_tpu.slam.system import System
    from orbslam3_tpu.utils.synth import stereo_sequence
    from orbslam3_tpu.utils.viewer import Viewer
    from orbslam3_tpu.cameras.models import Pinhole
    from orbslam3_tpu.oracle.orb_cpu import PyramidParams

    camera = Pinhole([350.0, 350.0, 256.0, 192.0])
    frames = stereo_sequence(3, camera, 0.12, 384, 512, seed=1)
    sysm = System(camera, 42.0, PyramidParams(n_features=700), sequential=True)
    viewer = Viewer(sysm, str(tmp_path / "viz"), map_every=2)
    for k, (il, ir, tg) in enumerate(frames):
        sysm.track_stereo(il, ir, k / 20.0)
        viewer.update(il)
    files = os.listdir(tmp_path / "viz")
    assert sum(f.startswith("frame_") for f in files) == 3
    assert sum(f.startswith("map_") for f in files) >= 1


@pytest.mark.slow
def test_viewer_worker_thread_sequence_dump(tmp_path):
    """Worker-thread viewer (Viewer::Run role, src/Viewer.cc:162): renders
    off the tracking thread across a full synth sequence, honors
    pause/step, drains on finish."""
    import time

    from orbslam3_tpu.slam.system import System
    from orbslam3_tpu.utils.synth import stereo_sequence
    from orbslam3_tpu.utils.viewer import Viewer
    from orbslam3_tpu.cameras.models import Pinhole
    from orbslam3_tpu.oracle.orb_cpu import PyramidParams

    camera = Pinhole([350.0, 350.0, 256.0, 192.0])
    frames = stereo_sequence(8, camera, 0.12, 384, 512, seed=1)
    sysm = System(camera, 42.0, PyramidParams(n_features=700), sequential=True)
    viewer = Viewer(sysm, str(tmp_path / "viz"), map_every=3)
    sysm.viewer = viewer
    viewer.start()
    assert viewer.running()

    def _wait_drawn(n, deadline=20.0):
        # deadline-poll: fixed sleeps flake on a loaded 1-CPU box where the
        # render worker may not get scheduled for hundreds of ms
        t0 = time.monotonic()
        while viewer.frames_drawn < n and time.monotonic() - t0 < deadline:
            time.sleep(0.02)
        return viewer.frames_drawn

    for k, (il, ir, tg) in enumerate(frames[:5]):
        sysm.track_stereo(il, ir, k / 20.0)  # viewer.update via System
        _wait_drawn(k + 1)  # drain each frame (exercises the worker loop)
    # pause: snapshots accepted, no rendering
    viewer.request_pause()
    drawn_at_pause = viewer.frames_drawn
    sysm.track_stereo(frames[5][0], frames[5][1], 5 / 20.0)
    time.sleep(0.3)
    assert viewer.frames_drawn == drawn_at_pause
    # step renders exactly the one pending frame
    viewer.step()
    assert _wait_drawn(drawn_at_pause + 1) == drawn_at_pause + 1
    viewer.resume()
    for k in (6, 7):
        sysm.track_stereo(frames[k][0], frames[k][1], k / 20.0)
        _wait_drawn(viewer.frames_drawn + 1, deadline=5.0)
    sysm.shutdown()  # request_finish + drain
    assert not viewer.running()
    files = os.listdir(tmp_path / "viz")
    n_frames = sum(f.startswith("frame_") for f in files)
    assert n_frames >= 6, files  # latest-wins may drop a few, not most
    assert sum(f.startswith("map_") for f in files) >= 2


TUMVI_YAML = """%YAML:1.0
---
File.version: "1.0"
Camera.type: "KannalaBrandt8"
Camera1.fx: 190.978477
Camera1.fy: 190.973307
Camera1.cx: 254.931706
Camera1.cy: 256.897442
Camera1.k1: 0.003482389402
Camera1.k2: 0.000715034845
Camera1.k3: -0.002053236141
Camera1.k4: 0.000202936736
Camera1.overlappingBegin: 0
Camera1.overlappingEnd: 511
Camera2.fx: 190.44236969
Camera2.fy: 190.4344384
Camera2.cx: 252.59949089
Camera2.cy: 254.91723356
Camera2.k1: 0.0034003170790
Camera2.k2: 0.001976708358
Camera2.k3: -0.002950517290
Camera2.k4: 0.00067033991
Camera2.overlappingBegin: 0
Camera2.overlappingEnd: 511
Camera.width: 512
Camera.height: 512
Camera.fps: 20
Camera.RGB: 1
Stereo.ThDepth: 40.0
Stereo.T_c1_c2: !!opencv-matrix
   rows: 4
   cols: 4
   dt: f
   data: [0.999997256,0.002312067,0.000376008,0.101063,
          -0.002317135,0.999898049,0.014089835,0.001946,
          -0.000343393,-0.014090668,0.99990063,0.001015,
          0.0,0.0,0.0,1.0]
Stereo.b: 0.101
IMU.NoiseGyro: 0.00016
IMU.NoiseAcc: 0.0028
IMU.GyroWalk: 0.000022
IMU.AccWalk: 0.00086
IMU.Frequency: 200.0
IMU.T_b_c1: !!opencv-matrix
   rows: 4
   cols: 4
   dt: f
   data: [-0.9995250378696743,0.029615343885863205,-0.008522328211654736,0.04727988224914392,
          0.0075019185074052044,-0.03439736061393144,-0.9993800792498829,-0.047443232143367084,
          -0.02989013031643309,-0.998969345370175,0.03415885127385616,-0.0681999605066297,
          0.0,0.0,0.0,1.0]
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
Viewer.KeyFrameSize: 0.05
"""


def test_system_from_files_fisheye_inertial(tmp_path):
    """TUM-VI-style KB8 stereo-inertial settings wire the fisheye front-end
    (camera2/Tlr/lapping) and the IMU calib through from_files."""
    from orbslam3_tpu.cameras.models import KannalaBrandt8
    from orbslam3_tpu.slam.system import System

    p = tmp_path / "tumvi.yaml"
    p.write_text(TUMVI_YAML)
    sysm = System.from_files(None, str(p), sensor="stereo-inertial")
    assert isinstance(sysm.camera, KannalaBrandt8)
    assert isinstance(sysm.camera2, KannalaBrandt8)
    assert sysm.lapping1 == (0.0, 511.0)
    assert sysm.Tlr is not None
    assert abs(sysm.Tlr.t[0] - 0.101063) < 1e-6
    assert abs(sysm.mbf - 0.101 * 190.978477) < 1e-4
    assert sysm.imu_calib is not None
    assert abs(sysm.imu_calib.Tbc.t[0] - 0.04727988) < 1e-6
    assert sysm.tracker.imu_calib is sysm.imu_calib
    assert sysm.local_mapper.imu_calib is sysm.imu_calib


def test_timestamp_jump_forks_map(small_image):
    """Tracking3.cc:66-104 parity: an out-of-order timestamp forks a fresh
    map instead of corrupting the current one."""
    import numpy as np

    from orbslam3_tpu.cameras.models import Pinhole
    from orbslam3_tpu.oracle.orb_cpu import PyramidParams
    from orbslam3_tpu.slam.system import System
    from orbslam3_tpu.slam.tracking import TrackingState
    from orbslam3_tpu.utils.synth import stereo_sequence

    camera = Pinhole([250.0, 250.0, 160.0, 120.0])
    frames = stereo_sequence(3, camera, 0.12, 240, 320, seed=4)
    sysm = System(camera, 30.0, PyramidParams(n_features=600), sequential=True)
    sysm.track_stereo(frames[0][0], frames[0][1], 0.0)
    sysm.track_stereo(frames[1][0], frames[1][1], 0.05)
    assert sysm.get_tracking_state() == TrackingState.OK
    n_maps_before = sysm.atlas.count_maps()
    # frame with an OLDER timestamp -> fork
    pose = sysm.track_stereo(frames[2][0], frames[2][1], 0.01)
    assert pose is None
    assert sysm.atlas.count_maps() == n_maps_before + 1
    assert sysm.get_tracking_state() == TrackingState.NOT_INITIALIZED


def test_prefetch_pipeline_matches_synchronous(small_image):
    """prefetch_stereo + track_stereo_prefetched == track_stereo (the async
    frame-pipelining path, ORBExtractorCUDA.cc:691-744 design revived)."""
    import numpy as np

    from orbslam3_tpu.cameras.models import Pinhole
    from orbslam3_tpu.oracle.orb_cpu import PyramidParams
    from orbslam3_tpu.slam.system import System
    from orbslam3_tpu.utils.synth import stereo_sequence

    camera = Pinhole([250.0, 250.0, 160.0, 120.0])
    frames = stereo_sequence(4, camera, 0.12, 240, 320, seed=5)
    s_sync = System(camera, 30.0, PyramidParams(n_features=600), sequential=True)
    s_pipe = System(camera, 30.0, PyramidParams(n_features=600), sequential=True)
    poses_sync = [s_sync.track_stereo(il, ir, k / 20.0)
                  for k, (il, ir, _) in enumerate(frames)]
    # pipelined drive: prefetch N+1 before consuming N
    handles = [s_pipe.prefetch_stereo(frames[0][0], frames[0][1])]
    poses_pipe = []
    for k in range(len(frames)):
        if k + 1 < len(frames):
            handles.append(s_pipe.prefetch_stereo(frames[k + 1][0], frames[k + 1][1]))
        poses_pipe.append(s_pipe.track_stereo_prefetched(handles[k], k / 20.0))
    for a, b in zip(poses_sync, poses_pipe):
        assert (a is None) == (b is None)
        if a is not None:
            np.testing.assert_allclose(a.t, b.t, atol=1e-12)
            np.testing.assert_allclose(a.R, b.R, atol=1e-12)


def test_system_small_api_parity(tmp_path):
    """System probe/utility parity: isShutDown, isFinished, ChangeDataset,
    GetImageScale, Insert*Time, SaveKeyFrameTrajectoryEuRoC
    (include/System.h:131-200 roles)."""
    import numpy as np

    from orbslam3_tpu.oracle.orb_cpu import PyramidParams
    from orbslam3_tpu.slam.system import System
    from orbslam3_tpu.utils.benchmark import Benchmark
    from test_fabricated_e2e import CAM, MBF, W, H, _feats_at, _pose, _world

    pts, descs, rng = _world()
    sysm = System(CAM, MBF, PyramidParams(n_features=800),
                  sequential=True, max_frames=4)
    for k in range(10):
        feats = _feats_at(pts, descs, rng, _pose(k))
        sysm.track_stereo_features(feats, k / 20.0, (0, 0, W, H))

    assert sysm.get_image_scale() == 1.0
    assert not sysm.is_finished()  # no VI init -> GetTimeFromIMUInit == 0

    Benchmark.the().enabled = True
    sysm.insert_rect_time(1.5)
    sysm.insert_track_time(7.0)
    assert "1.0_Track" in Benchmark.the().summary()

    p = str(tmp_path / "kf_euroc.txt")
    sysm.save_keyframe_trajectory_euroc(p)
    rows = [l.split() for l in open(p) if l.strip()]
    assert len(rows) == sysm.map_stats()["n_keyframes"]
    assert float(rows[0][0]) >= 0  # ns stamps

    # ChangeDataset with a small map resets in place (System.cc:1320)
    m_before = sysm.atlas.get_current_map()
    n_maps = sysm.atlas.count_maps()
    if m_before.n_keyframes() < 12:
        sysm.change_dataset()
        assert sysm.atlas.count_maps() == n_maps
        assert sysm.atlas.get_current_map().n_keyframes() == 0
    # ...and a large map forks a fresh one (System.cc:1323)
    for k in range(30):
        feats = _feats_at(pts, descs, rng, _pose(k))
        sysm.track_stereo_features(feats, 10.0 + k / 20.0, (0, 0, W, H))
    if sysm.atlas.get_current_map().n_keyframes() >= 12:
        n_maps = sysm.atlas.count_maps()
        sysm.change_dataset()
        assert sysm.atlas.count_maps() == n_maps + 1

    assert not sysm.is_shutdown()
    sysm.shutdown()
    assert sysm.is_shutdown()
