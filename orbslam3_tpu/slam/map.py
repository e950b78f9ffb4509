"""Map + Atlas: the multi-map landmark/keyframe store.

Role-parity with /root/reference/include/Map.h (208 LoC) and Atlas.h
(170 LoC): keyframe/map-point sets, reference map points for drawing,
change index, ApplyScaledRotation for inertial gravity/scale alignment;
Atlas holds many maps, one current, and creates a fresh map on tracking
loss (the reference's elastic-recovery mechanism, SURVEY §5.3).
"""

from __future__ import annotations

import threading

import numpy as np

from orbslam3_tpu.utils.lie import SE3


class Map:
    _next_id = 0

    def __init__(self):
        self.id = Map._next_id
        Map._next_id += 1
        self.keyframes: set = set()
        self.map_points: set = set()
        self.ref_map_points: list = []
        self.max_kf_id = 0
        self.init_kf_id = 0
        self.change_idx = 0
        self.imu_initialized = False
        self.iniertial_ba1 = False
        self.iniertial_ba2 = False
        self.is_inertial = False
        self.bad = False
        self.lock = threading.RLock()
        # coarse map-update mutex (mMutexMapUpdate role): held by Tracking
        # for a whole frame and by loop correction / merge / BA write-backs;
        # distinct from `lock`, which guards the containers fine-grained
        self.update_lock = threading.RLock()
        self.origin_kfs: list = []

    def __getstate__(self):
        state = self.__dict__.copy()
        state.pop("lock", None)
        state.pop("update_lock", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self.lock = threading.RLock()
        self.update_lock = threading.RLock()

    def add_keyframe(self, kf):
        with self.lock:
            if not self.keyframes:
                # per-map initial keyframe (Map::GetInitKFid role) — culling
                # and SetBadFlag protect it, not the process-global id 0
                self.init_kf_id = kf.id
            self.keyframes.add(kf)
            if kf.id > self.max_kf_id:
                self.max_kf_id = kf.id
            if not self.origin_kfs:
                self.origin_kfs.append(kf)

    def add_map_point(self, mp):
        with self.lock:
            self.map_points.add(mp)

    def erase_map_point(self, mp):
        with self.lock:
            self.map_points.discard(mp)

    def erase_keyframe(self, kf):
        with self.lock:
            self.keyframes.discard(kf)

    def get_all_keyframes(self) -> list:
        with self.lock:
            return sorted(self.keyframes, key=lambda k: k.id)

    def get_all_map_points(self) -> list:
        with self.lock:
            return list(self.map_points)

    def n_map_points(self) -> int:
        return len(self.map_points)

    def n_keyframes(self) -> int:
        return len(self.keyframes)

    def info_changed(self):
        with self.lock:
            self.change_idx += 1

    def apply_scaled_rotation(self, T: SE3, scale: float, scale_vel: bool = False):
        """Align the map to a new gravity/scale frame (Map::ApplyScaledRotation):
        every KF pose and MP position is transformed by (s, R, t)."""
        with self.lock:
            r, t = T.R, T.t
            for kf in self.keyframes:
                twc = kf.Twc
                twc_new = SE3(r @ twc.R, scale * (r @ twc.t) + t)
                kf.set_pose(twc_new.inverse())
                if hasattr(kf, "velocity") and kf.velocity is not None and scale_vel:
                    kf.velocity = scale * (r @ kf.velocity)
            for mp in self.map_points:
                mp.position = scale * (r @ mp.position) + t
                mp.update_normal_and_depth()
            self.change_idx += 1


class Atlas:
    def __init__(self):
        self.maps: list[Map] = []
        self.current: Map | None = None
        self.cameras: list = []
        self.lock = threading.RLock()
        self.create_new_map()

    def __getstate__(self):
        state = self.__dict__.copy()
        state.pop("lock", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self.lock = threading.RLock()

    def create_new_map(self) -> Map:
        with self.lock:
            m = Map()
            self.maps.append(m)
            self.current = m
            return m

    def change_map(self, m: Map):
        with self.lock:
            self.current = m

    def add_camera(self, cam):
        if cam not in self.cameras:
            self.cameras.append(cam)
        return cam

    def get_current_map(self) -> Map:
        return self.current

    def get_all_maps(self) -> list[Map]:
        return list(self.maps)

    def set_map_bad(self, m: Map):
        m.bad = True

    def remove_bad_maps(self):
        self.maps = [m for m in self.maps if not m.bad]

    def count_maps(self) -> int:
        return len(self.maps)

    # aggregate views
    def add_keyframe(self, kf):
        self.current.add_keyframe(kf)

    def add_map_point(self, mp):
        self.current.add_map_point(mp)
