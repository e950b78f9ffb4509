"""MapPoint: a triangulated 3D landmark with its observations.

Role-parity with /root/reference/include/MapPoint.h (256 LoC) /
src/MapPoint.cc (634 LoC): observations registry, distinctive-descriptor
selection (min median Hamming), viewing normal + scale-invariance distance
range, visibility/found counters, replacement and culling support — written
as a compact host-side class with vectorized descriptor math.
"""

from __future__ import annotations

import numpy as np

_POPCNT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1)


def hamming_rows(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise Hamming distances between (N, 32) and (M, 32) -> (N, M)."""
    x = a[:, None, :] ^ b[None, :, :]
    return _POPCNT[x].sum(axis=-1)


class MapPoint:
    _next_id = 0

    def __init__(self, position: np.ndarray, ref_kf, map_):
        self.id = MapPoint._next_id
        MapPoint._next_id += 1
        self.position = np.asarray(position, np.float64).copy()
        self.ref_kf = ref_kf
        self.map = map_
        self.observations: dict = {}  # kf -> (left_idx, right_idx); -1 = none
        self.n_obs = 0
        self.descriptor = np.zeros(32, np.uint8)
        self.normal = np.zeros(3)
        self.min_distance = 0.0
        self.max_distance = 0.0
        self.bad = False
        self.replaced_by = None
        self.n_visible = 1
        self.n_found = 1
        self.first_kf_id = ref_kf.id if ref_kf is not None else -1
        self.track_in_view = False
        self.track_proj = None  # (u, v, ur, level, view_cos) while tracking
        self.last_frame_seen = -1

    # ------------------------------------------------------------------
    def add_observation(self, kf, idx: int):
        left, right = self.observations.get(kf, (-1, -1))
        if idx >= kf.n_left:
            right = idx
        else:
            left = idx
        if self.observations.get(kf, (-1, -1)) == (-1, -1):
            self.n_obs += 2 if (left >= 0 and kf.u_right[left] >= 0) else 1
        self.observations[kf] = (left, right)

    def erase_observation(self, kf):
        if kf in self.observations:
            left, right = self.observations.pop(kf)
            if left >= 0 and kf.u_right[left] >= 0:
                self.n_obs -= 2
            else:
                self.n_obs -= 1
            if self.ref_kf is kf and self.observations:
                self.ref_kf = next(iter(self.observations))
            if self.n_obs <= 2:
                self.set_bad()

    def set_bad(self):
        self.bad = True
        obs = dict(self.observations)
        self.observations.clear()
        for kf, (left, right) in obs.items():
            if left >= 0:
                kf.map_points[left] = None
            if right >= 0:
                kf.map_points[right] = None
        if self.map is not None:
            self.map.erase_map_point(self)

    def replace(self, other: "MapPoint"):
        """Fuse this point into `other` (MapPoint::Replace semantics)."""
        if other.id == self.id:
            return
        obs = dict(self.observations)
        self.observations.clear()
        self.bad = True
        self.replaced_by = other
        for kf, (left, right) in obs.items():
            for idx in (left, right):
                if idx < 0:
                    continue
                if kf not in other.observations:
                    kf.map_points[idx] = other
                    other.add_observation(kf, idx)
                else:
                    kf.map_points[idx] = None
        other.n_found += self.n_found
        other.n_visible += self.n_visible
        other.compute_distinctive_descriptor()
        if self.map is not None:
            self.map.erase_map_point(self)

    def get_replaced(self):
        mp = self
        while mp.replaced_by is not None:
            mp = mp.replaced_by
        return mp

    # ------------------------------------------------------------------
    def compute_distinctive_descriptor(self):
        """Min-median-Hamming representative (ComputeDistinctiveDescriptors)."""
        descs = []
        for kf, (left, right) in self.observations.items():
            if kf.bad:
                continue
            if left >= 0:
                descs.append(kf.desc[left])
            if right >= 0:
                descs.append(kf.desc[right])
        if not descs:
            return
        d = np.asarray(descs)
        dist = hamming_rows(d, d)
        med = np.median(dist, axis=1)
        self.descriptor = d[int(np.argmin(med))].copy()

    def update_normal_and_depth(self):
        if not self.observations or self.ref_kf is None:
            return
        normals = []
        for kf, (left, right) in self.observations.items():
            v = self.position - kf.camera_center()
            nv = np.linalg.norm(v)
            if nv > 1e-9:
                normals.append(v / nv)
                if right >= 0 and left < 0:
                    pass
        if not normals:
            return
        self.normal = np.mean(normals, axis=0)
        nn = np.linalg.norm(self.normal)
        if nn > 1e-9:
            self.normal /= nn
        left, right = self.observations.get(self.ref_kf, (-1, -1))
        idx = left if left >= 0 else right
        if idx < 0:
            idx = 0
        dist = np.linalg.norm(self.position - self.ref_kf.camera_center())
        level = int(self.ref_kf.octave[idx]) if idx < self.ref_kf.n else 0
        factor = self.ref_kf.scale_factors[level]
        n_levels = self.ref_kf.n_levels
        self.max_distance = dist * factor
        self.min_distance = self.max_distance / self.ref_kf.scale_factors[n_levels - 1]

    def predict_scale(self, dist: float, frame) -> int:
        """Octave the point would be detected at (MapPoint::PredictScale)."""
        ratio = self.max_distance / max(dist, 1e-9)
        level = int(np.ceil(np.log(ratio) / frame.log_scale_factor))
        return int(np.clip(level, 0, frame.n_levels - 1))

    def increase_visible(self, n=1):
        self.n_visible += n

    def increase_found(self, n=1):
        self.n_found += n

    @property
    def found_ratio(self) -> float:
        return self.n_found / max(self.n_visible, 1)
