"""Host-side Frame container.

Mirrors the role of the reference Frame (/root/reference/include/Frame.h:53,
src/Frame.cc) — per-frame keypoints/descriptors, stereo depths, pose, the
64x48 feature grid for windowed queries, frustum checks — consuming the
device front-end's FrameFeatures block instead of running extraction
in-line.  Data lives in flat NumPy arrays (structure-of-arrays), not
per-keypoint objects; all queries are vectorized.
"""

from __future__ import annotations

import numpy as np

from orbslam3_tpu.utils.lie import SE3

GRID_COLS = 64
GRID_ROWS = 48


class Frame:
    _next_id = 0

    def __init__(
        self,
        kps: np.ndarray,          # (N, 2) keypoint pixels (raw)
        octave: np.ndarray,       # (N,)
        angle: np.ndarray,        # (N,)
        response: np.ndarray,     # (N,)
        desc: np.ndarray,         # (N, 32) uint8
        camera,
        scale_factors: np.ndarray,
        timestamp: float = 0.0,
        u_right: np.ndarray | None = None,
        depth: np.ndarray | None = None,
        mbf: float = 0.0,
    ):
        self.id = Frame._next_id
        Frame._next_id += 1
        self.timestamp = timestamp
        self.camera = camera
        self.mbf = mbf
        self.mb = mbf / camera.fx if mbf > 0 else 0.0

        self.kps = np.asarray(kps, np.float64)
        self.octave = np.asarray(octave, np.int32)
        self.angle = np.asarray(angle, np.float32)
        self.response = np.asarray(response, np.float32)
        self.desc = np.asarray(desc, np.uint8)
        self.n = len(self.kps)
        self.u_right = (
            np.asarray(u_right, np.float64)
            if u_right is not None
            else np.full(self.n, -1.0)
        )
        self.depth = (
            np.asarray(depth, np.float64) if depth is not None else np.full(self.n, -1.0)
        )

        self.scale_factors = np.asarray(scale_factors, np.float64)
        self.inv_scale_factors = 1.0 / self.scale_factors
        self.level_sigma2 = self.scale_factors**2
        self.inv_level_sigma2 = 1.0 / self.level_sigma2
        self.n_levels = len(scale_factors)
        self.log_scale_factor = float(np.log(self.scale_factors[1] / self.scale_factors[0])) if self.n_levels > 1 else 1.0

        # undistorted keypoints (pinhole distortion; fisheye kps stay raw,
        # Frame::UndistortKeyPoints semantics)
        if hasattr(camera, "undistort_points"):
            self.kps_un = camera.undistort_points(self.kps) if self.n else self.kps.copy()
        else:
            self.kps_un = self.kps.copy()

        # pose (world -> camera)
        self.Tcw: SE3 | None = None

        # map point associations
        self.map_points = np.full(self.n, None, dtype=object)
        self.outlier = np.zeros(self.n, bool)

        # image bounds (for grid + frustum); set from camera/keypoints
        if self.n:
            self.min_x = float(self.kps_un[:, 0].min()) - 1
            self.max_x = float(self.kps_un[:, 0].max()) + 1
            self.min_y = float(self.kps_un[:, 1].min()) - 1
            self.max_y = float(self.kps_un[:, 1].max()) + 1
        else:
            self.min_x, self.max_x, self.min_y, self.max_y = 0.0, 1.0, 0.0, 1.0
        self._build_grid()

        self.ref_keyframe = None

    # ------------------------------------------------------------------
    def set_image_bounds(self, min_x, min_y, max_x, max_y):
        self.min_x, self.min_y, self.max_x, self.max_y = (
            float(min_x),
            float(min_y),
            float(max_x),
            float(max_y),
        )
        self._build_grid()

    def _build_grid(self):
        """64x48 bucketing of keypoints (AssignFeaturesToGrid semantics)."""
        self._grid_w = (self.max_x - self.min_x) / GRID_COLS
        self._grid_h = (self.max_y - self.min_y) / GRID_ROWS
        cx = ((self.kps_un[:, 0] - self.min_x) / self._grid_w).astype(np.int64)
        cy = ((self.kps_un[:, 1] - self.min_y) / self._grid_h).astype(np.int64)
        ok = (cx >= 0) & (cx < GRID_COLS) & (cy >= 0) & (cy < GRID_ROWS)
        cell = np.where(ok, cy * GRID_COLS + cx, GRID_COLS * GRID_ROWS)
        order = np.argsort(cell, kind="stable")
        self._grid_order = order
        self._grid_cell_sorted = cell[order]
        self._grid_starts = np.searchsorted(
            self._grid_cell_sorted, np.arange(GRID_COLS * GRID_ROWS + 1)
        )

    def set_pose(self, Tcw: SE3):
        # normalized(): see SE3.normalized — unnormalized persistent poses
        # corrupt exponentially through re-anchoring chains
        self.Tcw = Tcw.normalized()
        self._Twc_cache = None

    @property
    def Twc(self) -> SE3:
        cached = getattr(self, "_Twc_cache", None)
        if cached is None:
            cached = self.Tcw.inverse()
            self._Twc_cache = cached
        return cached

    def camera_center(self) -> np.ndarray:
        return self.Twc.t

    # ------------------------------------------------------------------
    def features_in_area(
        self,
        x: float,
        y: float,
        r: float,
        min_level: int = -1,
        max_level: int = -1,
    ) -> np.ndarray:
        """Indices of keypoints within the square window (GetFeaturesInArea)."""
        cx0 = max(0, int((x - self.min_x - r) / self._grid_w))
        cx1 = min(GRID_COLS - 1, int((x - self.min_x + r) / self._grid_w))
        cy0 = max(0, int((y - self.min_y - r) / self._grid_h))
        cy1 = min(GRID_ROWS - 1, int((y - self.min_y + r) / self._grid_h))
        if cx1 < cx0 or cy1 < cy0:
            return np.empty(0, np.int64)
        chunks = []
        for cy in range(cy0, cy1 + 1):
            a = self._grid_starts[cy * GRID_COLS + cx0]
            b = self._grid_starts[cy * GRID_COLS + cx1 + 1]
            if b > a:
                chunks.append(self._grid_order[a:b])
        if not chunks:
            return np.empty(0, np.int64)
        idx = np.concatenate(chunks)
        kp = self.kps_un[idx]
        ok = (np.abs(kp[:, 0] - x) < r) & (np.abs(kp[:, 1] - y) < r)
        if min_level >= 0:
            ok &= self.octave[idx] >= min_level
        if max_level >= 0:
            ok &= self.octave[idx] <= max_level
        return idx[ok]

    def unproject_stereo(self, i: int) -> np.ndarray | None:
        """Back-project keypoint i using its stereo depth (world frame)."""
        z = self.depth[i]
        if z <= 0:
            return None
        ray = self.camera.unproject(self.kps_un[i : i + 1])[0]
        pc = ray * z
        return self.Twc * pc

    def unproject_stereo_batch(self, idxs: np.ndarray) -> np.ndarray:
        """(N, 3) world points for keypoints idxs (caller ensures depth>0)."""
        rays = self.camera.unproject(self.kps_un[idxs])
        pc = rays * self.depth[idxs][:, None]
        twc = self.Twc
        return pc @ twc.R.T + twc.t

    def is_in_frustum(self, mp, view_cos_limit: float = 0.5):
        """Vectorless single-point frustum check (Frame::isInFrustum).

        Returns None if not visible, else (u, v, ur, level, view_cos)."""
        p = mp.position
        pc = self.Tcw * p
        if pc[2] < 0.1:
            return None
        uv = self.camera.project(pc[None, :])[0]
        if not (self.min_x < uv[0] < self.max_x and self.min_y < uv[1] < self.max_y):
            return None
        dist = np.linalg.norm(p - self.camera_center())
        if not (mp.min_distance <= dist <= mp.max_distance):
            return None
        normal = mp.normal
        view_cos = float((p - self.camera_center()) @ normal / max(dist, 1e-9))
        if view_cos < view_cos_limit:
            return None
        level = mp.predict_scale(dist, self)
        ur = uv[0] - self.mbf / pc[2] if self.mbf > 0 else -1.0
        return uv[0], uv[1], ur, level, view_cos
