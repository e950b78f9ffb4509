"""Parity: batched refresh_points (native distinctive_select + NumPy
fallback) vs the per-point MapPoint methods it replaces.

The batched pass must reproduce compute_distinctive_descriptor (min median
Hamming, reference's sorted[(N-1)/2] median, first-winner ties) and
update_normal_and_depth exactly, across group sizes 1..30 including the
>24-observation per-point detour.
"""

import numpy as np
import pytest

from orbslam3_tpu import native
from orbslam3_tpu.slam.map_point import MapPoint, refresh_points


class _KF:
    _next = 0

    def __init__(self, rng, n=64):
        self.id = _KF._next
        _KF._next += 1
        self.bad = False
        self.n = n
        self.n_left = n
        self.desc = rng.integers(0, 256, (n, 32), dtype=np.uint8)
        self.octave = rng.integers(0, 8, n).astype(np.int32)
        self.u_right = np.full(n, -1.0)
        self.scale_factors = 1.2 ** np.arange(8)
        self.n_levels = 8
        self._center = rng.normal(size=3)
        self._mp_version = 0

    def camera_center(self):
        return self._center

    @property
    def map_points(self):
        # add_observation writes kf.map_points[idx]; give it a scratch list
        if not hasattr(self, "_mps"):
            self._mps = [None] * self.n
        return self._mps


def _build_world(seed, n_points=60):
    rng = np.random.default_rng(seed)
    kfs = [_KF(rng) for _ in range(8)]
    mps = []
    for p in range(n_points):
        mp = MapPoint(rng.normal(size=3) * 5, None, None)
        n_obs = int(rng.integers(1, 31))  # exercises the >24 detour too
        chosen = rng.choice(len(kfs), size=min(n_obs, len(kfs)), replace=False)
        for k in chosen:
            kf = kfs[int(k)]
            idx = int(rng.integers(0, kf.n))
            mp.observations[kf] = (idx, -1)
        mp.ref_kf = kfs[int(chosen[0])]
        mp.n_obs = len(chosen)
        mps.append(mp)
    # one bad KF: its descriptors must not vote
    kfs[3].bad = True
    return mps


def _snapshot(mps):
    return [
        (mp.descriptor.copy(), mp.normal.copy(), mp.min_distance, mp.max_distance)
        for mp in mps
    ]


def _check_equal(a, b):
    for (d1, n1, mn1, mx1), (d2, n2, mn2, mx2) in zip(a, b):
        assert (d1 == d2).all()
        np.testing.assert_allclose(n1, n2, atol=1e-12)
        assert mn1 == pytest.approx(mn2, abs=1e-12)
        assert mx1 == pytest.approx(mx2, abs=1e-12)


def test_refresh_points_matches_per_point_methods():
    ref = _build_world(0)
    for mp in ref:
        mp.compute_distinctive_descriptor()
        mp.update_normal_and_depth()
    want = _snapshot(ref)

    got_mps = _build_world(0)
    refresh_points(got_mps)
    _check_equal(_snapshot(got_mps), want)


def test_refresh_points_numpy_fallback_matches():
    ref = _build_world(1)
    refresh_points(ref)
    want = _snapshot(ref)

    got_mps = _build_world(1)
    orig = native.distinctive_select
    try:
        native.distinctive_select = lambda *a, **k: None  # force NumPy path
        refresh_points(got_mps)
    finally:
        native.distinctive_select = orig
    _check_equal(_snapshot(got_mps), want)


def test_distinctive_select_kernel_direct():
    rng = np.random.default_rng(2)
    descs = rng.integers(0, 256, (50, 32), dtype=np.uint8)
    off = np.array([0, 0, 1, 5, 20, 50], np.int32)  # empty, single, small, big
    rows = native.distinctive_select(descs, off)
    if rows is None:
        pytest.skip("native library unavailable")
    assert rows[0] == -1 and rows[1] == 0
    from orbslam3_tpu.slam.map_point import hamming_rows

    for g in range(2, 5):
        b0, b1 = off[g], off[g + 1]
        d = descs[b0:b1]
        dist = hamming_rows(d, d)
        m = (len(d) - 1) // 2
        med = np.partition(dist, m, axis=1)[:, m]
        assert rows[g] == b0 + int(np.argmin(med))
