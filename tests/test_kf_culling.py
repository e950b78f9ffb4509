"""KeyFrame culling: vectorized redundancy decision vs the scalar spec.

LocalMapping::KeyFrameCulling (/root/reference/src/LocalMapping.cc:902)
drops a covisible KF when >90% of its depth-eligible observations are seen
by >= 3 other KFs at the same-or-finer scale (octave <= level + 1).  The
production path (`LocalMapping._cull_keyframes`) computes the decision with
flattened observation arrays; this test replays randomized observation
graphs through both the scalar reference loop and the production pass and
asserts identical cull decisions.
"""

import numpy as np

from orbslam3_tpu.slam.local_mapping import LocalMapping
from orbslam3_tpu.slam.map_point import MapPoint


class _KF:
    _next = 0

    def __init__(self, rng, n=80, mb=0.5):
        self.id = _KF._next
        _KF._next += 1
        self.bad = False
        self.map = None
        self.n = n
        self.n_left = n
        self.mb = mb
        self.octave = rng.integers(0, 8, n).astype(np.int32)
        self.depth = rng.uniform(0.5, 10.0, n)
        self.depth[rng.random(n) < 0.1] = -1.0  # mono slots
        self.map_points = [None] * n
        self.u_right = np.full(n, -1.0)
        self.was_culled = False
        self._covis = []

    def get_best_covisibility_keyframes(self, k):
        return self._covis[:k]

    def get_map_point_indices(self):
        return [
            (i, mp)
            for i, mp in enumerate(self.map_points)
            if mp is not None and not mp.bad
        ]

    def set_bad(self):
        self.was_culled = True  # decision only; graph surgery not under test


def _scalar_cull_decisions(kf, monocular):
    """The reference triple loop, verbatim semantics."""
    decisions = {}
    th_obs = 3
    for k in kf.get_best_covisibility_keyframes(100):
        if k.bad:
            continue
        n_mps, n_redundant = 0, 0
        for i, mp in k.get_map_point_indices():
            if not monocular and (k.depth[i] > k.mb * 35 or k.depth[i] < 0):
                continue
            n_mps += 1
            if mp.n_obs <= th_obs:
                continue
            scale_level = k.octave[i]
            n_better = 0
            for kf_o, (left, right) in mp.observations.items():
                if kf_o is k or kf_o.bad:
                    continue
                io = left if left >= 0 else right
                if io < 0:
                    continue
                if kf_o.octave[io] <= scale_level + 1:
                    n_better += 1
                    if n_better >= th_obs:
                        break
            if n_better >= th_obs:
                n_redundant += 1
        decisions[k.id] = n_mps > 0 and n_redundant > 0.9 * n_mps
    return decisions


def _build_world(seed, n_kfs=7, n_points=120, density=0.75):
    rng = np.random.default_rng(seed)
    _KF._next = 0
    kfs = [_KF(rng) for _ in range(n_kfs)]
    cur = kfs[0]
    cur._covis = kfs[1:]
    for p in range(n_points):
        mp = MapPoint(rng.normal(size=3) * 4 + [0, 0, 6], None, None)
        observers = [k for k in kfs if rng.random() < density]
        for k in observers:
            slot = int(rng.integers(0, k.n))
            if k.map_points[slot] is not None:
                continue
            mp.add_observation(k, slot)
            k.map_points[slot] = mp
    # a couple of bad observers + a bad point exercise the filters
    kfs[-1].bad = True
    for mp in kfs[1].get_map_point_indices()[:2]:
        mp[1].bad = True
    return cur, kfs


def test_cull_decision_matches_scalar_spec():
    lm = LocalMapping.__new__(LocalMapping)
    for seed in range(8):
        for monocular in (False, True):
            cur, kfs = _build_world(seed)
            lm.monocular = monocular
            want = _scalar_cull_decisions(cur, monocular)
            lm._cull_keyframes(cur)
            got = {k.id: k.was_culled for k in cur._covis if not k.bad}
            assert got == want, (seed, monocular)


def test_cull_fires_on_fully_redundant_kf():
    """A KF whose every eligible point is seen by 4+ same-scale observers
    must be culled; sparse observers must survive."""
    rng = np.random.default_rng(99)
    _KF._next = 0
    kfs = [_KF(rng) for _ in range(6)]
    for k in kfs:
        k.octave[:] = 2          # uniform scale: every observer qualifies
        k.depth[:] = 5.0         # all depth-eligible
    cur, victim, sparse = kfs[0], kfs[1], kfs[2]
    cur._covis = [victim, sparse]
    for p in range(50):
        mp = MapPoint(rng.normal(size=3), None, None)
        for k in kfs:  # victim's points seen everywhere
            mp.add_observation(k, p)
            k.map_points[p] = mp
    for p in range(50, 60):  # sparse KF also holds 10 two-observer points
        mp = MapPoint(rng.normal(size=3), None, None)
        for k in (sparse, cur):
            mp.add_observation(k, p)
            k.map_points[p] = mp
    lm = LocalMapping.__new__(LocalMapping)
    lm.monocular = False
    lm._cull_keyframes(cur)
    assert victim.was_culled
    assert not sparse.was_culled
