"""Parity tests: the _hostops C extension vs its pure-Python fallbacks.

Each helper mutates exactly what the Python loop mutates; these tests run
both paths on mirrored object graphs and assert identical end states.
"""

import numpy as np
import pytest

from orbslam3_tpu.native import hostops
from orbslam3_tpu.slam.map import LandmarkTable
from orbslam3_tpu.slam.map_point import MapPoint


class _KF:
    def __init__(self, bad=False):
        self.bad = bad


def _world(seed=0):
    """Two mirrored (table, object-array) worlds with identical state."""
    worlds = []
    for _ in range(2):
        rng = np.random.default_rng(seed)  # identical stream per world
        t = LandmarkTable(cap=16)
        mps = [MapPoint(rng.normal(size=3), None, None) for _ in range(64)]
        for mp in mps[:40]:
            t.attach(mp)
        for mp in mps:
            mp.n_obs = int(rng.integers(0, 3))
            mp._sync_nobs()
        for i in (5, 17, 33, 60):
            mps[i].bad = True
        arr = np.empty(80, object)
        arr[:64] = mps
        worlds.append((t, arr, mps))
    return worlds


def _run_both(fn_c, fn_py):
    (tc, ac, mc), (tp, ap, mp_) = _world()
    m = hostops._load()
    assert m is not None, "hostops extension failed to build"
    rc = fn_c(m, tc, ac)
    rp = fn_py(tp, ap)
    return (tc, ac, mc, rc), (tp, ap, mp_, rp)


def test_slots_of_parity():
    (tc, ac, mc), (tp, ap, mp_) = _world()
    got = hostops.slots_of(list(ac[:64]), tc)
    want = np.fromiter(
        (m._slot if getattr(m, "_table", None) is tp else -1 for m in ap[:64]),
        np.int64,
        count=64,
    )
    assert (got == want).all()
    # None-free requirement does not hold for slots_of callers; attached vs
    # detached split must be exact
    assert (got[:40] >= 0).all() and (got[40:] == -1).all()


def test_n_obs_of_parity():
    (tc, ac, mc), (tp, ap, mp_) = _world()
    got = hostops.n_obs_of(ac)  # includes the None tail
    want = np.fromiter(
        (-1 if m is None else m.n_obs for m in ap), np.int64, count=len(ap)
    )
    assert (got == want).all()
    # bad points report their raw n_obs (no bad masking in this helper)
    assert got[5] == mc[5].n_obs


def test_mark_seen_parity():
    (tc, ac, mc, _), (tp, ap, mp_, _) = _run_both(
        lambda m, t, a: m.mark_seen(a, t, 42, t.seen_stamp),
        lambda t, a: _py_mark_seen(a, t, 42, t.seen_stamp),
    )
    for x, y in zip(ac, ap):
        assert (x is None) == (y is None)
    for x, y in zip(mc, mp_):
        assert x.n_visible == y.n_visible
        assert x.last_frame_seen == y.last_frame_seen
    assert (tc.seen_stamp == tp.seen_stamp).all()


def _py_mark_seen(map_points, table, fid, stamp):
    for i in range(len(map_points)):
        m = map_points[i]
        if m is None:
            continue
        if m.bad:
            map_points[i] = None
        else:
            m.n_visible += 1
            m.last_frame_seen = fid
            if getattr(m, "_table", None) is table:
                stamp[m._slot] = fid


def test_clean_vo_parity():
    (tc, ac, mc), (tp, ap, mp_) = _world()
    oc = np.zeros(80, bool)
    oc[::3] = True
    op = oc.copy()
    m = hostops._load()
    m.clean_vo(ac, oc)
    for i in range(len(ap)):
        x = ap[i]
        if x is not None and x.n_obs < 1:
            op[i] = False
            ap[i] = None
    for x, y in zip(ac, ap):
        assert (x is None) == (y is None)
    assert (oc == op).all()


def test_count_found_parity():
    (tc, ac, mc), (tp, ap, mp_) = _world()
    oc = np.zeros(80, bool)
    oc[1::4] = True
    m = hostops._load()
    got = m.count_found(ac, oc)
    want = 0
    for i in range(len(ap)):
        x = ap[i]
        if x is not None and not oc[i]:
            x.n_found += 1
            if x.n_obs > 0:
                want += 1
    assert got == want
    for x, y in zip(mc, mp_):
        assert x.n_found == y.n_found


def test_count_obs_kfs_parity():
    (tc, ac, mc), (tp, ap, mp_) = _world()
    k1, k2, kbad = _KF(), _KF(), _KF(bad=True)
    for ms in (mc, mp_):
        ms[0].observations = {k1: (0, -1), kbad: (1, -1)}
        ms[1].observations = {k1: (2, -1), k2: (3, -1)}
        ms[5].observations = {k2: (4, -1)}  # bad point: must not vote
    m = hostops._load()
    got = m.count_obs_kfs(ac)
    want = {}
    for x in ap:
        if x is None or x.bad:
            continue
        for kf in x.observations:
            if not kf.bad:
                want[kf] = want.get(kf, 0) + 1
    assert got == want == {k1: 2, k2: 1}


def test_collect_obs_parity():
    """C fill_obs/obs_counts vs the Python fallback: identical flattening."""
    (tc, ac, mc), (tp, ap, mp_) = _world()
    k1, k2, kbad = _KF(), _KF(), _KF(bad=True)
    for ms in (mc, mp_):
        ms[0].observations = {k1: (3, -1), kbad: (1, 7)}
        ms[0].ref_kf = k1
        ms[1].observations = {k2: (2, 9), k1: (0, -1)}
        ms[2].observations = {k2: (4, -1)}

    counts_c = hostops.obs_counts(list(mc[:4]))
    saved_mod, saved_tried = hostops._mod, hostops._tried
    try:
        hostops._mod, hostops._tried = None, True
        counts_py = hostops.obs_counts(list(mp_[:4]))
        py = hostops.collect_obs([mp_[0], mp_[1], mp_[2]])
    finally:
        hostops._mod, hostops._tried = saved_mod, saved_tried
    assert (counts_c == counts_py).all()
    assert counts_c[0] == 2 and counts_c[3] == 0

    cc = hostops.collect_obs([mc[0], mc[1], mc[2]])
    for a, b in zip(cc[:6], py[:6]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert cc[6] == py[6] == [k1, kbad, k2]  # first-seen intern order


def test_fallbacks_match_extension():
    """Force the fallback path and re-run one representative op."""
    (tc, ac, mc), (tp, ap, mp_) = _world()
    saved_mod, saved_tried = hostops._mod, hostops._tried
    try:
        hostops._mod, hostops._tried = None, True  # simulate no toolchain
        assert not hostops.available()
        a = hostops.slots_of(list(ap[:64]), tp)
    finally:
        hostops._mod, hostops._tried = saved_mod, saved_tried
    b = hostops.slots_of(list(ac[:64]), tc)
    assert (a == b).all()
