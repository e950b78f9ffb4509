"""ATE evaluator (tools/evaluate_ate.py): alignment math + real reference
artifacts (the committed MH01 run outputs of /root/reference)."""

import os

import numpy as np
import pytest

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from evaluate_ate import associate, evaluate, umeyama  # noqa: E402

REF = "/root/reference"


def _rand_rot(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def test_umeyama_recovers_known_similarity():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(100, 3))
    rot_true = _rand_rot(rng)
    s_true, t_true = 1.7, np.array([0.3, -2.0, 5.0])
    dst = s_true * src @ rot_true.T + t_true
    s, rot, t = umeyama(src, dst, with_scale=True)
    assert abs(s - s_true) < 1e-9
    assert np.allclose(rot, rot_true, atol=1e-9)
    assert np.allclose(t, t_true, atol=1e-9)
    # SE3 mode pins scale to 1
    s2, _, _ = umeyama(src, dst, with_scale=False)
    assert s2 == 1.0


def test_associate_nearest_within_tolerance():
    t_a = np.array([0.0, 1.0, 2.0, 3.0])
    t_b = np.array([0.004, 1.2, 2.996])
    ia, ib = associate(t_a, t_b, max_dt=0.02)
    assert list(zip(ia.tolist(), ib.tolist())) == [(0, 0), (3, 2)]


def test_evaluate_roundtrip_with_noise(tmp_path):
    rng = np.random.default_rng(1)
    n = 200
    t = np.arange(n) * 0.05
    xyz = np.cumsum(rng.normal(0, 0.02, (n, 3)), axis=0)
    rot = _rand_rot(rng)
    noisy = xyz @ rot.T + np.array([1.0, 2.0, 3.0]) + rng.normal(0, 1e-3, (n, 3))
    a, b = tmp_path / "est.txt", tmp_path / "gt.txt"
    q = "0 0 0 1"
    a.write_text("\n".join(
        f"{ti:.6f} {x:.9f} {y:.9f} {z:.9f} {q}" for ti, (x, y, z) in zip(t, noisy)
    ))
    b.write_text("\n".join(
        f"{ti:.6f} {x:.9f} {y:.9f} {z:.9f} {q}" for ti, (x, y, z) in zip(t, xyz)
    ))
    res = evaluate(str(a), str(b), with_scale=False, max_dt=0.02)
    assert res["pairs"] == n
    assert res["value"] < 4e-3  # recovers to the injected 1 mm noise floor


@pytest.mark.skipif(
    not os.path.exists(f"{REF}/f_dataset-MH01_stereo.txt"),
    reason="reference artifacts not present",
)
def test_reference_mh01_artifacts_parse_and_agree():
    """Our TUM loader + evaluator handle the fork's real MH01 outputs: the
    154 keyframes replay inside the frame trajectory to micrometers (the
    Tcp-walk property our trajectory savers implement too)."""
    res = evaluate(
        f"{REF}/kf_dataset-MH01_stereo.txt",
        f"{REF}/f_dataset-MH01_stereo.txt",
        with_scale=False,
        max_dt=0.02,
    )
    assert res["pairs"] == 154
    assert res["value"] < 1e-4
