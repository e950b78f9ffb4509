"""Native C++ runtime kernels vs Python references."""

import numpy as np
import pytest

from orbslam3_tpu import native
from orbslam3_tpu.slam.matchers import hamming_matrix_np

RNG = np.random.default_rng(9)


def test_native_builds():
    assert native.available(), "g++ build of the native library failed"


def test_hamming_matrix_matches_numpy():
    a = RNG.integers(0, 256, (60, 32), dtype=np.uint8)
    b = RNG.integers(0, 256, (45, 32), dtype=np.uint8)
    np.testing.assert_array_equal(native.hamming_matrix(a, b), hamming_matrix_np(a, b))


def test_hamming_knn_matches_argsort():
    a = RNG.integers(0, 256, (40, 32), dtype=np.uint8)
    b = RNG.integers(0, 256, (70, 32), dtype=np.uint8)
    idx, dist = native.hamming_knn(a, b, k=2)
    d = hamming_matrix_np(a, b)
    want_best = d.min(axis=1)
    got_best = dist[:, 0]
    np.testing.assert_array_equal(got_best, want_best)
    assert (dist[:, 1] >= dist[:, 0]).all()
    rows = np.arange(len(a))
    np.testing.assert_array_equal(d[rows, idx[:, 0]], dist[:, 0])


def test_native_octree_matches_oracle():
    from orbslam3_tpu.oracle.orb_cpu import distribute_octree as py_oct

    n = 500
    kps = np.column_stack([
        RNG.uniform(0, 700, n), RNG.uniform(0, 440, n), RNG.integers(8, 90, n),
    ]).astype(np.float32)
    for target in (50, 150, 400):
        idx = native.distribute_octree(kps, 0, 700, 0, 440, target)
        sel_py = py_oct(kps.astype(np.float64), 0, 700, 0, 440, target)
        # same selected keypoint SET (order may differ)
        got = set(map(tuple, np.round(kps[idx], 3)))
        want = set(map(tuple, np.round(sel_py, 3)))
        assert got == want, (target, len(got), len(want))
