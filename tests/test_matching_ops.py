"""Device matching primitives: MXU hamming, rotation mask, batch projection."""

import numpy as np
import jax.numpy as jnp

from orbslam3_tpu.ops import matching as dm
from orbslam3_tpu.slam.matchers import hamming_matrix_np

RNG = np.random.default_rng(12)


def test_mxu_hamming_matches_numpy():
    a = RNG.integers(0, 256, (130, 32), dtype=np.uint8)
    b = RNG.integers(0, 256, (90, 32), dtype=np.uint8)
    got = np.asarray(dm.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(got, hamming_matrix_np(a, b))


def test_search_by_projection_batch():
    # build a scene where map point i truly corresponds to keypoint i
    m = 80
    kp_xy = RNG.uniform(50, 400, (m, 2)).astype(np.float32)
    kp_level = RNG.integers(0, 4, m).astype(np.int32)
    desc = RNG.integers(0, 256, (m, 32), dtype=np.uint8)
    # projections near the true keypoints; same descriptor with 3 flipped bits
    proj = kp_xy + RNG.normal(0, 1.0, (m, 2)).astype(np.float32)
    mp_desc = desc.copy()
    flips = RNG.integers(0, 32, (m, 3))
    for i in range(m):
        for b in flips[i]:
            mp_desc[i, b] ^= 1 << int(RNG.integers(0, 8))
    idx, dist, matched = dm.search_by_projection_batch(
        jnp.asarray(proj), jnp.asarray(kp_level), jnp.full(m, 6.0),
        jnp.asarray(mp_desc), jnp.ones(m, bool),
        jnp.asarray(kp_xy), jnp.asarray(kp_level),
        jnp.asarray(desc), jnp.ones(m, bool),
    )
    idx, dist, matched = np.asarray(idx), np.asarray(dist), np.asarray(matched)
    hit = matched & (idx == np.arange(m))
    assert hit.mean() > 0.9, hit.mean()
    assert dist[hit].max() <= 24  # ~3 flipped bytes

    # out-of-window points must not match
    proj_far = kp_xy + 50.0
    _, _, matched_far = dm.search_by_projection_batch(
        jnp.asarray(proj_far), jnp.asarray(kp_level), jnp.full(m, 6.0),
        jnp.asarray(mp_desc), jnp.ones(m, bool),
        jnp.asarray(kp_xy), jnp.asarray(kp_level),
        jnp.asarray(desc), jnp.ones(m, bool),
    )
    assert not np.asarray(matched_far).any()


def test_rotation_histogram_mask():
    n = 200
    ang_a = RNG.uniform(0, 360, n).astype(np.float32)
    # consistent rotation of 30 deg for most, garbage for 20%
    ang_b = (ang_a - 30.0) % 360
    bad = RNG.choice(n, 40, replace=False)
    ang_b[bad] = RNG.uniform(0, 360, 40)
    valid = np.ones(n, bool)
    keep = np.asarray(dm.rotation_histogram_mask(
        jnp.asarray(ang_a), jnp.asarray(ang_b), jnp.asarray(valid)))
    good = np.setdiff1d(np.arange(n), bad)
    assert keep[good].mean() > 0.95
    assert keep[bad].mean() < 0.35
