"""Pyramid + blur: device vs oracle bit-exact; oracle vs cv2 parity."""

import numpy as np
import pytest

from orbslam3_tpu.oracle import orb_cpu as oc

cv2 = pytest.importorskip("cv2")


def test_resize_bit_exact_vs_cv2(test_image):
    p = oc.PyramidParams()
    prev = test_image
    for lvl in range(1, p.n_levels):
        lh, lw = p.level_sizes(*test_image.shape)[lvl]
        ref = cv2.resize(prev, (lw, lh), interpolation=cv2.INTER_LINEAR)
        mine = oc.resize_linear_u8(prev, lh, lw)
        np.testing.assert_array_equal(ref, mine)
        prev = ref


def test_device_pyramid_matches_oracle(test_image):
    import jax.numpy as jnp
    from orbslam3_tpu.ops import pyramid as dp

    p = oc.PyramidParams()
    want = oc.build_pyramid(test_image, p)
    got = dp.build_pyramid(jnp.asarray(test_image), p)
    assert len(want) == len(got)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_device_blur_matches_oracle(test_image):
    import jax.numpy as jnp
    from orbslam3_tpu.ops import pyramid as dp

    want = oc.gaussian_blur7_u8(test_image)
    got = np.asarray(dp.gaussian_blur7_u8(jnp.asarray(test_image)))
    np.testing.assert_array_equal(want, got)


def test_blur_close_to_cv2(test_image):
    """cv2's 8u path quantises taps to 8 fractional bits; ours keeps 16.

    Parity requirement: small bounded deviation (documented in the oracle)."""
    ref = cv2.GaussianBlur(test_image, (7, 7), 2, 2, cv2.BORDER_REFLECT_101)
    mine = oc.gaussian_blur7_u8(test_image)
    d = np.abs(ref.astype(int) - mine.astype(int))
    assert d.mean() < 1.0
    assert np.percentile(d, 99) <= 3


def test_feature_quota_sums_to_nfeatures():
    for nf in (500, 1000, 1200, 2000):
        p = oc.PyramidParams(n_features=nf)
        q = p.features_per_level()
        assert q.sum() == nf
        assert (q[:-1][1:] <= q[:-1][:-1]).all()  # geometric decay
