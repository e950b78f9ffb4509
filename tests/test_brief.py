"""Orientation + descriptors: bit-exactness and angle parity."""

import numpy as np

from orbslam3_tpu.oracle import orb_cpu as oc


def _keypoints_for(img, n=300):
    score = oc.nms3(oc.fast_score_map(img, 20))
    h, w = img.shape
    score[:19, :] = 0
    score[h - 19 :, :] = 0
    score[:, :19] = 0
    score[:, w - 19 :] = 0
    ys, xs = np.nonzero(score)
    order = np.argsort(-score[ys, xs])[:n]
    return np.stack([xs[order], ys[order]], 1).astype(np.float32)


def test_device_moments_and_angles_match_oracle(test_image):
    import jax.numpy as jnp
    from orbslam3_tpu.ops import orientation as do

    pts = _keypoints_for(test_image)
    want = oc.ic_angles(test_image, pts)
    got = np.asarray(do.ic_angles(jnp.asarray(test_image), jnp.asarray(pts, jnp.int32)))
    # integer moments are exact; atan2 may differ by float ulps only
    d = np.abs(want - got)
    d = np.minimum(d, 360 - d)
    assert d.max() < 1e-3


def test_descriptors_bit_exact_given_trig(test_image):
    """The full sampling/compare/pack machinery is bit-exact vs the oracle."""
    import jax.numpy as jnp
    from orbslam3_tpu.ops import brief as db

    pts = _keypoints_for(test_image)
    rng = np.random.default_rng(0)
    angles = rng.uniform(0, 360, len(pts)).astype(np.float32)
    rad = angles.astype(np.float32) * np.float32(np.pi / 180)
    cos = np.cos(rad.astype(np.float64)).astype(np.float32)
    sin = np.sin(rad.astype(np.float64)).astype(np.float32)
    blurred = oc.gaussian_blur7_u8(test_image)
    want = oc.brief_descriptors(blurred, pts, angles, trig=(cos, sin), raw=test_image)
    samp = db.brief_sampling_image(jnp.asarray(test_image), jnp.asarray(blurred))
    got = np.asarray(
        db.brief_descriptors(
            samp, jnp.asarray(pts), jnp.asarray(angles),
            trig=(jnp.asarray(cos), jnp.asarray(sin)),
        )
    )
    np.testing.assert_array_equal(want, got)


def test_descriptors_zero_angle_bit_exact(test_image):
    import jax.numpy as jnp
    from orbslam3_tpu.ops import brief as db

    pts = _keypoints_for(test_image)
    angles = np.zeros(len(pts), np.float32)
    blurred = oc.gaussian_blur7_u8(test_image)
    want = oc.brief_descriptors(blurred, pts, angles, raw=test_image)
    samp = db.brief_sampling_image(jnp.asarray(test_image), jnp.asarray(blurred))
    got = np.asarray(
        db.brief_descriptors(samp, jnp.asarray(pts), jnp.asarray(angles))
    )
    np.testing.assert_array_equal(want, got)


def test_descriptors_platform_trig_near_exact(test_image):
    """End-to-end (platform trig): ulp-level angle diffs flip almost no bits."""
    import jax.numpy as jnp
    from orbslam3_tpu.ops import brief as db

    pts = _keypoints_for(test_image)
    angles = oc.ic_angles(test_image, pts)
    blurred = oc.gaussian_blur7_u8(test_image)
    want = oc.brief_descriptors(blurred, pts, angles, raw=test_image)
    samp = db.brief_sampling_image(jnp.asarray(test_image), jnp.asarray(blurred))
    got = np.asarray(
        db.brief_descriptors(samp, jnp.asarray(pts), jnp.asarray(angles))
    )
    bits = np.unpackbits(want ^ got, axis=1).sum(axis=1)
    assert (bits == 0).mean() > 0.95
    assert bits.max() <= 8


def test_unpinned_trig_mismatch_rate_bounded(test_image):
    """Quantifies the BASELINE 'bit-exact' asterisk: platform cos/sin ulp
    differences can flip a rounded pattern offset only when a rotated
    coordinate lands within an ulp of a .5 boundary.  Bound the per-frame
    damage: virtually no descriptors differ, and any that do differ in a
    few bits only."""
    import jax.numpy as jnp

    from orbslam3_tpu.ops import brief as db
    from orbslam3_tpu.oracle import orb_cpu as oc

    pts = _keypoints_for(test_image, n=500)
    rng = np.random.default_rng(1)
    angles = rng.uniform(0, 360, len(pts)).astype(np.float32)
    blur = oc.gaussian_blur7_u8(test_image)
    samp = np.asarray(
        db.brief_sampling_image(jnp.asarray(test_image), jnp.asarray(blur))
    )
    # pinned trig (float64 -> f32, the oracle's path) vs the device's own
    rad = angles.astype(np.float64) * np.pi / 180.0
    pinned = (np.cos(rad).astype(np.float32), np.sin(rad).astype(np.float32))
    d_pin = np.asarray(
        db.brief_descriptors(
            jnp.asarray(samp), jnp.asarray(pts), jnp.asarray(angles),
            trig=(jnp.asarray(pinned[0]), jnp.asarray(pinned[1])),
        )
    )
    d_free = np.asarray(
        db.brief_descriptors(jnp.asarray(samp), jnp.asarray(pts), jnp.asarray(angles))
    )
    diff_bits = np.bitwise_count(
        d_pin.view(np.uint64) ^ d_free.view(np.uint64)
    ).sum(axis=1)
    n_diff = int((diff_bits > 0).sum())
    # CI bound: <= 1% of descriptors touched, <= 4 bits each (Hamming
    # matching tolerates single-bit flips without any behavioral change)
    assert n_diff <= max(5, len(pts) // 100), f"{n_diff} descriptors differ"
    assert diff_bits.max(initial=0) <= 4, diff_bits.max()
