"""FAST detection: device vs oracle bit-exact; oracle vs cv2 set-equal."""

import numpy as np
import pytest

from orbslam3_tpu.oracle import orb_cpu as oc


def test_oracle_fast_matches_cv2(test_image):
    cv2 = pytest.importorskip("cv2")
    score = oc.nms3(oc.fast_score_map(test_image, 20))
    mine = set(zip(*np.nonzero(score)))
    det = cv2.FastFeatureDetector_create(
        threshold=20, nonmaxSuppression=True, type=cv2.FAST_FEATURE_DETECTOR_TYPE_9_16
    )
    ref = set((int(k.pt[1]), int(k.pt[0])) for k in det.detect(test_image))
    assert mine == ref


def test_device_score_map_matches_oracle(test_image):
    import jax.numpy as jnp
    from orbslam3_tpu.ops import fast as df

    for th in (7, 20):
        want = oc.fast_score_map(test_image, th)
        got = np.asarray(df.fast_score_map(jnp.asarray(test_image), th))
        np.testing.assert_array_equal(want, got)


def test_device_nms_matches_oracle(test_image):
    import jax.numpy as jnp
    from orbslam3_tpu.ops import fast as df

    want = oc.nms3(oc.fast_score_map(test_image, 20))
    got = np.asarray(df.nms3(df.fast_score_map(jnp.asarray(test_image), 20)))
    np.testing.assert_array_equal(want, got)


def test_device_two_threshold_matches_oracle(test_image):
    import jax.numpy as jnp
    from orbslam3_tpu.ops import fast as df

    crop = test_image[16:-16, 16:-16]
    want_kps = oc.fast_keypoints_two_threshold(crop, 20, 7)
    got_map = np.asarray(df.detect_two_threshold(jnp.asarray(crop), 20, 7))
    ys, xs = np.nonzero(got_map)
    got = set(zip(xs.tolist(), ys.tolist()))
    want = set((int(x), int(y)) for x, y, _ in want_kps)
    assert got == want
    # scores identical too
    for x, y, s in want_kps:
        assert got_map[int(y), int(x)] == int(s)


def test_two_threshold_fallback_triggers():
    """A flat tile must retry at the low threshold."""
    img = np.full((64, 64), 100, np.uint8)
    # a weak corner: plus-shaped contrast ~10 (passes th=7, fails th=20)
    img[10, 10] = 112
    sc_hi = oc.fast_score_map(img, 20)
    assert sc_hi.max() == 0
    kps = oc.fast_keypoints_two_threshold(img, 20, 7)
    assert len(kps) >= 1


def test_multi_level_detect_matches_per_level(test_image):
    """Composite all-levels detection is bit-identical to per-level calls."""
    import jax.numpy as jnp

    from orbslam3_tpu.oracle.orb_cpu import FAST_BORDER, PyramidParams
    from orbslam3_tpu.ops.fast import detect_two_threshold, detect_two_threshold_multi
    from orbslam3_tpu.ops.pyramid import build_pyramid

    params = PyramidParams(n_features=1000)
    pyr = build_pyramid(jnp.asarray(test_image), params)
    b = FAST_BORDER
    crops = [img[b:-b, b:-b] for img in pyr]
    multi = detect_two_threshold_multi(crops, params.ini_th_fast, params.min_th_fast)
    for crop, got in zip(crops, multi):
        want = detect_two_threshold(crop, params.ini_th_fast, params.min_th_fast)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
