"""Device stereo LR matcher vs the CPU oracle (bit-exact parity)."""

import pytest

import numpy as np
import jax

from orbslam3_tpu.oracle.orb_cpu import PyramidParams, build_pyramid as oracle_pyramid
from orbslam3_tpu.oracle import stereo_cpu
from orbslam3_tpu.frontend.stereo_frame import extract_and_match_stereo

MBF, FX = 47.9064, 435.2047


def shifted_pair(img: np.ndarray, shift: int = 12) -> np.ndarray:
    """Synthetic rectified pair: right = left shifted by a constant disparity."""
    right = np.roll(img, -shift, axis=1)
    right[:, -shift:] = img[:, -shift:]
    return np.stack([img, right])


@pytest.mark.slow
def test_stereo_match_parity(small_image):
    params = PyramidParams(n_features=300)
    pair = shifted_pair(small_image)
    out = extract_and_match_stereo(pair, params, MBF, FX)
    out = jax.tree.map(np.asarray, out)

    valid = out.left.valid
    kps_l = np.stack(
        [out.left.xy[:, 0], out.left.xy[:, 1], out.left.octave, out.left.angle], 1
    )[valid]
    kps_r = np.stack(
        [out.right.xy[:, 0], out.right.xy[:, 1], out.right.octave, out.right.angle], 1
    )[out.right.valid]
    pyr_l = oracle_pyramid(pair[0], params)
    pyr_r = oracle_pyramid(pair[1], params)
    u_ref, d_ref = stereo_cpu.compute_stereo_matches(
        kps_l,
        out.left.desc[valid],
        kps_r,
        out.right.desc[out.right.valid],
        pyr_l,
        pyr_r,
        params.scale_factors,
        MBF,
        MBF / FX,
    )
    u_dev = out.u_right[valid]
    d_dev = out.depth[valid]
    matched_ref = u_ref >= 0
    matched_dev = u_dev >= 0
    np.testing.assert_array_equal(matched_dev, matched_ref)
    assert matched_ref.sum() > 20, "expected a healthy number of stereo matches"
    np.testing.assert_allclose(u_dev[matched_dev], u_ref[matched_ref], atol=1e-4)
    np.testing.assert_allclose(d_dev[matched_dev], d_ref[matched_ref], rtol=1e-5)


def test_stereo_disparity_recovers_shift(small_image):
    params = PyramidParams(n_features=300)
    shift = 9
    pair = shifted_pair(small_image, shift)
    out = extract_and_match_stereo(pair, params, MBF, FX)
    u_r = np.asarray(out.u_right)
    xy = np.asarray(out.left.xy)
    m = u_r >= 0
    disp = xy[m, 0] - u_r[m]
    # most matched keypoints should see the constant synthetic disparity
    frac = np.mean(np.abs(disp - shift) < 1.0)
    assert frac > 0.8, f"only {frac:.0%} of disparities near {shift}"


def test_packed_transfer_matches_unpacked(small_image):
    """extract_and_match_stereo_packed + unpack == the pytree path, exactly."""
    from orbslam3_tpu.frontend.stereo_frame import (
        extract_and_match_stereo_packed,
        unpack_host_features,
    )

    params = PyramidParams(n_features=120)
    pair = shifted_pair(small_image)
    ref = jax.tree.map(np.asarray, extract_and_match_stereo(pair, params, MBF, FX))
    got = unpack_host_features(
        np.asarray(extract_and_match_stereo_packed(pair, params, MBF, FX))
    )
    valid = ref.left.valid
    assert (got["kps"] == ref.left.xy[valid]).all()
    assert (got["octave"] == ref.left.octave[valid]).all()
    assert (got["angle"] == ref.left.angle[valid]).all()
    assert (got["response"] == ref.left.response[valid]).all()
    assert (got["desc"] == ref.left.desc[valid]).all()
    assert (got["u_right"] == ref.u_right[valid]).all()
    assert (got["depth"] == ref.depth[valid]).all()


def test_packed_batch_matches_per_frame(small_image):
    """Scan-batched B-frame program == the per-frame program (the
    prefetch pipeline's batched dispatch unit must not change outputs)."""
    from orbslam3_tpu.frontend.stereo_frame import (
        extract_and_match_stereo_packed,
        extract_and_match_stereo_packed_batch,
    )

    params = PyramidParams(n_features=120)
    rng = np.random.default_rng(7)
    pairs = []
    for s in (4, 7, 11):
        img = np.clip(
            small_image.astype(np.int32) + rng.integers(-6, 7, small_image.shape),
            0, 255,
        ).astype(np.uint8)
        pairs.append(shifted_pair(img, s))
    batch = np.stack([np.asarray(p) for p in pairs])
    got = np.asarray(
        extract_and_match_stereo_packed_batch(batch, params, MBF, FX)
    )
    for i, pair in enumerate(pairs):
        want = np.asarray(extract_and_match_stereo_packed(pair, params, MBF, FX))
        assert got[i].shape == want.shape
        assert (got[i] == want).all(), f"batch row {i} != per-frame result"


def test_system_batched_prefetch_matches_synchronous(small_image):
    """System.prefetch_stereo_batch handles, consumed in order, reproduce
    track_stereo exactly (one scan-batched dispatch serving the prefetch window)."""
    from orbslam3_tpu.cameras.models import Pinhole
    from orbslam3_tpu.slam.system import System
    from orbslam3_tpu.utils.synth import stereo_sequence

    camera = Pinhole([250.0, 250.0, 160.0, 120.0])
    frames = stereo_sequence(4, camera, 0.12, 240, 320, seed=5)
    s_sync = System(camera, 30.0, PyramidParams(n_features=600), sequential=True)
    s_b = System(camera, 30.0, PyramidParams(n_features=600), sequential=True)
    handles = s_b.prefetch_stereo_batch([(il, ir) for il, ir, _ in frames])
    for k, (il, ir, _) in enumerate(frames):
        p_sync = s_sync.track_stereo(il, ir, k / 20.0)
        p_b = s_b.track_stereo_prefetched(handles[k], k / 20.0)
        if p_sync is None:
            assert p_b is None
        else:
            assert np.allclose(p_sync.matrix(), p_b.matrix(), atol=0)
    assert s_sync.map_stats() == s_b.map_stats()
