"""Fused extractor pipeline: parity vs the CPU oracle."""

import pytest

import numpy as np

from orbslam3_tpu.oracle import orb_cpu as oc


def _oracle_corner_sets(img, params):
    """Per-level set of NMS'd two-threshold corners (full-image coords)."""
    pyr = oc.build_pyramid(img, params)
    sets = []
    for level_img in pyr:
        h, w = level_img.shape
        crop = level_img[16 : h - 16, 16 : w - 16]
        kps = oc.fast_keypoints_two_threshold(crop, params.ini_th_fast, params.min_th_fast)
        sets.append(set((int(x) + 16, int(y) + 16) for x, y, _ in kps))
    return sets


@pytest.mark.slow
def test_extractor_keypoints_are_true_corners(test_image):
    import jax.numpy as jnp
    from orbslam3_tpu.ops.extractor import extract_features_jit

    params = oc.PyramidParams(n_features=1000)
    feats = extract_features_jit(jnp.asarray(test_image), params)
    feats = {k: np.asarray(v) for k, v in feats._asdict().items()}
    corner_sets = _oracle_corner_sets(test_image, params)
    inv_scales = params.inv_scale_factors

    valid = feats["valid"]
    assert valid.sum() > 800  # textured synthetic image should near-fill quota
    for i in np.nonzero(valid)[0]:
        lvl = int(feats["octave"][i])
        x, y = feats["xy"][i]
        lx = int(round(x * inv_scales[lvl]))
        ly = int(round(y * inv_scales[lvl]))
        assert (lx, ly) in corner_sets[lvl], (lvl, lx, ly)


@pytest.mark.slow
def test_extractor_descriptors_match_oracle_pointwise(test_image):
    """For every selected keypoint, angle/descriptor match the oracle's
    computation at that same location (platform-trig tolerance on bits)."""
    import jax.numpy as jnp
    from orbslam3_tpu.ops.extractor import extract_features_jit

    params = oc.PyramidParams(n_features=500)
    feats = extract_features_jit(jnp.asarray(test_image), params)
    feats = {k: np.asarray(v) for k, v in feats._asdict().items()}
    pyr = oc.build_pyramid(test_image, params)
    inv_scales = params.inv_scale_factors

    total, exact = 0, 0
    for lvl in range(params.n_levels):
        sel = np.nonzero(feats["valid"] & (feats["octave"] == lvl))[0]
        if len(sel) == 0:
            continue
        pts = feats["xy"][sel] * inv_scales[lvl]
        pts = np.rint(pts).astype(np.float32)
        want_ang = oc.ic_angles(pyr[lvl], pts)
        d = np.abs(want_ang - feats["angle"][sel])
        d = np.minimum(d, 360 - d)
        assert d.max() < 1e-3
        blurred = oc.gaussian_blur7_u8(pyr[lvl])
        want_desc = oc.brief_descriptors(blurred, pts, want_ang, raw=pyr[lvl])
        diff_bits = np.unpackbits(want_desc ^ feats["desc"][sel], axis=1).sum(1)
        total += len(sel)
        exact += int((diff_bits == 0).sum())
        assert diff_bits.max() <= 8
    assert exact / total > 0.95


@pytest.mark.slow
def test_extractor_batch_matches_single(small_image):
    import jax.numpy as jnp
    from orbslam3_tpu.ops.extractor import (
        extract_features_jit,
        extract_features_stereo_jit,
    )

    params = oc.PyramidParams(n_features=300)
    one = extract_features_jit(jnp.asarray(small_image), params)
    two = extract_features_stereo_jit(
        jnp.stack([jnp.asarray(small_image)] * 2), params
    )
    for a, b in zip(one, two):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b)[0])
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b)[1])


def test_selection_respects_quota_and_spread(test_image):
    import jax.numpy as jnp
    from orbslam3_tpu.ops.extractor import extract_features_jit

    params = oc.PyramidParams(n_features=1000)
    feats = extract_features_jit(jnp.asarray(test_image), params)
    octave = np.asarray(feats.octave)
    valid = np.asarray(feats.valid)
    quotas = params.features_per_level()
    starts = np.cumsum(np.concatenate([[0], quotas[:-1]]))
    for lvl, (s, q) in enumerate(zip(starts, quotas)):
        block = slice(int(s), int(s + q))
        assert valid[block].sum() <= q
        assert (octave[block][valid[block]] == lvl).all()


def test_select_multi_matches_single(test_image):
    """Batched multi-level selection == per-level select_topk_grid, bitwise."""
    import jax.numpy as jnp
    from orbslam3_tpu.ops.extractor import detection_crops
    from orbslam3_tpu.ops.fast import detect_two_threshold_multi
    from orbslam3_tpu.ops.pyramid import build_pyramid
    from orbslam3_tpu.ops.select import select_topk_grid, select_topk_grid_multi

    params = oc.PyramidParams(n_features=1000)
    pyr = build_pyramid(jnp.asarray(test_image), params)
    active, crops = detection_crops(pyr, params)
    scores = detect_two_threshold_multi(crops, params.ini_th_fast, params.min_th_fast)
    quotas = params.features_per_level()
    ks = [int(quotas[l]) for l in active]
    multi = select_topk_grid_multi(scores, ks)
    for s, k, (xy_m, r_m, v_m) in zip(scores, ks, multi):
        xy, r, v = select_topk_grid(s, k)
        np.testing.assert_array_equal(np.asarray(xy), np.asarray(xy_m))
        np.testing.assert_array_equal(np.asarray(r), np.asarray(r_m))
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v_m))

    # stereo-pair layout: repeated same-shape maps (both cameras' matching
    # levels) must stay bitwise too, including an odd group (3 copies of
    # level 0) — guards any future same-shape batching of the pools
    scores2 = scores + scores + scores[:1]
    ks2 = ks + ks + ks[:1]
    multi2 = select_topk_grid_multi(scores2, ks2)
    for s, k, (xy_m, r_m, v_m) in zip(scores2, ks2, multi2):
        xy, r, v = select_topk_grid(s, k)
        np.testing.assert_array_equal(np.asarray(xy), np.asarray(xy_m))
        np.testing.assert_array_equal(np.asarray(r), np.asarray(r_m))
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v_m))


def test_merged_composite_matches_per_block_reflect():
    """The consolidated assembly (stacked strip reverses, 4-px band) is
    bit-identical to per-block reflect-101 padding at mixed block sizes."""
    import jax.numpy as jnp

    from orbslam3_tpu.ops.brief import _reflect101_pad
    from orbslam3_tpu.ops.extractor import build_merged_composites

    rng = np.random.default_rng(3)
    pyrs = [
        [
            jnp.asarray(rng.integers(0, 256, (h, w), np.uint8))
            for (h, w) in ((48, 64), (40, 53), (33, 44))
        ]
        for _ in range(2)
    ]
    comps = build_merged_composites(pyrs)
    p = comps.pad
    got = np.asarray(comps.bordered)
    # every block, read at its (y0, x0) origin, is bit-identical to its own
    # per-block reflect-101 padding — the invariant every consumer relies
    # on, independent of how the shelf packer arranges blocks
    covered = np.zeros(got.shape, bool)
    for cam, pyr in enumerate(pyrs):
        for lvl, img in enumerate(pyr):
            blk = np.asarray(_reflect101_pad(img, p))
            y0, x0 = comps.y0[cam][lvl], comps.x0[cam][lvl]
            hb, wb = blk.shape
            assert np.array_equal(got[y0 : y0 + hb, x0 : x0 + wb], blk)
            assert not covered[y0 : y0 + hb, x0 : x0 + wb].any(), "overlap"
            covered[y0 : y0 + hb, x0 : x0 + wb] = True
    # filler area is zero
    assert not got[~covered].any()
    # packing actually helps: the composite is smaller than a vertical stack
    wmax = max(img.shape[1] for pyr in pyrs for img in pyr) + 2 * p
    vstack_h = sum(img.shape[0] + 2 * p for pyr in pyrs for img in pyr)
    assert got.shape[0] * got.shape[1] <= vstack_h * wmax

