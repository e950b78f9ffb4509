"""Fused detection kernel (score+mask+retry+NMS) == XLA composition, bit-exact.

Runs the Pallas kernel in interpret mode on the CPU backend; the on-device
run is covered by `bench.py --verify` (stage B4) when the TPU relay is up.
"""

import numpy as np
import jax
import jax.numpy as jnp

from orbslam3_tpu.ops import fast as F


def _xla_detect(comp, mask, ini_th, min_th):
    raw = F.raw_score_map(jnp.asarray(comp))
    raw = jnp.where(jnp.asarray(mask), raw, 0)
    hi = jnp.where(raw >= ini_th, raw, 0)
    lo = jnp.where(raw >= min_th, raw, 0)
    tile_max = jax.lax.reduce_window(
        hi, jnp.zeros((), hi.dtype), jax.lax.max,
        (F.TILE, F.TILE), (F.TILE, F.TILE), "VALID",
    )
    use_hi = jnp.repeat(
        jnp.repeat(tile_max > 0, F.TILE, axis=0), F.TILE, axis=1
    )
    return np.asarray(F.nms3(jnp.where(use_hi, hi, lo)))


def _rect_mask(h, w, rects):
    mask = np.zeros((h, w), bool)
    for (y0, x0, ch, cw) in rects:
        mask[y0 + 3 : y0 + ch - 3, x0 + 3 : x0 + cw - 3] = True
    return mask


def _check(comp, mask, ini_th=20, min_th=7):
    want = _xla_detect(comp, mask, ini_th, min_th)
    got = np.asarray(
        F._detect_fused_pallas(
            jnp.asarray(comp), mask, ini_th, min_th, interpret=True
        )
    )
    assert got.shape == want.shape
    bad = np.argwhere(got != want)
    assert bad.size == 0, (bad[:5], got[tuple(bad[0])], want[tuple(bad[0])])


def test_fused_single_level():
    rng = np.random.default_rng(7)
    h, w = 96, 160
    comp = rng.integers(0, 255, (h, w), np.uint8)
    _check(comp, _rect_mask(h, w, [(0, 0, h, w)]))


def test_fused_single_strip():
    # n == 1: the lag pipeline's smallest case
    rng = np.random.default_rng(11)
    comp = rng.integers(0, 255, (32, 128), np.uint8)
    _check(comp, _rect_mask(32, 128, [(0, 0, 32, 128)]))


def test_fused_multi_level_shelves():
    # shelf-packed pyramid-like layout with seams and dead zones
    rng = np.random.default_rng(13)
    h, w = 160, 224
    comp = rng.integers(0, 255, (h, w), np.uint8)
    rects = [(0, 0, 96, 224), (96, 0, 64, 96), (96, 96, 32, 64)]
    _check(comp, _rect_mask(h, w, rects))


def test_fused_retry_tiles_exercised():
    # flat image with a few weak corners: ini_th finds nothing in most
    # tiles, so the min_th retry path decides the output
    rng = np.random.default_rng(17)
    comp = np.full((64, 256), 120, np.uint8)
    comp[8, 8] = 140   # weak corner: passes min_th only
    comp[40, 200] = 250  # strong corner: flips its tile to hi
    comp += rng.integers(0, 3, comp.shape).astype(np.uint8)
    _check(comp, _rect_mask(64, 256, [(0, 0, 64, 256)]), ini_th=60, min_th=7)


def test_fused_via_public_multi(monkeypatch):
    # the public composite entry, forced down the fused path in interpret
    # mode, matches the XLA branch exactly
    rng = np.random.default_rng(19)
    crops = [rng.integers(0, 255, (h, w), np.uint8)
             for (h, w) in ((96, 160), (72, 120), (48, 80))]
    want = [np.asarray(s) for s in
            F.detect_two_threshold_multi([jnp.asarray(c) for c in crops], 20, 7)]
    fused = F._detect_fused_pallas
    monkeypatch.setattr(F, "_use_pallas", lambda: True)
    monkeypatch.setattr(F, "_PALLAS_DETECT", True)
    monkeypatch.setattr(
        F, "_detect_fused_pallas",
        lambda comp, mask, a, b: fused(comp, mask, a, b, interpret=True),
    )
    got = [np.asarray(s) for s in
           F.detect_two_threshold_multi([jnp.asarray(c) for c in crops], 20, 7)]
    for g, wv in zip(got, want):
        assert (g == wv).all()


def test_masked_raw_branch_via_public_multi(monkeypatch):
    # the UNfused Pallas branch of detect_two_threshold_multi (masked
    # _raw_score_pallas + the hi/lo/tile-retry/nms3 XLA tail) — the default
    # on hardware — forced down in interpret mode, matches the pure-XLA
    # where(mask, raw_score_map, 0) branch exactly (ADVICE r3: this branch
    # was only covered end-to-end by bench.py --verify)
    rng = np.random.default_rng(23)
    crops = [rng.integers(0, 255, (h, w), np.uint8)
             for (h, w) in ((96, 160), (72, 120), (48, 80))]
    want = [np.asarray(s) for s in
            F.detect_two_threshold_multi([jnp.asarray(c) for c in crops], 20, 7)]
    raw_pallas = F._raw_score_pallas
    monkeypatch.setattr(F, "_use_pallas", lambda: True)
    monkeypatch.setattr(F, "_PALLAS_DETECT", False)
    monkeypatch.setattr(
        F, "_raw_score_pallas",
        lambda comp, mask_np=None: raw_pallas(comp, interpret=True, mask_np=mask_np),
    )
    got = [np.asarray(s) for s in
           F.detect_two_threshold_multi([jnp.asarray(c) for c in crops], 20, 7)]
    for g, wv in zip(got, want):
        assert (g == wv).all()
