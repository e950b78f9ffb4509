"""Pallas FAST kernel == XLA/roll formulation, bit-exact (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from orbslam3_tpu.ops import fast as F


def _roll_raw(img):
    # the XLA formulation, forced (module default on CPU backend anyway)
    h, w = img.shape
    c = img.astype(jnp.int32)
    ring = F._ring_planes(c)
    d = ring - c[None]
    score = jnp.maximum(F._arc_score(d), F._arc_score(-d)) - 1
    ys = np.arange(h)[:, None]
    xs = np.arange(w)[None, :]
    inner = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
    return np.where(inner, np.asarray(score), 0)


def test_pallas_fast_bit_exact(small_image):
    ref = _roll_raw(jnp.asarray(small_image))
    out = np.asarray(F._raw_score_pallas(jnp.asarray(small_image), interpret=True))
    assert out.shape == ref.shape
    assert (out == ref).all(), np.argwhere(out != ref)[:5]


def test_pallas_fast_masked_bit_exact(small_image):
    """Static interior mask folded into the kernel store == where(mask, raw, 0)."""
    h, w = small_image.shape
    mask = np.zeros((h, w), bool)
    mask[3 : h - 3, 3 : w - 3] = True
    mask[:, w // 3 : w // 3 + 5] = False  # fake level seam
    mask[h // 2 : h // 2 + 7, :] = False
    ref = np.where(mask, _roll_raw(jnp.asarray(small_image)), 0)
    out = np.asarray(
        F._raw_score_pallas(jnp.asarray(small_image), interpret=True, mask_np=mask)
    )
    assert (out == ref).all(), np.argwhere(out != ref)[:5]


def test_pallas_fast_odd_sizes():
    rng = np.random.default_rng(5)
    for h, w in ((65, 130), (96, 746), (57, 57)):
        img = rng.integers(0, 255, (h, w), np.uint8)
        ref = _roll_raw(jnp.asarray(img))
        out = np.asarray(F._raw_score_pallas(jnp.asarray(img), interpret=True))
        assert (out == ref).all(), (h, w)
