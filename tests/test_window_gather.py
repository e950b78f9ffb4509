"""Pallas window gather == one-hot strip engine, bit-exact (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from orbslam3_tpu.ops.patches import extract_row_strips
from orbslam3_tpu.ops.window_gather import _gather_windows_pallas


def _cases():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (213, 331), np.uint8)
    for k, nr, nc in ((40, 11, 21), (7, 31, 31), (64, 37, 37), (1, 5, 5)):
        row0 = rng.integers(0, 213 - nr + 1, k).astype(np.int32)
        col0 = rng.integers(0, 331 - nc + 1, k).astype(np.int32)
        yield img, row0, col0, nr, nc


def test_pallas_gather_bit_exact():
    for img, row0, col0, nr, nc in _cases():
        ref = np.asarray(
            extract_row_strips(jnp.asarray(img), jnp.asarray(row0), jnp.asarray(col0), nr, nc)
        )
        out = np.asarray(
            _gather_windows_pallas(
                jnp.asarray(img), jnp.asarray(row0), jnp.asarray(col0), nr, nc,
                True,
            )
        )
        assert (out == ref).all(), (nr, nc, np.argwhere(out != ref)[:3])


def test_pallas_gather_clamps_out_of_bounds():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (64, 160), np.uint8)
    row0 = np.array([-5, 60, 0], np.int32)   # clamped to [0, 64-11]
    col0 = np.array([200, -1, 3], np.int32)  # clamped to [0, 160-21]
    out = np.asarray(
        _gather_windows_pallas(
            jnp.asarray(img), jnp.asarray(row0), jnp.asarray(col0), 11, 21, True
        )
    )
    r = np.clip(row0, 0, 64 - 11)
    c = np.clip(col0, 0, 160 - 21)
    for i in range(3):
        assert (out[i] == img[r[i] : r[i] + 11, c[i] : c[i] + 21]).all()


def test_pallas_sample_windows_bit_exact():
    """Fused gather+sample kernel == direct numpy indexing."""
    from orbslam3_tpu.ops.window_gather import _sample_windows_pallas

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (213, 331), np.uint8)
    for k, nr, nc, s in ((40, 37, 37, 512), (9, 11, 21, 128), (1, 37, 37, 256)):
        row0 = rng.integers(0, 213 - nr + 1, k).astype(np.int32)
        col0 = rng.integers(0, 331 - nc + 1, k).astype(np.int32)
        ridx = rng.integers(0, nr, (k, s)).astype(np.int32)
        cidx = rng.integers(0, nc, (k, s)).astype(np.int32)
        ref = img[row0[:, None] + ridx, col0[:, None] + cidx].astype(np.float32)
        out = np.asarray(
            _sample_windows_pallas(
                jnp.asarray(img), jnp.asarray(row0), jnp.asarray(col0),
                jnp.asarray(ridx), jnp.asarray(cidx), nr, nc, True,
            )
        )
        assert (out == ref).all(), (nr, nc, s, np.argwhere(out != ref)[:3])


def test_pallas_window_moments_bit_exact():
    """Fused gather+moment kernel == gather + weighted-sum spec (exact:
    integer-valued f32 products < 2^12, sums < 2^24)."""
    from orbslam3_tpu.ops.window_gather import (
        _window_moments_pallas,
        gather_windows,
    )
    from orbslam3_tpu.oracle.orb_cpu import ic_moment_weights

    w10, w01 = ic_moment_weights()
    nr, nc = w10.shape
    nrp = -(-(nr + 16) // 16) * 16
    wp = np.zeros((2, nrp, 128), np.float32)
    wp[0, :nr, :nc] = w10
    wp[1, :nr, :nc] = w01
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (213, 331), np.uint8)
    for k in (1, 9, 64):
        row0 = rng.integers(0, 213 - nr + 1, k).astype(np.int32)
        col0 = rng.integers(0, 331 - nc + 1, k).astype(np.int32)
        out = np.asarray(
            _window_moments_pallas(
                jnp.asarray(img), jnp.asarray(row0), jnp.asarray(col0),
                jnp.asarray(wp), nr, nc, True,
            )
        )[:, :2]
        pat = np.asarray(
            gather_windows(jnp.asarray(img), jnp.asarray(row0),
                           jnp.asarray(col0), nr, nc)
        )
        want = np.stack(
            [(pat * w10[None]).sum((1, 2)), (pat * w01[None]).sum((1, 2))],
            axis=1,
        ).astype(np.float32)
        assert (out == want).all(), k
