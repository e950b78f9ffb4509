"""Rotated-BRIEF (rBRIEF) 256-bit descriptors, TPU-native.

The reference computes one byte per OpenCL lane from 16 rotated point-pair
tests (/root/reference/src/OpenCL/Kernel/Orb.cl:36-90).  Here the whole
descriptor block is one vectorised program: rotate all 512 pattern points for
all keypoints in f32 (cvRound == rint, matching the oracle's f32 arithmetic),
gather the 512 samples per keypoint from the blurred level image, compare the
256 pairs, and pack bits with a tiny matmul against the power-of-two vector.

Keypoint centers sit >= 19 px from the level border (detection crop + 3), and
the rotated pattern reach is <= 18, so every sample is in-bounds — same
invariant the reference relies on.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.ops.brief_pattern import BIT_PATTERN_31

_FACTOR_PI = np.float32(math.pi / 180.0)
# (256, 2) point pairs -> (512,) flat points, even = p0, odd = p1
_PX = np.concatenate([BIT_PATTERN_31[:, [0, 2]].reshape(-1)]).astype(np.float32)
_PY = np.concatenate([BIT_PATTERN_31[:, [1, 3]].reshape(-1)]).astype(np.float32)
_POW2 = np.array([1, 2, 4, 8, 16, 32, 64, 128], dtype=np.int32)


@jax.jit
def brief_descriptors(
    blurred: jax.Array,
    xy: jax.Array,
    angles_deg: jax.Array,
    trig: tuple[jax.Array, jax.Array] | None = None,
) -> jax.Array:
    """(N, 32) uint8 descriptors.

    blurred: uint8 level image; xy: (N, 2) f32 level coords; angles: (N,) deg.
    Bit-exact vs the oracle given identical (cos, sin); platform trig may
    differ by ulps, which the tests bound separately (pass `trig` to pin it).
    """
    h, w = blurred.shape
    if trig is not None:
        a = trig[0].astype(jnp.float32)[:, None]
        b = trig[1].astype(jnp.float32)[:, None]
    else:
        ang = angles_deg.astype(jnp.float32) * _FACTOR_PI
        a = jnp.cos(ang)[:, None]  # (N, 1)
        b = jnp.sin(ang)[:, None]
    px = jnp.asarray(_PX)[None, :]  # (1, 512)
    py = jnp.asarray(_PY)[None, :]
    cy = jnp.rint(xy[:, 1]).astype(jnp.int32)[:, None]
    cx = jnp.rint(xy[:, 0]).astype(jnp.int32)[:, None]
    r = jnp.rint(px * b + py * a).astype(jnp.int32) + cy  # (N, 512)
    c = jnp.rint(px * a - py * b).astype(jnp.int32) + cx
    flat = blurred.reshape(-1).astype(jnp.int32)
    idx = jnp.clip(r * w + c, 0, h * w - 1)  # clip only guards invalid slots
    samples = flat[idx]  # (N, 512) gather
    t0 = samples[:, 0::2]
    t1 = samples[:, 1::2]
    bits = (t0 < t1).astype(jnp.int32).reshape(-1, 32, 8)  # (N, 32 bytes, 8 bits)
    return jnp.sum(bits * jnp.asarray(_POW2)[None, None, :], axis=-1).astype(jnp.uint8)
