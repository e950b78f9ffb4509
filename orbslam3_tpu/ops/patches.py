"""Per-keypoint patch extraction and sampling as one-hot MXU einsums.

The generic TPU gather unit runs at ~0.1M elements/ms (measured on v5e),
making per-keypoint patch gathers the dominant extraction cost (the rBRIEF
sampler alone needs 512K samples/frame -> ~5 ms as a gather).  The MXU
instead delivers the same values as batched matmuls against one-hot
selection matrices at >100x the rate:

    patch[k] = rowOH[k] @ img @ colOH[k]^T     (separable selection)
    sample[k, s] = rowOH2[k, s] . patch[k] . colOH2[k, s]

Exactness: every operand is a small non-negative integer (pixels <= 255,
one-hots 0/1) — all exactly representable in bfloat16 — and contractions
accumulate in float32 (exact for integers < 2^24), so results are
bit-identical to the gather formulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def onehot_bf16(idx: jax.Array, n: int) -> jax.Array:
    """0/1 bf16 one-hot over the last axis: out[..., j] = (idx == j)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, idx.shape + (n,), idx.ndim)
    return (idx[..., None] == iota).astype(jnp.bfloat16)


def extract_patches(img: jax.Array, xy: jax.Array, half: int) -> jax.Array:
    """(K, 2*half+1, 2*half+1) f32 patches centered at integer xy (K, 2).

    img: (H, W) uint8 (or any small-int); centers must keep the patch
    in-bounds (callers guarantee this via detection borders / padding).
    """
    h, w = img.shape
    p = 2 * half + 1
    off = jnp.arange(p, dtype=jnp.int32)
    rows = xy[:, 1][:, None] - half + off[None, :]  # (K, P)
    cols = xy[:, 0][:, None] - half + off[None, :]
    row_oh = onehot_bf16(rows, h)                   # (K, P, H)
    col_oh = onehot_bf16(cols, w)                   # (K, P, W)
    imgb = img.astype(jnp.bfloat16)
    # row-select output = raw pixels (<= 255, bf16-exact; one-hot dot has a
    # single contributor so accumulation dtype is irrelevant): keeping the
    # big (K, P, W) intermediate in bf16 halves its HBM traffic
    strips = jnp.einsum(
        "kph,hw->kpw", row_oh, imgb, preferred_element_type=jnp.bfloat16
    )
    return jnp.einsum(
        "kpw,kqw->kpq",
        strips,
        col_oh,
        preferred_element_type=jnp.float32,
    )


def extract_level_strips(
    stack: jax.Array,
    level: jax.Array,
    y0: jax.Array,
    x0: jax.Array,
    nr: int,
    nc: int,
) -> jax.Array:
    """(K, nr, nc) f32 windows from a pyramid stack (L, H, W) — window k
    reads stack[level[k], y0[k]:y0[k]+nr, x0[k]:x0[k]+nc].

    Level selection folds into the row one-hot over the (L*H, W) view, so
    the whole thing is two MXU einsums; bit-identical to the flat gather
    (integers < 2^24 accumulate exactly in f32).
    """
    l, h, w = stack.shape
    img2d = stack.reshape(l * h, w).astype(jnp.bfloat16)
    # the nr window rows are CONSECUTIVE: one base-row one-hot (K, L*H)
    # against nr shifted image views, instead of a (K, nr, L*H) one-hot
    # whose materialization alone is ~nr x the traffic
    base_oh = onehot_bf16(level * h + y0, l * h)         # (K, L*H)
    img_pad = jnp.concatenate(
        [img2d, jnp.zeros((nr, w), img2d.dtype)], axis=0
    )
    strips = jnp.stack(
        [
            jnp.einsum(
                "kh,hw->kw",
                base_oh,
                jax.lax.dynamic_slice_in_dim(img_pad, r, l * h, 0),
                preferred_element_type=jnp.bfloat16,
            )
            for r in range(nr)
        ],
        axis=1,
    )  # (K, nr, W) raw pixels, bf16-exact (single contributor per output)
    cols = x0[:, None] + jnp.arange(nc, dtype=jnp.int32)[None, :]
    col_oh = onehot_bf16(cols, w)                        # (K, nc, W)
    return jnp.einsum(
        "krw,kcw->krc",
        strips,
        col_oh,
        preferred_element_type=jnp.float32,
    )


def extract_row_strips(
    img2d: jax.Array,
    row0: jax.Array,
    x0: jax.Array,
    nr: int,
    nc: int,
) -> jax.Array:
    """(K, nr, nc) windows from a 2D composite — window k reads
    img2d[row0[k]:row0[k]+nr, x0[k]:x0[k]+nc].

    Same one-hot machinery as extract_level_strips but over a CONCATENATED
    (sum_h, W) composite instead of a zero-padded (L, H0, W0) stack: the
    base-row one-hot contracts over sum_h (~1.4k rows for a 752x480
    8-level pyramid) instead of L*H0 (3.8k), cutting the strip-extraction
    MXU work ~2.7x.  Bit-identical (one contributor per output)."""
    h, w = img2d.shape
    img2d = img2d.astype(jnp.bfloat16)
    base_oh = onehot_bf16(row0, h)                       # (K, H)
    img_pad = jnp.concatenate(
        [img2d, jnp.zeros((nr, w), img2d.dtype)], axis=0
    )
    strips = jnp.stack(
        [
            jnp.einsum(
                "kh,hw->kw",
                base_oh,
                jax.lax.dynamic_slice_in_dim(img_pad, r, h, 0),
                preferred_element_type=jnp.bfloat16,
            )
            for r in range(nr)
        ],
        axis=1,
    )  # (K, nr, W)
    cols = x0[:, None] + jnp.arange(nc, dtype=jnp.int32)[None, :]
    col_oh = onehot_bf16(cols, w)                        # (K, nc, W)
    return jnp.einsum(
        "krw,kcw->krc",
        strips,
        col_oh,
        preferred_element_type=jnp.float32,
    )


def sample_patches(patches: jax.Array, r: jax.Array, c: jax.Array) -> jax.Array:
    """samples[k, s] = patches[k, r[k, s], c[k, s]] via separable one-hots.

    patches: (K, Pr, Pc) f32 with small-int values; r, c: (K, S) int32 in
    [0, Pr) / [0, Pc).
    """
    pr, pc = patches.shape[1], patches.shape[2]
    row_oh = onehot_bf16(r, pr)  # (K, S, Pr)
    col_oh = onehot_bf16(c, pc)  # (K, S, Pc)
    strips = jnp.einsum(
        "ksp,kpq->ksq",
        row_oh,
        patches.astype(jnp.bfloat16),
        preferred_element_type=jnp.bfloat16,
    )  # selected pixels (<= 255, bf16-exact; one contributor per output)
    return jnp.einsum(
        "ksq,ksq->ks",
        strips,
        col_oh,
        preferred_element_type=jnp.float32,
    )
