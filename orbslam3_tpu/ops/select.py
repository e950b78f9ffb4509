"""Spatially-uniform top-K keypoint selection (DistributeOctTree, TPU-native).

The reference spreads keypoints with a sequential pointer-chasing quadtree
(/root/reference/src/ORBextractor.cc:584-774) — unimplementable efficiently
under XLA's static-shape model.  The TPU design replaces it with an
equivalent-objective, fully data-parallel selection:

 1. partition the detection crop into a static grid of at most K cells
    (cell size chosen at trace time so gx*gy <= K);
 2. keep the best-response corner of every non-empty cell (the octree's
    "retain best per node" step, :755-771);
 3. fill the remaining quota with the globally best residual corners
    (lax.top_k over the winner-suppressed score map).

Output is a fixed-size (K,) slot block with a validity mask — no dynamic
shapes, no atomics (the reference used atomic_inc compaction).  The exact
octree is kept in the oracle for parity experiments (SURVEY §7).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def cell_size_for(h: int, w: int, k: int) -> int:
    """Smallest cell size whose grid has at most k cells."""
    cell = max(int(math.sqrt(h * w / max(k, 1))), 1)
    while math.ceil(w / cell) * math.ceil(h / cell) > k:
        cell += 1
    return cell


def select_topk_grid(score: jax.Array, k: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Pick k spatially-spread maxima from an NMS'd score map.

    Returns (xy (k, 2) int32 crop coords, response (k,) int32, valid (k,) bool).
    Deterministic: ties broken by flat index (lax.top_k is stable).
    """
    h, w = score.shape
    cell = cell_size_for(h, w, k)
    gy, gx = math.ceil(h / cell), math.ceil(w / cell)
    ph, pw = gy * cell, gx * cell
    padded = jnp.zeros((ph, pw), score.dtype).at[:h, :w].set(score)

    cells = padded.reshape(gy, cell, gx, cell).transpose(0, 2, 1, 3).reshape(gy * gx, cell * cell)
    cmax = cells.max(axis=1)
    carg = jnp.argmax(cells, axis=1)
    cell_ids = jnp.arange(gy * gx, dtype=jnp.int32)
    wy = (cell_ids // gx) * cell + (carg // cell).astype(jnp.int32)
    wx = (cell_ids % gx) * cell + (carg % cell).astype(jnp.int32)

    # residual pool: winner positions suppressed, then global top-k
    resid = padded.at[wy, wx].set(0).reshape(-1)
    rresp, ridx = jax.lax.top_k(resid, k)
    ry = (ridx // pw).astype(jnp.int32)
    rx = (ridx % pw).astype(jnp.int32)

    resp = jnp.concatenate([cmax, rresp])
    ys = jnp.concatenate([wy, ry])
    xs = jnp.concatenate([wx, rx])
    # cell winners take absolute priority; invalid slots sink below everything
    is_winner = jnp.concatenate(
        [jnp.ones_like(cmax), jnp.zeros_like(rresp)]
    ).astype(jnp.float32)
    key = jnp.where(resp > 0, is_winner * 1e6 + resp.astype(jnp.float32), -1.0)
    top_key, sel = jax.lax.top_k(key, k)
    xy = jnp.stack([xs[sel], ys[sel]], axis=1)
    return xy, resp[sel], top_key > 0
