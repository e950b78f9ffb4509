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

    def grid_maxima(m: jax.Array, c: int, mh: int = ph, mw: int = pw):
        """Per-cell (max, y, x) for cell size c over the (mh, mw) map."""
        ny, nx = mh // c, mw // c
        cells = m.reshape(ny, c, nx, c).transpose(0, 2, 1, 3).reshape(ny * nx, c * c)
        cmax = cells.max(axis=1)
        carg = jnp.argmax(cells, axis=1)
        ids = jnp.arange(ny * nx, dtype=jnp.int32)
        cy = (ids // nx) * c + (carg // c).astype(jnp.int32)
        cx = (ids % nx) * c + (carg % c).astype(jnp.int32)
        return cmax, cy, cx

    cmax, wy, wx = grid_maxima(padded, cell)

    # Residual pool: winners suppressed, then best-per-fine-cell (a 4x finer
    # grid).  A global lax.top_k over the whole map would sort ~350K values
    # (milliseconds); per-fine-cell maxima + a top-k over <=4k candidates is
    # the same spatial-uniformity objective at ~zero cost.
    resid = padded.at[wy, wx].set(0)
    fine = max(cell // 2, 1)
    fy, fx = math.ceil(ph / fine), math.ceil(pw / fine)
    resid = jnp.zeros((fy * fine, fx * fine), score.dtype).at[:ph, :pw].set(resid)
    rresp, ry, rx = grid_maxima(resid, fine, fy * fine, fx * fine)

    # zero-pad the candidate pool so it always holds >= k entries
    zpad = jnp.zeros((k,), jnp.int32)
    resp = jnp.concatenate([cmax, rresp, zpad])
    ys = jnp.concatenate([wy, ry, zpad])
    xs = jnp.concatenate([wx, rx, zpad])
    # cell winners take absolute priority; invalid slots sink below everything
    is_winner = jnp.concatenate(
        [jnp.ones_like(cmax), jnp.zeros_like(rresp), zpad]
    ).astype(jnp.float32)
    key = jnp.where(resp > 0, is_winner * 1e6 + resp.astype(jnp.float32), -1.0)
    top_key, sel = jax.lax.top_k(key, k)
    xy = jnp.stack([xs[sel], ys[sel]], axis=1)
    return xy, resp[sel], top_key > 0
