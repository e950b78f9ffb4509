"""Slope-method A/B: Pallas window gather vs one-hot einsum patch engines.

Run on the real chip.  Times sustained per-call cost by scanning N calls
in ONE dispatch (relay dispatch latency drifts 26-45 ms; never time single
dispatches — NOTES.md).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.ops.patches import extract_patches, extract_row_strips, sample_patches
from orbslam3_tpu.ops.window_gather import _gather_windows_pallas

rng = np.random.default_rng(0)


def slope_time(fn, n1=8, n2=64):
    """Sustained seconds/call via (wall(n2)-wall(n1))/(n2-n1)."""

    def scan_n(n):
        def body(c, _):
            d = fn(c)
            return c + 0.0 * d.sum(), d.sum()

        @jax.jit
        def run(c0):
            _, outs = jax.lax.scan(body, c0, None, length=n)
            return outs.sum()

        return run

    r1, r2 = scan_n(n1), scan_n(n2)
    c0 = jnp.zeros((), jnp.float32)
    r1(c0).block_until_ready(); r2(c0).block_until_ready()  # compile
    t = []
    for r, n in ((r1, n1), (r2, n2)):
        best = 1e9
        for _ in range(3):
            s = time.perf_counter()
            r(c0).block_until_ready()
            best = min(best, time.perf_counter() - s)
        t.append(best)
    return (t[1] - t[0]) / (n2 - n1)


def main():
    print("backend:", jax.default_backend(), flush=True)

    # --- stereo SAD strip case: composite 2210x752, K=1000 ---------------
    comp = jnp.asarray(rng.integers(0, 256, (2210, 752), np.uint8))
    row0 = jnp.asarray(rng.integers(0, 2199, 1000, np.int32))
    col0 = jnp.asarray(rng.integers(0, 731, 1000, np.int32))

    a = extract_row_strips(comp, row0, col0, 11, 21)
    b = _gather_windows_pallas(comp, row0, col0, 11, 21)
    print("strips equal:", bool(jnp.array_equal(a, b)), flush=True)

    t_oh = slope_time(lambda c: extract_row_strips(comp, row0 + c.astype(jnp.int32), col0, 11, 21))
    print(f"strips one-hot : {t_oh*1e3:.3f} ms", flush=True)
    t_pl = slope_time(lambda c: _gather_windows_pallas(comp, row0 + c.astype(jnp.int32), col0, 11, 21))
    print(f"strips pallas  : {t_pl*1e3:.3f} ms", flush=True)

    # --- BRIEF patch case: level-0 sampling image 518x828, K=256 ---------
    img = jnp.asarray(rng.integers(0, 256, (518, 828), np.uint8))
    xy = np.stack(
        [rng.integers(20, 808, 256), rng.integers(20, 498, 256)], axis=1
    ).astype(np.int32)
    xyj = jnp.asarray(xy)

    a = extract_patches(img, xyj, 18)
    b = _gather_windows_pallas(img, xyj[:, 1] - 18, xyj[:, 0] - 18, 37, 37)
    print("patches equal:", bool(jnp.array_equal(a, b)), flush=True)

    t_oh = slope_time(lambda c: extract_patches(img, xyj + c.astype(jnp.int32), 18))
    print(f"patch37 one-hot: {t_oh*1e3:.3f} ms (K=256)", flush=True)
    t_pl = slope_time(
        lambda c: _gather_windows_pallas(
            img, xyj[:, 1] - 18 + c.astype(jnp.int32), xyj[:, 0] - 18, 37, 37
        )
    )
    print(f"patch37 pallas : {t_pl*1e3:.3f} ms (K=256)", flush=True)

    # --- sampling einsum on K=1000 patches (the post-patch BRIEF stage) --
    patches = jnp.asarray(rng.integers(0, 256, (1000, 37, 37), np.uint8)).astype(jnp.float32)
    r = jnp.asarray(rng.integers(0, 37, (1000, 512), np.int32))
    c = jnp.asarray(rng.integers(0, 37, (1000, 512), np.int32))
    t_s = slope_time(lambda k: sample_patches(patches + k, r, c))
    print(f"sample_patches : {t_s*1e3:.3f} ms (K=1000)", flush=True)

    # big-K patch case: K=1000 composite patches (fused all-level BRIEF)
    t_pl = slope_time(
        lambda k: _gather_windows_pallas(
            comp, row0 + k.astype(jnp.int32), col0, 37, 37
        )
    )
    print(f"patch37 pallas : {t_pl*1e3:.3f} ms (K=1000, composite)", flush=True)


if __name__ == "__main__":
    main()
