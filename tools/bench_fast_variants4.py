"""FAST score kernel round-4 variants: dependency-depth (ILP) experiments.

The shipping _win9 is a van Herk prefix/suffix scan: fewest ops (58) but a
~24-step serial dependency chain per polarity.  The kernel runs at ~4.9x
its op-count bound, so if the gap is dependency stalls (not issue
throughput or spills), a lower-depth reducer should win despite more ops:

  * pairs: log-step windowed reduction w2/w4/w8 + tail combine — 77 ops,
    depth 4.  (The round-3 "log-step" that lost held BOTH polarities'
    partials live across the whole chunk; here each polarity completes
    before the next starts, like the shipping arrangement.)
  * vanherk: the shipping reducer inside the same harness (control).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from orbslam3_tpu.oracle.orb_cpu import FAST_RING
from orbslam3_tpu.ops.fast import _raw_score_pallas, _win9

rng = np.random.default_rng(0)
H, W = 2112, 736
IMG = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))


def _win9_pairs(p, op):
    """Windowed-9 reduction via log-step doubling: 77 ops, depth 4."""
    e = [p[j % 16] for j in range(24)]
    w2 = [op(e[j], e[j + 1]) for j in range(23)]
    w4 = [op(w2[j], w2[j + 2]) for j in range(21)]
    w8 = [op(w4[j], w4[j + 4]) for j in range(17)]
    return [op(w8[o], e[o + 8]) for o in range(16)]


def slope(fn, n1=8, n2=40):
    def scan_n(n):
        @jax.jit
        def run(c0):
            def body(c, _):
                d = fn(c)
                return c + 0.0 * d, d

            _, outs = jax.lax.scan(body, c0, None, length=n)
            return outs.sum()

        return run

    r1, r2 = scan_n(n1), scan_n(n2)
    c0 = jnp.zeros((), jnp.float32)
    r1(c0).block_until_ready(); r2(c0).block_until_ready()
    t = []
    for r, n in ((r1, n1), (r2, n2)):
        best = 1e9
        for _ in range(3):
            s = time.perf_counter()
            r(c0).block_until_ready()
            best = min(best, time.perf_counter() - s)
        t.append(best)
    return (t[1] - t[0]) / (n2 - n1) * 1e3


def make_kernel(strip=48, chunk=384, win=_win9):
    def build(img):
        h, w = img.shape
        wo = -(-w // 128) * 128
        wp = -(-(wo + 6) // 128) * 128
        hp = -(-h // strip) * strip
        n = hp // strip
        padded = jnp.pad(img, ((3, hp - h + 3), (3, wp - w - 3))).astype(
            jnp.bfloat16
        )
        strips = jnp.stack(
            [jax.lax.slice(padded, (i * strip, 0), (i * strip + strip + 6, wp))
             for i in range(n)]
        )

        def kernel(v, out):
            vx = {dx: v[0, :, 3 + dx : 3 + dx + wo] for dx in range(-3, 4)}
            for c0 in range(0, wo, chunk):
                cols = min(chunk, wo - c0)
                c = vx[0][3 : 3 + strip, c0 : c0 + cols]
                d = [
                    vx[dx][3 + dy : 3 + dy + strip, c0 : c0 + cols] - c
                    for (dx, dy) in FAST_RING
                ]
                bright = functools.reduce(jnp.maximum, win(d, jnp.minimum))
                ndark = functools.reduce(jnp.minimum, win(d, jnp.maximum))
                s = jnp.maximum(bright, -ndark)
                out[:, c0 : c0 + cols] = s.astype(jnp.int32) - 1

        return pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[
                pl.BlockSpec(
                    (1, strip + 6, wp), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (strip, wo), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((hp, wo), jnp.int32),
        )(strips)

    return jax.jit(build)


def main():
    print("backend:", jax.default_backend(), flush=True)
    base = np.asarray(_raw_score_pallas(IMG))

    cases = [
        ("vanherk s48 c384 (ctrl)", make_kernel(48, 384, _win9)),
        ("pairs   s48 c384       ", make_kernel(48, 384, _win9_pairs)),
        ("pairs   s48 c192       ", make_kernel(48, 192, _win9_pairs)),
        ("pairs   s48 c768       ", make_kernel(48, 768, _win9_pairs)),
        ("pairs   s32 c384       ", make_kernel(32, 384, _win9_pairs)),
    ]
    h, w = IMG.shape
    for name, fn in cases:
        try:
            out = np.asarray(fn(IMG))[:h, :w]
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        ok = bool(np.array_equal(out[3:-3, 3:-3], base[3:-3, 3:-3]))
        t = slope(
            lambda c, f=fn: f(IMG + (c.astype(jnp.uint8) % 2))
            .sum()
            .astype(jnp.float32)
        )
        print(f"{name}: {t:.3f} ms  exact={ok}", flush=True)


if __name__ == "__main__":
    main()
