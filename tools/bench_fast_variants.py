"""FAST score kernel micro-variants, slope-timed on the composite shape."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from orbslam3_tpu.oracle.orb_cpu import FAST_RING
from orbslam3_tpu.ops.fast import _raw_score_pallas

rng = np.random.default_rng(0)
H, W = 2112, 736
IMG = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))


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


def make_variant(cast_early: bool, chain_dtype, in_dtype):
    strip = 32

    def build(img):
        h, w = img.shape
        wo = -(-w // 128) * 128
        wp = -(-(wo + 6) // 128) * 128
        hp = -(-h // strip) * strip
        padded = jnp.pad(img, ((3, hp - h + 3), (3, wp - w - 3)))
        if in_dtype is not None:
            padded = padded.astype(in_dtype)
        views = [jax.lax.slice(padded, (3 + dy, 0), (3 + dy + hp, wp))
                 for dy in range(-3, 4)]

        def kernel(*refs):
            vs, out = refs[:7], refs[7]
            if cast_early and in_dtype == jnp.bfloat16:
                c = vs[3][:, 3 : 3 + wo]
                d = [vs[3 + dy][:, 3 + dx : 3 + dx + wo] - c
                     for (dx, dy) in FAST_RING]
            elif cast_early:
                vi = [v[:].astype(jnp.int32) for v in vs]
                c = vi[3][:, 3 : 3 + wo]
                d = [vi[3 + dy][:, 3 + dx : 3 + dx + wo] - c
                     for (dx, dy) in FAST_RING]
            else:
                c = vs[3][:, 3 : 3 + wo].astype(jnp.int32)
                d = [vs[3 + dy][:, 3 + dx : 3 + dx + wo].astype(jnp.int32) - c
                     for (dx, dy) in FAST_RING]
            if chain_dtype is not None:
                d = [x.astype(chain_dtype) for x in d]

            def arc(p):
                m2 = [jnp.minimum(p[o], p[(o + 1) % 16]) for o in range(16)]
                m4 = [jnp.minimum(m2[o], m2[(o + 2) % 16]) for o in range(16)]
                m8 = [jnp.minimum(m4[o], m4[(o + 4) % 16]) for o in range(16)]
                m9 = [jnp.minimum(m8[o], p[(o + 8) % 16]) for o in range(16)]
                best = m9[0]
                for o in range(1, 16):
                    best = jnp.maximum(best, m9[o])
                return best

            s = jnp.maximum(arc(d), arc([-x for x in d]))
            out[:] = s.astype(jnp.int32) - 1

        return pl.pallas_call(
            kernel,
            grid=(hp // strip,),
            in_specs=[pl.BlockSpec((strip, wp), lambda i: (i, 0), memory_space=pltpu.VMEM)] * 7,
            out_specs=pl.BlockSpec((strip, wo), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((hp, wo), jnp.int32),
        )(*views)

    return jax.jit(build)


def main():
    print("backend:", jax.default_backend(), flush=True)
    base = _raw_score_pallas(IMG)

    cases = [
        ("current        ", make_variant(False, None, None)),
        ("cast-early     ", make_variant(True, None, None)),
        ("i32-views      ", make_variant(False, None, jnp.int32)),
        ("bf16-chains    ", make_variant(False, jnp.bfloat16, None)),
        ("i32v+bf16chain ", make_variant(False, jnp.bfloat16, jnp.int32)),
        ("bf16-everything", make_variant(True, None, jnp.bfloat16)),
    ]
    h, w = IMG.shape
    for name, fn in cases:
        out = fn(IMG)[:h, :w]
        ok = bool(jnp.array_equal(out[3:-3, 3:-3], np.asarray(base)[3:-3, 3:-3]))
        t = slope(lambda c, f=fn: f(IMG + (c.astype(jnp.uint8) % 2)).sum().astype(jnp.float32))
        print(f"{name}: {t:.3f} ms  exact={ok}", flush=True)


if __name__ == "__main__":
    main()
