"""Batched window gather from a VMEM-resident image (Pallas).

The one-hot MXU patch engines (ops/patches.py) made per-keypoint window
extraction *possible* at MXU rates, but every call materialises (K, P, H)
one-hots and (K, P, W) strip intermediates through HBM — at EuRoC scale
that traffic (~100 MB/frame across orientation + BRIEF + stereo SAD) is
the dominant cost of the patch stages, not the MACs.

This kernel is the TPU-native endgame: the whole (composite) image is
pinned in VMEM once as f32 (a 752x480 8-level composite is ~7-9 MB with
alignment padding — inside but not far under the ~16 MB/core budget; f32
because Mosaic's dynamic-slice alignment granule is 8 rows vs bf16's 16),
keypoint coordinates ride the scalar-prefetch channel (SMEM), and each
grid step copies KB windows out with 2-D dynamic slices that never touch
HBM.  HBM traffic collapses to
one image read + the (K, nr, nc) result write.

Replaces `extract_row_strips` (stereo SAD strips) and `extract_patches`
(orientation moments, BRIEF sampling patches) on TPU; the one-hot einsum
formulation is kept as the non-TPU / fallback path and remains the
semantic spec — results are bit-identical (both are exact u8 gathers).

Reference role: the OpenCL kernels gather per-keypoint patches from
image textures (/root/reference/src/OpenCL/Kernel/Orb.cl:27-30,
Angle.cl:5-62); this is the batched TPU analogue.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_PALLAS_ENV = os.environ.get("ORBSLAM3_TPU_PALLAS_GATHER", "1") == "1"
# fused gather+sample kernel (sample_windows).  Default OFF: measured on v5e
# (r3), the per-keypoint (512,48)x(48,128) dots pay ~1.5 us each of MXU
# dispatch/relayout overhead — K=1000 of them cost ~1.1 ms/camera MORE than
# the XLA one-hot einsum path, whose ~150 MB of one-hot HBM traffic runs at
# full bandwidth (~0.18 ms, its roofline).  Kept hardware-parity-checked
# (bench.py --verify) as the option that wins if K shrinks or S grows.
_PALLAS_SAMPLE = os.environ.get("ORBSLAM3_TPU_PALLAS_SAMPLE", "0") == "1"
# fused gather+moment kernel (window_moments).  Default OFF: in isolation it
# runs the orientation stage ~5x faster (0.02 vs 0.10 ms/camera — the
# (K, 40, 128) patch round-trip and the moment einsums disappear), but in
# the full fused stereo program the A/B is a wash (measured 2.082 vs 2.054
# ms/frame wall/64 medians, overlapping ranges) — XLA already overlaps the
# einsum with neighboring stages, and the kernel pins a second copy of the
# composite in VMEM.  Kept hardware-parity-checked (bench.py --verify) as
# the option that wins when orientation runs standalone or VMEM pressure
# drops.
_PALLAS_MOMENTS = os.environ.get("ORBSLAM3_TPU_PALLAS_MOMENTS", "0") == "1"

# keypoints copied per grid step; sized so the out block (KB, nr, nc) keeps
# Mosaic's relayout work per step small while amortising step overhead
# (measured on v5e at K=2000/(37,128): kb=8 94 us, kb=16 86 us, kb=32 worse)
_KB = 16


def _use_pallas() -> bool:
    try:
        return _PALLAS_ENV and jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _gather_windows_pallas(
    img2d: jax.Array,
    row0: jax.Array,
    col0: jax.Array,
    nr: int,
    nc: int,
    interpret: bool = False,
) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = img2d.shape
    k = row0.shape[0]
    kb = _KB
    kp = -(-k // kb) * kb

    # clamp like the callers' explicit clips: every window stays in-bounds
    rc = jnp.stack(
        [
            jnp.clip(row0.astype(jnp.int32), 0, h - nr),
            jnp.clip(col0.astype(jnp.int32), 0, w - nc),
        ],
        axis=1,
    )
    rc = jnp.pad(rc, ((0, kp - k), (0, 0)))
    # Mosaic only supports dynamic slice starts aligned to the dtype tile —
    # (16, 128) for bf16 — so slices start at an aligned base and the
    # sub-tile residual is applied with a dynamic circular rotate; pad so
    # every aligned window stays in-bounds.  The image pin is bf16 (u8
    # pixels are bf16-exact): half the VMEM footprint and half the
    # slice/roll traffic vs f32, at the price of a 16-row alignment granule;
    # the cropped window upcasts to f32 on store so consumers are unchanged.
    nrp = -(-(nr + 16) // 16) * 16
    ncp = -(-(nc + 128) // 128) * 128
    # canonical pad extents (covering any window <= 48x128): all gathers of
    # the same composite then share ONE padded/bf16 array via CSE instead of
    # re-padding ~10 MB per distinct window shape
    assert nrp <= 64 and ncp <= 256, (nr, nc)
    imgp = jnp.pad(img2d.astype(jnp.bfloat16), ((0, 64), (0, 256)))

    def kernel(rc_ref, img_ref, out_ref):
        i = pl.program_id(0)
        for j in range(kb):
            r0 = rc_ref[i * kb + j, 0]
            c0 = rc_ref[i * kb + j, 1]
            rb = pl.multiple_of((r0 // 16) * 16, 16)
            cb = pl.multiple_of((c0 // 128) * 128, 128)
            win = img_ref[pl.ds(rb, nrp), pl.ds(cb, ncp)]
            # rotate the sub-tile residuals to the top-left, then crop.
            # Mosaic rotates only 32-bit data, so the lane rotate runs on
            # the bf16 slice BITCAST to i32 (sublane-packed pairs — a lane
            # rotate is row-independent, so it commutes with any row
            # packing) at half the vregs of rotating in f32; the row
            # rotate detours through f32 (no bf16 sublane rotate on v5e).
            wp = pltpu.bitcast(win, jnp.int32)
            wp = pltpu.roll(wp, (ncp - (c0 - cb)) % ncp, axis=1)
            win = pltpu.bitcast(wp[:, :128], jnp.bfloat16).astype(jnp.float32)
            win = pltpu.roll(win, (nrp - (r0 - rb)) % nrp, axis=0)
            out_ref[j] = win[:nr, :nc].astype(jnp.bfloat16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(kp // kb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (kb, nr, nc), lambda i, rc: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    # bf16 output: the kernel is bound by its (K, nr, nc) result write
    # (~38 MB/frame in f32 across the four gathers); pixels are u8-valued
    # so bf16 is exact, and every consumer either computes in bf16 already
    # (orientation/BRIEF einsums) or upcasts before reducing (stereo SAD).
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((kp, nr, nc), jnp.bfloat16),
        interpret=interpret,
    )(rc, imgp)
    return out[:k]


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _window_moments_pallas(
    img2d: jax.Array,
    row0: jax.Array,
    col0: jax.Array,
    wplanes: jax.Array,  # (2, nrp, ncp) f32, zero outside [0:nr, 0:nc]
    nr: int,
    nc: int,
    interpret: bool = False,
) -> jax.Array:
    """(K, 2) f32 weighted window sums: out[k, m] = sum(win_k * wplanes[m]).

    Folds the IC-moment reduction into the window gather so the (K, nr, nc)
    patches never round-trip HBM (vs gather_windows + einsum, ~40 MB/frame
    at EuRoC scale).  Exact for the IC use: pixels and weights are integer-
    valued f32, every product < 2^12 and every sum < 2^24, so f32
    accumulation is order-independent — bit-identical to the einsum path."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = img2d.shape
    k = row0.shape[0]
    kb = _KB
    kp = -(-k // kb) * kb
    rc = jnp.stack(
        [
            jnp.clip(row0.astype(jnp.int32), 0, h - nr),
            jnp.clip(col0.astype(jnp.int32), 0, w - nc),
        ],
        axis=1,
    )
    rc = jnp.pad(rc, ((0, kp - k), (0, 0)))
    # same pin as _gather_windows_pallas (bf16, canonical (64, 256) pad,
    # 16-row slice granule) so the two kernels' image inputs CSE into ONE
    # padded array — enabling the fused-moments path costs no extra pin
    nrp = -(-(nr + 16) // 16) * 16
    ncp = -(-(nc + 128) // 128) * 128
    assert nrp <= 64 and ncp <= 256, (nr, nc)
    imgp = jnp.pad(img2d.astype(jnp.bfloat16), ((0, 64), (0, 256)))

    def kernel(rc_ref, img_ref, w_ref, out_ref):
        i = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        for j in range(kb):
            r0 = rc_ref[i * kb + j, 0]
            c0 = rc_ref[i * kb + j, 1]
            rb = pl.multiple_of((r0 // 16) * 16, 16)
            cb = pl.multiple_of((c0 // 128) * 128, 128)
            win = img_ref[pl.ds(rb, nrp), pl.ds(cb, ncp)]
            wp = pltpu.bitcast(win, jnp.int32)
            wp = pltpu.roll(wp, (ncp - (c0 - cb)) % ncp, axis=1)
            win = pltpu.bitcast(wp[:, :128], jnp.bfloat16).astype(jnp.float32)
            win = pltpu.roll(win, (nrp - (r0 - rb)) % nrp, axis=0)
            m10 = jnp.sum(win * w_ref[0])
            m01 = jnp.sum(win * w_ref[1])
            out_ref[j] = jnp.where(lane == 0, m10, jnp.where(lane == 1, m01, 0.0))[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(kp // kb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (kb, 128), lambda i, rc: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((kp, 128), jnp.float32),
        interpret=interpret,
    )(rc, imgp, wplanes)
    return out[:k, :2]


def window_moments(
    img2d: jax.Array,
    row0: jax.Array,
    col0: jax.Array,
    w10: np.ndarray,
    w01: np.ndarray,
) -> tuple[jax.Array, jax.Array]:
    """(m10, m01) weighted window sums per keypoint; weights (nr, nc) are
    integer-valued host constants.  Fused Pallas kernel on TPU; the
    gather_windows + einsum composition (the semantic spec) elsewhere —
    bit-identical (integer sums < 2^24 are exact in f32 either way)."""
    nr, nc = w10.shape
    if _PALLAS_MOMENTS and _use_pallas():
        nrp = -(-(nr + 16) // 16) * 16
        wp = np.zeros((2, nrp, 128), np.float32)
        wp[0, :nr, :nc] = w10
        wp[1, :nr, :nc] = w01
        out = _window_moments_pallas(img2d, row0, col0, jnp.asarray(wp), nr, nc)
        return out[:, 0], out[:, 1]
    patches = gather_windows(img2d, row0, col0, nr, nc).astype(jnp.bfloat16)
    # both moments in ONE einsum: the (K, nr, nc) patch read (the dominant
    # cost, ~40 us/frame at EuRoC scale) happens once instead of twice
    wb = jnp.asarray(np.stack([w10, w01]), jnp.bfloat16)
    m = jnp.einsum("kpq,wpq->kw", patches, wb, preferred_element_type=jnp.float32)
    return m[:, 0], m[:, 1]


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def _sample_windows_pallas(
    img2d: jax.Array,
    row0: jax.Array,
    col0: jax.Array,
    ridx: jax.Array,
    cidx: jax.Array,
    nr: int,
    nc: int,
    interpret: bool = False,
) -> jax.Array:
    """samples[k, s] = img2d[row0[k] + ridx[k, s], col0[k] + cidx[k, s]].

    Fuses the window gather AND the per-sample one-hot selection into one
    kernel: each keypoint's window is 2-D-dynamic-sliced out of the
    VMEM-resident image (as _gather_windows_pallas), then the S samples are
    pulled with an in-kernel one-hot matmul (rows, MXU) + masked lane
    reduce (cols, VPU) — the (K, S, nr) / (K, S, nc) one-hot and strip
    intermediates that dominated the XLA formulation's HBM traffic
    (~115 MB/frame for rBRIEF at EuRoC scale) never leave VMEM; HBM sees
    one image read + the (K, S) result.  Exact: every selected value is a
    raw pixel (<= 255, bf16-exact operands, f32 single-contributor sums).

    Constraints: nr + 8 <= 48-row aligned window, nc <= 128; S a multiple
    of 128.  ridx/cidx must be in [0, nr) / [0, nc); row0/col0 are clamped
    in-bounds like gather_windows.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = img2d.shape
    k, s = ridx.shape
    assert nc <= 128 and s % 128 == 0
    kb = _KB
    kp = -(-k // kb) * kb

    rc = jnp.stack(
        [
            jnp.clip(row0.astype(jnp.int32), 0, h - nr),
            jnp.clip(col0.astype(jnp.int32), 0, w - nc),
        ],
        axis=1,
    )
    rc = jnp.pad(rc, ((0, kp - k), (0, 0)))
    ridx = jnp.pad(ridx.astype(jnp.int32), ((0, kp - k), (0, 0)))
    cidx = jnp.pad(cidx.astype(jnp.int32), ((0, kp - k), (0, 0)))
    nrp = -(-(nr + 8) // 8) * 8
    ncp = -(-(nc + 128) // 128) * 128
    imgp = jnp.pad(img2d.astype(jnp.float32), ((0, nrp), (0, ncp)))

    def kernel(rc_ref, ri_ref, ci_ref, img_ref, out_ref):
        i = pl.program_id(0)
        riota = jax.lax.broadcasted_iota(jnp.int32, (s, nrp), 1)
        ciota = jax.lax.broadcasted_iota(jnp.int32, (s, 128), 1)
        for j in range(kb):
            r0 = rc_ref[i * kb + j, 0]
            c0 = rc_ref[i * kb + j, 1]
            rb = pl.multiple_of((r0 // 8) * 8, 8)
            cb = pl.multiple_of((c0 // 128) * 128, 128)
            win = img_ref[pl.ds(rb, nrp), pl.ds(cb, ncp)]
            win = pltpu.roll(win, (nrp - (r0 - rb)) % nrp, axis=0)
            win = pltpu.roll(win, (ncp - (c0 - cb)) % ncp, axis=1)
            win = win[:, :128]  # cols [0, nc) now live in the first lanes
            row_oh = (ri_ref[j][:, None] == riota).astype(jnp.bfloat16)
            strips = jax.lax.dot_general(
                row_oh,
                win.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (s, 128) — strip row per sample
            col_oh = (ci_ref[j][:, None] == ciota).astype(jnp.float32)
            out_ref[j] = jnp.sum(strips * col_oh, axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(kp // kb,),
        in_specs=[
            pl.BlockSpec((kb, s), lambda i, rc: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, s), lambda i, rc: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (kb, s), lambda i, rc: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((kp, s), jnp.float32),
        interpret=interpret,
    )(rc, ridx, cidx, imgp)
    return out[:k]


def sample_windows(
    img2d: jax.Array,
    row0: jax.Array,
    col0: jax.Array,
    ridx: jax.Array,
    cidx: jax.Array,
    nr: int,
    nc: int,
) -> jax.Array:
    """(K, S) samples; sample [k, s] = img2d[row0[k]+ridx[k,s], col0[k]+cidx[k,s]].

    Fused gather+sample on TPU when ORBSLAM3_TPU_PALLAS_SAMPLE=1; the
    gather_windows + sample_patches composition (the semantic spec)
    otherwise — bit-identical.
    """
    if _PALLAS_SAMPLE and _use_pallas():
        return _sample_windows_pallas(img2d, row0, col0, ridx, cidx, nr, nc)
    from orbslam3_tpu.ops.patches import sample_patches

    patches = gather_windows(img2d, row0, col0, nr, nc)
    return sample_patches(patches, ridx, cidx)


def gather_windows(
    img2d: jax.Array, row0: jax.Array, col0: jax.Array, nr: int, nc: int
) -> jax.Array:
    """(K, nr, nc) bf16 windows; window k = img2d[row0[k]:+nr, col0[k]:+nc].

    Starts are clamped into bounds (callers guarantee real windows are
    in-bounds; clamping only normalises masked/invalid slots).  bf16 is
    exact for the u8-valued pixels; consumers upcast before any reduction
    that can exceed bf16's integer range.
    """
    if _use_pallas():
        return _gather_windows_pallas(img2d, row0, col0, nr, nc)
    from orbslam3_tpu.ops.patches import extract_row_strips

    h, w = img2d.shape
    r = jnp.clip(row0.astype(jnp.int32), 0, h - nr)
    c = jnp.clip(col0.astype(jnp.int32), 0, w - nc)
    return extract_row_strips(img2d, r, c, nr, nc).astype(jnp.bfloat16)
