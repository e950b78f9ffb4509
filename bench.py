"""Driver benchmark: steady-state ORB extraction+stereo-matching latency.

Prints ONE final JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}

Baseline: the reference's measured 38.53 ms/frame ORB extraction on EuRoC
MH01 stereo (ExecMean.txt:6, see BASELINE.md).  `vs_baseline` is the speedup
factor (baseline / ours; >1 means faster than the reference).

Benchmarks the headline per-frame front-end: stereo pair (2x 752x480, 8
levels, 1000 features/camera) extraction through the fused device pipeline,
plus left-right descriptor matching.

Survivability (round-2 postmortem): the r02 run died rc=124 with no output —
a relay hang mid-measurement, killed by the driver timeout before anything
printed.  Structure now:
  * a WATCHDOG THREAD (not SIGALRM: a Python signal handler cannot run while
    the main thread is blocked inside a hung PJRT RPC) holds a hard deadline
    well under the driver timeout; at the deadline it prints the best
    measurement recorded so far as the final JSON line and _exits 0;
  * the headline program (cache-warm from prior rounds) is measured FIRST,
    so a valid number exists within minutes of a healthy start;
  * every supplementary line (batch=1 latency, dispatch floor, slope, HBM
    roofline, Pallas on-TPU parity) runs after, individually guarded, and is
    sacrificed on deadline;
  * any exception anywhere still prints the best-known headline and exits 0.
If the relay is down for the entire window the final line carries
"value": null — no measurement is ever fabricated.

`python bench.py --verify` runs only the Pallas-vs-XLA on-device parity
checks (VERDICT r2 item 2) and prints one JSON line.
"""

import json
import os
import sys
import threading
import time

import numpy as np

BASELINE_EXTRACT_MS = 38.53  # reference ExecMean.txt:6 (+ 7.74 stereo match, :7)
HEADLINE_METRIC = "stereo_orb_extract_match_ms_per_frame"
V5E_HBM_GBPS = 819.0  # v5e peak HBM bandwidth

_DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_SECS", "1200"))
_T0 = time.monotonic()

# best-known headline, updated as measurements land (GIL-atomic dict swap)
_BEST = {"value": None}
_FINAL_EMITTED = threading.Event()


def _emit_final() -> None:
    """Print the best-known headline as the final JSON line (exactly once)."""
    if _FINAL_EMITTED.is_set():
        return
    _FINAL_EMITTED.set()
    rec = dict(_BEST)
    v = rec.get("value")
    line = {
        "metric": HEADLINE_METRIC,
        "value": None if v is None else round(v, 3),
        "unit": "ms",
        "vs_baseline": None if v is None else round(BASELINE_EXTRACT_MS / v, 2),
    }
    for k in ("method", "note"):
        if rec.get(k):
            line[k] = rec[k]
    print(json.dumps(line), flush=True)


def _time_left() -> float:
    return _DEADLINE_S - (time.monotonic() - _T0)


def _watchdog() -> None:
    while not _FINAL_EMITTED.is_set():
        left = _time_left()
        if left <= 0:
            _BEST.setdefault("note", "deadline hit; best-known result")
            if _BEST.get("value") is not None:
                _BEST["note"] = "deadline hit; best measurement so far"
            else:
                _BEST["note"] = "deadline hit before any measurement completed"
            _emit_final()
            os._exit(0)
        time.sleep(min(left, 5.0))


def _record(value_ms: float, method: str) -> None:
    cur = _BEST.get("value")
    if cur is None or value_ms < cur:
        _BEST.update({"value": float(value_ms), "method": method})


def make_frame(seed: int, h: int = 480, w: int = 752) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = (
        120 + 60 * np.sin(xx / 37.0) * np.cos(yy / 23.0) + rng.normal(0, 18, (h, w))
    ).clip(0, 255)
    for _ in range(120):
        cx, cy = int(rng.integers(20, w - 20)), int(rng.integers(20, h - 20))
        r = int(rng.integers(3, 14))
        img[(xx - cx) ** 2 + (yy - cy) ** 2 < r * r] = int(rng.integers(0, 256))
    return img.astype(np.uint8)


def _init_jax():
    import jax

    # persistent compile cache: remote TPU compiles run 20-120 s per program
    # variant; cached reruns keep the whole benchmark under the deadline
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # offline validation hook: the axon plugin overrides JAX_PLATFORMS, so
    # exercising the full stage machinery without the relay needs an
    # explicit post-import pin (numbers produced this way are NOT headline
    # numbers — the driver never sets this)
    if os.environ.get("BENCH_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    # the axon relay occasionally drops for minutes; ride out short outages
    # (the watchdog bounds a full hang)
    while True:
        try:
            jax.devices()
            return jax
        except Exception:
            if _time_left() < 90:
                raise
            time.sleep(30)


def _build_run(jax, params, n: int):
    """Scan program over n stereo pairs; digest defeats DCE."""
    import jax.numpy as jnp

    from orbslam3_tpu.frontend import stereo_frame as sf

    pairs = jax.device_put(
        np.stack(
            [np.stack([make_frame(2 * i), make_frame(2 * i + 1)]) for i in range(n)]
        )
    )

    @jax.jit
    def run(ps):
        out = sf.extract_and_match_stereo_sequence.__wrapped__(
            ps, params, sf.DEFAULT_MBF, sf.DEFAULT_FX
        )
        acc = jnp.float32(0)
        for leaf in jax.tree.leaves(out):
            acc = acc + leaf.astype(jnp.float32).sum()
        return acc

    return run, pairs


def _median_wall_ms(run, pairs, reps: int) -> float:
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(pairs))
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times))


def pallas_parity_checks(jax) -> dict:
    """On-device Pallas == XLA-fallback parity (VERDICT r2 item 2).

    Covers the round-2 Mosaic kernels on the real backend:
      * ops/window_gather: VMEM window gather vs one-hot einsum path
        (reference role: patch gathers in Orb.cl:27-30 / Angle.cl:5-62)
      * ops/fast: bf16 row-strip FAST score vs the XLA roll formulation
        (reference role: TileCalcKeypoints.cl:288)
    """
    import jax.numpy as jnp

    from orbslam3_tpu.ops import fast as fast_mod
    from orbslam3_tpu.ops import window_gather as wg
    from orbslam3_tpu.ops.patches import extract_row_strips

    backend = jax.default_backend()
    frame = make_frame(123)
    img = jnp.asarray(frame, jnp.float32)
    h, w = frame.shape

    rng = np.random.default_rng(5)
    k = 211
    row0 = jnp.asarray(rng.integers(0, max(h - 37, 1), k), jnp.int32)
    col0 = jnp.asarray(rng.integers(0, max(w - 37, 1), k), jnp.int32)

    results = {"backend": backend}
    on_tpu = backend == "tpu"

    # window gather: pallas (interpret off-TPU) vs the one-hot semantic spec
    got = np.asarray(
        wg._gather_windows_pallas(img, row0, col0, 37, 37, interpret=not on_tpu)
    )
    want = np.asarray(extract_row_strips(img, row0, col0, 37, 37))
    results["window_gather_exact"] = bool(np.array_equal(got, want))

    # fused gather+sample (rBRIEF sampler): pallas vs direct indexing
    ridx = rng.integers(0, 37, (k, 512)).astype(np.int32)
    cidx = rng.integers(0, 37, (k, 512)).astype(np.int32)
    got_s = np.asarray(
        wg._sample_windows_pallas(
            img, row0, col0, jnp.asarray(ridx), jnp.asarray(cidx), 37, 37,
            interpret=not on_tpu,
        )
    )
    r0 = np.asarray(row0)[:, None]
    c0 = np.asarray(col0)[:, None]
    want_s = np.asarray(img)[r0 + ridx, c0 + cidx].astype(np.float32)
    results["sample_windows_exact"] = bool(np.array_equal(got_s, want_s))

    # fused window moments (IC-angle): pallas gather+reduce vs gather+einsum
    from orbslam3_tpu.oracle.orb_cpu import ic_moment_weights

    w10, w01 = ic_moment_weights()
    nr = nc = w10.shape[0]
    nrp = -(-(nr + 16) // 16) * 16
    wp = np.zeros((2, nrp, 128), np.float32)
    wp[0, :nr, :nc] = w10
    wp[1, :nr, :nc] = w01
    got_m = np.asarray(
        wg._window_moments_pallas(
            img, row0, col0, jnp.asarray(wp), nr, nc, interpret=not on_tpu
        )
    )[:, :2]
    pat = np.asarray(extract_row_strips(img, row0, col0, nr, nc))
    want_m = np.stack(
        [(pat * w10[None]).sum((1, 2)), (pat * w01[None]).sum((1, 2))], axis=1
    ).astype(np.float32)
    results["window_moments_exact"] = bool(np.array_equal(got_m, want_m))

    # FAST raw score: pallas bf16 strips vs XLA roll formulation
    img_u8 = jnp.asarray(make_frame(321))
    got_f = np.asarray(fast_mod._raw_score_pallas(img_u8, interpret=not on_tpu))
    prev = fast_mod._PALLAS_ENV
    fast_mod._PALLAS_ENV = False
    try:
        want_f = np.asarray(fast_mod.raw_score_map(img_u8))
    finally:
        fast_mod._PALLAS_ENV = prev
    results["fast_score_exact"] = bool(np.array_equal(got_f, want_f))

    # masked FAST score (per-level interior mask folded into the store)
    mask_f = np.zeros(img_u8.shape, bool)
    mask_f[3:-3, 3:-3] = True
    mask_f[:, 200:230] = False  # fake level seam
    mask_f[100:140, :] = False
    got_fm = np.asarray(
        fast_mod._raw_score_pallas(
            img_u8, interpret=not on_tpu, mask_np=mask_f
        )
    )
    want_fm = np.where(mask_f, want_f, 0)
    results["fast_score_masked_exact"] = bool(np.array_equal(got_fm, want_fm))

    # fused detection (score+mask+retry+NMS one-kernel path) vs the XLA
    # composition — the whole per-composite pipeline, bit-exact.  Composite
    # dims must be TILE multiples (as the extractor's shelf packing
    # guarantees), so the probe crops to 480x736.
    hc, wc = (h // 32) * 32, (w // 32) * 32
    img_c = img_u8[:hc, :wc]
    mask = np.zeros((hc, wc), bool)
    mask[3 : hc - 3, 3 : wc - 3] = True
    mask[:, wc // 2 : wc // 2 + 6] = False  # fake level seam
    got_d = np.asarray(
        fast_mod._detect_fused_pallas(
            img_c, mask, 20, 7, interpret=not on_tpu
        )
    )
    fast_mod._PALLAS_ENV = False
    try:
        raw_c = fast_mod.raw_score_map(img_c)
    finally:
        fast_mod._PALLAS_ENV = prev
    raw = jnp.where(jnp.asarray(mask), raw_c, 0)
    hi = jnp.where(raw >= 20, raw, 0)
    lo = jnp.where(raw >= 7, raw, 0)
    tmax = jax.lax.reduce_window(
        hi, jnp.zeros((), hi.dtype), jax.lax.max, (32, 32), (32, 32), "VALID"
    )
    use_hi = jnp.repeat(jnp.repeat(tmax > 0, 32, axis=0), 32, axis=1)
    want_d = np.asarray(fast_mod.nms3(jnp.where(use_hi, hi, lo)))
    results["fused_detect_exact"] = bool(np.array_equal(got_d, want_d))

    results["ok"] = (
        results["window_gather_exact"]
        and results["sample_windows_exact"]
        and results["window_moments_exact"]
        and results["fast_score_exact"]
        and results["fast_score_masked_exact"]
        and results["fused_detect_exact"]
    )
    return results


V5E_VPU_BF16_TOPS = 1.9e12  # 8x128 ALUs x ~940 MHz x 2-per-lane bf16 packing


def _per_stage_budget(jax, params) -> None:
    """Emit one JSON line: per-stage slope ms + roofline bound per stage.

    Measurement: slope over scan length with 8 independent stage
    evaluations per scan step (the cheap stages are tens of us — without
    amplification the relay's wall noise swamps them and slopes go
    negative).  Bound basis per stage:
      - "kernel-op-model" (fast): composite area x the documented
        per-pixel op count of the Pallas score kernel / VPU bf16 peak —
        XLA's cost model cannot see inside a pallas_call;
      - "xla" (rest): max(XLA-counted flops / VPU bf16 peak, XLA bytes /
        819 GB/s HBM).  orient/brief also contain a Pallas gather whose
        interior ops are invisible to XLA, so their bounds are loose
        lower bounds (flagged in the note).
    Stages are per CAMERA at production geometry, mirroring
    tools/bench_stages.py.
    """
    import jax.numpy as jnp

    from orbslam3_tpu.oracle.orb_cpu import FAST_BORDER
    from orbslam3_tpu.ops.brief import brief_descriptors, brief_sampling_image
    from orbslam3_tpu.ops.fast import detect_two_threshold_multi
    from orbslam3_tpu.ops.orientation import ic_angles
    from orbslam3_tpu.ops.pyramid import build_pyramid, gaussian_blur7_u8
    from orbslam3_tpu.ops.select import select_topk_grid

    img = jnp.asarray(make_frame(7))

    def digest(tree):
        return sum(x.astype(jnp.float32).sum() for x in jax.tree.leaves(tree))

    def wiggle(c):
        return (c.astype(jnp.uint8) % 2)

    pyr = build_pyramid(img, params)
    b = FAST_BORDER
    crops = [l[b : l.shape[0] - b, b : l.shape[1] - b] for l in pyr]
    scores = detect_two_threshold_multi(
        crops, params.ini_th_fast, params.min_th_fast
    )
    quotas = [int(q) for q in params.features_per_level()]
    sels = [select_topk_grid(s, q) for s, q in zip(scores, quotas)]
    xys = [jnp.where(v[:, None], xy + b, b + 3) for (xy, _, v) in sels]
    angs = [ic_angles(l, xy) for l, xy in zip(pyr, xys)]
    samps = [brief_sampling_image(l, gaussian_blur7_u8(l)) for l in pyr]

    stages = [
        ("fast", lambda c: digest(detect_two_threshold_multi(
            [cr + wiggle(c) for cr in crops],
            params.ini_th_fast, params.min_th_fast))),
        ("brief", lambda c: digest([
            brief_descriptors(s + wiggle(c), xy.astype(jnp.float32), a)
            for s, xy, a in zip(samps, xys, angs)])),
        ("select", lambda c: digest([
            select_topk_grid(s + wiggle(c).astype(s.dtype), q)
            for s, q in zip(scores, quotas)])),
        ("orient", lambda c: digest([
            ic_angles(l + wiggle(c), xy) for l, xy in zip(pyr, xys)])),
        ("blur", lambda c: digest([gaussian_blur7_u8(l + wiggle(c)) for l in pyr])),
        ("pyramid", lambda c: digest(build_pyramid(img + wiggle(c), params))),
    ]

    REPS = 8  # independent stage evals per scan step (noise amplification)

    def scan_run(fn, n):
        @jax.jit
        def run(c0):
            def body(c, _):
                d = jnp.float32(0)
                for r in range(REPS):
                    d = d + fn(c + jnp.float32(2 * r))
                return c + 0.0 * d, d

            return jax.lax.scan(body, c0, None, length=n)[1].sum()

        return run

    # kernel-op-model bound for the FAST stage: XLA cannot cost a
    # pallas_call interior, so use the kernel's documented per-pixel op
    # count over the (conservative: un-shelf-packed) scored area
    from orbslam3_tpu.ops.fast import FAST_SCORE_OPS_PER_PIXEL, TILE

    fast_area = sum(
        (-(-c.shape[0] // TILE) * TILE) * (-(-c.shape[1] // TILE) * TILE)
        for c in crops
    )
    fast_bound_ms = (
        fast_area * FAST_SCORE_OPS_PER_PIXEL / V5E_VPU_BF16_TOPS * 1e3
    )

    out = {}
    n1, n2 = 8, 40
    for name, fn in stages:
        if _time_left() < 150:
            break
        try:
            r1, r2 = scan_run(fn, n1), scan_run(fn, n2)
            c0 = jnp.zeros((), jnp.float32)
            np.asarray(r1(c0)); np.asarray(r2(c0))
            walls = []
            for r in (r1, r2):
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(r(c0))
                    best = min(best, time.perf_counter() - t0)
                walls.append(best)
            ms = (walls[1] - walls[0]) / ((n2 - n1) * REPS) * 1e3
            if name == "fast":
                bound_ms, basis = fast_bound_ms, "kernel-op-model"
            else:
                ca = r2.lower(c0).compile().cost_analysis()
                if isinstance(ca, list):
                    ca = ca[0]
                flops = float(ca.get("flops", 0.0)) / (n2 * REPS)
                nbytes = float(ca.get("bytes accessed", 0.0)) / (n2 * REPS)
                bound_ms = max(
                    flops / V5E_VPU_BF16_TOPS, nbytes / (V5E_HBM_GBPS * 1e9)
                ) * 1e3
                basis = "xla"
            out[name] = {
                "ms": round(ms, 4),
                "bound_ms": round(bound_ms, 4),
                "x_of_bound": round(ms / bound_ms, 1) if bound_ms > 0 else None,
                "basis": basis,
            }
        except Exception as e:
            out[name] = {"error": f"{type(e).__name__}"}
            print(f"stage B7 [{name}] failed: {e}", file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": "per_stage_budget",
        "stages": out,
        "unit": "ms_per_camera",
        "note": "slope over scan length (n=8 vs 40, 8 evals/step) per stage at 480x752/8L/1000f; bound = kernel op model (fast; 1.9 Tops VPU bf16 packed) or max(XLA flops / VPU peak, XLA bytes / 819 GB/s) — orient/brief contain a Pallas gather invisible to the XLA model, so their bounds are loose",
    }), flush=True)


def main() -> None:
    threading.Thread(target=_watchdog, daemon=True).start()
    try:
        _main_measurements()
    except BaseException as e:  # noqa: BLE001 — always emit the final line
        _BEST.setdefault("note", f"aborted: {type(e).__name__}: {e}")
    _emit_final()


def _main_measurements() -> None:
    jax = _init_jax()
    from orbslam3_tpu.oracle.orb_cpu import PyramidParams

    params = PyramidParams(n_features=1000)

    # ---- stage A: headline FIRST (cache-warm program from prior rounds) ----
    # n=128 amortises the relay's fixed ~22-45 ms dispatch latency inside ONE
    # lax.scan dispatch; at n=128 the residual overhead is < 0.4 ms/frame.
    # Kernel-fallback ladder: the round-3 Mosaic kernels (fused detection,
    # halo-strip FAST) were written during a relay outage and have never
    # compiled on real hardware — if Mosaic rejects one, retry with the
    # fused-detect path off, then with Pallas off entirely (pure XLA), so a
    # kernel lowering failure costs one compile attempt, not the artifact.
    from orbslam3_tpu.ops import fast as fast_mod

    n = 128
    run64 = pairs64 = None
    for setting in ("as-configured", "no-fused-detect", "no-pallas"):
        try:
            if setting == "no-fused-detect":
                fast_mod._PALLAS_DETECT = False
            elif setting == "no-pallas":
                fast_mod._PALLAS_ENV = False
            run64, pairs64 = _build_run(jax, params, n)
            np.asarray(run64(pairs64))  # compile + warmup
            if setting != "as-configured":
                print(json.dumps({
                    "metric": "kernel_fallback",
                    "value": setting,
                    "note": "preferred Pallas path failed to compile/run; see stderr",
                }), flush=True)
            break
        except Exception as e:
            if setting == "no-pallas":
                raise
            print(f"stage A ({setting}) failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
    wall = _median_wall_ms(run64, pairs64, 3)
    _record(wall / n, "median of 3 runs, %d-frame scan, wall/n" % n)
    wall64_best = wall

    # refine with two more reps if time allows
    if _time_left() > 120:
        wall = min(wall64_best, _median_wall_ms(run64, pairs64, 2))
        wall64_best = min(wall64_best, wall)
        _record(wall64_best / n, "median wall/n over 5 runs, %d-frame scan" % n)

    # ---- stage B: supplementary honesty lines (sacrificed on deadline) ----
    # B1: slope method — the relay's per-dispatch latency cancels between two
    # scan lengths; purest sustained-compute number (NOTES.md: only the slope
    # is trustworthy when dispatch latency jitters).
    slope_ms = None
    if _time_left() > 240:
        try:
            run8, pairs8 = _build_run(jax, params, 8)
            np.asarray(run8(pairs8))
            wall8 = _median_wall_ms(run8, pairs8, 3)
            slope_ms = (wall64_best - wall8) / (n - 8)
            print(json.dumps({
                "metric": "stereo_extract_match_slope_ms_per_frame",
                "value": round(slope_ms, 3),
                "unit": "ms",
                "note": "(wall(n)-wall(8))/(n-8), n=%d; dispatch-latency-free sustained compute" % n,
            }), flush=True)
        except Exception:
            pass

    # B2: batch=1 single-pair dispatch INCLUDING host round-trip (what a
    # real-time loop sees) + the environment's fixed dispatch floor.
    if _time_left() > 180:
        try:
            import jax.numpy as jnp

            from orbslam3_tpu.frontend import stereo_frame as sf

            @jax.jit
            def run_one(pair):
                out = sf.extract_and_match_stereo.__wrapped__(
                    pair, params, sf.DEFAULT_MBF, sf.DEFAULT_FX
                )
                acc = jnp.float32(0)
                for leaf in jax.tree.leaves(out):
                    acc = acc + leaf.astype(jnp.float32).sum()
                return acc

            one_host = np.stack([make_frame(0), make_frame(1)])
            np.asarray(run_one(jax.device_put(one_host)))  # compile
            b1 = []
            for _ in range(8):
                t0 = time.perf_counter()
                np.asarray(run_one(jax.device_put(one_host)))
                b1.append((time.perf_counter() - t0) * 1e3)

            @jax.jit
            def noop(x):
                return x + 1.0

            tiny = jax.device_put(np.zeros((8, 8), np.float32))
            np.asarray(noop(tiny))
            floor = []
            for _ in range(8):
                t0 = time.perf_counter()
                np.asarray(noop(tiny))
                floor.append((time.perf_counter() - t0) * 1e3)
            b1_min = float(np.min(b1))
            floor_min = float(np.min(floor))
            print(json.dumps({
                "metric": "stereo_batch1_latency_ms",
                "value": round(b1_min, 2),
                "unit": "ms",
                "dispatch_floor_ms": round(floor_min, 2),
                "batch1_minus_floor_ms": round(max(b1_min - floor_min, 0.0), 2),
                "note": "includes host->device transfer; floor is the relay's fixed per-dispatch latency; on attached hardware expect ~2-3 ms (unverified)",
            }), flush=True)
        except Exception:
            pass

    # B3: HBM roofline (replaces MFU, VERDICT r2 item 4).  This workload is
    # VPU/HBM-bound by design — gathers left the MXU — so the meaningful
    # ceiling is bytes moved vs the v5e's ~819 GB/s, not bf16 FLOP peak.
    # bytes_accessed comes from XLA's own cost model of the compiled scan.
    if _time_left() > 60:
        try:
            ca = run64.lower(pairs64).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            nbytes = float(ca.get("bytes accessed", 0.0))
            flops = float(ca.get("flops", 0.0))
            per_frame_ms = (
                slope_ms if slope_ms and slope_ms > 0 else wall64_best / n
            )
            gbps = nbytes / n / (per_frame_ms * 1e-3) / 1e9
            print(json.dumps({
                "metric": "fused_extractor_hbm_utilization",
                "value": round(gbps / V5E_HBM_GBPS, 4),
                "unit": "fraction_of_v5e_819GBps",
                "achieved_gbps": round(gbps, 1),
                "bytes_per_frame_mb": round(nbytes / n / 1e6, 1),
                "program_gflops_per_frame": round(flops / n / 1e9, 2),
                "note": "XLA-counted bytes accessed / measured per-frame time; workload is VPU/HBM-bound (gathers off the MXU)",
            }), flush=True)
        except Exception:
            pass

    # B4: Pallas on-TPU parity smoke — hardware correctness of the round-2
    # Mosaic kernels recorded in the driver artifact, not just NOTES.md.
    if _time_left() > 120:
        try:
            res = pallas_parity_checks(jax)
            res["metric"] = "pallas_tpu_parity"
            print(json.dumps(res), flush=True)
        except Exception:
            pass

    # B5: full-system end-to-end — device front-end + host tracking/mapping
    # through the 1-frame prefetch pipeline (async dispatch + async D2H
    # copy).  Through the relay the residual is dominated by the one
    # remaining ~25-40 ms tunnel round trip; on attached hardware it
    # collapses to the ~10-12 ms host loop.  Reference end-to-end stage
    # means for the same roles: 38.5 (extract) + 7.7 (stereo match) ms
    # plus its tracking stages (ExecMean.txt:6-9).
    if _time_left() > 240:
        try:
            from orbslam3_tpu.cameras.models import Pinhole
            from orbslam3_tpu.oracle.orb_cpu import PyramidParams as PP
            from orbslam3_tpu.slam.system import System
            from orbslam3_tpu.utils.synth import ate_rmse, stereo_sequence

            fx = 350.0
            h, w = 480, 752
            camera = Pinhole([fx, fx, w / 2, h / 2])
            baseline = 0.12
            n_frames = 80
            frames = stereo_sequence(
                n_frames, camera, baseline, h, w, seed=1
            )
            sysm = System(
                camera, fx * baseline, PP(n_features=1000), sequential=False
            )
            est, gt, times = [], [], []
            # Prefetch depth: extraction of future frames is independent of
            # tracking, so several dispatches ride the relay concurrently;
            # depth D gives each result ~D host-track intervals to arrive
            # before np.asarray blocks on it.  Depth 1 already suffices on
            # attached hardware (device ~2 ms < host ~8 ms); the extra depth
            # only hides this environment's ~25-40 ms tunnel RTT.
            depth = max(1, int(os.environ.get("BENCH_PIPE_DEPTH", "4")))
            from collections import deque

            handles = deque(
                sysm.prefetch_stereo(frames[k][0], frames[k][1])
                for k in range(min(depth, n_frames))
            )
            for kf in range(n_frames):
                t0 = time.perf_counter()
                if kf + depth < n_frames:
                    handles.append(
                        sysm.prefetch_stereo(
                            frames[kf + depth][0], frames[kf + depth][1]
                        )
                    )
                pose = sysm.track_stereo_prefetched(handles.popleft(), kf / 20.0)
                dt = (time.perf_counter() - t0) * 1e3
                if kf >= 10:
                    times.append(dt)
                if pose is not None:
                    est.append(pose)
                    gt.append(frames[kf][2])
            sysm.shutdown()
            rmse = ate_rmse(est, gt) if len(est) >= 2 else float("nan")
            print(json.dumps({
                "metric": "slam_system_ms_per_frame_pipelined",
                "value": round(float(np.median(times)), 2),
                "unit": "ms",
                "tracked": len(est),
                "frames": n_frames,
                "ate_rmse_m": round(float(rmse), 4),
                "pipe_depth": depth,
                "note": "full SLAM loop (device front-end + host tracking) through the relay; prefetch depth hides the tunnel RTT behind host tracking — depth 1 suffices on attached hardware",
            }), flush=True)
        except Exception:
            pass

    # ---- stage C: final refinement if time is plentiful ----
    if _time_left() > 180:
        try:
            wall = _median_wall_ms(run64, pairs64, 3)
            wall64_best = min(wall64_best, wall)
            _record(wall64_best / n, "best median wall/n across refinement rounds, %d-frame scan" % n)
        except Exception:
            pass

    # B6: batched-throughput mode (VERDICT r3 weak #6) — the chip is ~99%
    # idle at the per-frame slope, so mapping-rate / multi-robot workloads
    # batch B frames per dispatch (scan-batched; the vmapped form measured
    # 1.50 vs 1.12 ms/frame and was dropped).  Slope over scan rounds
    # cancels dispatch latency, same method as B1.
    if _time_left() > 300:
        try:
            import jax.numpy as jnp

            from orbslam3_tpu.frontend import stereo_frame as sf

            B, m_hi, m_lo = 8, 16, 2
            batch_np = np.stack(
                [np.stack([make_frame(1000 + 2 * i), make_frame(1001 + 2 * i)])
                 for i in range(m_hi * B)]
            ).reshape(m_hi, B, 2, 480, 752)

            def build_batch_run(m):
                data = jax.device_put(batch_np[:m])

                @jax.jit
                def run(bs):
                    def body(c, bp):
                        out = sf.extract_and_match_stereo_packed_batch.__wrapped__(
                            bp, params, sf.DEFAULT_MBF, sf.DEFAULT_FX
                        )
                        return c + out.astype(jnp.float32).sum(), None

                    return jax.lax.scan(body, jnp.float32(0), bs)[0]

                return run, data

            run_hi, data_hi = build_batch_run(m_hi)
            run_lo, data_lo = build_batch_run(m_lo)
            np.asarray(run_hi(data_hi)); np.asarray(run_lo(data_lo))
            wall_hi = _median_wall_ms(run_hi, data_hi, 3)
            wall_lo = _median_wall_ms(run_lo, data_lo, 3)
            per_batch_ms = (wall_hi - wall_lo) / (m_hi - m_lo)
            per_frame_ms = per_batch_ms / B
            print(json.dumps({
                "metric": "stereo_frames_per_sec_batch%d" % B,
                "value": round(1000.0 / per_frame_ms, 1) if per_frame_ms > 0 else None,
                "unit": "frames/s",
                "batch_ms": round(per_batch_ms, 3),
                "ms_per_frame": round(per_frame_ms, 4),
                "note": "scan-batched front-end (B=%d frames/dispatch), slope over scan rounds; one dispatch serves a depth-B prefetch window (System.prefetch_stereo_batch); vmapped form measured 1.50 ms/frame vs scan 1.12 (r4) - scan kept" % B,
            }), flush=True)
        except Exception as e:
            print(f"stage B6 failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    # B7: per-stage budget (VERDICT r3 weak #4) — stage slopes measured on
    # hardware next to each stage's roofline bound from XLA's own cost
    # model (max of FLOP-limit at VPU bf16 peak and HBM-byte-limit), so
    # "the remaining tail is structural" is checkable in the artifact
    # rather than asserted in NOTES.md.
    if _time_left() > 420:
        try:
            _per_stage_budget(jax, params)
        except Exception as e:
            print(f"stage B7 failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    # B8: in-program attribution (r4) — per-source-file device time from a
    # profiler trace joined with optimized-HLO source metadata.  This is
    # the noise-free decomposition of the slope: wall-clock through the
    # relay jitters +-5%, but these sums only move when the program does.
    if _time_left() > 240:
        try:
            import tempfile

            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from tools.attribute_trace import hlo_source_map
            from tools.trace_ops import build_run, capture, parse_xplane

            run8, pairs8b = build_run()
            smap = hlo_source_map(run8.lower(pairs8b).compile().as_text())
            log_dir = tempfile.mkdtemp(prefix="bench_attr_")
            capture(run8, pairs8b, log_dir)
            rows, _total, _p = parse_xplane(log_dir)
            per_file: dict = {}
            for name, dur in rows.items():
                if name.startswith("jit_run") or name.startswith("while."):
                    continue  # outer containers double-count their children
                key = smap.get(name)
                f = os.path.basename(key[0]) if key else "<unattributed>"
                per_file[f] = per_file.get(f, 0.0) + dur
            nfr = 8
            budget = {
                f: round(d / nfr, 1)
                for f, d in sorted(per_file.items(), key=lambda kv: -kv[1])
            }
            print(json.dumps({
                "metric": "in_program_stage_us_per_frame",
                "value": round(sum(per_file.values()) / nfr, 1),
                "unit": "us/frame",
                "per_file": budget,
                "note": "device-op us per source file (profiler trace x "
                        "optimized-HLO metadata), n=8 scan — the noise-free "
                        "slope decomposition backing the structural-floor "
                        "claim (3 instrumented A/Bs recorded in NOTES.md r4)",
            }), flush=True)
        except Exception as e:
            print(f"stage B8 failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)


if __name__ == "__main__":
    if "--verify" in sys.argv:
        jax = _init_jax()
        res = pallas_parity_checks(jax)
        res["metric"] = "pallas_tpu_parity"
        print(json.dumps(res), flush=True)
        sys.exit(0 if res["ok"] else 1)
    main()
