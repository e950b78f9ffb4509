"""Op-level device-time breakdown of the fused stereo program.

Captures a jax.profiler trace of the n=8 scan on the real chip, parses the
xplane protobuf, and prints per-op and per-category device time so the
"XLA glue" (elementwise fusions, data movement) budget is attributable to
specific HLOs instead of a single bucket.

Usage: python tools/trace_ops.py [top_n]
"""

import glob
import gzip
import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def build_run(n=8):
    from orbslam3_tpu.frontend import stereo_frame as sf
    from orbslam3_tpu.oracle.orb_cpu import PyramidParams

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_frame

    params = PyramidParams(n_features=1000)
    pairs = jax.device_put(
        np.stack([np.stack([make_frame(2 * i), make_frame(2 * i + 1)]) for i in range(n)])
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


def capture(run, pairs, log_dir):
    np.asarray(run(pairs))  # compile + warm
    jax.profiler.start_trace(log_dir)
    np.asarray(run(pairs))
    jax.profiler.stop_trace()


def parse_xplane(log_dir):
    """Aggregate device-op durations from the trace-events json.gz export."""
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {log_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find device-lane pids (TPU core op lanes, not host threads)
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "/device:" in name or "XLA Op" in name:
                dev_pids.add(e["pid"])
    rows = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        # op lanes: thread name would disambiguate; keep all X events on device pids
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))
        rows[name] = rows.get(name, 0.0) + dur
        total += dur
    return rows, total, path


CATS = (
    ("pallas/fast", ("strip_score", "fast", "detect_fused")),
    ("pallas/gather", ("gather", "sample_windows", "window_moments", "kernel")),
    ("matmul", ("dot", "conv", "einsum")),
    ("datamove", ("copy", "transpose", "concatenate", "pad", "slice", "reshape", "bitcast", "dynamic-update")),
    ("reduce", ("reduce", "sort", "top-k", "scan", "cumsum", "select-and-scatter")),
    ("elementwise", ("fusion", "add", "multiply", "subtract", "compare", "select", "convert", "iota", "broadcast")),
)


def categorize(name):
    low = name.lower()
    for cat, keys in CATS:
        if any(k in low for k in keys):
            return cat
    return "other"


def main():
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    log_dir = "/tmp/traceops_%d" % int(time.time())
    run, pairs = build_run()
    print("backend:", jax.default_backend(), flush=True)
    capture(run, pairs, log_dir)
    rows, total, path = parse_xplane(log_dir)
    print(f"trace: {path}\ntotal device-event us: {total:.0f}")
    cats = {}
    for name, dur in rows.items():
        cats[categorize(name)] = cats.get(categorize(name), 0.0) + dur
    for cat, dur in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:16s} {dur:10.0f} us  {100*dur/max(total,1):5.1f}%")
    print(f"\ntop {top_n} ops:")
    for name, dur in sorted(rows.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"  {dur:9.1f} us  {name[:130]}")


if __name__ == "__main__":
    main()
