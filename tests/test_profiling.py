"""Profiling hooks: jax.profiler trace capture + named ranges feeding the
host Benchmark (the reference's NVTX PUSH_RANGE/POP_RANGE + orb_benchmark
pair, Utils.hpp:17-38 + Benchmark.h)."""

import glob
import os

import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.utils.benchmark import Benchmark, device_trace, trace_range


def test_trace_range_records_into_benchmark():
    b = Benchmark.the()
    before = len(b.records.get("unit_test_range", []))
    with trace_range("unit_test_range"):
        _ = np.ones(10).sum()
    assert len(b.records["unit_test_range"]) == before + 1


def test_device_trace_writes_profile(tmp_path):
    d = str(tmp_path / "trace")
    with device_trace(d):
        with trace_range("traced_matmul"):
            a = jnp.ones((64, 64))
            (a @ a).block_until_ready()
    files = glob.glob(os.path.join(d, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), "no trace artifacts written"
