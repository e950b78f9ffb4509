"""Test configuration: force a virtual 8-device CPU mesh.

Device kernels are integer/fixed-point by design, so CPU-backend results are
bit-identical to TPU results; multi-chip sharding tests run on the virtual
mesh exactly as they would on real ICI-connected chips.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin (registered via sitecustomize) force-selects itself as
# jax_platforms="axon,cpu" regardless of the JAX_PLATFORMS env var; config
# update after import is the reliable way to pin tests to the CPU mesh.
jax.config.update("jax_platforms", "cpu")
# CPU-backend XLA compiles dominate the fast tier's wall clock; the
# persistent cache (keyed by HLO hash) cuts repeat runs to the test logic
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def test_image():
    """Deterministic structured synthetic frame (EuRoC-like 752x480)."""
    rng = np.random.default_rng(7)
    h, w = 480, 752
    yy, xx = np.mgrid[0:h, 0:w]
    img = (
        120
        + 60 * np.sin(xx / 37.0) * np.cos(yy / 23.0)
        + rng.normal(0, 18, (h, w))
    ).clip(0, 255)
    for _ in range(80):
        cx = int(rng.integers(20, w - 20))
        cy = int(rng.integers(20, h - 20))
        r = int(rng.integers(3, 14))
        m = (xx - cx) ** 2 + (yy - cy) ** 2 < r * r
        img[m] = int(rng.integers(0, 256))
    return img.astype(np.uint8)


@pytest.fixture(scope="session")
def small_image():
    rng = np.random.default_rng(3)
    h, w = 240, 320
    yy, xx = np.mgrid[0:h, 0:w]
    img = (128 + 80 * np.sin(xx / 13.0) * np.sin(yy / 17.0) + rng.normal(0, 12, (h, w))).clip(0, 255)
    return img.astype(np.uint8)
