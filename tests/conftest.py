"""Test configuration: force CPU platform with 8 virtual devices.

The shell environment exports JAX_PLATFORMS=axon plus PYTHONPATH=/root/.axon_site so that
benchmarks reach the real TPU through a single-client tunnel.  Tests must NOT touch that
tunnel (concurrent clients hang on the TCP relay), so we override the platform
unconditionally and hide the axon plugin before JAX is imported.  Multi-chip sharding
tests then run against a virtual 8-device CPU mesh, mirroring how the driver dry-runs the
multi-chip path (xla_force_host_platform_device_count).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
sys.path = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":") if ".axon_site" not in p
)

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Plugins may have imported jax before this conftest runs; the config route still works
# as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/m3t_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(7)
