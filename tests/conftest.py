"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware isn't available in CI, so all sharding tests run against
``--xla_force_host_platform_device_count=8`` — the standard JAX substitute
for a real slice. Must be set before jax is imported anywhere.
"""

import os

# This box has 1 CPU core; torch's default OMP threading livelocks on it
# (a 16x16 conv took 379s). Force single-threaded BLAS/OMP everywhere.
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The environment pre-imports jax (sitecustomize) with the TPU backend
# selected, so the JAX_PLATFORMS env var is latched before conftest runs —
# only a config update reliably redirects tests to the virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# This box has a single CPU core — XLA compiles dominate the suite runtime.
# A persistent compilation cache makes repeat runs cheap.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

try:
    import torch

    torch.set_num_threads(1)
except ImportError:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
