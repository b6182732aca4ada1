"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware isn't available in CI, so all sharding tests run against
``--xla_force_host_platform_device_count=8`` — the standard JAX substitute
for a real slice. Must be set before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override: the shell presets 'axon' (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
