"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on host devices (the standard JAX
fake-multi-device pattern) since only one real TPU chip is attached.
Must run before jax is imported anywhere.
"""

import os

# Hard-override: the session presets the TPU backend, but the test suite
# always runs on the virtual 8-device CPU mesh.
os.environ.pop("JAX_PLATFORMS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
