"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

All tests run single-host on CPU with 8 virtual devices so that multi-chip
sharding paths (pjit / shard_map over a Mesh) are exercised for real without
TPU hardware, mirroring how the driver dry-runs `__graft_entry__.dryrun_multichip`.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU PJRT plugin ignores JAX_PLATFORMS; the config update is binding.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
