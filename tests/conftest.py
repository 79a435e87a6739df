"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; per the build contract the
sharding paths are validated on virtual CPU devices
(xla_force_host_platform_device_count) and the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
