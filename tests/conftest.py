"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated here without TPU hardware (the
driver separately dry-runs them via __graft_entry__.dryrun_multichip).
Must set env BEFORE jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(553)
