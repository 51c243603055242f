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

import jax  # noqa: E402

# A startup hook preloads the axon TPU plugin and force-merges 'axon' into
# jax_platforms, so the JAX_PLATFORMS env var alone does NOT select CPU —
# only config.update does.  Tests must run on the virtual 8-device CPU
# mesh, not the single real TPU chip.
jax.config.update("jax_platforms", "cpu")

# XLA compiles in this environment are slow (~2s per new executable, even
# for tiny eager ops); the persistent cache makes re-runs cheap.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(553)
