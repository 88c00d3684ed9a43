"""Test harness config: force CPU with 8 virtual devices so sharding tests run
without TPU hardware. Must run before the first `import jax` anywhere."""

import os

# The environment pins JAX_PLATFORMS=axon (remote TPU tunnel) and a
# sitecustomize imports jax at interpreter start, so the env var is already
# snapshotted — override via jax.config, which is effective until the first
# backend initialization. Tests run on local CPU with 8 virtual devices so
# sharding tests work without TPU hardware.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
