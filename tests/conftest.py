"""Test configuration: run everything on a virtual 8-device CPU platform.

Multi-chip TPU hardware is not available in CI; sharding tests use
`--xla_force_host_platform_device_count=8` (the standard JAX recipe for
testing `Mesh`/`shard_map` code single-host). Must run before jax imports.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(24601)  # the reference's MATLAB seed
