"""Test configuration: run everything on a virtual 8-device CPU platform.

Multi-chip TPU hardware is not available in CI; sharding tests use
`--xla_force_host_platform_device_count=8` (the standard JAX recipe for
testing `Mesh`/`shard_map` code single-host).

Environment quirk: this image boots every Python process through an axon
sitecustomize that imports jax and pins `jax_platforms` to the TPU backend
before any user code runs. Env vars are therefore too late — we override the
already-loaded jax config and reset the backend cache instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge as _xb  # noqa: E402
    _xb._clear_backends()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_platform():
    devs = jax.devices()
    assert devs[0].platform == "cpu" and len(devs) == 8, (
        f"tests must run on the 8-device CPU platform, got {devs}")
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(24601)  # the reference's MATLAB seed
