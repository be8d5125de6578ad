"""Test configuration.

Tests run on the JAX CPU backend with 8 virtual devices — the
TPU-world "fake backend" for mesh/collective tests (SURVEY.md §4).
The XLA flag must be set before jax initializes its backends. The
environment's TPU plugin registers itself regardless of JAX_PLATFORMS,
so the default device is pinned to CPU explicitly; mesh tests build
their mesh from ``jax.devices("cpu")``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# The TPU plugin registers via sitecustomize when this var is set and
# its backend INIT (not just compute) hangs through tunnel outages.
# Registration already happened at interpreter start, so popping here
# only shields SUBPROCESSES (multi-host workers); to run the suite
# during an outage invoke pytest itself with the var unset:
#   env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest ...
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(20080524)


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
