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


def pytest_collection_modifyitems(config, items):
    """Applies the ``slow`` marker from tests/slow_tests.txt (prefix
    match on node id) so ``pytest -m "not slow"`` is a <5-min inner
    loop; the list is regenerated from --durations=0 output (see the
    file header). Explicit @pytest.mark.slow decorators compose."""
    listing = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    try:
        with open(listing) as file:
            prefixes = tuple(line.strip() for line in file
                             if line.strip()
                             and not line.startswith("#"))
    except OSError:
        return
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if not nodeid.startswith("tests/"):
            # pytest reports node ids relative to the rootdir the
            # suite was invoked from
            nodeid = "tests/" + nodeid
        if nodeid.startswith(prefixes):
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(20080524)


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
