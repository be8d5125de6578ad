"""Test configuration.

Tests run on the JAX CPU backend with 8 virtual devices — the
TPU-world "fake backend" for mesh/collective tests (SURVEY.md §4).
The env vars must be set before jax initializes its backends, which is
why this happens at conftest import time.
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
    return np.random.default_rng(20080524)
