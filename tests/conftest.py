"""Test configuration: force an 8-virtual-device CPU platform.

The test strategy (SURVEY.md §4) requires multi-chip tests without a TPU
pod: JAX simulates 8 devices on CPU via
``--xla_force_host_platform_device_count=8``.  The environment's axon
sitecustomize pins ``jax_platforms`` to the (single) tunneled TPU chip, so
we override the jax config back to CPU *before any backend is initialized*.
"""

import os

os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] = (
        os.environ["XLA_FLAGS"] + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs[:8]


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
