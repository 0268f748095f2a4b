"""Test configuration: force an 8-device virtual CPU platform.

Must run before jax is imported anywhere (SURVEY.md §4e): this is how
TPU-pod sharding behavior is tested without a real pod.
"""
import os

# Force CPU regardless of ambient JAX_PLATFORMS (the session may point at a
# single tunneled TPU chip, which would hang / serialize the test suite).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs


@pytest.fixture
def rng():
    return np.random.default_rng(1337)
