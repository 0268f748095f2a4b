"""Test configuration: force an 8-device virtual CPU platform.

Must run before jax is imported anywhere (SURVEY.md §4e): this is how
TPU-pod sharding behavior is tested without a real pod.
"""
import os

# Force CPU regardless of ambient JAX_PLATFORMS. NOTE: the environment's
# sitecustomize registers an 'axon' TPU plugin and overrides jax_platforms
# AFTER env-var parsing, so the env var alone is not enough — we must also
# jax.config.update post-import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on CPU"

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
