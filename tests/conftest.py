"""Test harness: run all JAX tests on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU plugin and calls
jax.config.update("jax_platforms", "axon,cpu") at interpreter start, so the
JAX_PLATFORMS env var alone is not enough — override the config after import.
XLA_FLAGS must be set before the CPU backend is first initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.RandomState(0)
