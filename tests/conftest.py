"""Test configuration: force an 8-device virtual CPU mesh (the JAX-idiomatic
"fake backend" for multi-device tests — SURVEY.md SS4) before jax initializes."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU plugin and force-sets
# jax_platforms="axon,cpu", overriding the env var — override it back.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
