"""Test configuration: force an 8-device virtual CPU mesh (the JAX-idiomatic
"fake backend" for multi-device tests — SURVEY.md SS4) before jax initializes."""

import os

# SIE_TPU_TEST_TPU=1 leaves the real backend in place (for the TPU-only
# tests, e.g. test_flash_tpu.py); everything else runs on the virtual CPU mesh
_FORCE_CPU = os.environ.get("SIE_TPU_TEST_TPU") != "1"

if _FORCE_CPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    if "xla_backend_optimization_level" not in flags:
        # the suite is compile-dominated; level 0 cuts CPU compiles ~38% with
        # all tolerances green (tiny test programs barely slow down)
        flags = (flags + " --xla_backend_optimization_level=0").strip()
    os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU plugin and force-sets
# jax_platforms="axon,cpu", overriding the env var — override it back.
if _FORCE_CPU:
    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: repeat suite runs skip recompilation (the suite is
# compile-dominated). First run is unchanged; the cache lives outside the repo.
jax.config.update("jax_compilation_cache_dir", "/tmp/sie_tpu_test_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
