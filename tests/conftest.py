"""Test configuration: force an 8-virtual-device CPU platform so multi-chip
sharding logic is exercised without TPU hardware (SURVEY §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The container's sitecustomize force-registers the axon TPU plugin and
# appends it to jax_platforms; pin tests to the 8-virtual-device CPU platform.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from otto_tpu.data.synthetic import synthetic_events


@pytest.fixture(scope="session")
def small_events():
    return synthetic_events(n_sessions=300, n_aids=500, mean_length=8.0, seed=7)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
