"""Test configuration: run everything on a virtual 8-device CPU mesh.

The TPU-hardware path is exercised by bench.py / __graft_entry__.py; unit
tests use the CPU backend (f32, same code paths) with 8 virtual devices so
multi-chip sharding tests run anywhere.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# Restrict to the CPU backend entirely: merely initializing the axon TPU
# backend claims the (single) device grant, which would serialize test runs
# against real TPU work and can wedge the relay.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def cpu_devices():
    return jax.devices("cpu")
