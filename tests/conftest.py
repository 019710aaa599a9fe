"""Test harness configuration.

All unit tests run on a virtual 8-device CPU mesh so multi-chip sharding
logic is exercised without TPU hardware (the TPU-native analogue of a fake
backend; the reference has no test suite at all, see SURVEY.md §4).
"""

import os

# Must be set before jax is imported anywhere. Force CPU even when the
# session env points at a TPU platform — unit tests validate numerics at
# fp32 and sharding on a virtual 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin can override the env var; pin via config too.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
