"""Test configuration: force a virtual 8-device CPU platform.

Tests validate numerics and multi-chip sharding without TPU hardware; the
driver separately compile-checks the TPU path via __graft_entry__.py.

Note: the environment's sitecustomize may register a TPU backend and
override ``JAX_PLATFORMS`` via jax.config, so we must update jax.config
*after* import (but before any backend is initialised) rather than rely on
environment variables alone.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
