"""Test harness: force an 8-device virtual CPU mesh.

This is the JAX-native fake backend for exercising DP/pjit sharding without a
TPU pod (SURVEY §4).  Note: this environment's sitecustomize registers a TPU
('axon') PJRT backend in every interpreter and exports JAX_PLATFORMS=axon, so
overriding the env var alone is not enough — we must also flip the jax config
after import (before any backend is initialized).
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


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    devices = jax.devices()
    assert devices[0].platform == "cpu", devices
    assert len(devices) == 8, devices
    yield


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
