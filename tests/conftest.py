"""Test harness: force the JAX CPU backend with 8 virtual devices.

Multi-chip hardware is not available in CI; the standard JAX answer is a fake
device mesh on CPU (SURVEY.md §4d).  The environment's site hook force-selects
the TPU backend via `jax.config.update("jax_platforms", ...)` at interpreter
start, so an env var is not enough — we must update the config after import,
before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    devices = jax.devices()
    assert devices[0].platform == "cpu", devices
    assert len(devices) == 8, devices
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(0)
