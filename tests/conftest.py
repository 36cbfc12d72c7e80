"""Test harness: force an 8-device virtual CPU platform before jax imports.

Per SURVEY.md §4: multi-host behavior is tested single-host with
XLA_FLAGS=--xla_force_host_platform_device_count=8 fake meshes.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment preloads the experimental 'axon' TPU platform plugin, which
# ignores JAX_PLATFORMS — force the CPU backend explicitly for tests.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration test (full receiver loop)")
