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

# Keep the CPU test suite on a 12-slot channel pool: the PRODUCT default
# is the reference's full per-system plan (rx_stream.CHANNEL_PLAN,
# sdrinit.c:41-107), whose cost is amortized by the TPU's batched scan but
# not by the CPU backend these tests run on. Tests that exercise the full
# plan pass n_slots explicitly.
from gps_jamming_tpu.runtime import rx_stream as _rx_stream

_rx_stream.CHANNEL_PLAN = {k: 12 for k in _rx_stream.CHANNEL_PLAN}


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration test (full receiver loop)")
